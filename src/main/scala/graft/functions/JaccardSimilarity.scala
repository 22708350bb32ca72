package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Jaccard similarity of two string arrays treated as sets:
  * |A ∩ B| / |A ∪ B|, computed in one hash-set pass.
  *
  * Value-identical to
  *   size(array_intersect(a,b)) / (size(a)+size(b)-size(array_intersect))
  * over distinct inputs (WordShingles already emits distinct shingles),
  * but avoids materializing the intersect array and double-scanning —
  * the near-dup verify stage runs this once per candidate pair.
  */
case class JaccardSimilarity(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.forall(_.dataType match {
          case ArrayType(StringType, _) => true
          case _ => false
        })) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"expected array<string> inputs, got ${children.map(_.dataType).mkString(", ")}")

  override def nullSafeEval(a: Any, b: Any): Any = {
    val xs = a.asInstanceOf[ArrayData]
    val ys = b.asInstanceOf[ArrayData]
    val na = xs.numElements()
    val nb = ys.numElements()
    val set = new java.util.HashSet[UTF8String](na * 2)
    var i = 0
    while (i < na) { set.add(xs.getUTF8String(i)); i += 1 }
    var inter = 0
    // distinct inputs assumed (WordShingles emits distinct); count
    // distinct matches defensively anyway via removal.
    var j = 0
    while (j < nb) { if (set.remove(ys.getUTF8String(j))) inter += 1; j += 1 }
    // same division as size(intersect)/(na+nb-inter), incl. 0/0 -> NaN
    inter.toDouble / (na + nb - inter)
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object JaccardFunctions {
  def jaccardSim(a: Column, b: Column): Column =
    ColumnBridge.column(JaccardSimilarity(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
