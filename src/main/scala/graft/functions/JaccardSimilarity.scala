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
  * Inputs are DEDUPLICATED here (set sizes, not array lengths), so the
  * registered SQL function `jaccard_sim` is correct for arbitrary
  * arrays, not just pre-distinct ones — equivalent to
  *   size(array_intersect(a,b)) /
  *     (size(array_distinct(a)) + size(array_distinct(b)) - size(array_intersect(a,b)))
  * without materializing any intermediate array. (WordShingles already
  * emits distinct shingles, so the near-dup pipeline pays nothing.)
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
    val sa = new java.util.HashSet[UTF8String](na * 2)
    var i = 0
    while (i < na) { sa.add(xs.getUTF8String(i)); i += 1 }
    val sb = new java.util.HashSet[UTF8String](nb * 2)
    var inter = 0
    var j = 0
    while (j < nb) {
      val v = ys.getUTF8String(j)
      if (sb.add(v) && sa.contains(v)) inter += 1
      j += 1
    }
    // |A∩B| / (|A|+|B|-|A∩B|) over the DISTINCT sets; 0/0 -> NaN
    inter.toDouble / (sa.size + sb.size - inter)
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object JaccardFunctions {
  def jaccardSim(a: Column, b: Column): Column =
    ColumnBridge.column(JaccardSimilarity(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
