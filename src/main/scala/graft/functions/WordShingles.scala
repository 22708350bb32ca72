package graft.functions

import scala.collection.mutable
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Distinct word n-gram shingles of a token array, in one pass.
  *
  * Semantically identical to
  * array_distinct(transform(sequence(1, greatest(size-n+1, 1)),
  *   i -> concat_ws(" ", slice(toks, i, n))))
  * including the clamp for short inputs (< n tokens -> one shingle of
  * whatever remains) and first-occurrence distinct order — but a single
  * Java loop instead of four nested interpreted higher-order ops
  * allocating intermediate arrays per row (the dedup-pipeline hotspot).
  *
  * CodegenFallback: the surrounding operators stay codegen'd; string
  * assembly itself dominates, and the tight eval loop is the win.
  */
case class WordShingles(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"expected array<string>, got $other")
  }

  private val sep = UTF8String.fromString(" ")

  override def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[ArrayData]
    val m = toks.numElements()
    val count = math.max(m - n + 1, 1)
    val seen = new mutable.LinkedHashSet[UTF8String]
    var i = 0
    while (i < count) {
      val hi = math.min(i + n, m)
      val parts = new Array[UTF8String](hi - i)
      var j = i
      while (j < hi) { parts(j - i) = toks.getUTF8String(j); j += 1 }
      seen += UTF8String.concatWs(sep, parts: _*)
      i += 1
    }
    new GenericArrayData(seen.toArray[Any])
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ShingleFunctions {
  def wordShingles(toks: Column, n: Int): Column =
    ColumnBridge.column(WordShingles(ColumnBridge.expression(toks), n))
}
