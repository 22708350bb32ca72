package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}

/** Morton (Z-order) bit interleave of two non-negative longs — the
  * data-layout primitive behind multi-dimensional clustering (q212):
  * z = sum_i ((x>>i & 1) << 2i  |  (y>>i & 1) << (2i+1)) for the low
  * `bits` bits of each input. A native codegen expression so the hot
  * path (computed once per row at write time over the full table)
  * stays inside whole-stage codegen as one tight bit loop instead of
  * a 2*bits-term arithmetic tree; `eval` and `doGenCode` share the
  * same shift/mask semantics, and inputs are masked to `bits` so
  * out-of-range values alias deterministically rather than corrupting
  * high bits.
  */
case class MortonInterleave(left: Expression, right: Expression, bits: Int)
    extends BinaryExpression {

  require(bits >= 1 && bits <= 31, s"bits must be in [1, 31], got $bits")

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"expected (bigint, bigint), got (${left.dataType}, ${right.dataType})")

  override def nullSafeEval(x: Any, y: Any): Any =
    MortonInterleave.interleave(x.asInstanceOf[Long], y.asInstanceOf[Long], bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) =>
      s"${ev.value} = graft.functions.MortonInterleave.interleave($x, $y, $bits);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object MortonInterleave {
  /** Shared by the interpreted and generated paths. */
  def interleave(x: Long, y: Long, bits: Int): Long = {
    val mask = (1L << bits) - 1
    val (mx, my) = (x & mask, y & mask)
    var z = 0L
    var i = 0
    while (i < bits) {
      z |= ((mx >> i) & 1L) << (2 * i)
      z |= ((my >> i) & 1L) << (2 * i + 1)
      i += 1
    }
    z
  }

  def morton(x: Column, y: Column, bits: Int): Column =
    ColumnBridge.column(MortonInterleave(
      ColumnBridge.expression(x), ColumnBridge.expression(y), bits))
}
