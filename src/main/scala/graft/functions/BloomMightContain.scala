package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Bloom-filter membership test as a native codegen'd expression — the
  * semi-join PRUNING primitive for the regime between "dim broadcasts
  * as an exact hash relation" and "both sides must shuffle": a dim key
  * set of hundreds of millions of rows won't broadcast as a hash join,
  * but its ~1-byte-per-key bloom sketch ships to every executor fine,
  * and filtering the fact against it BEFORE the shuffle removes the
  * non-matching (at fpp, slightly superset) rows from the wire. The
  * exact join afterwards discharges false positives, so results are
  * exact — the sketch only reduces shuffle volume, never changes
  * semantics. (Spark's own runtime row-level filtering injects the same
  * shape when statistics let it; this operator is the explicit form for
  * pipelines that build the dim key set outside one query's plan — an
  * incremental index, a previous job's output — where the optimizer
  * cannot see it.)
  *
  * The expression carries the SERIALIZED sketch and deserializes once
  * per task ([[bloom]] is `@transient lazy`); `doGenCode` references
  * the expression instance itself (guaranteed serializable — the bytes
  * are a plain array) and emits a direct `test(long)` call, so the
  * probe stays inside whole-stage codegen with zero boxing.
  */
case class BloomMightContain(child: Expression, filterBytes: Array[Byte])
    extends UnaryExpression {

  @transient private lazy val bloom: BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(filterBytes))

  def test(v: Long): Boolean = bloom.mightContainLong(v)

  override def dataType: DataType = BooleanType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"expected bigint key, got $other")
  }

  override def nullSafeEval(v: Any): Any = test(v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftBloom", this, classOf[BloomMightContain].getName)
    defineCodeGen(ctx, ev, c => s"$ref.test($c)")
  }

  override def prettyName: String = "bloom_might_contain"

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BloomFunctions {

  /** Build a bloom sketch of `keyCol` (bigint) from `dim`. The build is
    * a tree-aggregate over the dim side only (each partition folds its
    * keys into a local sketch, sketches OR-merge upward) — the result
    * is executor-memory-scale metadata like the k-means centroids
    * (Similarity.scala) or the sink bucket lists (MergeSink.scala),
    * never fact-side data on the driver.
    */
  def buildBloom(dim: DataFrame, keyCol: String, expectedItems: Long, fpp: Double): Array[Byte] = {
    val bf = dim.stat.bloomFilter(keyCol, math.max(expectedItems, 1L), fpp)
    val out = new ByteArrayOutputStream()
    bf.writeTo(out)
    out.toByteArray
  }

  def mightContain(key: Column, filterBytes: Array[Byte]): Column =
    ColumnBridge.column(BloomMightContain(ColumnBridge.expression(key), filterBytes))
}
