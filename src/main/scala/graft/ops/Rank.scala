package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ext.Lineage

/** Distributed global row numbering — the primitive behind exact
  * equi-depth histograms, global percentile assignment, and
  * deterministic pagination, WITHOUT the single-partition window
  * (`row_number().over(Window.orderBy(...))` moves the entire dataset
  * through ONE task — the canonical 100 TB scale-killer; Spark itself
  * warns `WindowExec: No Partition Defined`).
  *
  * Shape (the classic two-pass distributed rank):
  *   1. range-repartition on the sort key, sort within partitions —
  *      the same machinery as a global `orderBy`, fully parallel;
  *   2. count rows per partition (metadata-scale: one long per
  *      partition, collected to the driver like the k-means centroids
  *      or sink bucket lists);
  *   3. per-partition `row_number` (window PARTITIONED by partition id
  *      — parallel, no single-task funnel) plus the partition's
  *      cumulative offset, broadcast-joined back on partition id.
  *
  * The range-partitioned frame is lineage-checkpointed so pass 2 and
  * pass 3 read the SAME materialized partitioning: RangePartitioner
  * samples per-RDD-id seeds, so re-executing the exchange in two
  * separate jobs could place boundary rows differently and corrupt
  * offsets. The checkpoint blocks are released by the session's
  * per-query `clearCache` (the frame escapes to the caller, so no
  * eager free here — the bfsHops discipline).
  *
  * The result is a correct global row number for any TOTAL ordering
  * (ties in the key columns would get arbitrary relative order across
  * partition boundaries — pass a tiebreak column that makes the order
  * total, as every oracle-gated caller must anyway).
  */
object Rank {

  /** Adds `rnCol` (1-based global row number under `order`) to `df`.
    * `order` must be a total order for a deterministic result.
    */
  def globalRowNumber(df: DataFrame, order: Seq[Column], rnCol: String,
                      numPartitions: Int = 0): DataFrame =
    globalRowNumberWithTotal(df, order, rnCol, numPartitions)._1

  /** [[globalRowNumber]] plus the TOTAL row count, for free: pass 2
    * already collects one count per partition to build the offsets, so
    * their sum is driver metadata the caller would otherwise pay a
    * whole extra aggregate job (plus a broadcast attach) to recompute —
    * q123's partner-draw modulus was exactly that redundant pass.
    */
  def globalRowNumberWithTotal(df: DataFrame, order: Seq[Column], rnCol: String,
                               numPartitions: Int = 0): (DataFrame, Long) =
    twoPhase(df, order, numPartitions, count(lit(1))) { (parted, w) =>
      parted.withColumn(rnCol, row_number().over(w).cast("long") + col("__off"))
    }

  /** Adds `outCol` (INCLUSIVE running sum of `valueCol` under the
    * global total order `order`) to `df` — the distributed prefix sum
    * behind token-budget sample packing (q122) and equi-width layout
    * assignment, with the same two-pass shape as [[globalRowNumber]]:
    * pass 2 collects one per-partition TOTAL of `valueCol` (metadata-
    * scale), pass 3 runs the cumsum window PARTITIONED by partition id
    * plus the partition's cumulative offset. `valueCol` must be an
    * integral column (offsets are exact longs).
    */
  def globalRunningSum(df: DataFrame, order: Seq[Column], valueCol: String,
                       outCol: String, numPartitions: Int = 0): DataFrame =
    twoPhase(df, order, numPartitions,
      coalesce(sum(col(valueCol)), lit(0L)).cast("long")) { (parted, w) =>
      parted.withColumn(outCol,
        sum(col(valueCol)).over(w.rowsBetween(Window.unboundedPreceding,
          Window.currentRow)).cast("long") + col("__off"))
    }._1

  /** Shared two-pass skeleton: range-repartition + in-partition sort
    * (checkpointed — see class doc), per-partition aggregate `perPart`
    * collected to the driver (one long per partition), exclusive
    * prefix-sum offsets broadcast back on `__pid`, then `build` runs
    * the parallel per-partition window with `__off` in scope. Returns
    * (result, sum of the per-partition aggregates) — for `count(*)`
    * that sum is the exact total row count, already on the driver as a
    * byproduct of building the offsets.
    */
  private def twoPhase(df: DataFrame, order: Seq[Column], numPartitions: Int,
                       perPart: Column)(
      build: (DataFrame, org.apache.spark.sql.expressions.WindowSpec) => DataFrame): (DataFrame, Long) = {
    val spark = df.sparkSession
    import spark.implicits._
    val parts =
      if (numPartitions > 0) numPartitions
      else spark.sessionState.conf.numShufflePartitions
    // LAZY checkpoint (round 15): the totals collect right below is the
    // first action, so materialization rides it instead of paying a
    // dedicated eager job first — one fewer full pass over the frame
    // per rank/cumsum call (q122's fixed floor dropped a whole job; at
    // cluster scale it is one fewer stage barrier). Determinism is
    // unchanged: lineage truncates at the checkpoint either way, so the
    // range exchange can never re-sample between pass 2 and pass 3.
    val (parted, _) = Lineage.checkpointLazy(
      df.repartitionByRange(parts, order: _*)
        .sortWithinPartitions(order: _*)
        .withColumn("__pid", spark_partition_id()))
    // pass 2: one long per partition — metadata-scale collect
    val totals: Map[Int, Long] = parted.groupBy(col("__pid"))
      .agg(perPart.as("t")).as[(Int, Long)].collect().toMap
    val offsets = (0 until parts).scanLeft(0L) {
      case (acc, pid) => acc + totals.getOrElse(pid, 0L)
    }.dropRight(1).zipWithIndex.map { case (off, pid) => (pid, off) }
    val offDf = broadcast(offsets.toDF("__pid", "__off"))
    // pass 3: parallel per-partition window + offset
    val w = Window.partitionBy(col("__pid")).orderBy(order: _*)
    (build(parted.join(offDf, "__pid"), w).drop("__pid", "__off"),
     totals.values.sum)
  }
}
