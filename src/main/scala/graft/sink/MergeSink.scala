package graft.sink

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.Cdc

/** Durable keyed MERGE upsert sink — the production replacement for
  * `CdcStream.foreachBatchMerge`'s full-state rewrite, and the Spark
  * twin of the reference's warehouse upsert (consumer/DoFns/
  * load_data.py:52-60 `insert_rows` into the ClickHouse
  * ReplacingMergeTree of clickhouse/init.sql:22-24).
  *
  * The state table is parquet hash-partitioned on
  * `__bucket = pmod(hash(keys), nBuckets)`. Each `merge(batch)`:
  *
  *   1. computes the batch's touched buckets (a `distinct` over the
  *      bucket expression — at most `nBuckets` small ints reach the
  *      driver; this IS the partition-pruning decision, metadata not
  *      data);
  *   2. reads ONLY those bucket partitions of the state table (the
  *      `isin` filter prunes at the parquet partition level — verified
  *      by PlanSpec's PartitionFilters audit);
  *   3. LWW-merges state + batch with `Cdc.latestByKey` (commutative,
  *      associative, idempotent — replaying a batch is a no-op on
  *      content);
  *   4. rewrites ONLY the touched partitions via dynamic partition
  *      overwrite (untouched bucket directories keep their files
  *      byte-for-byte — asserted in PipelineSpec).
  *
  * Cost per micro-batch is O(|touched state| + |batch|), not
  * O(|state|): with uniform key hashing a batch touching k distinct
  * keys reads at most min(k, nBuckets)/nBuckets of the table. At
  * 100 TB, size `nBuckets` so one bucket ≈ a few GB (e.g. 16k buckets
  * for 100 TB); hot-key skew spreads by hash, and the merge itself is
  * the same map-side-combine hash aggregate as the batch path.
  *
  * Write atomicity is SNAPSHOT-grade via [[TableManifest]]: every
  * commit writes immutable files into a fresh generation dir and then
  * atomically renames a new manifest into place — a crash at any
  * point before the rename leaves the previous snapshot fully intact
  * (no more delete-before-rename partition-overwrite window), and a
  * crash after it is a complete commit. Combined with Structured
  * Streaming: the LWW merge is idempotent, so at-least-once
  * redelivery of a micro-batch after a crash converges to the same
  * state (StreamingSpec's checkpoint-restart case proves it); the
  * manifest makes each individual commit all-or-nothing
  * (PipelineSpec's crash-injection case proves that).
  */
final class MergeSink(
    spark: SparkSession,
    val path: String,
    keys: Seq[String],
    orderCols: Seq[String],
    nBuckets: Int = 64) {

  import MergeSink.BucketCol

  private[graft] val manifest = new TableManifest(spark, path)

  private def bucketOf: Column = pmod(hash(keys.map(col): _*), lit(nBuckets))

  /** Current committed state (bucket column dropped — callers see the
    * logical schema they wrote).
    */
  def read(): DataFrame =
    manifest.snapshot().map(_.drop(BucketCol)).getOrElse(
      throw new IllegalStateException(s"no committed state at $path"))

  /** Latest-per-key state restricted to the given buckets; resolution
    * is path-level — other buckets' files are never listed, let alone
    * scanned.
    */
  private[graft] def readBuckets(buckets: Seq[Int]): Option[DataFrame] =
    manifest.snapshot(Some(buckets)).map(_.drop(BucketCol))

  /** One-time adoption of a table written by the pre-manifest code
    * (bucket dirs at the root, no `_MANIFEST`) — reads fail loudly on
    * such layouts instead of treating them as empty. File renames
    * only, no data rewrite; idempotent.
    */
  def migrateLegacy(): Unit =
    MergeSink.withWriterLock(spark, path, "migrate")(manifest.migrateLegacy())

  /** Per-bucket parquet file counts of the committed snapshot — the
    * compaction-policy input, and what layout gates audit.
    */
  def bucketFileCounts(): Map[Int, Int] =
    manifest.bucketFiles().map { case (b, fl) => b -> fl.size }

  /** (fileName, size, mtime) per bucket — maintenance metadata. */
  def bucketFiles(): Map[Int, Seq[(String, Long, Long)]] = manifest.bucketFiles()

  /** Upsert one batch. Empty batches are a no-op (no read, no write).
    * Holds the writer lock: a concurrent merge or compact on the same
    * table fails fast instead of interleaving commits
    * (see [[MergeSink.withWriterLock]]).
    */
  def merge(batch: DataFrame): Unit = MergeSink.withWriterLock(spark, path, "merge") {
    val touched = batch.select(bucketOf.as(BucketCol)).distinct()
      .collect().map(_.getInt(0)).toSeq
    if (touched.nonEmpty) {
      val current = manifest.mapping()
      val base = readBuckets(touched) match {
        case Some(state) => state.unionByName(batch)
        case None        => batch
      }
      val merged = Cdc.latestByKey(base, keys, orderCols)
      val gen = manifest.newGenDir()
      merged
        .withColumn(BucketCol, bucketOf)
        // key-sorted within each write task: parquet row-group min/max
        // stats then let point lookups and merge reads skip row groups
        .sortWithinPartitions(keys.map(col): _*)
        .write
        .partitionBy(BucketCol)
        .parquet(s"$path/$gen")
      // all-or-nothing publish; crashed attempts' files stay invisible
      manifest.commit(current ++ manifest.writtenBuckets(gen).map(_ -> gen))
      manifest.vacuum()
    }
  }

  /** foreachBatch adapter: `stream.writeStream.foreachBatch(sink.forEachBatch)`. */
  def forEachBatch: (DataFrame, Long) => Unit = (batch, _) => merge(batch)

  /** Compact buckets that have accumulated more than
    * `maxFilesPerBucket` parquet files — the classic streaming-sink
    * pathology: every micro-batch writes at least one file per bucket
    * it touches, and scan cost eventually drowns in file-open overhead.
    * Rewrites ONLY oversized buckets (hot buckets compact often, cold
    * ones never), one file per bucket after the rewrite
    * (`repartition` on the bucket column -> one task per bucket).
    * Content is untouched — pure layout maintenance, safe to run
    * between merges on any schedule.
    */
  def compact(maxFilesPerBucket: Int = 4): Unit = MergeSink.withWriterLock(spark, path, "compact") {
    if (manifest.exists) {
      val oversized = manifest.bucketFiles()
        .filter { case (_, fl) => fl.size > maxFilesPerBucket }
        .keys.toSeq.sorted
      if (oversized.nonEmpty) {
        val current = manifest.mapping()
        val gen = manifest.newGenDir()
        manifest.snapshot(Some(oversized)).get
          .repartition(oversized.length, col(BucketCol))
          .write
          .partitionBy(BucketCol)
          .parquet(s"$path/$gen")
        manifest.commit(current ++ manifest.writtenBuckets(gen).map(_ -> gen))
        manifest.vacuum()
      }
    }
  }
}

object MergeSink {
  /** Partition column of the state table layout. */
  val BucketCol = "__bucket"

  /** Thrown when a second writer attempts to mutate a sink table while
    * another merge/compact holds the lock.
    */
  final class ConcurrentWriterException(msg: String)
    extends IllegalStateException(msg)

  /** SINGLE-WRITER contract, enforced: dynamic partition overwrite is
    * per-partition-atomic but has no cross-writer commit protocol —
    * two interleaved merges (or a merge racing a compact) could each
    * rewrite a bucket from a stale read and lose the other's rows. A
    * create-exclusive lock file (`<table>_lock`) makes the second
    * writer FAIL FAST with the holder's identity instead of corrupting
    * state. Exclusive-create atomicity is filesystem-specific, so the
    * acquisition path picks the primitive that IS atomic on each:
    * local paths use NIO `Files.createFile` (O_CREAT|O_EXCL);
    * HDFS-like filesystems use `fs.create(overwrite = false)` (an
    * atomic namespace operation there). Genuine I/O errors are
    * rethrown, never misreported as contention. The reference
    * delegates this to ClickHouse's merge machinery; a transactional
    * table format (Delta/Iceberg) replaces this with optimistic commit
    * protocols without changing callers.
    *
    * A crashed writer leaves its lock behind (it names owner + epoch
    * for diagnosis); `breakLock` is the documented operator override.
    */
  def withWriterLock[T](spark: SparkSession, table: String, op: String)(body: => T): T = {
    val lock = new Path(table + "_lock")
    val fs = lock.getFileSystem(spark.sessionState.newHadoopConf())
    val owner = s"$op pid=${ProcessHandle.current().pid()} epochMs=${System.currentTimeMillis()}"
    def contention(): Nothing = {
      val holder =
        try {
          val in = fs.open(lock)
          try scala.io.Source.fromInputStream(in).mkString.trim finally in.close()
        } catch { case _: java.io.IOException => "<unreadable>" }
      throw new ConcurrentWriterException(
        s"$table is locked by [$holder]; refusing concurrent $op " +
          "(single-writer contract; breakLock() overrides a crashed holder)")
    }
    val isLocal = lock.toUri.getScheme == null || lock.toUri.getScheme == "file"
    if (isLocal) {
      val p = java.nio.file.Paths.get(lock.toUri.getPath)
      if (p.getParent != null) java.nio.file.Files.createDirectories(p.getParent)
      try java.nio.file.Files.write(p, owner.getBytes("UTF-8"),
        java.nio.file.StandardOpenOption.CREATE_NEW,
        java.nio.file.StandardOpenOption.WRITE)
      catch { case _: java.nio.file.FileAlreadyExistsException => contention() }
    } else {
      // rename is the atomic namespace op on HDFS-like stores, so the
      // CLAIM is the rename of a fully-written temp file — a contender
      // can never observe a claimed-but-empty lock (create-then-write
      // had that window). On S3-like object stores neither
      // create-exclusive nor rename is atomic: the lock is ADVISORY
      // there; a table format with a real commit protocol
      // (Delta/Iceberg — see class doc) is the production answer.
      val tmp = new Path(table + s"_lock.tmp.${java.util.UUID.randomUUID()}")
      val out = fs.create(tmp, false)
      out.write(owner.getBytes("UTF-8")); out.close()
      val claimed =
        try fs.rename(tmp, lock)
        catch {
          case e: java.io.IOException =>
            // the rename may have landed despite the error — if the lock
            // now carries OUR owner string we hold it; otherwise this is
            // a genuine I/O failure and must be rethrown, not
            // misreported as contention (class-doc contract)
            val ours =
              try {
                val in = fs.open(lock)
                try scala.io.Source.fromInputStream(in).mkString == owner
                finally in.close()
              } catch { case _: java.io.IOException => false }
            if (!ours) { fs.delete(tmp, false); throw e }
            true
        }
      if (!claimed) { fs.delete(tmp, false); contention() }
      // holder-side hygiene: sweep lock temp files from CRASHED claimers
      // (mtime-guarded so a live claimer mid-write is never raced; a live
      // one is about to fail on rename and delete its own tmp anyway)
      try {
        val dir = lock.getParent
        val prefix = lock.getName + ".tmp."
        val cutoff = System.currentTimeMillis() - 10 * 60 * 1000
        fs.listStatus(dir).foreach { st =>
          if (st.getPath.getName.startsWith(prefix) &&
              st.getModificationTime < cutoff)
            fs.delete(st.getPath, false)
        }
      } catch { case _: java.io.IOException => () } // hygiene is best-effort
    }
    try body finally fs.delete(lock, false)
  }

  /** Operator override: remove a lock left by a crashed writer. */
  def breakLock(spark: SparkSession, table: String): Unit = {
    val lock = new Path(table + "_lock")
    val fs = lock.getFileSystem(spark.sessionState.newHadoopConf())
    fs.delete(lock, false)
  }
}
