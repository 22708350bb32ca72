package graft.sink

import scala.jdk.CollectionConverters._

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
  * The state table is parquet-partitioned on a bucket of the merge
  * keys, `__bucket = f(keys)`, where `f` is one of two layouts:
  *
  *  - HASH (default): `pmod(hash(keys), nBuckets)` — uniform spread,
  *    hot keys scattered; point lookups and merges prune by bucket.
  *  - RANGE (`rangeBucketWidth = Some(w)`): `pmod(keys.head div w,
  *    nBuckets)` — CONTIGUOUS key ranges share a bucket, so zone-map
  *    statistics on the key (below) become tight and RANGE predicates
  *    prune at the metadata level. The ClickHouse analog is ORDER BY
  *    key range granules; the trade is skew sensitivity (pick `w` so
  *    the key domain spreads across buckets).
  *
  * Each `merge(batch)`:
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
  *   4. rewrites ONLY the touched buckets into a fresh generation dir
  *      and publishes via one atomic manifest commit (untouched bucket
  *      directories keep their files byte-for-byte — asserted in
  *      PipelineSpec).
  *
  * Cost per micro-batch is O(|touched state| + |batch|), not
  * O(|state|): with uniform key hashing a batch touching k distinct
  * keys reads at most min(k, nBuckets)/nBuckets of the table. At
  * 100 TB, size `nBuckets` so one bucket ≈ a few GB (e.g. 16k buckets
  * for 100 TB); hot-key skew spreads by hash, and the merge itself is
  * the same map-side-combine hash aggregate as the batch path.
  *
  * ZONE MAPS (`statsCols`): after each rewrite the sink records
  * per-bucket min/max of the named numeric columns in the manifest
  * (read back from the freshly written files — a columnar metadata
  * scan of only those columns). [[readRange]] then resolves ONLY the
  * buckets whose range can intersect the predicate — Iceberg-style
  * data skipping where files outside the range are never even listed.
  * Stats are only selective when layout correlates with the column
  * (range bucketing on a key, or a time-ordered ingest on an
  * event-time column); under hash bucketing they are recorded but
  * typically span the full domain — documented, not hidden.
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
  *
  * TIME TRAVEL: every commit is a retained, numbered version
  * ([[TableManifest]] version log). [[readAt]] reads the table as of
  * any retained version — the audit/debug/reproducibility primitive a
  * training-data warehouse needs ("which exact state fed run N?").
  * [[expireVersions]] is the retention knob that bounds history
  * storage; expiry is what finally frees superseded generations.
  */
final class MergeSink(
    spark: SparkSession,
    val path: String,
    keys: Seq[String],
    orderCols: Seq[String],
    nBuckets: Int = 64,
    statsCols: Seq[String] = Seq.empty,
    rangeBucketWidth: Option[Long] = None,
    bloomCols: Seq[String] = Seq.empty,
    bloomBits: Int = BucketBloom.DefaultBits) {

  import MergeSink.{BucketCol, LayoutStride, MaxLayoutGen}
  import TableManifest.{ColStats, Layout, Migration, Stats}

  /** Gate/spec instrumentation: per-instance counters of sidecar-
    * pruned point probes ([[readBucketsForPoints]]) — probes made,
    * buckets admitted, buckets that existed at probe time. A gate that
    * claims its sweep pruned can REQUIRE admitted < total instead of
    * trusting the plan comment (per-instance, so concurrent queries'
    * probes on OTHER tables cannot contaminate the evidence).
    */
  val probeCount = new java.util.concurrent.atomic.AtomicLong(0)
  val probeBucketsAdmitted = new java.util.concurrent.atomic.AtomicLong(0)
  val probeBucketsTotal = new java.util.concurrent.atomic.AtomicLong(0)

  /** Commit-time stats provenance counters (round 15): how many
    * generations' zone maps came from parquet FOOTERS (O(files)
    * metadata) vs the fallback columnar re-scan — the spec pins that
    * the footer path actually fires, not just that stats are right.
    */
  val statsFromFooter = new java.util.concurrent.atomic.AtomicLong(0)
  val statsFromScan = new java.util.concurrent.atomic.AtomicLong(0)

  private[graft] val manifest = new TableManifest(spark, path)

  /** LAYOUT IS MANIFEST-AUTHORITATIVE: the constructor's
    * nBuckets/rangeBucketWidth only name the layout a NEW table is
    * created with; once any commit has recorded a layout header, every
    * handle — including one constructed with stale parameters, or one
    * held from before a [[rebucket]]/[[beginMigration]] — routes by
    * the COMMITTED layout. This closes the silent-wrong-modulus hazard
    * of handle-owned bucket arithmetic: there is nothing on the handle
    * left to go stale.
    */
  private def currentLayout: Layout =
    manifest.layout().getOrElse(Layout(0, nBuckets, rangeBucketWidth))

  private def logicalOf(l: Layout): Column = l.rangeWidth match {
    case Some(w) => pmod(expr(s"${keys.head} div $w"), lit(l.n.toLong)).cast("int")
    case None    => pmod(hash(keys.map(col): _*), lit(l.n))
  }

  /** Physical bucket id of layout `l`: generation-namespaced so two
    * layouts' buckets can coexist in one snapshot mid-migration
    * (gen 0 keeps bare ids — byte-compatible with every pre-layout
    * table).
    */
  private def physOf(l: Layout): Column =
    if (l.gen == 0) logicalOf(l)
    else (lit(l.gen * LayoutStride) + logicalOf(l)).cast("int")

  /** Migration-aware routing: a key whose OLD-layout bucket has been
    * migrated routes to its target-layout bucket; everything else
    * stays put. Deterministic per key at every committed version, so
    * the one-bucket-per-key LWW invariant holds THROUGHOUT a
    * progressive migration — that is the whole design. The migrated
    * set compiles to an InSet over at most `l.n` small ints (bucket
    * metadata, not data; at 16k buckets that is a 64 KB broadcast-free
    * hash probe inside codegen).
    */
  private def routing(l: Layout, mig: Option[Migration]): Column = mig match {
    case Some(Migration(target, done)) if done.nonEmpty =>
      when(logicalOf(l).isin(done.toSeq: _*), physOf(target)).otherwise(physOf(l))
    case _ => physOf(l)
  }

  private def bucketOf: Column = routing(currentLayout, manifest.migration())

  /** The layout state every data commit must carry forward (captured
    * under the writer lock, published in the same atomic commit as the
    * data it routes).
    */
  private def layoutState: Option[(Layout, Option[Migration])] =
    Some((currentLayout, manifest.migration()))

  /** Anti-join `df` against the outstanding DELETION VECTORS of the
    * requested buckets (None = all): DV parquet dirs hold key rows of
    * merge-on-read deletes ([[deleteVector]]); a key in a DV is
    * invisible until some rewrite of its bucket physically drops it
    * and consumes the vector. DVs are small by design (O(deleted
    * keys) per delete commit), so the key list broadcasts.
    */
  private def applyDv(df: DataFrame, dvm: Map[Int, Seq[String]],
                      buckets: Option[Seq[Int]]): DataFrame = {
    val rel = buckets match {
      case Some(bs) =>
        val s = bs.toSet // O(dv + requested), not O(dv × requested)
        dvm.filter { case (b, _) => s(b) }
      case None => dvm
    }
    val paths = rel.values.flatten.toSeq.distinct.sorted
    if (paths.isEmpty) df
    else {
      // ONE read with an EXPLICIT schema (round 16): DV files hold
      // exactly the key columns, whose types `df` already knows — a
      // bare spark.read.parquet per vector file each ran a single-task
      // footer schema-inference job, so a table with v delete commits
      // paid O(v x buckets) job launches per DV-applied read
      val dvSchema = org.apache.spark.sql.types.StructType(
        df.schema.fields.filter(f => keys.contains(f.name)))
      val dvKeys = spark.read.schema(dvSchema)
        .parquet(paths.map(p => s"$path/$p"): _*)
        .select(keys.map(col): _*).distinct()
      df.join(broadcast(dvKeys), keys, "left_anti")
    }
  }

  /** Current committed state (bucket column dropped — callers see the
    * logical schema they wrote). Keys deleted merge-on-read
    * ([[deleteVector]]) are excluded. Snapshot and DV set come from
    * separate manifest parses: a commit racing plan construction can
    * at worst apply the NEWER version's deletes to this version's rows
    * (recent-delete visibility, never resurrection or row loss — DV
    * anti-joins only ever REMOVE); pruned reads, where version skew
    * COULD lose rows, run under [[consistentRead]] instead.
    */
  def read(): DataFrame =
    manifest.snapshot().map(df => applyDv(df.drop(BucketCol), manifest.dv(), None))
      .getOrElse(throw new IllegalStateException(s"no committed state at $path"))

  /** State as of retained version `v` — see class doc (TIME TRAVEL).
    * Applies the deletion vectors as of THAT version: a DV delete is a
    * real commit, so versions before it still show the rows.
    */
  def readAt(v: Long): DataFrame =
    manifest.snapshotAt(v).map(df => applyDv(df.drop(BucketCol), manifest.dvAt(v), None))
      .getOrElse(throw new IllegalStateException(s"version $v at $path holds no buckets"))

  /** Retained snapshot versions, ascending. */
  def versions(): Seq[Long] = manifest.versions()

  /** Retain only the `keepLast` most recent versions (min 1) and free
    * the generations only expired versions referenced.
    */
  def expireVersions(keepLast: Int): Unit =
    MergeSink.withWriterLock(spark, path, "expire")(manifest.expireVersions(keepLast))

  /** Restore the table to `toVersion` as a new commit (Delta RESTORE /
    * Iceberg rollback) — metadata-only, history preserved; see
    * [[TableManifest.rollback]]. Takes the writer lock: a rollback IS
    * a write and must serialize with concurrent merges.
    */
  def rollback(toVersion: Long): Unit =
    MergeSink.withWriterLock(spark, path, "rollback")(manifest.rollback(toVersion))

  /** Metadata-level data-skipping decision for `col` in `[lo, hi]` —
    * exposed for layout audits and tests.
    */
  def bucketsForRange(c: String, lo: Double, hi: Double): Seq[Int] =
    manifest.bucketsForRange(c, lo, hi)

  /** Rows with `c` in `[lo, hi]` (NULLs excluded), resolving ONLY the
    * buckets whose zone map can intersect the range — buckets outside
    * it are never listed, let alone scanned. Equivalent to
    * `read().where(c between lo and hi)` by the zone-map invariant;
    * PipelineSpec asserts both the equivalence and the pruning.
    */
  def readRange(c: String, lo: Double, hi: Double): DataFrame = {
    val bs = bucketsForRange(c, lo, hi)
    val resolved =
      if (bs.isEmpty) read().filter(lit(false)) // schema-preserving empty; optimizes to zero scans
      else readBuckets(bs).getOrElse(read().filter(lit(false)))
    resolved.filter(col(c) >= lit(lo) && col(c) <= lit(hi))
  }

  /** Latest-per-key state restricted to the given buckets; resolution
    * is path-level — other buckets' files are never listed, let alone
    * scanned.
    */
  private[graft] def readBuckets(buckets: Seq[Int]): Option[DataFrame] =
    manifest.snapshot(Some(buckets))
      .map(df => applyDv(df.drop(BucketCol), manifest.dv(), Some(buckets)))

  /** Latest-per-key state restricted to the buckets `probe`'s key rows
    * route to — the KEYED-LOOKUP read. `probe` must expose this sink's
    * key columns; resolution is the same committed-layout routing every
    * write uses, so a key present in the table is ALWAYS inside the
    * returned frame (the result is the full rows of the touched
    * buckets — a superset of the probe's matches, never a subset).
    * Cost: O(touched buckets), the point of maintaining a bucketed
    * table — a per-batch lookup against a 100 TB labels/index table
    * must not re-scan the table per micro-batch. Only the bucket IDS
    * are collected (O(buckets) metadata, the same discipline as
    * [[merge]]'s touched-bucket audit).
    *
    * Routing and data resolution parse the manifest separately, so the
    * whole plan construction runs under [[consistentRead]]'s version
    * fence — a commit landing mid-construction (rebucket flips the
    * routing, a merge moves a bucket's generation) retries instead of
    * serving one layout's routing over another's data.
    */
  def readForKeys(probe: DataFrame): DataFrame = consistentRead {
    val touched = probe.select(bucketOf.as(BucketCol)).distinct()
      .collect().map(_.getInt(0)).toSeq
    if (touched.isEmpty) read().filter(lit(false))
    else readBuckets(touched).getOrElse(read().filter(lit(false)))
  }

  /** OPTIMISTIC READ FENCE for multi-parse plan constructions. The
    * manifest is re-parsed by every metadata call (mapping, blooms,
    * layout, snapshot), so a read path that makes several of them can
    * straddle a concurrent commit and combine state from two versions
    * — e.g. bloom admission from version N+1 pruning a bucket whose
    * version-N data the snapshot then serves, silently dropping rows
    * (the READ-side sibling of the stage-fence lost-update race).
    * Plans pin immutable generation files at construction time, so
    * "version unchanged across construction" makes every parse
    * provably identical. Concurrent commits are rare (writers hold the
    * table lock far longer than a plan takes to build); after a few
    * racing retries we fail loudly rather than spin.
    */
  private[graft] def consistentRead(build: => DataFrame): DataFrame = {
    var attempt = 0
    while (true) {
      val v0 = manifest.currentVersion()
      val df = build
      if (manifest.currentVersion() == v0) return df
      attempt += 1
      if (attempt >= 5) throw new IllegalStateException(
        s"table at $path kept committing during 5 read-plan constructions — " +
          "pruned reads need a quiescent-enough manifest; use read() or retry")
    }
    throw new IllegalStateException("unreachable")
  }

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

  /** Per-bucket min/max of `statsCols` read back from a just-written
    * generation — a columnar scan of ONLY those columns over ONLY the
    * rewritten buckets' files. All-NULL columns record no stats for
    * that bucket (missing stats never prune).
    */
  private def statsOfGen(gen: String): Map[Int, Stats] =
    if (statsCols.isEmpty) Map.empty
    else footerStatsOfGen(gen).map { m =>
      statsFromFooter.incrementAndGet(); m
    }.getOrElse {
      statsFromScan.incrementAndGet()
      // fallback scan — the pre-round-15 path, kept for any footer the
      // metadata read cannot decide (missing statistics, non-numeric
      // physical type): correctness never depends on footers
      val aggs = statsCols.flatMap(c => Seq(
        min(col(c)).cast("double").as(s"__mn_$c"),
        max(col(c)).cast("double").as(s"__mx_$c")))
      graft.core.JobLabel(spark, s"merge:stats-scan $path") {
        spark.read.parquet(s"$path/$gen")
          .groupBy(col(BucketCol))
          .agg(aggs.head, aggs.tail: _*)
          .collect()
          .map { r =>
            val b = r.getAs[Number](BucketCol).intValue()
            val st: Stats = statsCols.flatMap { c =>
              val mn = r.getAs[Any](s"__mn_$c"); val mx = r.getAs[Any](s"__mx_$c")
              if (mn == null || mx == null) None
              else Some(c -> ColStats(mn.asInstanceOf[Double], mx.asInstanceOf[Double]))
            }.toMap
            b -> st
          }.toMap
      }
    }

  /** Zone-map stats read from the just-written generation's PARQUET
    * FOOTERS (round 15, optimization guide §6): the writer sorted and
    * wrote these files moments ago, and their row-group statistics
    * already hold exact per-column min/max for numeric types — so the
    * commit-time stats pass is O(files) driver-side metadata instead
    * of a full columnar re-scan of the generation (at 100 TB the old
    * scan re-read every byte just written). Returns None — falling
    * back to the scan — if ANY (file, column) is undecidable: missing
    * statistics, a non-numeric physical type, or an unreadable footer.
    * All-NULL columns record no stats, exactly like the scan path
    * (missing stats never prune). Equivalence is spec-pinned
    * (PipelineSpec "footer stats").
    */
  private def footerStatsOfGen(gen: String): Option[Map[Int, Stats]] = try {
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    val conf = spark.sessionState.newHadoopConf()
    val genPath = new Path(s"$path/$gen")
    val fs = genPath.getFileSystem(conf)
    if (!fs.exists(genPath)) return Some(Map.empty)
    val bucketDirs = fs.listStatus(genPath).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith(s"$BucketCol="))
    val out = bucketDirs.map { bd =>
      val b = bd.getPath.getName.stripPrefix(s"$BucketCol=").toInt
      // (min, max, sawValue) per stats column, folded over row groups
      val acc = scala.collection.mutable.Map.empty[String, (Double, Double)]
      fs.listStatus(bd.getPath).toSeq
        .filter(f => f.getPath.getName.startsWith("part-") &&
                     f.getPath.getName.endsWith(".parquet"))
        .foreach { f =>
          val reader = ParquetFileReader.open(HadoopInputFile.fromPath(f.getPath, conf))
          try {
            val md = reader.getFooter.getBlocks
            statsCols.foreach { c =>
              md.forEach { blk =>
                val colChunk = blk.getColumns.asScala
                  .find(_.getPath.toDotString == c)
                  .getOrElse(return None) // column missing: undecidable
                // Only PLAIN numeric physical types are decidable from
                // footers: a logical annotation over a numeric physical
                // (int32/int64-backed DECIMAL's unscaled value,
                // TIMESTAMP/TIME/DATE epochs) yields raw physical units
                // that diverge from the scan path's cast-to-double
                // semantics — wrong zone maps would silently prune
                // buckets holding matching rows (round-15 ADVICE). Such
                // columns fall back to the scan, which casts correctly.
                val pt = colChunk.getPrimitiveType
                import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._
                val physOk = pt.getPrimitiveTypeName match {
                  case INT32 | INT64 | FLOAT | DOUBLE => true
                  case _                              => false
                }
                val annOk = pt.getLogicalTypeAnnotation match {
                  case null => true
                  case i: org.apache.parquet.schema.LogicalTypeAnnotation.IntLogicalTypeAnnotation =>
                    i.isSigned // unsigned stats reinterpret as signed: undecidable
                  case _ => false // DECIMAL / TIMESTAMP / TIME / DATE / ...
                }
                if (!physOk || !annOk) return None
                val st = colChunk.getStatistics
                if (st == null || !st.isNumNullsSet) return None
                if (st.hasNonNullValue) {
                  val (mn, mx) = (st.genericGetMin, st.genericGetMax) match {
                    case (a: Number, bx: Number) => (a.doubleValue(), bx.doubleValue())
                    case _ => return None // non-numeric: undecidable
                  }
                  acc.get(c) match {
                    case Some((m0, m1)) => acc(c) = (math.min(m0, mn), math.max(m1, mx))
                    case None           => acc(c) = (mn, mx)
                  }
                } else if (st.getNumNulls != blk.getRowCount) {
                  return None // no value recorded but not all-null: undecidable
                }
              }
            }
          } finally reader.close()
        }
      b -> acc.toMap.map { case (c, (mn, mx)) => c -> ColStats(mn, mx) }
    }.toMap
    Some(out)
  } catch { case scala.util.control.NonFatal(_) => None }

  /** Per-(bucket, column) BLOOM SIDECARS for a just-written generation
    * (see [[BucketBloom]] for geometry and why): one extra columnar
    * scan of only the written files, hashing with codegen'd `xxhash64`
    * inside the scan and aggregating fixed-size bitsets with map-side
    * combine — the collect is `nBuckets x bloomBits/8` bytes of
    * metadata. Sidecars land inside the generation dir BEFORE the
    * manifest rename, so they share the data files' atomic-publish
    * story.
    */
  private def writeBloomsOfGen(gen: String): Unit =
    if (bloomCols.nonEmpty) {
      val build = udaf(BucketBloom.Build(bloomBits, BucketBloom.DefaultHashes))
      val df = spark.read.parquet(s"$path/$gen")
      bloomCols.foreach { c =>
        df.filter(col(c).isNotNull)
          .select(col(BucketCol), xxhash64(col(c)).as("__h"))
          .groupBy(col(BucketCol))
          .agg(build(col("__h")).as("__bloom"))
          .collect()
          .foreach { r =>
            manifest.writeBloom(gen, r.getAs[Number](BucketCol).intValue(), c,
              BucketBloom.DefaultHashes, r.getAs[Array[Byte]]("__bloom"))
          }
      }
    }

  /** Buckets that might hold `c = v` per the bloom sidecars — the
    * metadata-level point-lookup pruning decision. `c` must be a
    * BIGINT column named in `bloomCols` for pruning to bite; anything
    * else keeps every bucket (missing sidecars never prune).
    */
  def bucketsForPoint(c: String, v: Long): Seq[Int] =
    manifest.bucketsForPoint(c, BucketBloom.hashLong(v))

  /** Rows with `c` IN `vs`, resolving ONLY the buckets some probe's
    * bloom admits — the secondary-id point lookup ([[readRange]]'s
    * equality sibling). False positives are discharged by the residual
    * `isin` filter; false negatives cannot happen (the sidecar is
    * built from the committed files themselves). Equivalent to
    * `read().where(c isin vs)`; PipelineSpec asserts equivalence and
    * pruning.
    */
  def readPoints(c: String, vs: Seq[Long]): DataFrame =
    readBucketsForPoints(c, vs).filter(col(c).isin(vs: _*))

  /** [[readPoints]] WITHOUT the residual `isin` filter: the rows of
    * every bucket some probe's bloom admits. For a caller that joins
    * the result on `c` anyway (the join discharges non-matches), the
    * residual filter is redundant — and an `isin` over a large probe
    * set is a degenerate expression (thousands of literals in one
    * predicate). Bloom probing is batched: one sidecar read per
    * bucket for the whole probe set ([[TableManifest.bucketsForPoints]]),
    * and admission + data resolution run under [[consistentRead]]'s
    * version fence (a commit between them could prune a bucket by the
    * NEW sidecar while serving the OLD generation's rows).
    */
  def readBucketsForPoints(c: String, vs: Seq[Long]): DataFrame = consistentRead {
    // empty probe set short-circuits to an empty frame BEFORE bloom
    // admission: "admitted if ANY probe might be contained" is
    // vacuously false for zero probes, but an unbloomed bucket's
    // missing-sidecar rule (forall on None) would admit it — an empty
    // probe list on an unbloomed table returned the ENTIRE table
    // (ADVICE r12; latent — callers guarded nChanged > 0)
    if (vs.isEmpty) read().filter(lit(false))
    else {
      val bs = manifest.bucketsForPoints(c, vs.map(BucketBloom.hashLong))
      probeCount.incrementAndGet()
      probeBucketsAdmitted.addAndGet(bs.size)
      probeBucketsTotal.addAndGet(manifest.mapping().size)
      if (bs.isEmpty) read().filter(lit(false))
      else readBuckets(bs).getOrElse(read().filter(lit(false)))
    }
  }

  /** Upsert one batch. Empty batches are a no-op (no read, no write).
    * Holds the writer lock: a concurrent merge or compact on the same
    * table fails fast instead of interleaving commits
    * (see [[MergeSink.withWriterLock]]).
    */
  /** Upsert one batch. `materializeBatch = true` runs the batch plan
    * ONCE (lazy localCheckpoint: the touched-bucket route collect is
    * the materializing action, the merge write scans the blocks, the
    * blocks are freed after the commit) — the right call when the
    * delta plan is expensive, e.g. it joins the sink's own state
    * (q287's postings delta: the route collect profiled as expensive
    * as the write). The default recomputes, which is CHEAPER for plain
    * projections of a source table: the route job then reads only the
    * pruned bucket column instead of materializing every column
    * (measured +17% on q258's projection-only merges when
    * materialization was unconditional).
    */
  def merge(batch: DataFrame, materializeBatch: Boolean = false): Unit =
      MergeSink.withWriterLock(spark, path, "merge") {
    if (!materializeBatch) mergeImpl(batch)
    else {
      val (b, freeBatch) = graft.ext.Lineage.checkpointLazy(batch)
      try mergeImpl(b)
      finally freeBatch()
    }
  }

  private def mergeImpl(batch: DataFrame): Unit = {
    val touched = graft.core.JobLabel(spark, s"merge:route $path") {
      batch.select(bucketOf.as(BucketCol)).distinct()
        .collect().map(_.getInt(0)).toSeq
    }
    if (touched.nonEmpty) {
      val current = manifest.mapping()
      val base = readBuckets(touched) match {
        case Some(state) => state.unionByName(batch)
        case None        => batch
      }
      val merged = Cdc.latestByKey(base, keys, orderCols)
      val gen = manifest.newGenDir()
      graft.core.JobLabel(spark, s"merge:write $path") {
        merged
          .withColumn(BucketCol, bucketOf)
          // key-sorted within each write task: parquet row-group min/max
          // stats then let point lookups and merge reads skip row groups
          .sortWithinPartitions(keys.map(col): _*)
          .write
          .partitionBy(BucketCol)
          .parquet(s"$path/$gen")
      }
      graft.core.JobLabel(spark, s"merge:sidecars $path") {
        writeBloomsOfGen(gen)
        // all-or-nothing publish; crashed attempts' files stay invisible
        manifest.commit(
          current ++ manifest.writtenBuckets(gen).map(_ -> gen),
          manifest.stats() ++ statsOfGen(gen),
          layoutState)
      }
      manifest.vacuum()
    }
  }

  /** foreachBatch adapter: `stream.writeStream.foreachBatch(sink.forEachBatch)`. */
  def forEachBatch: (DataFrame, Long) => Unit = (batch, _) => merge(batch)

  /** WRITE-AUDIT-PUBLISH, stage step (Iceberg WAP analog): compute the
    * merge EXACTLY like [[merge]] — same touched-bucket pruning, same
    * LWW, same sorted write, blooms, stats — but persist the result as
    * a STAGED snapshot no reader resolves. The returned token feeds an
    * audit ([[readStaged]]), then [[publishStaged]] (atomic, exactly
    * one new version) or [[discardStaged]] (staged generation swept).
    * The stage carries a base-version fence: publishing after ANY
    * intervening commit fails fast, because the staged LWW was
    * computed against state that commit replaced. This is the
    * bad-batch quarantine shape at 100 TB: an upstream feed suspected
    * of poison stages in, invariant checks run against the REAL merged
    * candidate state (not just the batch — cross-batch invariants
    * need the merge), and visibility is a rename, not a rewrite.
    */
  def stageMerge(batch: DataFrame): String =
    MergeSink.withWriterLock(spark, path, "stage")(stageImpl(batch))

  /** [[stageMerge]] WITHOUT the writer lock — the staging half of the
    * optimistic-concurrency path. Safe lock-free because every write
    * lands under this stage's own fresh generation dir and unique
    * token, and reads resolve only immutable published generations;
    * the one genuine race — a concurrent publisher's vacuum sweeping
    * the half-written, not-yet-referenced generation — is closed by
    * pre-registering the generation ([[TableManifest.preStage]])
    * BEFORE the first data byte.
    */
  def stageMergeConcurrent(batch: DataFrame): String = stageImpl(batch)

  /** Test seam: fires right after the stage's base (version+mapping)
    * is read, BEFORE the O(data) merge write — the window where a
    * concurrent commit must trip the stale fence, not be overwritten.
    * Production leaves it default.
    */
  private[graft] var onStageBaseRead: () => Unit = () => ()

  private def stageImpl(batch: DataFrame): String = {
    val touched = batch.select(bucketOf.as(BucketCol)).distinct()
      .collect().map(_.getInt(0)).toSeq
    require(touched.nonEmpty, "stageMerge of an empty batch has nothing to audit")
    // ONE atomic manifest read: the #base fence must be the version
    // this mapping (the merge input) was read at. Reading the fence
    // later — after the long parquet write — would let a concurrent
    // commit land unseen and be silently overwritten at publish.
    val (baseVersion, current, curStats) = manifest.versionedState()
    onStageBaseRead()
    val base = readBuckets(touched) match {
      case Some(state) => state.unionByName(batch)
      case None        => batch
    }
    val merged = Cdc.latestByKey(base, keys, orderCols)
    val gen = manifest.newGenDir()
    val pending = manifest.preStage(gen)
    try {
      merged
        .withColumn(BucketCol, bucketOf)
        .sortWithinPartitions(keys.map(col): _*)
        .write
        .partitionBy(BucketCol)
        .parquet(s"$path/$gen")
      writeBloomsOfGen(gen)
      manifest.finalizeStage(pending,
        current ++ manifest.writtenBuckets(gen).map(_ -> gen),
        curStats ++ statsOfGen(gen),
        baseVersion = Some(baseVersion))
    } catch {
      case scala.util.control.NonFatal(e) =>
        try manifest.discardPending(pending)
        catch { case scala.util.control.NonFatal(_) => () }
        throw e
    }
  }

  /** OPTIMISTIC CONCURRENCY — the Delta/Iceberg commit-retry loop,
    * replacing "hold the writer lock for the whole merge" with "hold
    * it only for the O(1) publish": stage LOCK-FREE (the O(data)
    * compute runs with zero mutual exclusion, so N writers overlap
    * their heavy work), then publish under the short critical
    * section; when an intervening commit moved the base — the staged
    * LWW was computed against replaced state — the stale stage is
    * discarded and the merge RE-STAGES against the new base.
    * Returns the attempt count that succeeded. `beforePublish` is a
    * test seam (contention injection); production leaves it default.
    */
  def mergeOptimistic(batch: DataFrame, maxAttempts: Int = 5,
                      beforePublish: () => Unit = () => ()): Int = {
    require(maxAttempts >= 1, "need at least one attempt")
    var attempt = 0
    while (attempt < maxAttempts) {
      attempt += 1
      val token = stageMergeConcurrent(batch)
      beforePublish()
      try { publishStaged(token); return attempt }
      catch {
        case e: IllegalStateException if e.getMessage.contains("stale") =>
          discardStaged(token)
          if (attempt >= maxAttempts)
            throw new IllegalStateException(
              s"mergeOptimistic lost the commit race $attempt times at $path — " +
                "live contention; raise maxAttempts or fall back to merge()", e)
      }
    }
    attempt // unreachable: the loop either returns or throws
  }

  /** The staged snapshot (state as it WOULD be after publish) — what
    * the audit step queries. DV application matches publish semantics:
    * staged rewritten buckets carry no vectors; untouched buckets keep
    * theirs.
    */
  def readStaged(token: String): DataFrame =
    manifest.stagedSnapshot(token)
      .map(df => applyDv(df.drop(BucketCol), manifest.stagedDv(token), None))
      .getOrElse(throw new IllegalStateException(s"stage $token resolves no buckets"))

  /** Publish a staged merge atomically (one new version; fails fast if
    * the table committed past the stage's base version).
    */
  def publishStaged(token: String): Unit =
      MergeSink.withWriterLock(spark, path, "publish") {
    manifest.publish(token)
    manifest.vacuum()
  }

  /** Reject a staged merge; its generation is swept immediately. */
  def discardStaged(token: String): Unit =
      MergeSink.withWriterLock(spark, path, "discard")(manifest.discard(token))

  /** Outstanding stage tokens. */
  def stagedTokens(): Seq[String] = manifest.staged()

  /** COMPLIANCE PURGE — hard-delete every row whose merge key appears
    * in `keyRows` (a frame of the key columns), then DESTROY history so
    * the data is physically unrecoverable (the GDPR / takedown-request
    * primitive; a tombstone merge only hides a key, and time travel
    * would happily resurrect it).
    *
    *   1. touched buckets come from `bucketOf` over the key list —
    *      metadata, same pruning decision as [[merge]]; keys hash (or
    *      range) to buckets deterministically, so NO other bucket can
    *      hold the key;
    *   2. ONLY those buckets rewrite, anti-joined against the
    *      (broadcast-small) key list — Delta/Iceberg DELETE rewrite
    *      semantics;
    *   3. the commit publishes atomically like any other, then
    *      `expireVersions(1)` drops every prior version: the old
    *      generations holding the purged rows are deleted, not merely
    *      dereferenced. (On object stores add the provider's billing /
    *      versioning purge on top; here deletion is deletion.)
    *
    * Cost: O(|buckets holding purged keys| + |key list|), not
    * O(|table|). The price of erasure is losing time travel across the
    * purge point — inherent, not incidental: retained history IS the
    * data you were asked to destroy.
    *
    * `destroyHistory = false` is the TTL-EVICTION variant (dropping
    * cold keys for cost, not compliance): the delete commits like any
    * other version, history and time travel survive, and
    * [[changesBetween]] across the eviction reports the keys as
    * `delete` rows — downstream increments see them leave.
    */
  /** CHANGE DATA FEED between two retained versions — the incremental-
    * consumption primitive (Delta CDF analog): downstream pipelines
    * read "what changed since the version I last processed" instead of
    * rescanning the table. A full-outer equi-join of the two snapshots
    * on the merge keys, classified per key:
    * `insert` (absent before), `delete` (absent after — purges),
    * `update` (present in both, any non-key column differs,
    * null-safely). Unchanged keys are dropped. Output: key columns +
    * `_change_type` + the AFTER values of the non-key columns (NULL
    * for deletes). Scale shape: both sides share the bucket layout and
    * the join keys ARE the merge keys, so the join co-partitions; cost
    * is O(|v1| + |v2|) with no row inflation.
    *
    * DV-ONLY FAST PATH: when the step's commits changed NO data bucket
    * (identical bucket->generation mapping — the [[deleteVector]]
    * shape), the only possible changes are deletes, and they are
    * exactly "rows alive at v1 whose key entered a NEW vector". The
    * feed then reads the new vectors (O(deleted) bytes), restricts to
    * their buckets' v1 state, and semi-joins — O(deleted keys +
    * touched-bucket rows), never two full snapshot reads. This is the
    * cost shape a continuously-deleting upstream demands at 100 TB
    * (q274's steady state): the general full-outer diff would pay
    * O(2 x table) per wave for an O(deleted)-sized answer.
    */
  def changesBetween(v1: Long, v2: Long): DataFrame = {
    require(v1 < v2, s"changesBetween needs v1 < v2, got ($v1, $v2)")
    val (m1, m2) = (manifest.mappingAt(v1), manifest.mappingAt(v2))
    val (d1, d2) = (manifest.dvAt(v1), manifest.dvAt(v2))
    val dvOnly = m1 == m2 && d1.forall { case (b, ps) =>
      d2.getOrElse(b, Seq.empty).startsWith(ps) }
    val newDv = if (!dvOnly) Seq.empty else d2.toSeq.flatMap { case (b, ps) =>
      ps.drop(d1.getOrElse(b, Seq.empty).size).map(b -> _) }
    if (dvOnly && newDv.nonEmpty) {
      val touched = newDv.map(_._1).distinct.sorted
      val snap1 = manifest.snapshotAt(v1, Some(touched))
        .getOrElse(throw new IllegalStateException(s"version $v1 missing at $path"))
        .drop(BucketCol)
      // one read, explicit key schema (round 16) — see [[applyDv]]: a
      // bare read per vector file ran a schema-inference job each
      val dvSchema = org.apache.spark.sql.types.StructType(
        snap1.schema.fields.filter(f => keys.contains(f.name)))
      val newKeys = spark.read.schema(dvSchema)
        .parquet(newDv.map { case (_, p) => s"$path/$p" }: _*)
        .select(keys.map(col): _*).distinct()
      // alive-at-v1 rows of ONLY the vectored buckets (a key in a new
      // vector that an older vector already killed must NOT re-report)
      val alive = applyDv(snap1, d1, Some(touched))
      // deletes carry NULL data columns (the general path's contract:
      // AFTER values, which for a delete do not exist)
      val nulled = alive.columns.filterNot(keys.contains).toSeq
        .map(c => lit(null).cast(alive.schema(c).dataType).as(c))
      return alive.join(broadcast(newKeys), keys, "left_semi")
        .withColumn("_change_type", lit("delete"))
        .select(keys.map(col) ++ (col("_change_type") +: nulled): _*)
    }
    val before = readAt(v1).withColumn("__in_b", lit(1))
    val after = readAt(v2).withColumn("__in_a", lit(1))
    val dataCols = readAt(v2).columns.filterNot(keys.contains).toSeq
    val b = before.select(
      keys.map(col) ++ dataCols.map(c => col(c).as(s"__b_$c")) :+ col("__in_b"): _*)
    val joined = after.join(b, keys, "full_outer")
    val unchanged = dataCols.map(c => col(c) <=> col(s"__b_$c")).reduce(_ && _)
    joined
      .withColumn("_change_type",
        when(col("__in_b").isNull, lit("insert"))
          .when(col("__in_a").isNull, lit("delete"))
          .otherwise(lit("update")))
      .filter(col("__in_b").isNull || col("__in_a").isNull || !unchanged)
      .select(keys.map(col) ++ (col("_change_type") +: dataCols.map(col)): _*)
  }

  /** The purge rewrite frame: surviving rows of the touched buckets —
    * a broadcast ANTI-join against the key list (PlanSpec locks the
    * shape), reading only those buckets' files. Exposed for plan
    * audits; [[purgeKeys]] is the committing entry point.
    */
  private[graft] def purgeKeptFrame(keyList: DataFrame, rewrite: Seq[Int]): DataFrame =
    readBuckets(rewrite).get.join(broadcast(keyList), keys, "left_anti")

  def purgeKeys(keyRows: DataFrame, destroyHistory: Boolean = true): Unit =
      MergeSink.withWriterLock(spark, path, "purge") {
    val keyList = keyRows.select(keys.map(col): _*).distinct()
    val touched = keyList.select(bucketOf.as(BucketCol)).distinct()
      .collect().map(_.getInt(0)).toSeq
    val held = manifest.mapping().keySet
    val rewrite = touched.filter(held.contains)
    if (rewrite.nonEmpty) {
      val current = manifest.mapping()
      val kept = purgeKeptFrame(keyList, rewrite)
      val gen = manifest.newGenDir()
      kept
        .withColumn(BucketCol, bucketOf)
        .sortWithinPartitions(keys.map(col): _*)
        .write
        .partitionBy(BucketCol)
        .parquet(s"$path/$gen")
      // a bucket whose every row was purged vanishes from the mapping
      // (the write produced no dir for it) rather than keeping a stale gen
      writeBloomsOfGen(gen)
      val written = manifest.writtenBuckets(gen)
      val emptied = rewrite.toSet -- written
      manifest.commit(
        (current -- emptied) ++ written.map(_ -> gen),
        (manifest.stats() -- rewrite) ++
          (if (statsCols.isEmpty) Map.empty else statsOfGen(gen)),
        layoutState)
    }
    // history carries the purged rows — for a compliance purge destroy
    // it even when no bucket matched (the request may target data
    // already purged upstream)
    if (destroyHistory) manifest.expireVersions(1)
  }

  /** MERGE-ON-READ delete (Iceberg v2 delete-file / Delta deletion-
    * vector analog): record the keys as a per-bucket DELETION VECTOR
    * sidecar instead of rewriting any data bucket. [[purgeKeys]]'
    * copy-on-write rewrite costs O(|every bucket holding a deleted
    * key|) — for a scattered delete under hash layout that approaches
    * O(|table|) even when |keys| is tiny; this commit writes
    * O(|keys|) bytes and touches NO data file, which is the only
    * delete shape that stays cheap at 100 TB.
    *
    * Semantics: every read path anti-joins the outstanding vectors
    * (reads, range/point lookups, time travel at the vector's
    * version, and the state that merges/compactions/migrations
    * rebuild from). The delete is logical until some rewrite of the
    * bucket materializes it: that rewrite reads DV-applied state and
    * its commit CONSUMES the bucket's vectors atomically
    * ([[TableManifest.commit]]'s consumption rule) — so a key
    * re-inserted by a LATER merge survives (the merge's own rewrite
    * dropped the vector), and [[compact]] treats DV-holding buckets
    * as rewrite candidates, making compaction the physical-apply
    * step. History keeps the deleted rows (versions before the DV
    * commit still show them) — for erasure obligations use
    * [[purgeKeys]], which is physical by contract.
    *
    * Vectors are written into a fresh generation dir (under
    * `dv_<bucket>` (NOT underscore-prefixed: `_`-led path segments are
    * hidden to Spark file discovery)) BEFORE the manifest rename, sharing the
    * data files' atomic-publish story; vacuum treats DV references as
    * liveness.
    */
  def deleteVector(keyRows: DataFrame): Unit =
      MergeSink.withWriterLock(spark, path, "delete-vector") {
    // no write-side distinct (round 16): every DV consumer dedupes at
    // read ([[applyDv]] and [[changesBetween]]'s fast path both
    // `.distinct()` the vector keys), so the exchange a distinct plans
    // here bought nothing — duplicate probe rows merely repeat in the
    // sidecar bytes
    val keyList = keyRows.select(keys.map(col): _*)
      .withColumn(BucketCol, bucketOf)
    val held = manifest.mapping().keySet
    val gen = manifest.newGenDir()
    // ONE distributed write; the touched-bucket set is discovered from
    // the write's own output dirs (round 16, guide §2.4: the previous
    // separate route collect was a second full pass over the key frame
    // purely to learn which buckets it was about to write). Per-bucket
    // renames then move the dirs out of the partition layout (DV dirs
    // must NOT look like `__bucket=` data dirs, and must NOT be
    // `_`-prefixed — Spark file discovery hides such segments).
    graft.core.JobLabel(spark, s"dv:write $path") {
      keyList.write.partitionBy(BucketCol).parquet(s"$path/$gen/dvtmp")
    }
    val fs = new Path(path).getFileSystem(spark.sessionState.newHadoopConf())
    val dvtmp = new Path(s"$path/$gen/dvtmp")
    val written =
      if (!fs.exists(dvtmp)) Seq.empty[Int]
      else fs.listStatus(dvtmp).toSeq
        .filter(st => st.isDirectory && st.getPath.getName.startsWith(s"$BucketCol="))
        .map(_.getPath.getName.stripPrefix(s"$BucketCol=").toInt)
    // only buckets that exist can hold rows to delete — a key routed
    // to an absent bucket has no row, and recording a vector for it
    // would wrongly delete a FUTURE insert of that key
    val touched = written.filter(held.contains).sorted
    if (touched.nonEmpty) {
      touched.foreach { b =>
        fs.rename(new Path(s"$path/$gen/dvtmp/$BucketCol=$b"),
                  new Path(s"$path/$gen/dv_$b"))
      }
      fs.delete(dvtmp, true)
      val dv = manifest.dv()
      val appended = dv ++ touched.map(b =>
        b -> (dv.getOrElse(b, Seq.empty) :+ s"$gen/dv_$b"))
      manifest.commit(manifest.mapping(), manifest.stats(), layoutState,
        dvState = Some(appended))
    } else fs.delete(new Path(s"$path/$gen"), true)
  }

  /** Outstanding deletion vectors per bucket — maintenance metadata
    * (what [[compact]] will consume; layout gates audit this).
    */
  def deleteVectors(): Map[Int, Seq[String]] = manifest.dv()

  /** Compact buckets that have accumulated more than
    * `maxFilesPerBucket` parquet files — the classic streaming-sink
    * pathology: every micro-batch writes at least one file per bucket
    * it touches, and scan cost eventually drowns in file-open overhead.
    * Rewrites ONLY oversized buckets (hot buckets compact often, cold
    * ones never), one file per bucket after the rewrite
    * (`repartition` on the bucket column -> one task per bucket).
    * Content is untouched — pure layout maintenance, safe to run
    * between merges on any schedule; zone maps carry over unchanged
    * for the same reason.
    *
    * `dropDeleted = Some(flag)` is the REORG PURGE variant (Delta's
    * `REORG TABLE ... APPLY (PURGE)` analog) for tables maintained
    * with soft-delete tombstones (q250's postings): buckets holding
    * any row with `flag = true` rewrite too, and flagged rows are
    * physically dropped from the new generation. Sound because every
    * generation's bucket file holds that bucket's FULL current state
    * (merges rewrite whole buckets), so a tombstone row IS its key's
    * present state: removing it equals the key being absent, which
    * future merges treat identically. Prior versions keep their
    * generations, so time travel across the compaction still shows
    * the tombstones until `expireVersions`. Tombstoned buckets are
    * found by a columnar scan of the one flag column; at 100 TB the
    * manifest would carry a per-bucket tombstone count (same decision
    * from pure metadata) — the rewrite itself is already
    * bucket-pruned either way. Zone maps carry over: dropped rows can
    * only NARROW a bucket's true min/max, so the retained (wider)
    * stats stay conservative-correct for pruning.
    */
  def compact(maxFilesPerBucket: Int = 4,
              dropDeleted: Option[String] = None): Unit =
      MergeSink.withWriterLock(spark, path, "compact") {
    if (manifest.exists) {
      val oversized = manifest.bucketFiles()
        .filter { case (_, fl) => fl.size > maxFilesPerBucket }
        .keys.toSet
      val tombstoned: Set[Int] = dropDeleted match {
        case None => Set.empty
        // NULL flag means LIVE on both sides of this operation: a NULL
        // never marks a bucket for rewrite here, and the keep-filter
        // below coalesces to false so NULL-flag rows survive the
        // rewrite — compact is layout maintenance and must never
        // hard-delete a row whose tombstone state is merely unknown.
        case Some(flag) => manifest.snapshot(None) match {
          case None     => Set.empty
          case Some(df) => df.filter(coalesce(col(flag), lit(false)))
            .select(col(BucketCol)).distinct()
            .collect().map(_.getInt(0)).toSet
        }
      }
      // buckets with outstanding deletion vectors are compaction
      // candidates too: the rewrite is what applies a DV physically
      // and consumes it (commit's DV-consumption rule)
      val dvHeld = manifest.dv().keySet
      val rewrite = (oversized ++ tombstoned ++ dvHeld).toSeq.sorted
      if (rewrite.nonEmpty) {
        val current = manifest.mapping()
        val gen = manifest.newGenDir()
        val base = applyDv(manifest.snapshot(Some(rewrite)).get,
          manifest.dv(), Some(rewrite))
        dropDeleted.fold(base)(flag => base.filter(!coalesce(col(flag), lit(false))))
          .repartition(rewrite.length, col(BucketCol))
          .write
          .partitionBy(BucketCol)
          .parquet(s"$path/$gen")
        // content rows are unchanged (minus dropped tombstones) but the
        // rewritten buckets move to a new generation dir — sidecars are
        // generation-scoped, so rebuild
        writeBloomsOfGen(gen)
        val written = manifest.writtenBuckets(gen)
        // a bucket whose every row was a tombstone vanishes from the
        // mapping (the write produced no dir for it)
        val emptied = rewrite.toSet -- written
        manifest.commit(
          (current -- emptied) ++ written.map(_ -> gen),
          manifest.stats() -- emptied,
          layoutState)
        manifest.vacuum()
      }
    }
  }

  private def nextLayout(newNBuckets: Int): Layout = {
    require(newNBuckets >= 1 && newNBuckets <= LayoutStride,
      s"newNBuckets must be in [1, $LayoutStride], got $newNBuckets")
    val l = currentLayout
    require(l.gen + 1 <= MaxLayoutGen,
      s"layout generation ${l.gen + 1} exceeds $MaxLayoutGen at $path")
    require(manifest.migration().isEmpty,
      s"a migration to ${manifest.migration().get.target.n} buckets is already " +
        s"in flight at $path — finish it (migrateStep) before starting another")
    Layout(l.gen + 1, newNBuckets, l.rangeWidth)
  }

  /** BUCKET-LAYOUT EVOLUTION, one-shot (Iceberg partition-spec
    * evolution analog): rewrite the whole table into `newNBuckets`
    * hash/range buckets in ONE generation and publish atomically —
    * readers see either the old layout or the new, never a mix, and
    * the version log keeps prior layouts time-travelable. The
    * operational need: a table sized at creation for 1 TB (say 64
    * buckets) that has grown 100x merges ever-larger bucket rewrites
    * per batch; re-bucketing restores O(batch)-proportional merges
    * without downtime. Content is byte-invariant (pure layout, like
    * [[compact]]); zone maps and bloom sidecars are rebuilt for the
    * new buckets. The new layout commits IN the manifest, so every
    * handle — including this one — routes by it from the next call;
    * the returned handle is a convenience whose constructor parameters
    * match the new layout, not a correctness requirement.
    *
    * The monolithic rewrite stops the world for O(|table|) — at
    * 100 TB that is the wrong tool; [[beginMigration]] +
    * [[migrateStep]] is the same evolution as an incremental
    * background job with merges running throughout.
    */
  def rebucket(newNBuckets: Int): MergeSink =
      MergeSink.withWriterLock(spark, path, "rebucket") {
    val target = nextLayout(newNBuckets)
    val handle = new MergeSink(spark, path, keys, orderCols, newNBuckets,
      statsCols, rangeBucketWidth, bloomCols, bloomBits)
    manifest.snapshot(None) match {
      case None =>
        // empty table: the layout change is metadata-only but still a
        // real commit — a stale-parameter handle must see it
        manifest.commit(Map.empty, Map.empty, Some((target, None)))
        handle
      case Some(snap) =>
        val gen = manifest.newGenDir()
        applyDv(snap.drop(BucketCol), manifest.dv(), None)
          .withColumn(BucketCol, physOf(target))
          .repartition(newNBuckets, col(BucketCol))
          .sortWithinPartitions(keys.map(col): _*)
          .write
          .partitionBy(BucketCol)
          .parquet(s"$path/$gen")
        writeBloomsOfGen(gen)
        val written = manifest.writtenBuckets(gen)
        // FULL mapping replacement: every old bucket id retires with
        // this commit (prior versions still resolve them)
        manifest.commit(written.map(_ -> gen).toMap, statsOfGen(gen),
          Some((target, None)))
        manifest.vacuum()
        handle
    }
  }

  /** PROGRESSIVE bucket-layout migration, step 1 of 2 (the actual
    * Iceberg partition-spec-evolution operational shape): declare the
    * target layout in a metadata-only commit; no data moves. From this
    * commit on, the manifest carries (old layout, target layout,
    * migrated-bucket set) and EVERY writer routes each key by its OLD
    * bucket's migration state — merges continue throughout the whole
    * migration, which [[migrateStep]] advances k old buckets at a
    * time. Readers are oblivious: a snapshot mid-migration is simply a
    * table whose physical buckets span two layout generations, each
    * key living in exactly one of them.
    */
  def beginMigration(newNBuckets: Int): Unit =
      MergeSink.withWriterLock(spark, path, "begin-migration") {
    val target = nextLayout(newNBuckets)
    manifest.commit(manifest.mapping(), manifest.stats(),
      Some((currentLayout, Some(Migration(target, Set.empty)))))
  }

  /** PROGRESSIVE migration, step 2: rewrite the next `k` unmigrated
    * OLD-layout buckets into their target-layout buckets and commit —
    * data movement is O(k buckets + affected target buckets), never
    * O(|table|), so maintenance interleaves with live merges at any
    * cadence. Each step: (1) the k old buckets' rows re-route to
    * target physical ids; (2) target buckets that ALREADY hold rows
    * (from earlier steps, or merges that arrived for already-migrated
    * keys) are unioned in and rewritten whole — key sets are disjoint
    * by the routing invariant, so this is concatenation, not conflict
    * resolution; (3) one atomic commit retires the old buckets,
    * publishes the rewritten targets, and advances the migrated set.
    * A crash between steps leaves a valid mid-migration table; the
    * step is idempotent from the committed state. When the last old
    * bucket migrates, the SAME commit promotes the target to the
    * committed layout and clears the migration — [[rebucket]]'s final
    * state, reached without ever stopping the world.
    *
    * Returns the number of old buckets still unmigrated (0 = done).
    */
  def migrateStep(k: Int): Int =
      MergeSink.withWriterLock(spark, path, "migrate-step") {
    require(k >= 1, s"migrateStep needs k >= 1, got $k")
    val l = currentLayout
    val mig = manifest.migration().getOrElse(throw new IllegalStateException(
      s"no migration in flight at $path — beginMigration first"))
    val todo = (0 until l.n).filterNot(mig.migrated)
    val pick = todo.take(k)
    val remaining = todo.size - pick.size
    val complete = remaining == 0
    val nextState: Option[(Layout, Option[Migration])] =
      if (complete) Some((mig.target, None))
      else Some((l, Some(Migration(mig.target, mig.migrated ++ pick))))
    val current = manifest.mapping()
    val physPick = pick.map(b => if (l.gen == 0) b else l.gen * LayoutStride + b)
    val held = physPick.filter(current.contains)
    if (held.isEmpty) {
      // nothing stored under these old buckets: marking them migrated
      // is pure metadata (still a real commit — routing changes)
      manifest.commit(current, manifest.stats(), nextState)
    } else {
      val moving = applyDv(manifest.snapshot(Some(held)).get.drop(BucketCol),
          manifest.dv(), Some(held))
        .withColumn(BucketCol, physOf(mig.target))
      // which target buckets these keys land in: at most k * spread
      // small ints reach the driver — the same metadata-not-data
      // pruning decision merge() makes
      val targets = moving.select(col(BucketCol)).distinct()
        .collect().map(_.getInt(0)).toSeq
      val affected = targets.filter(current.contains)
      val out = manifest.snapshot(Some(affected))
          .map(df => applyDv(df, manifest.dv(), Some(affected))) match {
        case Some(existing) => existing.unionByName(moving)
        case None           => moving
      }
      val gen = manifest.newGenDir()
      out
        .repartition(math.max(targets.size, 1), col(BucketCol))
        .sortWithinPartitions(keys.map(col): _*)
        .write
        .partitionBy(BucketCol)
        .parquet(s"$path/$gen")
      writeBloomsOfGen(gen)
      val written = manifest.writtenBuckets(gen)
      manifest.commit(
        (current -- physPick) ++ written.map(_ -> gen),
        (manifest.stats() -- physPick) ++ statsOfGen(gen),
        nextState)
      manifest.vacuum()
    }
    remaining
  }

  /** (current layout, in-flight migration) as committed — layout
    * audits and gates read this, never handle fields.
    */
  def layoutInfo: (Layout, Option[Migration]) =
    (currentLayout, manifest.migration())
}

object MergeSink {
  /** Partition column of the state table layout. */
  val BucketCol = "__bucket"

  /** Physical-bucket-id namespace width per layout generation:
    * `phys = gen * LayoutStride + logical` (gen 0 stays bare for
    * byte-compatibility with pre-layout tables). 2^20 logical buckets
    * per layout is ~100 GB/bucket headroom past 100 TB; generations
    * are capped so the physical id can never overflow Int.
    */
  val LayoutStride: Int = 1 << 20
  val MaxLayoutGen: Int = Int.MaxValue / LayoutStride - 1 // 2046

  /** Thrown when a second writer attempts to mutate a sink table while
    * another merge/compact holds the lock.
    */
  final class ConcurrentWriterException(msg: String)
    extends IllegalStateException(msg)

  /** Lease TTL for the writer lock: a holder HEARTBEATS the lock's
    * mtime every ttl/4; a contender may break a lock whose mtime is
    * older than the TTL (no heartbeat for >= 4 missed intervals =
    * crashed holder), never a live one. Package-visible so specs can
    * shrink the lease; production default 60 s — far above any GC
    * pause, far below "page an operator". The classic lease caveat
    * applies and is accepted: a holder frozen LONGER than the TTL
    * (stop-the-world pause measured in minutes) could be broken while
    * still alive; the commit itself stays untorn either way because
    * publishing is one atomic manifest rename, so the failure mode is
    * a lost-update race identical to the pre-lock world — which is why
    * the TTL is 60 s and the heartbeat 15 s, not seconds. A
    * transactional table format's optimistic commit protocol
    * (Delta/Iceberg) is the production answer past that.
    */
  private[graft] var lockTtlMs: Long =
    sys.env.get("GRAFT_LOCK_TTL_MS").map(_.toLong).getOrElse(60000L)

  /** Lease capability per filesystem: can this store refresh a file's
    * mtime (`setTimes`)? Without it a holder cannot heartbeat, so an
    * old mtime says NOTHING about holder liveness — the lock must
    * degrade to a pure advisory lock there (never auto-broken;
    * [[breakLock]] is the only override) instead of letting a
    * contender break a LIVE long-running writer after the TTL.
    * Probed once per filesystem URI with a throwaway file; transient
    * probe failures count as capable (individual missed beats are
    * already tolerated — TTL = 4 beats).
    */
  private val leaseCapable =
    new java.util.concurrent.ConcurrentHashMap[java.net.URI, java.lang.Boolean]()

  private def canHeartbeat(fs: org.apache.hadoop.fs.FileSystem, lock: Path): Boolean =
    leaseCapable.computeIfAbsent(fs.getUri, _ => {
      val probe = new Path(lock.toString + s".probe.${java.util.UUID.randomUUID()}")
      try {
        val out = fs.create(probe, false); out.close()
        fs.setTimes(probe, System.currentTimeMillis(), -1)
        true
      } catch {
        case _: UnsupportedOperationException      => false
        case scala.util.control.NonFatal(_)        => true
      } finally {
        try fs.delete(probe, false)
        catch { case scala.util.control.NonFatal(_) => () }
      }
    })

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
    * CRASHED holders no longer need an operator: the lock is a LEASE
    * (see [[lockTtlMs]]) — holders heartbeat its mtime, and a
    * contender that finds the heartbeat stale breaks the lock and
    * proceeds. The break is guarded against racing a FRESH holder:
    * the breaker RENAMES the lock aside (one atomic winner among
    * concurrent breakers), re-reads the renamed file, and only
    * proceeds if it holds exactly the stale owner it observed —
    * anything else is restored and reported as live contention.
    * `breakLock` remains as the manual override.
    */
  def withWriterLock[T](spark: SparkSession, table: String, op: String)(body: => T): T = {
    val lock = new Path(table + "_lock")
    val fs = lock.getFileSystem(spark.sessionState.newHadoopConf())
    val owner = s"$op pid=${ProcessHandle.current().pid()} " +
      s"epochMs=${System.currentTimeMillis()} uuid=${java.util.UUID.randomUUID()}"
    val isLocal = lock.toUri.getScheme == null || lock.toUri.getScheme == "file"

    def readLock(): Option[(String, Long)] =
      try {
        val st = fs.getFileStatus(lock)
        val in = fs.open(lock)
        val text = try scala.io.Source.fromInputStream(in).mkString.trim finally in.close()
        Some((text, st.getModificationTime))
      } catch { case _: java.io.IOException => None } // vanished or unreadable

    def contention(holder: String): Nothing =
      throw new ConcurrentWriterException(
        s"$table is locked by [$holder]; refusing concurrent $op " +
          s"(single-writer contract; lease expires ${lockTtlMs} ms after its " +
          "last heartbeat; breakLock() is the manual override)")

    /** One create-exclusive claim attempt; false = someone holds it. */
    def tryClaim(): Boolean =
      if (isLocal) {
        val p = java.nio.file.Paths.get(lock.toUri.getPath)
        if (p.getParent != null) java.nio.file.Files.createDirectories(p.getParent)
        try {
          java.nio.file.Files.write(p, owner.getBytes("UTF-8"),
            java.nio.file.StandardOpenOption.CREATE_NEW,
            java.nio.file.StandardOpenOption.WRITE)
          true
        } catch { case _: java.nio.file.FileAlreadyExistsException => false }
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
              val ours = readLock().exists(_._1 == owner)
              if (!ours) { fs.delete(tmp, false); throw e }
              true
          }
        if (!claimed) fs.delete(tmp, false)
        else {
          // holder-side hygiene: sweep lock temp files from CRASHED
          // claimers (mtime-guarded so a live claimer mid-write is never
          // raced; a live one is about to fail on rename and delete its
          // own tmp anyway)
          try {
            val dir = lock.getParent
            val prefix = lock.getName + ".tmp."
            val cutoff = System.currentTimeMillis() - 10 * 60 * 1000
            fs.listStatus(dir).foreach { st =>
              if (st.getPath.getName.startsWith(prefix) &&
                  st.getModificationTime < cutoff)
                fs.delete(st.getPath, false)
            }
          } catch { case _: java.io.IOException => () } // best-effort
        }
        claimed
      }

    /** Break a lock whose heartbeat is stale. Atomic among concurrent
      * breakers (exactly one rename wins); guarded against a fresh
      * holder appearing between the staleness read and the rename by
      * re-reading the renamed file — if it is not the observed stale
      * owner, it is restored and treated as live. Returns true if the
      * stale lock is gone and a claim may be retried.
      */
    def breakStale(staleOwner: String): Boolean = {
      val aside = new Path(table + s"_lock.stale.${java.util.UUID.randomUUID()}")
      val renamed =
        try fs.rename(lock, aside)
        catch { case _: java.io.IOException => false }
      if (!renamed) true // another breaker won the rename; retry the claim
      else {
        val moved =
          try {
            val in = fs.open(aside)
            try scala.io.Source.fromInputStream(in).mkString.trim finally in.close()
          } catch { case _: java.io.IOException => "" }
        if (moved == staleOwner) { fs.delete(aside, false); true }
        else {
          // we grabbed a FRESH holder's lock — put it back and report
          // live contention (a release racing the restore leaves a
          // zombie lock that the TTL itself will break: self-healing)
          try fs.rename(aside, lock)
          catch { case _: java.io.IOException => fs.delete(aside, false) }
          false
        }
      }
    }

    // claim loop: exclusive-create; on contention, break only a lock
    // whose lease has expired. Bounded — never spins on live holders.
    var acquired = false
    var attempts = 0
    while (!acquired && attempts < 3) {
      attempts += 1
      acquired = tryClaim()
      if (!acquired) readLock() match {
        case None => () // holder released between claim and read; retry
        case Some((holder, mtime)) =>
          val age = System.currentTimeMillis() - mtime
          if (age <= lockTtlMs) contention(holder)
          // no heartbeat support on this FS → mtime age proves nothing
          // about liveness; advisory posture, never auto-break
          else if (!canHeartbeat(fs, lock)) contention(holder)
          else if (!breakStale(holder)) contention(holder)
      }
    }
    if (!acquired) contention(readLock().map(_._1).getOrElse("<unknown>"))

    // the lease heartbeat: refresh the lock's mtime every ttl/4 while
    // the body runs — a contender reading an mtime older than the TTL
    // can only be seeing a crashed (or frozen-past-the-lease) holder
    val hb: Option[Thread] =
      if (!canHeartbeat(fs, lock)) None // advisory posture: no lease on this FS
      else {
        val t = new Thread(() => {
          try {
            while (!Thread.interrupted()) {
              Thread.sleep(math.max(lockTtlMs / 4, 10))
              try fs.setTimes(lock, System.currentTimeMillis(), -1)
              // NonFatal (not just IOException): any one missed beat is
              // tolerated (TTL = 4 beats), but an uncaught throw would
              // kill the daemon silently and let a contender break a
              // LIVE holder after the TTL. NonFatal leaves interrupts
              // and JVM-fatal errors alone.
              catch { case scala.util.control.NonFatal(_) => () }
            }
          } catch { case _: InterruptedException => () }
        })
        t.setDaemon(true)
        t.setName(s"graft-lock-heartbeat-$op")
        t.start()
        Some(t)
      }
    try body finally { hb.foreach(_.interrupt()); fs.delete(lock, false) }
  }

  /** Operator override: remove a lock left by a crashed writer. */
  def breakLock(spark: SparkSession, table: String): Unit = {
    val lock = new Path(table + "_lock")
    val fs = lock.getFileSystem(spark.sessionState.newHadoopConf())
    fs.delete(lock, false)
  }
}
