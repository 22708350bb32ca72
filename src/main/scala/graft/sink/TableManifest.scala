package graft.sink

import org.apache.hadoop.fs.{FileContext, Options, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Snapshot-manifest commit protocol for the bucketed sink tables
  * (MergeSink / AggSink) — the atomic-commit layer that replaces
  * dynamic partition-directory overwrite.
  *
  * Why: Hadoop's partition overwrite deletes the old partition
  * directory before renaming the staged one in, so a crash inside that
  * window loses a bucket's directory entirely — the residual window
  * the round-3 docs called out honestly. The fix is the standard
  * table-format idea (Delta/Iceberg snapshot commits, re-expressed
  * minimally): data files are IMMUTABLE and uniquely named, and the
  * only mutable object is one small manifest file naming, per bucket,
  * the generation directory holding its current files.
  *
  * Layout:
  * {{{
  *   <root>/_MANIFEST                 # "bucket \t gen-dir" lines
  *   <root>/data/g-<uuid>/__bucket=N/part-*.parquet
  * }}}
  *
  * Commit = write the new snapshot's data files into a FRESH
  * generation dir (never touching current files), fully write the new
  * manifest to a temp name, then RENAME it onto `_MANIFEST` — the
  * atomic namespace operation (NIO ATOMIC_MOVE locally, FileContext
  * `Rename.OVERWRITE` on HDFS-like stores). A reader therefore
  * resolves the old snapshot or the new one, never a mix; a writer
  * crash at ANY point before the rename leaves the previous snapshot
  * untouched and only orphans unreferenced data files, which
  * [[vacuum]] sweeps on the next successful commit.
  *
  * Concurrency: writers are serialized by [[MergeSink.withWriterLock]]
  * (single-writer contract). Readers never lock; they race only the
  * manifest rename, which is atomic. Immediate vacuum can delete a
  * generation a long-running reader of the PREVIOUS snapshot is still
  * scanning — production object stores defer deletion by a retention
  * horizon (Delta/Iceberg VACUUM semantics); the sweep here is
  * immediate because the writer lock plus same-process readers make
  * the window empty in this engine's usage.
  */
final class TableManifest(spark: SparkSession, val root: String) {
  import MergeSink.BucketCol

  private def conf = spark.sessionState.newHadoopConf()
  private val rootPath = new Path(root)
  private def fs = rootPath.getFileSystem(conf)
  private def manifestPath = new Path(root, TableManifest.ManifestFile)

  def exists: Boolean = fs.exists(manifestPath)

  /** A table written by the pre-manifest code has `__bucket=N` dirs
    * directly under the root and no `_MANIFEST`. Reading that as "no
    * committed state" would silently orphan every previously merged
    * row (and, for AggSink, disarm the replay fence) — so resolution
    * FAILS LOUDLY instead, and [[migrateLegacy]] performs the one-time
    * adoption: move the bucket dirs into a generation dir and commit a
    * manifest naming them.
    */
  private def legacyBuckets(): Seq[Int] =
    if (!fs.exists(rootPath)) Seq.empty
    else fs.listStatus(rootPath).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith(s"$BucketCol="))
      .map(_.getPath.getName.stripPrefix(s"$BucketCol=").toInt)

  private def requireNotLegacy(): Unit =
    if (!exists) {
      val legacy = legacyBuckets()
      if (legacy.nonEmpty) throw new IllegalStateException(
        s"$root holds a pre-manifest table layout (${legacy.size} bucket dirs, " +
          "no _MANIFEST); refusing to read it as empty — run migrateLegacy() once")
    }

  /** One-time adoption of a pre-manifest table: bucket dirs move (file
    * renames, no data rewrite) into a fresh generation dir and a
    * manifest naming them is committed. Idempotent: a no-op when the
    * manifest already exists or no legacy dirs remain.
    */
  def migrateLegacy(): Unit =
    if (!exists) {
      val legacy = legacyBuckets()
      if (legacy.nonEmpty) {
        val gen = newGenDir()
        val genPath = new Path(root, gen)
        fs.mkdirs(genPath)
        legacy.foreach { b =>
          fs.rename(new Path(root, s"$BucketCol=$b"),
                    new Path(genPath, s"$BucketCol=$b"))
        }
        commit(legacy.map(_ -> gen).toMap)
      }
    }

  /** Current snapshot: bucket -> root-relative generation dir. */
  def mapping(): Map[Int, String] =
    if (!exists) { requireNotLegacy(); Map.empty }
    else {
      val in = fs.open(manifestPath)
      val text =
        try scala.io.Source.fromInputStream(in, "UTF-8").mkString
        finally in.close()
      text.linesIterator.filter(_.nonEmpty).map { line =>
        val Array(b, g) = line.split("\t", 2)
        b.toInt -> g
      }.toMap
    }

  /** Fresh, never-reused generation dir for one commit's data files. */
  def newGenDir(): String = s"data/g-${java.util.UUID.randomUUID()}"

  /** Crash-injection seam for tests: runs right before the manifest
    * rename — the exact point "data files written, snapshot not yet
    * published".
    */
  private[graft] var beforeCommit: () => Unit = () => ()

  /** Publish a snapshot atomically (see class doc). */
  def commit(m: Map[Int, String]): Unit = {
    beforeCommit()
    val body = m.toSeq.sortBy(_._1)
      .map { case (b, g) => s"$b\t$g" }.mkString("", "\n", "\n")
    val tmp = new Path(root, s"_manifest.tmp.${java.util.UUID.randomUUID()}")
    val out = fs.create(tmp, false)
    try out.write(body.getBytes("UTF-8")) finally out.close()
    val isLocal = rootPath.toUri.getScheme == null || rootPath.toUri.getScheme == "file"
    if (isLocal)
      java.nio.file.Files.move(
        java.nio.file.Paths.get(tmp.toUri.getPath),
        java.nio.file.Paths.get(manifestPath.toUri.getPath),
        java.nio.file.StandardCopyOption.ATOMIC_MOVE,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    else
      FileContext.getFileContext(rootPath.toUri, conf)
        .rename(tmp, manifestPath, Options.Rename.OVERWRITE)
  }

  /** Sweep everything no longer referenced by the committed mapping:
    * generation dirs (superseded bucket rewrites, crashed commits'
    * data) and stale `_manifest.tmp.*` files (a writer that died
    * between tmp write and rename). Callers hold the writer lock, so
    * no live committer's tmp can be racing this sweep.
    */
  def vacuum(): Unit = {
    val live = mapping().values.toSet
    val dataDir = new Path(root, "data")
    if (fs.exists(dataDir))
      fs.listStatus(dataDir).foreach { st =>
        if (!live.contains(s"data/${st.getPath.getName}"))
          fs.delete(st.getPath, true)
      }
    fs.listStatus(rootPath).foreach { st =>
      if (st.getPath.getName.startsWith("_manifest.tmp."))
        fs.delete(st.getPath, false)
    }
  }

  /** Resolved snapshot read with the `__bucket` partition column.
    * `buckets` restricts resolution to those buckets' file sets —
    * pruning at the PATH level: other buckets' files are never even
    * listed into the scan. None = no committed state for the request.
    */
  def snapshot(buckets: Option[Seq[Int]] = None): Option[DataFrame] = {
    val all = mapping()
    val m = buckets match {
      case Some(bs) => all.filter { case (b, _) => bs.contains(b) }
      case None     => all
    }
    if (m.isEmpty) None
    else Some(
      m.groupBy(_._2).map { case (gen, bm) =>
        val base = s"$root/$gen"
        val paths = bm.keys.toSeq.sorted.map(b => s"$base/$BucketCol=$b")
        spark.read.option("basePath", base).parquet(paths: _*)
      }.reduce(_ unionByName _))
  }

  /** Per-bucket (fileName, size, mtime) of the current snapshot — the
    * metadata the compaction policy and layout audits read.
    */
  def bucketFiles(): Map[Int, Seq[(String, Long, Long)]] =
    mapping().map { case (b, gen) =>
      val d = new Path(root, s"$gen/$BucketCol=$b")
      val files =
        if (fs.exists(d))
          fs.listStatus(d).toSeq
            .filter(_.getPath.getName.endsWith(".parquet"))
            .map(st => (st.getPath.getName, st.getLen, st.getModificationTime))
        else Seq.empty
      b -> files
    }

  /** Buckets that a just-written generation actually produced files
    * for (resolved from the filesystem, not assumed from the plan).
    */
  def writtenBuckets(gen: String): Seq[Int] = {
    val p = new Path(root, gen)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith(s"$BucketCol="))
      .map(_.getPath.getName.stripPrefix(s"$BucketCol=").toInt)
  }
}

object TableManifest {
  val ManifestFile = "_MANIFEST"
}
