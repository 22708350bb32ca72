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
  *   <root>/_MANIFEST                 # current snapshot (see format below)
  *   <root>/_versions/v-<n>          # immutable copy of snapshot n
  *   <root>/data/g-<uuid>/__bucket=N/part-*.parquet
  * }}}
  *
  * Manifest format (tab-separated, one header + one line per bucket):
  * {{{
  *   #version=<n>
  *   <bucket> \t <gen-dir> \t [col,min,max;col,min,max;…]
  * }}}
  * The optional third field carries per-bucket ZONE-MAP statistics
  * (min/max per declared stats column, doubles — exact for integral
  * values up to 2^53, which covers ids and epoch-micro timestamps).
  * Readers prune buckets whose range cannot satisfy a predicate
  * BEFORE any file is listed — the Iceberg manifest-stats idea at
  * bucket granularity. A bucket with no recorded stats for a column
  * is never pruned (correctness over optimism).
  *
  * Commit = write the new snapshot's data files into a FRESH
  * generation dir (never touching current files), write the snapshot
  * body to the immutable version file `_versions/v-<n>`, fully write
  * the new manifest to a temp name, then RENAME it onto `_MANIFEST` —
  * the atomic namespace operation (NIO ATOMIC_MOVE locally,
  * FileContext `Rename.OVERWRITE` on HDFS-like stores). A reader
  * therefore resolves the old snapshot or the new one, never a mix; a
  * writer crash at ANY point before the rename leaves the previous
  * snapshot untouched and only orphans unreferenced data files and an
  * unpublished `v-<n>` (both ignored by readers — a version file above
  * the published `#version` header does not exist as far as resolution
  * is concerned — and reclaimed by [[vacuum]] / the next commit, which
  * rewrites `v-<n>` from scratch).
  *
  * TIME TRAVEL: `_versions/v-<n>` files are retained across commits,
  * so [[snapshotAt]] resolves any historical snapshot; generation dirs
  * referenced by ANY retained version survive [[vacuum]]. Retention is
  * bounded by [[expireVersions]] (Delta/Iceberg VACUUM-with-retention
  * semantics): expiring old versions is what finally frees their
  * superseded generation dirs. At 100 TB, version files stay tiny
  * (one line per bucket — metadata, not data), so the cost of history
  * is only the superseded data generations, which expiry reclaims.
  *
  * Concurrency: writers are serialized by [[MergeSink.withWriterLock]]
  * (single-writer contract). Readers never lock; they race only the
  * manifest rename, which is atomic. A long-running reader of an OLD
  * version races only [[expireVersions]] — production object stores
  * defer deletion by a retention horizon; here the writer lock plus
  * same-process readers make the window empty in this engine's usage.
  */
final class TableManifest(spark: SparkSession, val root: String) {
  import MergeSink.BucketCol
  import TableManifest.{ColStats, Layout, Migration, Stats}

  private def conf = spark.sessionState.newHadoopConf()
  private val rootPath = new Path(root)
  private def fs = rootPath.getFileSystem(conf)
  private def manifestPath = new Path(root, TableManifest.ManifestFile)
  private def versionsDir = new Path(root, TableManifest.VersionsDir)
  private def versionPath(n: Long) = new Path(versionsDir, s"v-$n")

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

  private def readText(p: Path): String = {
    val in = fs.open(p)
    try scala.io.Source.fromInputStream(in, "UTF-8").mkString
    finally in.close()
  }

  import TableManifest.Parsed

  private def parseLayout(s: String): Layout = {
    val Array(g, n, w) = s.split(",", 3)
    Layout(g.toInt, n.toInt, if (w == "-") None else Some(w.toLong))
  }

  /** A body without a `#version` header predates the version log and
    * reads as version 1 with no history.
    */
  private def parse(text: String): Parsed = {
    val lines = text.linesIterator.filter(_.nonEmpty).toSeq
    val (headers, dataLines) = lines.span(_.startsWith("#"))
    def header(k: String): Option[String] =
      headers.collectFirst { case h if h.startsWith(s"#$k=") => h.stripPrefix(s"#$k=") }
    val version = header("version").map(_.toLong).getOrElse(1L)
    val layout = header("layout").map(parseLayout)
    val migration = header("target").map(parseLayout).map { t =>
      val migrated = header("migrated").filter(_.nonEmpty)
        .map(_.split(",").map(_.toInt).toSet).getOrElse(Set.empty[Int])
      Migration(t, migrated)
    }
    val m = dataLines.map { line =>
      val fields = line.split("\t", -1)
      val stats: Stats =
        if (fields.length < 3 || fields(2).isEmpty) Map.empty
        else fields(2).split(";").iterator.map { triple =>
          val Array(c, lo, hi) = triple.split(",", 3)
          c -> ColStats(lo.toDouble, hi.toDouble)
        }.toMap
      val dvs: Seq[String] =
        if (fields.length < 4 || fields(3).isEmpty) Seq.empty
        else fields(3).split(";").toSeq
      fields(0).toInt -> (fields(1), stats, dvs)
    }.toMap
    Parsed(version, m, layout, migration)
  }

  private def full(): Parsed =
    if (!exists) { requireNotLegacy(); Parsed(0L, Map.empty, None, None) }
    else parse(readText(manifestPath))

  /** Current snapshot: bucket -> root-relative generation dir. */
  def mapping(): Map[Int, String] = full().m.map { case (b, (g, _, _)) => b -> g }

  /** Current per-bucket zone-map stats (empty map per bucket when the
    * writer declared no stats columns).
    */
  def stats(): Map[Int, Stats] = full().m.map { case (b, (_, s, _)) => b -> s }

  /** Current per-bucket DELETION VECTORS: bucket -> root-relative
    * parquet dirs of key rows deleted merge-on-read (only buckets with
    * at least one outstanding DV appear). Readers anti-join these
    * keys; a rewrite of the bucket consumes them (see [[commit]]).
    */
  def dv(): Map[Int, Seq[String]] =
    full().m.collect { case (b, (_, _, d)) if d.nonEmpty => b -> d }

  /** [[dv]] as of retained version `v`. */
  def dvAt(v: Long): Map[Int, Seq[String]] =
    parsedAt(v).m.collect { case (b, (_, _, d)) if d.nonEmpty => b -> d }

  /** Published snapshot version (0 = never committed). */
  def currentVersion(): Long = full().version

  /** Atomic read of (version, mapping, stats) from ONE manifest parse.
    * An optimistic stager MUST fence against the version its merge
    * input was actually read at: reading version and mapping in two
    * calls lets a concurrent commit land between them, and reading the
    * version only at stage-finalization time (after the O(data)
    * parquet write) lets the fence record a version NEWER than the
    * merge base — publish would then pass its stale check and silently
    * overwrite the intervening commit's rows (lost update).
    */
  def versionedState(): (Long, Map[Int, String], Map[Int, Stats]) = {
    val f = full()
    (f.version,
      f.m.map { case (b, (g, _, _)) => b -> g },
      f.m.map { case (b, (_, s, _)) => b -> s })
  }

  /** Committed bucket layout, when the writing sink records one —
    * manifests written before the layout header (or by layout-less
    * sinks like AggSink) return None and the owning sink's constructor
    * parameters apply, exactly as before the header existed.
    */
  def layout(): Option[Layout] = full().layout

  /** In-flight progressive bucket migration, if any. */
  def migration(): Option[Migration] = full().migration

  /** Retained, published versions, ascending. Version files above the
    * published `#version` are crashed-commit orphans, not snapshots.
    */
  def versions(): Seq[Long] = {
    val cur = currentVersion()
    if (!fs.exists(versionsDir)) Seq.empty
    else fs.listStatus(versionsDir).toSeq
      .map(_.getPath.getName).filter(_.startsWith("v-"))
      .map(_.stripPrefix("v-").toLong)
      .filter(_ <= cur).sorted
  }

  /** Historical snapshot `v`'s bucket -> generation dir. Fails loudly
    * on an expired or never-published version.
    */
  def mappingAt(v: Long): Map[Int, String] =
    parsedAt(v).m.map { case (b, (g, _, _)) => b -> g }

  private def parsedAt(v: Long): Parsed = {
    require(v >= 1 && v <= currentVersion(),
      s"version $v is not published at $root (current=${currentVersion()})")
    val p = versionPath(v)
    if (!fs.exists(p)) throw new IllegalStateException(
      s"version $v at $root has been expired (expireVersions) — retained: ${versions().mkString(",")}")
    parse(readText(p))
  }

  /** Fresh, never-reused generation dir for one commit's data files. */
  def newGenDir(): String = s"data/g-${java.util.UUID.randomUUID()}"

  /** Crash-injection seam for tests: runs right before the manifest
    * rename — the exact point "data files + version file written,
    * snapshot not yet published".
    */
  private[graft] var beforeCommit: () => Unit = () => ()

  private def renderLayout(l: Layout): String =
    s"${l.gen},${l.n},${l.rangeWidth.getOrElse("-")}"

  private def render(version: Long, m: Map[Int, String], stats: Map[Int, Stats],
                     layout: Option[Layout], migration: Option[Migration],
                     dv: Map[Int, Seq[String]]): String = {
    val body = m.toSeq.sortBy(_._1).map { case (b, g) =>
      val st = stats.getOrElse(b, Map.empty)
        .toSeq.sortBy(_._1)
        .map { case (c, cs) => s"$c,${cs.min},${cs.max}" }.mkString(";")
      val d = dv.getOrElse(b, Seq.empty).mkString(";")
      if (d.isEmpty) s"$b\t$g\t$st" else s"$b\t$g\t$st\t$d"
    }.mkString("", "\n", "\n")
    val lh = layout.map(l => s"#layout=${renderLayout(l)}\n").getOrElse("")
    val mh = migration.map(mg =>
      s"#target=${renderLayout(mg.target)}\n#migrated=${mg.migrated.toSeq.sorted.mkString(",")}\n")
      .getOrElse("")
    s"#version=$version\n$lh$mh$body"
  }

  /** Publish a snapshot atomically (see class doc). `stats` carries
    * the per-bucket zone maps; omit for stat-less tables.
    * `layoutState`: None carries the current layout headers forward
    * unchanged (stat-less and layout-less writers never think about
    * them); Some((layout, migration)) sets them exactly — how
    * [[MergeSink]] records layout evolution and migration progress in
    * the SAME atomic commit as the data it describes.
    * `dvState`: None applies the CONSUMPTION rule — a bucket keeps its
    * deletion vectors iff this commit maps it to the SAME generation
    * as before (an unchanged bucket's DVs still apply; a rewritten
    * bucket was rebuilt from a DV-applied read, so its DVs are
    * consumed and dropped in the same atomic commit). Every
    * data-rewriting caller gets correct DV semantics for free;
    * Some(dv) sets the map exactly (how [[MergeSink.deleteVector]]
    * appends new vectors).
    */
  def commit(m: Map[Int, String], stats: Map[Int, Stats] = Map.empty,
             layoutState: Option[(Layout, Option[Migration])] = None,
             dvState: Option[Map[Int, Seq[String]]] = None): Unit = {
    val f = full()
    val (lay, mig) = layoutState match {
      case Some((l, mg)) => (Some(l), mg)
      case None          => (f.layout, f.migration)
    }
    val dv = dvState.getOrElse {
      f.m.collect {
        case (b, (g, _, d)) if d.nonEmpty && m.get(b).contains(g) => b -> d
      }
    }
    commitExact(m, stats, lay, mig, dv)
  }

  /** Restore the table to `toVersion`'s EXACT snapshot as a NEW
    * version — the Delta RESTORE / Iceberg rollback primitive.
    * Metadata-only and O(1): the rollback commit re-points at
    * `toVersion`'s generation dirs (mapping, zone maps, layout,
    * migration headers AND deletion vectors all restored verbatim,
    * including a None layout — a plain `commit` cannot clear headers,
    * rollback must). History is preserved: the rolled-back-over
    * versions stay time-travelable until [[expireVersions]], and
    * [[vacuum]] keeps their generations live for the same reason.
    * Forward writes continue normally on top of the restored state.
    */
  def rollback(toVersion: Long): Unit = {
    val cur = currentVersion()
    require(toVersion < cur,
      s"rollback target $toVersion is not in the past (current=$cur)")
    val p = parsedAt(toVersion)
    commitExact(
      p.m.map { case (b, (g, _, _)) => b -> g },
      p.m.map { case (b, (_, st, _)) => b -> st }.filter(_._2.nonEmpty),
      p.layout, p.migration,
      p.m.collect { case (b, (_, _, d)) if d.nonEmpty => b -> d })
  }

  private def commitExact(m: Map[Int, String], stats: Map[Int, Stats],
                          lay: Option[Layout], mig: Option[Migration],
                          dv: Map[Int, Seq[String]]): Unit = {
    val next = currentVersion() + 1
    val body = render(next, m, stats, lay, mig, dv)
    // immutable history copy first (overwrite: a crashed prior attempt
    // at this same unpublished version is dead by single-writer rule)
    fs.mkdirs(versionsDir)
    val vout = fs.create(versionPath(next), true)
    try vout.write(body.getBytes("UTF-8")) finally vout.close()
    beforeCommit()
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

  // ------------------------------------------------- staged snapshots

  private def stagedDir = new Path(root, TableManifest.StagedDir)
  private def stagedPath(token: String) = new Path(stagedDir, token)

  /** WRITE-AUDIT-PUBLISH, stage step: persist a fully-rendered
    * snapshot body under `_staged/<token>` WITHOUT publishing — no
    * reader resolves it, no version is consumed. The body carries a
    * `#base=<version>` fence: [[publish]] refuses when the table has
    * committed past that version, because the staged mapping was
    * computed against state that no longer exists (publishing it would
    * silently drop the intervening commits' rows from the staged
    * buckets). Staged generations count as LIVE for [[vacuum]] until
    * the stage is published or [[discard]]ed.
    */
  def stage(m: Map[Int, String], stats: Map[Int, Stats] = Map.empty,
            dvState: Option[Map[Int, Seq[String]]] = None,
            baseVersion: Option[Long] = None): String = {
    val f = full()
    val dv = dvState.getOrElse {
      f.m.collect {
        case (b, (g, _, d)) if d.nonEmpty && m.get(b).contains(g) => b -> d
      }
    }
    // The fence must be the version the stager's merge input was READ
    // at (threaded in by lock-free stagers), not the version observed
    // here after the O(data) write — see [[versionedState]].
    val body = s"#base=${baseVersion.getOrElse(f.version)}\n" +
      render(f.version + 1, m, stats, f.layout, f.migration, dv)
    val token = s"s-${java.util.UUID.randomUUID()}"
    fs.mkdirs(stagedDir)
    val out = fs.create(stagedPath(token), false)
    try out.write(body.getBytes("UTF-8")) finally out.close()
    token
  }

  /** Outstanding stage tokens (audit/maintenance metadata). */
  def staged(): Seq[String] =
    if (!fs.exists(stagedDir)) Seq.empty
    else fs.listStatus(stagedDir).toSeq.map(_.getPath.getName).filter(_.startsWith("s-")).sorted

  // ------------------------------------------- lock-free stage support

  /** Pre-register a generation a LOCK-FREE stager is about to write
    * (`_staged/p-<token>`, body = the gen name). A concurrent
    * publisher's [[vacuum]] counts pre-registered generations fully
    * live, closing the race where the half-written generation of an
    * optimistic stager is referenced by nothing yet. Written BEFORE
    * any data byte, so there is no unprotected window. A crashed
    * stager leaves its marker until [[discardPending]] — the same
    * manual-reclaim posture as an unaudited staged snapshot.
    */
  def preStage(gen: String): String = {
    val token = s"p-${java.util.UUID.randomUUID()}"
    fs.mkdirs(stagedDir)
    val out = fs.create(stagedPath(token), false)
    try out.write(gen.getBytes("UTF-8")) finally out.close()
    token
  }

  /** Promote a pre-registered stage to a full staged snapshot (the
    * normal `s-` token [[publish]]/[[discard]] operate on); the
    * pending marker is consumed. The staged file itself now holds the
    * generation references, so liveness never lapses between the two.
    */
  def finalizeStage(pending: String, m: Map[Int, String],
                    stats: Map[Int, Stats] = Map.empty,
                    dvState: Option[Map[Int, Seq[String]]] = None,
                    baseVersion: Option[Long] = None): String = {
    val token = stage(m, stats, dvState, baseVersion)
    fs.delete(stagedPath(pending), false)
    token
  }

  /** Drop a pending pre-registration (failed or crashed stager) and
    * reclaim its generation.
    */
  def discardPending(pending: String): Unit = {
    fs.delete(stagedPath(pending), false)
    vacuum()
  }

  /** Outstanding pre-registrations. */
  def pendingStages(): Seq[String] =
    if (!fs.exists(stagedDir)) Seq.empty
    else fs.listStatus(stagedDir).toSeq.map(_.getPath.getName)
      .filter(_.startsWith("p-")).sorted

  private def pendingGens(): Set[String] =
    pendingStages().map(t => readText(stagedPath(t)).trim).toSet

  private def parseStaged(token: String): (Long, Parsed) = {
    val p = stagedPath(token)
    if (!fs.exists(p)) throw new IllegalStateException(
      s"stage $token at $root does not exist (published or discarded?)")
    val text = readText(p)
    val base = text.linesIterator.collectFirst {
      case l if l.startsWith("#base=") => l.stripPrefix("#base=").toLong
    }.getOrElse(throw new IllegalStateException(s"stage $token has no #base fence"))
    (base, parse(text))
  }

  /** The staged snapshot as a readable frame (bucket column included,
    * like [[snapshot]]) — what the AUDIT step inspects. Returns None
    * for an empty staged mapping.
    */
  def stagedSnapshot(token: String, buckets: Option[Seq[Int]] = None): Option[DataFrame] =
    resolve(parseStaged(token)._2.m.map { case (b, (g, _, _)) => b -> g }, buckets)

  /** Staged deletion-vector map (the audit may need to see deletes). */
  def stagedDv(token: String): Map[Int, Seq[String]] =
    parseStaged(token)._2.m.collect { case (b, (_, _, d)) if d.nonEmpty => b -> d }

  /** WRITE-AUDIT-PUBLISH, publish step: commit the staged snapshot
    * atomically — the normal [[commit]] path, so history, time travel,
    * and crash atomicity are identical to a direct commit. Fails fast
    * when the table committed past the stage's `#base` fence.
    */
  def publish(token: String): Unit = {
    val (base, p) = parseStaged(token)
    val cur = currentVersion()
    if (cur != base) throw new IllegalStateException(
      s"stage $token was computed against version $base but the table is at $cur — " +
        "the staged merge is stale; discard and re-stage")
    commit(
      p.m.map { case (b, (g, _, _)) => b -> g },
      p.m.map { case (b, (_, s, _)) => b -> s },
      layoutState = p.layout.map(l => (l, p.migration)),
      dvState = Some(p.m.collect { case (b, (_, _, d)) if d.nonEmpty => b -> d }))
    fs.delete(stagedPath(token), false)
  }

  /** WRITE-AUDIT-PUBLISH, reject step: drop the staged snapshot; the
    * next [[vacuum]] sweeps generations only it referenced.
    */
  def discard(token: String): Unit = {
    fs.delete(stagedPath(token), false)
    vacuum()
  }

  /** Sweep everything no longer reachable at (generation, bucket)
    * granularity: a generation dir is shared by every bucket its
    * commit wrote, so whole-dir liveness is not enough — a bucket
    * subdir that NO retained version references any more (superseded
    * rewrite whose versions expired, or a purged bucket) must go even
    * while sibling buckets keep the dir alive. This is what makes
    * [[MergeSink.purgeKeys]]' erasure PHYSICAL: after history expiry
    * no parquet byte of a dereferenced bucket survives. Also sweeps
    * generation dirs referenced by nothing (crashed commits), version
    * files above the published version (crashed commits' history
    * copies), and stale `_manifest.tmp.*` files. Callers hold the
    * writer lock, so no live committer's files can be racing this
    * sweep.
    */
  def vacuum(): Unit = {
    val cur = currentVersion()
    // gen -> buckets any retained snapshot still resolves from it
    val dataRefs: Map[String, Set[Int]] =
      (mapping().toSeq ++ versions().flatMap(v => mappingAt(v).toSeq))
        .groupMap { case (_, g) => g } { case (b, _) => b }
        .map { case (g, bs) => g -> bs.toSet }
    // deletion-vector dirs keep their generation alive too: a DV path
    // is `data/g-*/dv_<bucket>`, so its first two segments name the
    // gen; referenced-with-no-data-buckets keeps the dir but sweeps
    // nothing inside (DV subdirs are not `__bucket=` dirs)
    val dvGens: Set[String] =
      (dv().values.flatten ++ versions().flatMap(v => dvAt(v).values.flatten))
        .map(_.split("/").take(2).mkString("/")).toSet
    // staged (write-audit-publish) snapshots keep their generations —
    // both data mappings and DV refs — alive until published/discarded
    val stagedParsed = staged().map(t => parseStaged(t)._2)
    val stagedDataRefs: Map[String, Set[Int]] = stagedParsed
      .flatMap(_.m.toSeq.map { case (b, (g, _, _)) => (b, g) })
      .groupMap(_._2)(_._1).map { case (g, bs) => g -> bs.toSet }
    val stagedDvGens: Set[String] = stagedParsed
      .flatMap(_.m.values.flatMap(_._3))
      .map(_.split("/").take(2).mkString("/")).toSet
    val merged = (dataRefs.toSeq ++ stagedDataRefs.toSeq)
      .groupMapReduce(_._1)(_._2)(_ ++ _)
    val liveRefs: Map[String, Set[Int]] =
      merged ++ ((dvGens ++ stagedDvGens) -- merged.keySet).map(_ -> Set.empty[Int])
    // generations pre-registered by in-flight lock-free stagers are
    // fully live — their bucket layout is still being written
    val pending = pendingGens()
    val dataDir = new Path(root, "data")
    if (fs.exists(dataDir))
      fs.listStatus(dataDir).foreach { st =>
        val rel = s"data/${st.getPath.getName}"
        if (pending.contains(rel)) ()
        else liveRefs.get(rel) match {
          case None => fs.delete(st.getPath, true)
          case Some(liveBuckets) =>
            fs.listStatus(st.getPath).foreach { sub =>
              val name = sub.getPath.getName
              if (name.startsWith(s"$BucketCol=") &&
                  !liveBuckets.contains(name.stripPrefix(s"$BucketCol=").toInt))
                fs.delete(sub.getPath, true)
            }
        }
      }
    if (fs.exists(versionsDir))
      fs.listStatus(versionsDir).foreach { st =>
        val name = st.getPath.getName
        if (name.startsWith("v-") && name.stripPrefix("v-").toLong > cur)
          fs.delete(st.getPath, false)
      }
    fs.listStatus(rootPath).foreach { st =>
      if (st.getPath.getName.startsWith("_manifest.tmp."))
        fs.delete(st.getPath, false)
    }
  }

  /** Drop history: retain only the `keepLast` most recent versions
    * (minimum 1 — the current snapshot is always readable), then
    * vacuum generation dirs only the expired versions referenced.
    * This is the retention knob that bounds storage growth under
    * continuous merging.
    */
  def expireVersions(keepLast: Int): Unit = {
    val keep = math.max(1, keepLast)
    val cutoff = currentVersion() - keep
    versions().filter(_ <= cutoff).foreach(v => fs.delete(versionPath(v), false))
    vacuum()
  }

  private def resolve(m: Map[Int, String], buckets: Option[Seq[Int]]): Option[DataFrame] = {
    val sel = buckets match {
      case Some(bs) => m.filter { case (b, _) => bs.contains(b) }
      case None     => m
    }
    if (sel.isEmpty) None
    else {
      // ONE schema inference for the whole snapshot (round 16): every
      // generation of a sink table writes the full logical schema, so
      // the first generation's inferred schema serves the rest — a bare
      // spark.read.parquet per generation each ran its own single-task
      // footer schema-inference job, so a snapshot spanning g
      // generations paid g job launches purely to re-learn one schema.
      val gens = sel.groupBy(_._2).toSeq.map { case (gen, bm) =>
        val base = s"$root/$gen"
        (base, bm.keys.toSeq.sorted.map(b => s"$base/$BucketCol=$b"))
      }
      val first = spark.read.option("basePath", gens.head._1).parquet(gens.head._2: _*)
      val rest = gens.tail.map { case (base, paths) =>
        spark.read.schema(first.schema).option("basePath", base).parquet(paths: _*)
      }
      Some((first +: rest).reduce(_ unionByName _))
    }
  }

  /** Resolved snapshot read with the `__bucket` partition column.
    * `buckets` restricts resolution to those buckets' file sets —
    * pruning at the PATH level: other buckets' files are never even
    * listed into the scan. None = no committed state for the request.
    */
  def snapshot(buckets: Option[Seq[Int]] = None): Option[DataFrame] =
    resolve(mapping(), buckets)

  /** [[snapshot]] as of a retained historical version — time travel.
    * Generation dirs are immutable and version-pinned, so this read is
    * SNAPSHOT-ISOLATED from any concurrent committer.
    */
  def snapshotAt(v: Long, buckets: Option[Seq[Int]] = None): Option[DataFrame] =
    resolve(mappingAt(v), buckets)

  /** Buckets whose zone map can intersect `[lo, hi]` on `col` — the
    * metadata-level data-skipping decision. Buckets without recorded
    * stats for `col` are kept (never prune on missing information).
    */
  def bucketsForRange(col: String, lo: Double, hi: Double): Seq[Int] =
    stats().collect {
      case (b, s) if s.get(col).forall(cs => cs.max >= lo && cs.min <= hi) => b
    }.toSeq.sorted

  // ------------------------------------------------- bloom sidecars

  /** Bloom sidecars live INSIDE the bucket's generation dir, prefixed
    * `_` so every Hadoop/Spark data scan ignores them. Generation dirs
    * are immutable and atomically published, so a sidecar written
    * before [[commit]] shares the data files' crash story exactly: an
    * unpublished generation's sidecars are orphans, a published one's
    * are guaranteed present and consistent with its rows.
    */
  private def bloomPath(gen: String, bucket: Int, c: String): Path =
    new Path(root, s"$gen/$BucketCol=$bucket/_bloom_$c")

  /** Sidecar format: 4-byte big-endian hash count, then the bitset. */
  def writeBloom(gen: String, bucket: Int, c: String,
                 numHashes: Int, bits: Array[Byte]): Unit = {
    val out = fs.create(bloomPath(gen, bucket, c), true)
    try { out.writeInt(numHashes); out.write(bits) } finally out.close()
  }

  /** Current snapshot's bloom for (bucket, column), if the writer
    * recorded one — (numHashes, bits).
    */
  def bloom(bucket: Int, c: String): Option[(Int, Array[Byte])] =
    mapping().get(bucket).flatMap(gen => bloomIn(gen, bucket, c))

  /** [[bloom]] against an already-resolved generation — the form the
    * batched probes use so one manifest resolve serves every bucket
    * (and so a probe can never mix two committed versions
    * mid-iteration, which per-bucket `mapping()` calls could).
    */
  private def bloomIn(gen: String, bucket: Int, c: String): Option[(Int, Array[Byte])] = {
    val p = bloomPath(gen, bucket, c)
    if (!fs.exists(p)) None
    else {
      val len = fs.getFileStatus(p).getLen.toInt - 4
      val in = fs.open(p)
      try {
        val k = in.readInt()
        val bits = new Array[Byte](len)
        in.readFully(bits)
        Some((k, bits))
      } finally in.close()
    }
  }

  /** Buckets that MIGHT hold a row with `c` hashing to `hash` — the
    * metadata-level point-lookup decision ([[bucketsForRange]]'s
    * equality sibling, for high-cardinality secondary ids where
    * min/max spans the domain and zone maps cannot prune). A bucket
    * without a sidecar for `c` is kept: missing information never
    * prunes.
    */
  def bucketsForPoint(c: String, hash: Long): Seq[Int] =
    bucketsForPoints(c, Seq(hash))

  /** Batched form of [[bucketsForPoint]]: ONE manifest resolve and ONE
    * sidecar read per bucket for the whole probe set (the per-value
    * form re-opened every bucket's bloom file per probe — a
    * 10k-point sweep turned into 10k x buckets of file I/O). A bucket
    * is admitted if ANY probe hash might be contained (or it has no
    * sidecar — missing information never prunes).
    */
  def bucketsForPoints(c: String, hashes: Seq[Long]): Seq[Int] = {
    val m = mapping() // ONE resolve: every bucket probes the same committed version
    m.filter { case (b, gen) =>
      bloomIn(gen, b, c).forall { case (k, bits) =>
        hashes.exists(h => BucketBloom.mightContain(bits, k, h))
      }
    }.keys.toSeq.sorted
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
  val VersionsDir = "_versions"
  val StagedDir = "_staged"

  /** Inclusive min/max zone map of one column within one bucket.
    * Doubles: exact for integral values up to 2^53 (ids, epoch
    * micros); floating stats columns round-trip via Double.toString.
    */
  final case class ColStats(min: Double, max: Double)

  /** Column name -> zone map, for one bucket. */
  type Stats = Map[String, ColStats]

  /** One bucket-layout generation of a [[MergeSink]] table: `n`
    * hash (rangeWidth = None) or range buckets, living in the physical
    * bucket-id namespace `[gen * MergeSink.LayoutStride, ... + n)`.
    * Recording the layout IN the manifest (same atomic commit as the
    * data) is what makes stale handles harmless: every sink routes by
    * the committed layout, never by whatever its constructor said.
    */
  final case class Layout(gen: Int, n: Int, rangeWidth: Option[Long])

  /** Progressive-migration state: the layout being migrated TO and the
    * OLD-layout logical bucket ids whose keys already route to it.
    * Absent = no migration in flight.
    */
  final case class Migration(target: Layout, migrated: Set[Int])

  /** One parsed manifest body: version, bucket mapping (+ zone maps),
    * and the BUCKET-LAYOUT state — the committed layout plus, while a
    * progressive migration is in flight, the target layout and the set
    * of old-layout buckets already rewritten into it. A body without
    * the optional headers (pre-round-10 manifests) reads as
    * `layout = None`: the owning sink falls back to its constructor
    * parameters, which is exactly the pre-header behavior.
    */
  private final case class Parsed(
      version: Long,
      m: Map[Int, (String, Stats, Seq[String])],
      layout: Option[Layout],
      migration: Option[Migration])
}
