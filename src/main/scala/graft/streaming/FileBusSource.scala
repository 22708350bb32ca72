package graft.streaming

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.Files
import java.util.{Map => JMap}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{CompositeReadLimit, MicroBatchStream, Offset, ReadAllAvailable, ReadLimit, ReadMaxBytes, ReadMaxFiles, ReportsSourceMetrics, SupportsAdmissionControl, SupportsTriggerAvailableNow}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.{IntegerType, LongType, StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 connector over [[FileBus]] — the reference's RabbitMQ
  * consume hop (`consumer/consumer.py:12-19`) as a FIRST-CLASS Spark
  * source instead of a hand-driven lease loop: `spark.readStream
  * .format("filebus")` (micro-batch streaming) and `spark.read
  * .format("filebus")` (batch backfill over the full retained log).
  *
  * Design — the Kafka-connector model, not the AMQP lease model:
  * streaming replay requires that a committed batch range re-read
  * after a crash yields EXACTLY the same rows, which per-message
  * leases cannot promise (leases expire and re-lease nondeterminis-
  * tically). So the connector reads confirmed segment FILES directly
  * (publish's atomic rename means a listed segment is always complete)
  * and maps bus settlement onto the engine's own progress protocol:
  * when Spark commits a micro-batch's offset, [[FileBusMicroBatch
  * .commit]] settles every message of the batch's segments for the
  * configured consumer group via [[FileBus.commitSegment]] — ack IS
  * checkpoint commit, so `depth()` drains exactly as far as durable
  * progress and an un-checkpointed batch redelivers after restart
  * (at-least-once into an LWW/idempotent sink, the q66/q282
  * contract). The AMQP per-message surface (nack, bounded
  * redelivery, DLQ) remains available on the same bus for non-engine
  * consumers; the DLQ stays terminal across both paths.
  *
  * Offsets: a micro-batch offset is the SET of consumed segment ids
  * (sorted, JSON array). Segment ids are caller-chosen (distributed
  * producers publish under task ids), so id order carries no arrival
  * order — set difference, not a high-water mark, is what makes a
  * late-arriving LOWER id still get picked up instead of silently
  * skipped. [[FileBusMicroBatch.latestOffset]] COMPACTS the set each
  * trigger by intersecting with the live log, so segments retention
  * has pruned leave the checkpointed offset and the set stays bounded
  * by retained segments (sound because the bus's persistent allocator
  * never reuses a pruned segment id).
  *
  * Scale shape: ONE InputPartition per segment — the bus's declared
  * parallelism unit — so a 1000-executor cluster drains a busy topic
  * segment-parallel with zero coordination (readers never touch
  * settle maps). Admission control: `maxSegmentsPerTrigger` bounds a
  * micro-batch (ReadMaxFiles), and Trigger.AvailableNow drains the
  * backlog in bounded batches via [[SupportsTriggerAvailableNow]].
  *
  * Options: `path` (bus root, required), `group` (consumer group to
  * settle on commit; omit for a side-effect-free tap — e.g. backfill
  * or a second subscriber that must not drain the queue),
  * `maxSegmentsPerTrigger` / `maxBytesPerTrigger` (admission bounds,
  * composable; bytes is a soft cap with an at-least-one floor so an
  * oversized segment flows alone instead of wedging the stream).
  * The stream reports per-progress source metrics (published /
  * consumed / backlog segment counts, unsettled group depth).
  */
final class FileBusSourceProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "filebus"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    FileBusSource.schema
  // writes present the QUERY's schema (one payload column) while reads
  // infer the fixed source schema — external metadata lets both through
  override def supportsExternalMetadata(): Boolean = true
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: JMap[String, String]): Table =
    new FileBusTable(schema, new CaseInsensitiveStringMap(properties))
}

object FileBusSource {
  /** Settle every segment the ENGINE'S OWN commit log proves durable —
    * the shutdown counterpart of the per-batch [[FileBusMicroBatch
    * .commit]] path, which (like the Kafka connector) lags one batch:
    * Spark invokes source.commit for batch N only when batch N+1
    * executes, so a stopped stream leaves its final batch's segments
    * leased-but-unsettled until the next nonempty run. This reads the
    * checkpoint's `commits/` log (the engine's durable record of
    * completed batches) and the matching `offsets/` entry, and settles
    * exactly those segments — over-ack is impossible because an entry
    * reaches `commits/` only after the batch's sink commit. On-disk
    * formats are the stable structured-streaming checkpoint contract:
    * one file per batch id, "v1" header, JSON body; offset entries
    * carry one line per source (ours is the JSON segment array).
    */
  def settleCommitted(ckpt: String, busRoot: String, group: String,
                      sourceIndex: Int = 0): Unit = {
    require(sourceIndex >= 0, s"sourceIndex must be >= 0, got $sourceIndex")
    val commits = java.nio.file.Paths.get(ckpt, "commits")
    val offsets = java.nio.file.Paths.get(ckpt, "offsets")
    if (!Files.exists(commits) || !Files.exists(offsets)) return
    val committed = Files.list(commits).iterator().asScala
      .map(_.getFileName.toString).filter(_.forall(_.isDigit))
      .map(_.toLong).toSeq
    if (committed.isEmpty) return
    val last = offsets.resolve(committed.max.toString)
    if (!Files.exists(last)) return
    // offset-log layout (the stable checkpoint contract): line 0 = the
    // "v1" header, line 1 = batch metadata JSON, lines 2+ = ONE offset
    // line per source, POSITIONAL. Select this source's line by index —
    // pattern-matching on "looks like a JSON array" would, in a
    // multi-source query, settle ANOTHER source's segment ids into this
    // bus's group: over-acking messages never processed, which prune()
    // could then permanently delete.
    val lines = Files.readAllLines(last, UTF_8).asScala
    require(lines.nonEmpty && lines.head.trim.startsWith("v"),
      s"unrecognized offset log format at $last (missing version header)")
    val idx = 2 + sourceIndex
    require(idx < lines.length,
      s"offset log $last has ${lines.length - 2} source line(s); " +
        s"sourceIndex $sourceIndex is out of range")
    val line = lines(idx).trim
    if (line == "-" || line.isEmpty) return // source reported no offset
    require(line.startsWith("[") && line.endsWith("]"),
      s"offset line $idx at $last is not a filebus segment array ('$line') — " +
        "wrong sourceIndex for this source?")
    val segs = parseOffsetJson(line)
    if (segs.nonEmpty) {
      val bus = new FileBus(busRoot, visibilityMs = 1L, maxDeliveries = 1)
      val live = FileBus.segments(busRoot).toSet // pruned ids settle nothing
      segs.toSeq.sorted.filter(live).foreach(bus.commitSegment(group, _))
    }
  }

  /** Fixed wire schema — payload plus its stable bus coordinates
    * (segment, idx) so downstream can fingerprint provenance or dedup
    * by transport identity if its algebra ever needs to.
    */
  val schema: StructType = StructType(Seq(
    StructField("segment", LongType, nullable = false),
    StructField("idx", IntegerType, nullable = false),
    StructField("value", StringType, nullable = false)))

  /** Tolerant offset conversion: the engine replays checkpointed
    * offsets as SerializedOffset (raw JSON) on restart/metrics paths,
    * not as the source's own class — always go through json().
    */
  def segsOf(o: Offset): Set[Long] = o match {
    case f: FileBusOffset => f.segs
    case other            => parseOffsetJson(other.json())
  }

  def parseOffsetJson(json: String): Set[Long] = {
    val body = json.trim.stripPrefix("[").stripSuffix("]").trim
    if (body.isEmpty) Set.empty
    else body.split(',').map(_.trim.toLong).toSet
  }

  def offsetJson(segs: Set[Long]): String =
    segs.toSeq.sorted.mkString("[", ",", "]")
}

final class FileBusOffset(val segs: Set[Long]) extends Offset {
  override def json(): String = FileBusSource.offsetJson(segs)
  override def equals(o: Any): Boolean = o match {
    case f: FileBusOffset => f.segs == segs
    case _                => false
  }
  override def hashCode(): Int = segs.hashCode()
}

final class FileBusTable(schemaIn: StructType, options: CaseInsensitiveStringMap)
    extends Table with SupportsRead
    with org.apache.spark.sql.connector.catalog.SupportsWrite {
  private val root = {
    val p = options.get("path")
    require(p != null && p.nonEmpty, "filebus: 'path' option is required")
    p
  }
  override def name(): String = s"filebus:$root"
  override def schema(): StructType = schemaIn
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ,
                         TableCapability.MICRO_BATCH_READ,
                         TableCapability.BATCH_WRITE,
                         TableCapability.STREAMING_WRITE)
  override def newScanBuilder(opts: CaseInsensitiveStringMap): ScanBuilder = {
    // the wire schema is fixed; a user-supplied read schema would
    // silently misinterpret the reader's rows — reject it up front
    require(schemaIn == FileBusSource.schema,
      s"filebus reads have a fixed schema ${FileBusSource.schema.toDDL}; " +
        "drop the .schema(...) call and parse `value` downstream")
    new ScanBuilder {
      override def build(): Scan = new FileBusScan(root, opts)
    }
  }
  override def newWriteBuilder(
      info: org.apache.spark.sql.connector.write.LogicalWriteInfo)
      : org.apache.spark.sql.connector.write.WriteBuilder =
    FileBusSink.newWriteBuilder(root, info)
}

final class FileBusScan(root: String, options: CaseInsensitiveStringMap)
    extends Scan {
  override def readSchema(): StructType = FileBusSource.schema
  override def description(): String = s"FileBusScan(root=$root)"

  /** Batch backfill: the whole retained log, one partition per
    * segment — "the queue never becomes the only copy of history".
    * Never settles anything (a backfill is a tap, not a consumer).
    */
  override def toBatch: Batch = new Batch {
    override def planInputPartitions(): Array[InputPartition] =
      FileBus.segments(root).map(s => FileBusPartition(root, s)).toArray
    override def createReaderFactory(): PartitionReaderFactory =
      new FileBusReaderFactory
  }

  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new FileBusMicroBatch(root,
      Option(options.get("group")).filter(_.nonEmpty),
      Option(options.get("maxSegmentsPerTrigger")).map(_.toInt),
      Option(options.get("maxBytesPerTrigger")).map(_.toLong))
}

final class FileBusMicroBatch(root: String, group: Option[String],
                              maxSegsPerTrigger: Option[Int],
                              maxBytesPerTrigger: Option[Long])
    extends MicroBatchStream with SupportsAdmissionControl
    with SupportsTriggerAvailableNow with ReportsSourceMetrics {
  maxSegsPerTrigger.foreach(n =>
    require(n > 0, s"maxSegmentsPerTrigger must be positive, got $n"))
  maxBytesPerTrigger.foreach(n =>
    require(n > 0, s"maxBytesPerTrigger must be positive, got $n"))

  // fixed at prepareForTriggerAvailableNow: AvailableNow must drain to
  // the log as of stream START and then stop, even while producers
  // keep publishing
  @volatile private var availableNowTarget: Option[Set[Long]] = None

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowTarget = Some(FileBus.segments(root).toSet)

  override def getDefaultReadLimit: ReadLimit = {
    val limits = maxSegsPerTrigger.map(n => ReadLimit.maxFiles(n)).toSeq ++
      maxBytesPerTrigger.map(n => ReadLimit.maxBytes(n)).toSeq
    limits match {
      case Seq()  => ReadLimit.allAvailable()
      case Seq(l) => l
      case many   => ReadLimit.compositeLimit(many.toArray)
    }
  }

  override def initialOffset(): Offset = new FileBusOffset(Set.empty)

  override def deserializeOffset(json: String): Offset =
    new FileBusOffset(FileBusSource.parseOffsetJson(json))

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(Offset, ReadLimit) is the admission-controlled entry")

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val have = FileBusSource.segsOf(start)
    val all = FileBus.segments(root).toSet
    val fresh = (availableNowTarget.fold(all)(all.intersect) -- have).toSeq.sorted
    // OFFSET COMPACTION: segments retention has pruned leave the set,
    // keeping the checkpointed offset bounded by RETAINED segments (the
    // class-doc promise). Safe only because the bus's persistent
    // allocator never reuses a pruned id — with max(live)+1 allocation
    // a reused id would re-enter `have` and its new messages would
    // silently never deliver.
    new FileBusOffset((have & all) ++ admit(fresh, limit))
  }

  /** Apply an admission bound. ReadMaxBytes is a SOFT cap with an
    * at-least-one floor (the file-source convention: an oversized
    * segment must still flow, alone in its own batch, or it would
    * wedge the stream forever). Composite limits intersect.
    */
  private def admit(fresh: Seq[Long], limit: ReadLimit): Seq[Long] = limit match {
    case m: ReadMaxFiles => fresh.take(m.maxFiles())
    case b: ReadMaxBytes =>
      // stop at the first over-budget segment (no skip-ahead: a later
      // small segment must not jump a blocked earlier one — keeps
      // per-run admission sequential even though offsets are sets)
      val out = Seq.newBuilder[Long]
      var budget = b.maxBytes(); var n = 0; var blocked = false
      fresh.foreach { s =>
        if (!blocked) {
          val sz = Files.size(FileBus.segFile(root, s))
          if (n == 0 || sz <= budget) { out += s; budget -= sz; n += 1 }
          else blocked = true
        }
      }
      out.result()
    case c: CompositeReadLimit =>
      c.getReadLimits.foldLeft(fresh)((acc, l) => admit(acc, l))
    case _: ReadAllAvailable => fresh
    case _                   => fresh
  }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = FileBusSource.segsOf(start)
    val e = FileBusSource.segsOf(end)
    (e -- s).toSeq.sorted.map(x => FileBusPartition(root, x)).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new FileBusReaderFactory

  /** Ack = checkpoint commit: the engine durably recorded `end`, so
    * every segment in it settles for the consumer group. Idempotent
    * (recommits after restart re-settle already-settled segments as
    * no-ops), and a group-less tap settles nothing.
    */
  override def commit(end: Offset): Unit = group.foreach { g =>
    val bus = busFor(root)
    // an offset may reference segments retention has already pruned
    // (settled by an earlier commit, then compacted) — settle only
    // what still exists
    val live = FileBus.segments(root).toSet
    FileBusSource.segsOf(end).toSeq.sorted
      .filter(live).foreach(bus.commitSegment(g, _))
  }

  // commitSegment needs an instance only for its settle-map I/O; the
  // visibility/redelivery knobs are irrelevant to the log-read path
  private def busFor(r: String) = new FileBus(r, visibilityMs = 1L, maxDeliveries = 1)

  /** Progress-report observability (StreamingQueryProgress.sources[i]
    * .metrics): published/consumed/backlog segment counts, plus the
    * group's unsettled depth — the lag signal an operator alerts on.
    */
  override def metrics(latestConsumed: java.util.Optional[Offset]): JMap[String, String] = {
    val all = FileBus.segments(root).toSet
    val consumed =
      if (latestConsumed.isPresent) FileBusSource.segsOf(latestConsumed.get)
      else Set.empty[Long]
    // byte counters ride the progress report because bus payloads move
    // OUTSIDE Spark's shuffle metrics — without them a connector-side
    // volume regression (e.g. settle-map rewrite growth) is invisible
    // to the bench's shuffle-MB regression net
    def bytesOf(segs: Set[Long]): Long =
      segs.iterator.map(s => Files.size(FileBus.segFile(root, s))).sum
    val m = new java.util.HashMap[String, String]()
    m.put("publishedSegments", all.size.toString)
    m.put("consumedSegments", (all & consumed).size.toString)
    m.put("backlogSegments", (all -- consumed).size.toString)
    m.put("publishedBytes", bytesOf(all).toString)
    m.put("consumedBytes", bytesOf(all & consumed).toString)
    group.foreach(g => m.put("unsettledDepth", busFor(root).depth(g).toString))
    m
  }

  override def stop(): Unit = ()
}

final case class FileBusPartition(root: String, seg: Long) extends InputPartition

final class FileBusReaderFactory extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val fp = p.asInstanceOf[FileBusPartition]
    new PartitionReader[InternalRow] {
      private val lines = {
        FileBus.bytesConsumed.addAndGet(Files.size(FileBus.segFile(fp.root, fp.seg)))
        Files.readAllLines(FileBus.segFile(fp.root, fp.seg), UTF_8).asScala
      }
      private var i = -1
      override def next(): Boolean = { i += 1; i < lines.length }
      override def get(): InternalRow =
        InternalRow(fp.seg, i, UTF8String.fromString(lines(i)))
      override def close(): Unit = ()
    }
  }
}
