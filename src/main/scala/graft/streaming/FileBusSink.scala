package graft.streaming

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.types.{StringType, StructType}

/** Write side of the [[FileBusSource]] connector — the reference's
  * producer hop (`producer/producer.py:48-73`: publish with confirm)
  * as a real DSv2 sink: `df.writeStream.format("filebus")` publishes
  * each micro-batch's partitions as confirmed bus segments, and
  * `df.write.format("filebus")` appends a batch.
  *
  * Two-phase protocol, file-per-segment atomicity: executors write
  * payloads to INVISIBLE tmp files (unique per task attempt — a
  * speculative twin can never collide) and report them in their
  * commit message; the driver's commit renames each into its
  * confirmed segment. The publisher-confirm unit is one segment file,
  * so a crash mid-commit publishes a PREFIX of the epoch's segments,
  * never a torn segment.
  *
  * Exactly-once on epoch replay: streaming segment ids are
  * DETERMINISTIC — `(epochId << 16) | partitionId` — and commit
  * SKIPS a segment that already exists, so a replayed epoch (crash
  * after some renames, or after the engine wrote offsets but not its
  * commit log) re-publishes nothing. This is the FileStreamSink
  * contract: idempotence assumes the replayed epoch recomputes the
  * same partitioned content (deterministic query), the standard
  * assumption for every file-granularity exactly-once sink. Batch
  * appends instead take fresh ids past the current maximum at
  * driver-commit time (single-point, no coordination) — retrying a
  * FAILED batch job is a new append, i.e. INSERT semantics.
  *
  * Input contract: exactly one STRING column (the payload line —
  * callers pack structure with `to_json(struct(...))`, the envelope
  * discipline q283 reads back). Line framing is the bus's: embedded
  * newlines are rejected at write time, not corrupted at read time.
  */
object FileBusSink {
  def validateSchema(schema: StructType): Unit =
    require(schema.fields.length == 1 &&
            schema.fields(0).dataType == StringType,
      s"filebus sink expects exactly one STRING payload column, got $schema")

  def newWriteBuilder(root: String, info: LogicalWriteInfo): WriteBuilder = {
    validateSchema(info.schema())
    new WriteBuilder {
      override def build(): Write = new Write {
        override def toBatch: BatchWrite = new FileBusBatchWrite(root)
        override def toStreaming: StreamingWrite = new FileBusStreamingWrite(root)
      }
    }
  }

  private[streaming] def msgsDir(root: String): Path = {
    val d = Paths.get(root, "msgs")
    Files.createDirectories(d)
    d
  }

  /** Driver-side: rename a tmp into `seg`. A pre-existing segment is
    * accepted as an idempotent replay ONLY when its bytes match the
    * tmp's — a content MISMATCH means a genuine collision (two
    * streaming queries sharing one bus root land on the same
    * `(epochId << 16) | partitionId`, or a non-deterministic query
    * replayed an epoch with different rows) and MUST fail loudly:
    * silently dropping the tmp would discard the loser's batch.
    * Confirmed ids also advance the bus's persistent high-water mark
    * so batch-append allocation can never collide with a streaming
    * epoch id, live or pruned.
    */
  private[streaming] def confirm(root: String, tmp: String, seg: Long): Boolean = {
    val target = FileBus.segFile(root, seg)
    val src = Paths.get(tmp)
    val fresh =
      if (Files.exists(target)) {
        val same = Files.size(target) == Files.size(src) &&
          java.util.Arrays.equals(Files.readAllBytes(target), Files.readAllBytes(src))
        if (!same) throw new IllegalStateException(
          s"filebus segment $seg at $root already exists with DIFFERENT content — " +
            "either two queries share one bus root (give each its own root or " +
            "distinct epoch namespaces) or a replayed epoch recomputed different " +
            "rows (the exactly-once contract requires a deterministic query); " +
            "refusing to silently discard the new batch")
        Files.deleteIfExists(src)
        false
      } else {
        Files.move(src, target, StandardCopyOption.ATOMIC_MOVE)
        FileBus.bytesPublished.addAndGet(Files.size(target))
        true
      }
    FileBus.bumpHighWater(root, seg + 1)
    fresh
  }

  private[streaming] def dropTmps(msgs: Array[WriterCommitMessage]): Unit =
    msgs.foreach {
      case FileBusCommit(tmp, _, _) => Files.deleteIfExists(Paths.get(tmp))
      case _                        => ()
    }
}

/** One partition's pending segment: the invisible tmp file plus its
  * coordinates. `rows == 0` carries no tmp (empty partitions publish
  * nothing — the bus rejects empty segments by contract).
  */
final case class FileBusCommit(tmp: String, partitionId: Int, rows: Long)
    extends WriterCommitMessage

/** Serializable factories (shipped to executors; a writer factory must
  * not drag the driver-side Write object along).
  */
final case class FileBusStreamingWriterFactory(root: String)
    extends StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long,
                            epochId: Long): DataWriter[InternalRow] =
    new FileBusDataWriter(root, partitionId, s"$taskId-$epochId")
}

final case class FileBusBatchWriterFactory(root: String)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new FileBusDataWriter(root, partitionId, s"batch-$taskId")
}

final class FileBusStreamingWrite(root: String) extends StreamingWrite {
  override def createStreamingWriterFactory(info: PhysicalWriteInfo): StreamingDataWriterFactory =
    FileBusStreamingWriterFactory(root)

  override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
    require(epochId >= 0 && epochId < (1L << 47), s"epochId $epochId out of range")
    messages.foreach {
      case FileBusCommit(tmp, pid, rows) if rows > 0 =>
        require(pid >= 0 && pid < (1 << 16), s"partitionId $pid out of range")
        FileBusSink.confirm(root, tmp, (epochId << 16) | pid.toLong)
      case _ => ()
    }
  }

  override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit =
    FileBusSink.dropTmps(messages)
}

final class FileBusBatchWrite(root: String) extends BatchWrite {
  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    FileBusBatchWriterFactory(root)

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    // fresh ids from the persistent allocator at the single driver
    // commit point (never reuses a pruned id — max(live)+1 would);
    // partition order kept for read-back determinism
    val toConfirm = messages.collect { case m: FileBusCommit if m.rows > 0 => m }
      .sortBy(_.partitionId)
    if (toConfirm.nonEmpty) {
      val base = FileBus.allocate(root, toConfirm.length)
      toConfirm.zipWithIndex
        .foreach { case (m, i) => FileBusSink.confirm(root, m.tmp, base + i) }
    }
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit =
    FileBusSink.dropTmps(messages)
}

/** Executor-side payload writer: spills lines straight to the tmp
  * file (no row buffering — a segment can exceed executor memory).
  */
final class FileBusDataWriter(root: String, partitionId: Int, attemptTag: String)
    extends DataWriter[InternalRow] {
  private val tmp = FileBusSink.msgsDir(root)
    .resolve(f"pending-$partitionId%05d-$attemptTag.tmp")
  private var out: java.io.BufferedWriter = _
  private var rows = 0L

  override def write(row: InternalRow): Unit = {
    val payload = row.getUTF8String(0)
    require(payload != null, "filebus payload must not be null")
    val s = payload.toString
    // readback splits on \n, \r and \r\n (readAllLines semantics): a
    // bare carriage return would become two messages and shift every
    // later ack/settle coordinate in the segment
    require(!s.contains('\n') && !s.contains('\r'),
      "payloads are line-framed: embedded newlines/carriage returns must be escaped by the caller")
    if (out == null)
      out = Files.newBufferedWriter(tmp, UTF_8)
    if (rows > 0) out.write('\n')
    out.write(s)
    rows += 1L
  }

  override def commit(): WriterCommitMessage = {
    if (out != null) out.close()
    FileBusCommit(tmp.toString, partitionId, rows)
  }

  override def abort(): Unit = {
    if (out != null) out.close()
    Files.deleteIfExists(tmp)
  }

  override def close(): Unit = ()
}
