package graft.streaming

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import scala.collection.mutable
import scala.jdk.CollectionConverters._

/** Durable file-backed message bus with AMQP-style delivery semantics —
  * the reference's RabbitMQ hop made REAL instead of modeled: publish
  * with publisher confirm (producer/producer.py:48-73), consume with
  * MANUAL per-message ack (consumer/consumer.py:12-19, auto_ack absent),
  * nack-with-requeue, bounded redelivery, and a dead-letter queue for
  * poison messages (the x-dead-letter-exchange contract).
  *
  * Storage model — segments, not file-per-message: publishers flush
  * BATCHES as append-only segment files (`seg-<n>.jsonl`, written tmp
  * then atomically renamed — the rename IS the publisher confirm: a
  * crash mid-write leaves only an invisible tmp file, never a
  * half-published batch). Per-message delivery state lives in ONE
  * settle-map file per (consumer group, segment)
  * (`state/<group>/seg-<n>.state`), also rewritten tmp+rename, holding
  * each in-flight/settled message's attempt count, lease deadline and
  * terminal status. This is the high-throughput broker shape: per-
  * message acks amortized into a per-segment settle map, O(segments)
  * files total rather than O(messages).
  *
  * Delivery contract (at-least-once, exactly the reference's):
  *  - a consumed message is LEASED until `visibilityMs` elapses; ack
  *    before the deadline settles it forever (idempotent);
  *  - a consumer crash between downstream commit and ack leaves the
  *    lease to expire, and the message REDELIVERS with `redelivered =
  *    true` and a bumped attempt count — downstream must dedup by
  *    algebra (LWW upsert), never by assuming exactly-once transport;
  *  - `nack(requeue = true)` clears the lease for immediate
  *    redelivery; after `maxDeliveries` attempts the message dead-
  *    letters instead (status recorded in the settle map, payload
  *    readable via [[deadLetters]]) so a poison message can never
  *    wedge the queue.
  *
  * Time is a PARAMETER (`nowMs`) — the bus has no wall clock, so
  * gates drive lease expiry deterministically and a production caller
  * passes `System.currentTimeMillis`.
  *
  * Scale-out model: the SEGMENT is the parallelism unit. Concurrent
  * consumers in one group partition segments by hash (the Kafka
  * partition-ownership model) rather than contending on shared settle
  * maps; within a segment, claims are single-writer. At 100 TB the
  * bus is a thin durable buffer in front of the streaming engine —
  * segment files are also directly readable as a Spark JSON-lines
  * source for backfill, so the queue never becomes the only copy of
  * history.
  */
final class FileBus(root: String, visibilityMs: Long, maxDeliveries: Int) {
  require(visibilityMs > 0, "visibilityMs must be positive")
  require(maxDeliveries >= 1, "maxDeliveries must be >= 1")

  import FileBus.jvmLock

  private val msgsDir = Paths.get(root, "msgs")
  private val stateRoot = Paths.get(root, "state")
  Files.createDirectories(msgsDir)
  Files.createDirectories(stateRoot)

  import FileBus.Delivery

  // ------------------------------------------------------------ publish

  private def segPath(n: Long): Path = msgsDir.resolve(f"seg-$n%06d.jsonl")

  private def listSegments(): Seq[Long] =
    Files.list(msgsDir).iterator().asScala
      .map(_.getFileName.toString)
      .collect { case s if s.startsWith("seg-") && s.endsWith(".jsonl") =>
        s.stripPrefix("seg-").stripSuffix(".jsonl").toLong }
      .toSeq.sorted

  /** Publish a batch as one durable segment under a CALLER-CHOSEN id —
    * the coordination-free path for distributed producers (segment id =
    * a unique producer/task id, the Kafka producer-partition file
    * model; Spark callers pass `TaskContext.getPartitionId`). The
    * atomic rename is the publisher confirm — after this returns, the
    * batch survives any crash; a crash mid-write leaves only an
    * invisible tmp file. Publishing an already-existing segment id is
    * an error, never a silent overwrite.
    */
  def publish(payloads: Seq[String], segId: Long): Long = jvmLock.synchronized {
    require(payloads.nonEmpty, "empty publish batch")
    // readback splits on \n, \r and \r\n (readAllLines semantics): a
    // bare carriage return would silently become two messages and
    // shift every later index's ack/settle coordinates
    require(payloads.forall(p => !p.contains('\n') && !p.contains('\r')),
      "payloads are line-framed: embedded newlines/carriage returns must be escaped by the caller")
    require(!Files.exists(segPath(segId)), s"segment $segId already published")
    val tmp = msgsDir.resolve(f"seg-$segId%06d.tmp")
    Files.write(tmp, payloads.mkString("\n").getBytes(UTF_8))
    Files.move(tmp, segPath(segId), StandardCopyOption.ATOMIC_MOVE)
    FileBus.bytesPublished.addAndGet(Files.size(segPath(segId)))
    FileBus.bumpHighWater(root, segId + 1)
    segId
  }

  /** Single-producer convenience: next sequential segment id — drawn
    * from the persistent allocator, so an id is NEVER reused after
    * retention pruned the highest segments (a reused id would sit in a
    * connector's committed offset set and its new messages would
    * silently never deliver).
    */
  def publishNext(payloads: Seq[String]): Long = jvmLock.synchronized {
    publish(payloads, FileBus.allocate(root, 1))
  }

  // ------------------------------------------------------- settle maps

  /** Per-message delivery state inside one (group, segment) settle map.
    * status: 0 = open, 1 = acked, 2 = dead-lettered.
    */
  private final case class MsgState(status: Int, attempt: Int, deadlineMs: Long)

  private def statePath(group: String, seg: Long): Path = {
    require(group.matches("[A-Za-z0-9_-]+"), s"bad group name '$group'")
    stateRoot.resolve(group).resolve(f"seg-$seg%06d.state")
  }

  /** Settle map + the segment's total line count (the `#n=` header,
    * recorded on first write so [[depth]] and deliverability scans
    * never have to re-read the payload file just to count it).
    */
  private def readStateN(group: String, seg: Long): (Option[Int], mutable.Map[Int, MsgState]) = {
    val p = statePath(group, seg)
    val m = mutable.Map.empty[Int, MsgState]
    var n: Option[Int] = None
    if (Files.exists(p)) {
      // manual field parse (same format): the split-based form
      // allocated an array + four substrings per line, and settle maps
      // are the bus's driver-side hot path — q282 rewrites ~100k-line
      // maps several times per pass at sf0.1
      Files.readAllLines(p, UTF_8).asScala.foreach { ln =>
        if (ln.isEmpty) ()
        else if (ln.startsWith("#n=")) n = Some(ln.substring(3).toInt)
        else {
          val s1 = ln.indexOf(' ')
          val s2 = ln.indexOf(' ', s1 + 1)
          val s3 = ln.indexOf(' ', s2 + 1)
          m(java.lang.Integer.parseInt(ln, 0, s1, 10)) = MsgState(
            java.lang.Integer.parseInt(ln, s1 + 1, s2, 10),
            java.lang.Integer.parseInt(ln, s2 + 1, s3, 10),
            java.lang.Long.parseLong(ln, s3 + 1, ln.length, 10))
        }
      }
    }
    (n, m)
  }

  private def readState(group: String, seg: Long): mutable.Map[Int, MsgState] =
    readStateN(group, seg)._2

  private def writeState(group: String, seg: Long,
                         m: mutable.Map[Int, MsgState],
                         nLines: Option[Int] = None): Unit = {
    val p = statePath(group, seg)
    Files.createDirectories(p.getParent)
    val tmp = p.getParent.resolve(p.getFileName.toString + ".tmp")
    val sb = new java.lang.StringBuilder(m.size * 24 + 16)
    nLines.foreach(n => sb.append("#n=").append(n).append('\n'))
    // ascending-index emit without the tupled sortBy (same bytes): the
    // key domain is 0..max segment index, so an index scan over the
    // map is O(n) with zero boxing — measured on the q282 hot path
    if (m.nonEmpty) {
      val maxIdx = m.keysIterator.max
      var i = 0
      while (i <= maxIdx) {
        val s = m.getOrElse(i, null)
        if (s != null)
          sb.append(i).append(' ').append(s.status).append(' ')
            .append(s.attempt).append(' ').append(s.deadlineMs).append('\n')
        i += 1
      }
    }
    Files.write(tmp, sb.toString.getBytes(UTF_8))
    Files.move(tmp, p, StandardCopyOption.ATOMIC_MOVE)
  }

  // IndexedSeq, deliberately: consumeFiltered's delivery loop does
  // `lines(i)` and `lines.length` per message, and `Buffer.toSeq`
  // builds a LIST — O(i) per access, O(n^2) per segment. Invisible at
  // the sf0.01 gate (~1k-line segments); at the synthesized sf1 tier
  // one consume burned 16 CPU-minutes in List.drop before the round-15
  // full-sf1 sweep caught it mid-loop (jstack: LinearSeqOps.apply).
  private def segLines(seg: Long): IndexedSeq[String] =
    Files.readAllLines(segPath(seg), UTF_8).asScala.toIndexedSeq

  // ------------------------------------------------------------ consume

  /** Lease up to `max` deliverable messages for `group`, oldest segment
    * first (FIFO per queue, the AMQP ordering contract for a single
    * consumer). A message is deliverable iff unsettled and its lease is
    * absent or expired at `nowMs`.
    */
  def consume(group: String, max: Int, nowMs: Long): Seq[Delivery] =
    consumeFiltered(group, max, nowMs, _ => true)

  /** Settle delivered messages forever — the AMQP multiple-ack shape:
    * one settle-map rewrite per TOUCHED SEGMENT regardless of how many
    * messages settle, so a consumer acking a whole processed batch pays
    * O(segments), not O(messages), in durable writes. Idempotent;
    * acking a message that already dead-lettered is an error (the
    * consumer processed a poison message some earlier delivery gave up
    * on — a logic bug).
    */
  def ackAll(group: String, ids: Seq[(Long, Int)]): Unit = jvmLock.synchronized {
    ids.groupBy(_._1).foreach { case (seg, segIds) =>
      val (n, st) = readStateN(group, seg)
      var dirty = false
      segIds.foreach { case (_, idx) =>
        val cur = st.getOrElse(idx,
          throw new IllegalStateException(s"ack of never-delivered $seg/$idx"))
        require(cur.status != 2, s"ack of dead-lettered message $seg/$idx")
        if (cur.status != 1) { st(idx) = cur.copy(status = 1, deadlineMs = 0L); dirty = true }
      }
      if (dirty) writeState(group, seg, st, n)
    }
  }

  /** Settle one delivered message. */
  def ack(group: String, segment: Long, index: Int): Unit =
    ackAll(group, Seq((segment, index)))

  /** Reject deliveries, batched like [[ackAll]]. With `requeue` and
    * attempts left, the lease clears for immediate redelivery;
    * otherwise the message dead-letters (terminal, visible via
    * [[deadLetters]]).
    */
  def nackAll(group: String, ids: Seq[(Long, Int)],
              requeue: Boolean): Unit = jvmLock.synchronized {
    ids.groupBy(_._1).foreach { case (seg, segIds) =>
      val (n, st) = readStateN(group, seg)
      segIds.foreach { case (_, idx) =>
        val cur = st.getOrElse(idx,
          throw new IllegalStateException(s"nack of never-delivered $seg/$idx"))
        require(cur.status == 0, s"nack of settled message $seg/$idx")
        val dead = !requeue || cur.attempt >= maxDeliveries
        st(idx) =
          if (dead) cur.copy(status = 2, deadlineMs = 0L)
          else cur.copy(deadlineMs = 0L)
      }
      writeState(group, seg, st, n)
    }
  }

  /** Reject one delivery. */
  def nack(group: String, segment: Long, index: Int, requeue: Boolean): Unit =
    nackAll(group, Seq((segment, index)), requeue)

  /** Settle EVERY message of a segment for `group` in one durable
    * write — the Kafka-style offset-commit path for LOG-READ consumers
    * (the [[FileBusSource]] streaming connector reads segment files
    * directly for replayability and settles whole segments when the
    * engine's checkpoint commits, instead of leasing per message).
    * Idempotent; dead-lettered messages keep their status (the DLQ is
    * terminal — a log reader settling past a poison message does not
    * un-dead-letter it).
    */
  def commitSegment(group: String, seg: Long): Unit = jvmLock.synchronized {
    require(Files.exists(segPath(seg)), s"commit of unknown segment $seg")
    val (nOpt, st) = readStateN(group, seg)
    val n = nOpt.getOrElse(segLines(seg).length)
    var dirty = false
    (0 until n).foreach { i =>
      val cur = st.getOrElse(i, MsgState(0, 0, 0L))
      if (cur.status == 0) {
        st(i) = MsgState(1, math.max(cur.attempt, 1), 0L)
        dirty = true
      }
    }
    if (dirty) writeState(group, seg, st, Some(n))
  }

  /** Consumer scale-out: the deterministic hash-partitioned segment
    * ownership the class doc promises — consumer `consumerId` of
    * `nConsumers` in a group owns exactly the segments hashing to its
    * slot, so N concurrent consumers drain one queue with ZERO
    * coordination (no shared settle-map writes, no lock contention
    * across JVMs; within a segment, claims stay single-writer by
    * construction). Same contract as Kafka partition assignment with
    * a fixed group size; resizing the group is a coordinated
    * operation (drain, then restart consumers with the new size),
    * exactly like a Kafka consumer-group rebalance generation.
    */
  def consumeOwned(group: String, consumerId: Int, nConsumers: Int,
                   max: Int, nowMs: Long): Seq[Delivery] = {
    require(nConsumers >= 1 && consumerId >= 0 && consumerId < nConsumers,
      s"consumerId $consumerId out of range for $nConsumers consumers")
    consumeFiltered(group, max, nowMs,
      seg => FileBus.owner(seg, nConsumers) == consumerId)
  }

  private def consumeFiltered(group: String, max: Int, nowMs: Long,
                              owns: Long => Boolean): Seq[Delivery] =
    jvmLock.synchronized {
      val out = mutable.ArrayBuffer.empty[Delivery]
      val segs = listSegments().iterator.filter(owns)
      while (out.size < max && segs.hasNext) {
        val seg = segs.next()
        val (nOpt, st) = readStateN(group, seg)
        val nothingDeliverable = nOpt.exists { n =>
          st.size >= n && st.valuesIterator.forall(ms =>
            ms.status != 0 || ms.deadlineMs > nowMs)
        }
        if (!nothingDeliverable) {
          val lines = segLines(seg)
          FileBus.bytesConsumed.addAndGet(Files.size(segPath(seg)))
          var dirty = false
          var i = 0
          while (i < lines.length && out.size < max) {
            val cur = st.getOrElse(i, MsgState(0, 0, 0L))
            if (cur.status == 0 && cur.deadlineMs <= nowMs) {
              val attempt = cur.attempt + 1
              st(i) = MsgState(0, attempt, nowMs + visibilityMs)
              dirty = true
              out += Delivery(seg, i, lines(i), attempt,
                              redelivered = attempt > 1)
            }
            i += 1
          }
          if (dirty) writeState(group, seg, st, Some(lines.length))
        }
      }
      out.toSeq
    }

  /** Retention: delete every segment that EVERY listed consumer group
    * has fully settled — the compaction that keeps the log (and the
    * [[FileBusSource]] connector's set-offsets) bounded by RETAINED
    * segments at production scale. A segment with dead-lettered
    * messages is retained unless `includeDlq` (the DLQ payload lives
    * in the segment file; pruning it forfeits the poison evidence —
    * an explicit operator decision, never a side effect). Deletion
    * order is crash-safe in the at-most-once direction: the segment
    * file (the visibility switch) goes first, so a crash mid-prune
    * can never resurrect settled messages for redelivery; orphaned
    * settle maps from such a crash are swept on the next prune.
    * Returns the pruned segment ids.
    */
  def prune(groups: Seq[String], includeDlq: Boolean = false): Seq[Long] =
    jvmLock.synchronized {
      require(groups.nonEmpty, "prune needs the consumer groups that must have settled")
      val pruned = listSegments().filter { seg =>
        val n = segLines(seg).length
        groups.forall { g =>
          val st = readState(g, seg)
          st.size >= n && st.valuesIterator.forall(s =>
            s.status == 1 || (includeDlq && s.status == 2)) &&
            (0 until n).forall(st.contains)
        }
      }
      pruned.foreach { seg =>
        Files.delete(segPath(seg))
        groups.foreach(g => Files.deleteIfExists(statePath(g, seg)))
      }
      // sweep settle maps orphaned by any earlier crash mid-prune
      val live = listSegments().toSet
      if (Files.exists(stateRoot)) {
        Files.list(stateRoot).iterator().asScala.filter(Files.isDirectory(_))
          .foreach { gd =>
            Files.list(gd).iterator().asScala
              .filter { p =>
                val n = p.getFileName.toString
                n.startsWith("seg-") && n.endsWith(".state") &&
                  !live.contains(
                    n.stripPrefix("seg-").stripSuffix(".state").toLong)
              }.foreach(Files.deleteIfExists(_))
          }
      }
      pruned
    }

  // ---------------------------------------------------------- inspect

  /** Dead-lettered payloads for `group`, in (segment, index) order. */
  /** DLQ REDRIVE — the SQS/RabbitMQ redrive-policy operation: after an
    * operator fixes the downstream defect that poisoned the messages,
    * re-open every dead-lettered message for `group` with a FULL
    * retry budget (attempt count reset, the SQS receive-count-reset
    * semantics — keeping the old count would re-dead-letter on the
    * first failure and defeat the redrive; like a queue shoveled back
    * from an AMQP DLX, the delivery lifecycle restarts, so the next
    * delivery's redelivered bit reads false by design). Returns the
    * number of messages redriven.
    */
  def redrive(group: String): Long = jvmLock.synchronized {
    var n = 0L
    listSegments().foreach { seg =>
      val (nOpt, st) = readStateN(group, seg)
      var dirty = false
      st.foreach { case (i, ms) =>
        if (ms.status == 2) {
          st(i) = MsgState(0, 0, 0L)
          dirty = true; n += 1
        }
      }
      if (dirty) writeState(group, seg, st, nOpt)
    }
    n
  }

  def deadLetters(group: String): Seq[String] = jvmLock.synchronized {
    listSegments().flatMap { seg =>
      val st = readState(group, seg)
      val dead = st.toSeq.filter(_._2.status == 2).map(_._1).sorted
      if (dead.isEmpty) Nil
      else { val lines = segLines(seg); dead.map(lines) }
    }
  }

  /** Unsettled message count for `group` (leased messages included —
    * they are still owed a terminal ack/dead-letter).
    */
  def depth(group: String): Long = jvmLock.synchronized {
    listSegments().map { seg =>
      val (n, st) = readStateN(group, seg)
      val settled = st.valuesIterator.count(_.status != 0)
      n.map(_.toLong).getOrElse(segLines(seg).length.toLong) - settled
    }.sum
  }

  /** Total published message count (all segments). */
  def published(): Long = jvmLock.synchronized {
    listSegments().map(segLines(_).length.toLong).sum
  }
}

object FileBus {
  /** One delivered message. `redelivered` is the AMQP redelivered bit:
    * true iff some earlier delivery of this message was neither acked
    * nor dead-lettered.
    */
  final case class Delivery(segment: Long, index: Int, payload: String,
                            attempt: Int, redelivered: Boolean)

  /** Static path of one segment file — the log-read surface used by
    * executor-side partition readers ([[FileBusSource]]), which read
    * confirmed segments directly and never touch settle maps.
    */
  def segFile(root: String, seg: Long): Path =
    Paths.get(root, "msgs", f"seg-$seg%06d.jsonl")

  /** Confirmed segment ids under `root`, ascending. Static twin of the
    * instance listing for planner-side use (offset computation needs
    * no bus instance or lock: renames are atomic, so a listing only
    * ever sees fully-published segments).
    */
  def segments(root: String): Seq[Long] = {
    val dir = Paths.get(root, "msgs")
    if (!Files.exists(dir)) Nil
    else Files.list(dir).iterator().asScala
      .map(_.getFileName.toString)
      .collect { case s if s.startsWith("seg-") && s.endsWith(".jsonl") =>
        s.stripPrefix("seg-").stripSuffix(".jsonl").toLong }
      .toSeq.sorted
  }

  /** JVM-local bus VOLUME counters (bench instrumentation): payload
    * bytes move OUTSIDE Spark's shuffle metrics, so the bench's
    * shuffle-MB regression net cannot see a connector-side volume
    * regression (e.g. a gate suddenly re-reading segments per wave).
    * `published` counts confirmed segment bytes (publish + sink
    * confirm, fresh renames only); `consumed` counts segment bytes
    * read for delivery (lease reads + DSv2 partition readers). In
    * local mode every task shares this JVM, so the counters are
    * complete; on a real cluster the per-query aggregation is the
    * DSv2 source's ReportsSourceMetrics — these statics exist for the
    * bench artifact, not as the production metric path.
    */
  val bytesPublished = new java.util.concurrent.atomic.AtomicLong(0L)
  val bytesConsumed = new java.util.concurrent.atomic.AtomicLong(0L)

  /** Persistent segment-id allocator (`msgs/_next_seg`): the next id
    * [[allocate]] may hand out. Monotonic and NEVER reset by
    * retention — prune deletes the highest live segments, but an
    * allocated id must not regress past a pruned one: connectors'
    * committed offset sets remember consumed ids, so a reused id's
    * new messages would silently never deliver (and the sink's replay
    * detection would misread the collision as an idempotent replay).
    * Written tmp+atomic-rename like everything else on the bus.
    * Multi-driver appends to one root should prefer caller-chosen
    * unique ids ([[FileBus.publish]]); a lost allocator race between
    * two driver JVMs fails loudly at publish/confirm, never silently.
    */
  private def hwmPath(root: String): Path = Paths.get(root, "msgs", "_next_seg")

  private def readHighWater(root: String): Long = {
    val p = hwmPath(root)
    if (Files.exists(p)) new String(Files.readAllBytes(p), UTF_8).trim.toLong else 0L
  }

  private def writeHighWater(root: String, v: Long): Unit = {
    val p = hwmPath(root)
    Files.createDirectories(p.getParent)
    val tmp = p.getParent.resolve("_next_seg.tmp")
    Files.write(tmp, v.toString.getBytes(UTF_8))
    Files.move(tmp, p, StandardCopyOption.ATOMIC_MOVE)
  }

  /** Record that ids below `atLeast` are spoken for (every publish and
    * every confirmed sink segment passes through here, so allocation
    * can never collide with a caller-chosen or streaming-epoch id —
    * even after the segment itself is pruned).
    */
  private[streaming] def bumpHighWater(root: String, atLeast: Long): Unit =
    if (readHighWater(root) < atLeast) writeHighWater(root, atLeast)

  /** Allocate `n` fresh sequential segment ids (driver-side single
    * point: [[FileBus.publishNext]] and the batch sink's driver
    * commit). Returns the first id; never reuses a live OR pruned id.
    */
  private[streaming] def allocate(root: String, n: Int): Long = {
    require(n >= 1, s"allocate needs n >= 1, got $n")
    val base = math.max(readHighWater(root),
      segments(root).lastOption.map(_ + 1).getOrElse(0L))
    writeHighWater(root, base + n)
    base
  }

  /** Deterministic segment-ownership slot (spread-stable for
    * sequential AND task-id segment ids: a finalizer over the mixed
    * bits, not a plain modulo that would stripe correlated ids).
    */
  def owner(seg: Long, nConsumers: Int): Int = {
    var x = seg
    x = (x ^ (x >>> 33)) * 0xff51afd7ed558ccdL
    x = (x ^ (x >>> 33)) * 0xc4ceb9fe1a85ec53L
    x ^= (x >>> 33)
    (((x % nConsumers) + nConsumers) % nConsumers).toInt
  }

  /** One lock per JVM, shared by every instance: local-mode Spark runs
    * all producer/consumer tasks in one JVM, where instances over the
    * same root must serialize settle-map read-modify-write cycles.
    * Cross-JVM deployments serialize by OWNERSHIP instead — unique
    * producer segment ids and hash-partitioned segment ownership per
    * consumer — never by file locking.
    *
    * HARD CONTRACT: consumers of ONE group in DIFFERENT JVMs MUST
    * partition segments by ownership ([[FileBus!.consumeOwned]]); the
    * lock cannot reach across processes, so two JVMs touching the same
    * (group, segment) settle map interleave its tmp+rename rewrite
    * last-writer-wins. The failure mode is bounded — a lost lease/ack
    * record means EXTRA REDELIVERY, never message loss (at-least-once
    * holds; LWW/idempotent downstreams absorb it; a lost dead-letter
    * record re-runs the delivery lifecycle) — but it burns attempts
    * and redelivers settled work, so it is a misuse, not a mode.
    */
  private val jvmLock = new Object
}
