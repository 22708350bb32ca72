package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Schemas

/** Deterministic workload simulator — the Spark twin of the reference's
  * data_simulation.py (SURVEY.md §2 S8): a seeded CDC stream of
  * insert/update/delete envelopes in the reference's 50/30/20 mix over
  * a bounded document-id space, with updates touching only
  * watched_seconds + timestamp (data_simulation.py:58-64) and the
  * 0 <= watched <= duration invariant (:28,33).
  *
  * Determinism: rand(seed) in Spark depends on the partitioning, so
  * the range is pinned to a fixed partition count — same output on any
  * cluster size.
  */
object Workload {

  /** Uniform [0,1) draw derived deterministically from the sequence
    * number — usable in STREAMING plans (rand() is per-execution
    * nondeterministic there) and identical in batch, so the streaming
    * and batch twins of a workload agree row-for-row.
    */
  private def u(seqCol: Column, salt: Int): Column =
    pmod(xxhash64(seqCol, lit(salt)), lit(1000000L)).cast("double") / 1e6

  /** Deterministic envelope derivation from a `seq` column: the
    * hash-uniform twin of `cdcEnvelopes`, shared by the batch and
    * rate-source paths. Same mix/invariants as data_simulation.py.
    */
  def envelopesFromSeq(df: DataFrame, nDocs: Int): DataFrame = {
    val seq = col("seq")
    def r(i: Int) = u(seq, i)
    val opRoll = r(0)
    val duration = (floor(r(1) * 3541) + 60).cast("int")   // [60, 3600]
    val watched = floor(r(2) * (duration + 1)).cast("int") // [0, duration]
    val docId = floor(r(3) * nDocs).cast("long")
    val eventTime = timestamp_millis(lit(1700000000000L) + seq * 1000)
    val doc = struct(
      concat(lit("video_"), (floor(r(4) * 90000) + 10000).cast("long")).as("video_id"),
      concat(lit("session_"), (floor(r(5) * 900000) + 100000).cast("long")).as("session_id"),
      watched.as("watched_seconds"),
      duration.as("video_duration_seconds"),
      date_format(eventTime, "yyyy-MM-dd'T'HH:mm:ss'Z'").as("timestamp"),
      element_at(array(Schemas.deviceTypes.map(lit): _*),
        (floor(r(6) * Schemas.deviceTypes.size) + 1).cast("int")).as("device_type"),
      element_at(array(Schemas.qualities.map(lit): _*),
        (floor(r(7) * Schemas.qualities.size) + 1).cast("int")).as("quality"))
    df.select(
      when(opRoll < 0.5, "insert").when(opRoll < 0.8, "update")
        .otherwise("delete").as("operation"),
      concat(lit("doc_"), docId).as("document_id"),
      date_format(eventTime, "yyyy-MM-dd'T'HH:mm:ss'Z'").as("timestamp"),
      seq,
      eventTime.as("event_time"),
      when(opRoll < 0.8, doc).as("data")) // delete carries data = NULL
  }

  /** Queue-shaped unbounded CDC source (the S4 analogy the file-drop
    * stream can't fully play): Spark's `rate-micro-batch` source is
    * the queue stand-in — monotonically increasing offsets (`value` =
    * the queue's sequence number), per-batch admission control
    * (`rowsPerBatch` = consumer prefetch), and checkpointed offsets as
    * the resume token / ack cursor (consumer/consumer.py:12-19's
    * blocking consume + manual ack). Envelope content is a pure
    * deterministic function of the offset, so delivered prefixes are
    * reproducible and the stream twin can be cross-checked against the
    * batch generator row-for-row.
    */
  def cdcEnvelopeStream(spark: SparkSession, rowsPerBatch: Int,
                        nDocs: Int = 40): DataFrame =
    envelopesFromSeq(
      spark.readStream.format("rate-micro-batch")
        .option("rowsPerBatch", rowsPerBatch)
        .option("startTimestamp", 0L)
        .load()
        .select(col("value").as("seq")),
      nDocs)

  /** n CDC operations over a space of nDocs documents. */
  def cdcEnvelopes(spark: SparkSession, n: Long, nDocs: Int,
                   seed: Long = 42L): DataFrame = {
    // Materialize every random draw in its own projection FIRST: a
    // Rand expression copy inside a conditional branch advances its
    // RNG only when the branch evaluates, silently desyncing from
    // copies evaluated every row. Attributes of a separate Project
    // are evaluated exactly once (CollapseProject never inlines
    // non-deterministic expressions).
    val base = spark.range(0, n, 1, numPartitions = 4).toDF("seq")
      .select(col("seq") +: (0 to 7).map(i => rand(seed + i).as(s"r$i")): _*)
    def r(salt: Int) = col(s"r$salt")
    val opRoll = r(0)
    val duration = (floor(r(1) * 3541) + 60).cast("int")  // [60, 3600]
    val watched = floor(r(2) * (duration + 1)).cast("int") // [0, duration]
    val docId = floor(r(3) * nDocs).cast("long")
    val eventTime = timestamp_millis(lit(1700000000000L) + col("seq") * 1000)
    val doc = struct(
      concat(lit("video_"), (floor(r(4) * 90000) + 10000).cast("long")).as("video_id"),
      concat(lit("session_"), (floor(r(5) * 900000) + 100000).cast("long")).as("session_id"),
      watched.as("watched_seconds"),
      duration.as("video_duration_seconds"),
      date_format(eventTime, "yyyy-MM-dd'T'HH:mm:ss'Z'").as("timestamp"),
      element_at(array(Schemas.deviceTypes.map(lit): _*),
        (floor(r(6) * Schemas.deviceTypes.size) + 1).cast("int")).as("device_type"),
      element_at(array(Schemas.qualities.map(lit): _*),
        (floor(r(7) * Schemas.qualities.size) + 1).cast("int")).as("quality"))
    base.select(
      when(opRoll < 0.5, "insert").when(opRoll < 0.8, "update")
        .otherwise("delete").as("operation"),
      concat(lit("doc_"), docId).as("document_id"),
      date_format(eventTime, "yyyy-MM-dd'T'HH:mm:ss'Z'").as("timestamp"),
      col("seq"),
      eventTime.as("event_time"),
      when(opRoll < 0.8, doc).as("data")) // delete carries data = NULL
  }
}
