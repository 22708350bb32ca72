package graft.core

import org.apache.spark.sql.types._

/** Typed schemas for the reference's three data layers (SURVEY.md §1.2):
  * source document, CDC envelope, warehouse row. Case classes give
  * Dataset[T] type safety; StructTypes are the explicit wire contracts
  * (the reference enforces schema nowhere — we enforce it at the edges).
  */
object Schemas {

  /** (a) Source video-watch document (producer/db/data_simulation.py:26-37). */
  case class SourceDoc(
      video_id: String,
      session_id: String,
      watched_seconds: Int,
      video_duration_seconds: Int,
      timestamp: String, // ISO-8601 with trailing Z, as produced upstream
      device_type: String,
      quality: String)

  /** (b) CDC envelope (producer/producer.py:57-62); data is None for
    * deletes (:61).
    */
  case class ChangeEnvelope(
      operation: String,
      document_id: String,
      timestamp: String,
      data: Option[SourceDoc])

  /** (c) Warehouse row (clickhouse/init.sql:8-24). original_timestamp
    * stays a string for reference fidelity; event_time is the proper
    * TimestampType kept alongside so LWW ordering never parses strings
    * (SURVEY.md §7 trap 5).
    */
  case class VideoLogRow(
      original_id: String,
      original_timestamp: String,
      event_time: java.sql.Timestamp,
      video_id: String,
      session_id: String,
      watched_seconds: Int,
      video_duration_seconds: Int,
      watched_ratio: Double,
      device_type: String,
      quality: String,
      ingestion_time: java.sql.Timestamp,
      is_deleted: Boolean)

  val deviceTypes: Seq[String] = Seq("mobile", "desktop", "tablet", "smart_tv")
  val qualities: Seq[String] = Seq("360p", "480p", "720p", "1080p", "4k")

  val sourceDocSchema: StructType = StructType(Seq(
    StructField("video_id", StringType, nullable = false),
    StructField("session_id", StringType, nullable = false),
    StructField("watched_seconds", IntegerType, nullable = false),
    StructField("video_duration_seconds", IntegerType, nullable = false),
    StructField("timestamp", StringType, nullable = false),
    StructField("device_type", StringType, nullable = false),
    StructField("quality", StringType, nullable = false)))

  val envelopeSchema: StructType = StructType(Seq(
    StructField("operation", StringType, nullable = false),
    StructField("document_id", StringType, nullable = false),
    StructField("timestamp", StringType, nullable = false),
    StructField("data", sourceDocSchema, nullable = true)))
}
