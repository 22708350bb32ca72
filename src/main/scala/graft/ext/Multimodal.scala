package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column support: image/audio/video payloads ride as opaque
  * `binary` columns next to typed metadata, exactly like a training-data
  * lake would store them (payload + schema'd features).
  *
  * The Spark-side plumbing — schema, batched per-partition processing,
  * deterministic partitioning — is real and tested; the actual codec
  * call is STUBBED (no image/audio libraries in this container) behind
  * `decodePayloadStub`, which derives deterministic fake features from
  * the bytes so tests have stable expectations. Swap `decodePayloadStub`
  * for a real codec (JNI/javacv) without touching the plumbing.
  */
object Multimodal {

  case class MediaRecord(doc_id: Long, modality: String, payload: Array[Byte])
  case class MediaFeatures(doc_id: Long, modality: String, n_bytes: Long,
                           width: Long, height: Long, n_frames: Long,
                           sample_rate: Long)

  /** Synthesize a media table from `documents`: payload = utf-8 bytes
    * of the text (a stand-in blob), modality round-robins by id.
    */
  def mediaFromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      when(pmod(col("doc_id"), lit(3)) === 0, "image")
        .when(pmod(col("doc_id"), lit(3)) === 1, "audio")
        .otherwise("video").as("modality"),
      encode(col("text"), "UTF-8").as("payload"))

  /** STUB decode: deterministic pseudo-features from payload length.
    * A real implementation would decode the codec here (this is the
    * only line that changes); everything around it — batching,
    * iterator shape, output schema — is the production plumbing.
    */
  def decodePayloadStub(modality: String, payload: Array[Byte]): (Long, Long, Long, Long) = {
    val n = payload.length.toLong
    modality match {
      case "image" => (16 + n % 640, 16 + (n / 7) % 480, 1L, 0L)
      case "audio" => (0L, 0L, 0L, 8000 + (n % 5) * 8000)
      case _       => (16 + n % 640, 16 + (n / 7) % 480, 1 + n % 16, 0L)
    }
  }

  /** Batched per-partition feature extraction — the Scala analog of a
    * pandas-UDF `mapInPandas`: payloads are processed in batches of
    * `batchSize` inside each partition (a real codec would amortize
    * per-batch setup), never collected to the driver.
    */
  def extractFeatures(media: Dataset[MediaRecord], batchSize: Int = 64)
                     (implicit spark: SparkSession): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // per-batch setup for a real codec would go here
        batch.iterator.map { m =>
          val (w, h, fr, sr) = decodePayloadStub(m.modality, m.payload)
          MediaFeatures(m.doc_id, m.modality, m.payload.length.toLong, w, h, fr, sr)
        }
      }
    }
  }

  case class PayloadStats(doc_id: Long, modality: String, n_bytes: Long,
                          n_distinct: Long, entropy_mbits: Long, max_run: Long)

  /** REAL (non-stub) byte-level content analysis — the features a lake
    * computes before any codec is involved: Shannon entropy (in
    * milli-bits/byte, integer for exact cross-run compares), distinct
    * byte count, longest byte run. Used for corruption screens
    * (entropy ~8000 = compressed/encrypted, ~0 = padding) and cheap
    * dedup pre-filters. Same batched mapPartitions shape as
    * extractFeatures.
    */
  def payloadStats(media: Dataset[MediaRecord])
                  (implicit spark: SparkSession): Dataset[PayloadStats] = {
    import spark.implicits._
    media.mapPartitions { it =>
      val hist = new Array[Long](256)
      it.map { m =>
        java.util.Arrays.fill(hist, 0L)
        val bytes = m.payload
        var i = 0
        var maxRun = 0L; var run = 0L; var prev = -1
        while (i < bytes.length) {
          val b = bytes(i) & 0xff
          hist(b) += 1
          if (b == prev) run += 1 else { prev = b; run = 1 }
          if (run > maxRun) maxRun = run
          i += 1
        }
        val n = bytes.length.toDouble
        var distinct = 0L; var h = 0.0
        var j = 0
        while (j < 256) {
          if (hist(j) > 0) {
            distinct += 1
            val p = hist(j) / n
            h -= p * (math.log(p) / math.log(2.0))
          }
          j += 1
        }
        PayloadStats(m.doc_id, m.modality, bytes.length.toLong, distinct,
          if (bytes.length == 0) 0L else math.round(h * 1000), maxRun)
      }
    }
  }

  /** Column-expression twin of the stub decode (portable to the DuckDB
    * oracle): same arithmetic over octet_length.
    */
  def featuresExpr(media: DataFrame): DataFrame =
    media
      .withColumn("n_bytes", octet_length(col("payload")).cast("long"))
      .withColumn("width",
        when(col("modality") === "audio", 0L)
          .otherwise(lit(16) + pmod(col("n_bytes"), lit(640))))
      .withColumn("height",
        when(col("modality") === "audio", 0L)
          .otherwise(lit(16) + pmod(expr("n_bytes div 7"), lit(480))))
      .withColumn("n_frames",
        when(col("modality") === "image", 1L)
          .when(col("modality") === "audio", 0L)
          .otherwise(lit(1) + pmod(col("n_bytes"), lit(16))))
      .withColumn("sample_rate",
        when(col("modality") === "audio",
          lit(8000) + pmod(col("n_bytes"), lit(5)) * 8000).otherwise(0L))
      .select(col("doc_id"), col("modality"), col("n_bytes"),
              col("width").cast("long"), col("height").cast("long"),
              col("n_frames").cast("long"), col("sample_rate").cast("long"))
}
