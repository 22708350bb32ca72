package graft.queries

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.core.Tables

/** Source/sink format coverage beyond parquet: ORC and CSV round-trips
  * gated against the base-table oracle. The round trip itself is what's
  * under test — the formats must preserve values exactly, so the
  * post-roundtrip aggregate must hash-match the oracle computed on the
  * original table. Float discipline: doubles survive ORC natively and
  * CSV via Spark's shortest-round-trip rendering, but SUMS of doubles
  * are order-dependent — aggregates use count/min/max and an exact
  * integer checksum (floor(value*1000) as BIGINT) instead.
  */
object SourceQueries {

  // ---------------------------------------------------------------- q96
  def q96OrcRoundtrip(s: SparkSession, d: String): DataFrame = {
    val dir = graft.core.TempDirs.scoped("graft_q96_") + "/orc"
    Tables.events(s, d)
      .select(col("event_id"), col("user_id"), col("value"), col("event_type"))
      .write.orc(dir)
    s.read.orc(dir)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
           min(col("value")).as("vmin"),
           max(col("value")).as("vmax"),
           sum(floor(col("value") * 1000).cast("long")).as("vchk"))
  }

  val q96Sql: String =
    """SELECT event_type, CAST(count(*) AS BIGINT) AS n,
      |  min(value) AS vmin, max(value) AS vmax,
      |  CAST(sum(CAST(floor(value * 1000) AS BIGINT)) AS BIGINT) AS vchk
      |FROM events GROUP BY event_type""".stripMargin

  // ---------------------------------------------------------------- q97
  /** CSV with an explicit schema (header tolerated, never used for
    * typing — the `Ingest.flatCsv` contract).
    */
  def q97CsvRoundtrip(s: SparkSession, d: String): DataFrame = {
    val dir = graft.core.TempDirs.scoped("graft_q97_") + "/csv"
    Tables.events(s, d)
      .select(col("event_id"), col("user_id"), col("event_type"))
      .write.option("header", "true").csv(dir)
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("user_id", LongType),
      StructField("event_type", StringType)))
    graft.sources.Ingest.flatCsv(s, dir, schema)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("user_id")).as("uid_sum"),
           min(col("event_id")).as("id_min"), max(col("event_id")).as("id_max"))
  }

  val q97Sql: String =
    """SELECT event_type, CAST(count(*) AS BIGINT) AS n,
      |  CAST(sum(user_id) AS BIGINT) AS uid_sum,
      |  min(event_id) AS id_min, max(event_id) AS id_max
      |FROM events GROUP BY event_type""".stripMargin

  // ---------------------------------------------------------------- q102
  /** Avro round-trip — the remaining wire format from the reference's
    * dependency set (consumer/requirements.txt:13, a transitive Beam
    * dep; Spark 4 bundles the avro source in spark-sql). Avro has no
    * native timestamp-nanos or unsigned types, so the projected
    * columns are the long/double/string core; exactness discipline is
    * q96's (integer checksum, never a double sum).
    */
  /** The full Avro reader/writer ships inside spark-sql; only the
    * "avro" short-name registration lives in the separate spark-avro
    * artifact, so the format is addressed by class name.
    */
  private val AvroFormat = "org.apache.spark.sql.avro.AvroFileFormat"

  def q102AvroRoundtrip(s: SparkSession, d: String): DataFrame = {
    val dir = graft.core.TempDirs.scoped("graft_q102_") + "/avro"
    Tables.events(s, d)
      .select(col("event_id"), col("user_id"), col("value"), col("event_type"))
      .write.format(AvroFormat).save(dir)
    s.read.format(AvroFormat).load(dir)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
           min(col("value")).as("vmin"),
           max(col("value")).as("vmax"),
           sum(floor(col("value") * 1000).cast("long")).as("vchk"),
           sum(col("user_id")).as("uid_sum"))
  }

  val q102Sql: String =
    """SELECT event_type, CAST(count(*) AS BIGINT) AS n,
      |  min(value) AS vmin, max(value) AS vmax,
      |  CAST(sum(CAST(floor(value * 1000) AS BIGINT)) AS BIGINT) AS vchk,
      |  CAST(sum(user_id) AS BIGINT) AS uid_sum
      |FROM events GROUP BY event_type""".stripMargin

  // ---------------------------------------------------------------- q111
  /** Bucketed co-located join: both sides written as bucketed tables on
    * the join key (same bucket count), then joined and aggregated on
    * that key — the whole plan runs with ZERO shuffle exchanges
    * (PlanSpec-locked). This is the storage-layout lever that matters
    * most at 100 TB: a fact-fact join whose shuffle is paid ONCE at
    * write time and amortized over every subsequent join/aggregate on
    * the bucket key, instead of re-shuffling both sides per query.
    *
    * Float discipline: l_extendedprice carries 2 decimals, so
    * round(sum, 2) recovers the exact 2-decimal total on both engines;
    * l_quantity is integral-valued, its double sum is exact.
    */
  // q111 returns a LAZY plan over its bucketed tables (PlanSpec asserts
  // the zero-exchange shape on it), so cleanup can't happen before the
  // caller materializes. Instead each invocation sweeps the PREVIOUS
  // invocation's tables + temp dir (bounding in-session accumulation to
  // one live set across bench min-of-3 / verify reruns), and a shutdown
  // hook deletes the last dir on JVM exit (the in-memory catalog dies
  // with the JVM; only the on-disk parquet would otherwise outlive it).
  private val q111Live =
    new java.util.concurrent.atomic.AtomicReference[(Seq[String], String)](null)

  private def deleteRecursively(path: String): Unit = {
    val root = new java.io.File(path)
    def loop(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(loop))
      f.delete(); ()
    }
    if (root.exists()) loop(root)
  }

  private lazy val q111ShutdownHook: Unit =
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      Option(q111Live.get()).foreach { case (_, dir) => deleteRecursively(dir) }))

  private def q111Sweep(s: SparkSession, replaceWith: (Seq[String], String)): Unit = {
    q111ShutdownHook
    Option(q111Live.getAndSet(replaceWith)).foreach { case (tables, dir) =>
      tables.foreach(t => s.sql(s"DROP TABLE IF EXISTS `$t`"))
      deleteRecursively(dir)
    }
  }

  def q111BucketedJoin(s: SparkSession, d: String): DataFrame = {
    val base = graft.core.TempDirs.scoped("graft_q111_")
    // per-run table names: a fixed name would race concurrent sessions
    // and leave each rerun's DROP orphaning the previous temp dir's
    // data while reusing the catalog entry
    val tag = java.util.UUID.randomUUID.toString.replace("-", "").take(8)
    q111Sweep(s, (Seq(s"graft_q111_orders_$tag", s"graft_q111_lineitem_$tag"), base))
    def bucketed(df: DataFrame, table: String, key: String): DataFrame = {
      df.write.format("parquet").option("path", s"$base/$table")
        .bucketBy(8, key).sortBy(key)
        .saveAsTable(table)
      s.table(table)
    }
    val o = bucketed(Tables.orders(s, d).select("o_orderkey", "o_orderpriority", "o_totalprice"),
                     s"graft_q111_orders_$tag", "o_orderkey")
    val l = bucketed(Tables.lineitem(s, d).select("l_orderkey", "l_quantity", "l_extendedprice"),
                     s"graft_q111_lineitem_$tag", "l_orderkey")
    o.join(l, col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_orderkey"))
      .agg(count(lit(1)).as("n_items"),
           sum(col("l_quantity")).as("sum_qty"),
           round(sum(col("l_extendedprice")), 2).as("revenue"))
  }

  val q111Sql: String =
    """SELECT o_orderkey, CAST(count(*) AS BIGINT) AS n_items,
      |  sum(l_quantity) AS sum_qty,
      |  round(sum(l_extendedprice), 2) AS revenue
      |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      |GROUP BY o_orderkey""".stripMargin

  // ---------------------------------------------------------------- q167
  /** `binaryFile` source — Spark's bulk raw-asset ingestion path (how a
    * directory of images/audio enters the lake before any decode): one
    * row per file with (path, modificationTime, length, content),
    * split across tasks by `maxPartitionBytes` like any file scan. The
    * gate materializes each document's UTF-8 bytes as an individual
    * blob file (written EXECUTOR-side via foreachPartition — no driver
    * loop; on a cluster the target is a shared store, same code), then
    * ingests the directory back: id parsed from the path, byte length
    * from the source's metadata column (no content read needed for
    * it), and an md5 digest of the content bytes. Oracle recomputes
    * length and digest from the table itself — the round-trip proves
    * content fidelity, not just counts. Production note: pathGlobFilter
    * prunes non-matching files at listing time; for millions of small
    * assets prefer fewer, larger archives (the multimodal parquet
    * tables in ext/Multimodal are exactly that next step).
    */
  def q167BinaryFiles(s: SparkSession, d: String): DataFrame = {
    val dir = graft.core.TempDirs.scoped("graft_q167_") + "/blobs"
    new java.io.File(dir).mkdirs()
    Tables.documents(s, d)
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
      .foreachPartition { rows: Iterator[org.apache.spark.sql.Row] =>
        rows.foreach { r =>
          val id = r.getLong(0)
          val bytes = r.getAs[Array[Byte]](1)
          java.nio.file.Files.write(
            java.nio.file.Paths.get(dir, f"doc_$id%08d.bin"), bytes)
        }
      }
    s.read.format("binaryFile").option("pathGlobFilter", "*.bin").load(dir)
      .select(
        regexp_extract(col("path"), "doc_(\\d+)\\.bin", 1).cast("long").as("doc_id"),
        col("length").cast("long").as("byte_len"),
        md5(col("content")).as("digest"))
  }

  val q167Sql: String =
    """SELECT doc_id,
      |  CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
      |  md5(text) AS digest
      |FROM documents""".stripMargin

  // ---------------------------------------------------------------- q178
  /** XML round-trip — the `xml` datasource Spark 4 absorbed from
    * spark-xml, covering the last of the ingestion-format family
    * (parquet/ORC/CSV/JSON/Avro/binaryFile/XML). Write with an
    * explicit rowTag, read back with an EXPLICIT schema (inference
    * would re-type ids to the narrowest fit — the q97 CSV contract
    * applies to every self-describing-less format). String fidelity
    * is the real test: o_comment carries punctuation the writer must
    * escape and the reader must unescape; the md5-sum checksum over
    * comments proves byte-exact inversion, while cents sum proves
    * numeric fidelity. XML files split by row boundaries like any
    * text source — scan parallelism is files x maxPartitionBytes.
    */
  def q178XmlRoundtrip(s: SparkSession, d: String): DataFrame = {
    val dir = graft.core.TempDirs.scoped("graft_q178_") + "/xml"
    Tables.documents(s, d)
      .select(col("doc_id"), col("lang"), col("source"),
        col("n_chars"), col("text"))
      .write.format("xml").option("rowTag", "doc").save(dir)
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("lang", StringType),
      StructField("source", StringType), StructField("n_chars", LongType),
      StructField("text", StringType)))
    s.read.format("xml").option("rowTag", "doc").schema(schema).load(dir)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n"), sum(col("n_chars")).as("sum_chars"),
           min(col("doc_id")).as("id_min"), max(col("doc_id")).as("id_max"),
           sum(conv(substring(md5(col("text")), 1, 7), 16, 10).cast("long")).as("text_chk"))
  }

  val q178Sql: String =
    """SELECT lang, CAST(count(*) AS BIGINT) AS n,
      |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
      |  min(doc_id) AS id_min, max(doc_id) AS id_max,
      |  CAST(sum(('0x' || substr(md5(text), 1, 7))::BIGINT) AS BIGINT) AS text_chk
      |FROM documents GROUP BY lang""".stripMargin

  // ---------------------------------------------------------------- q184
  /** DYNAMIC PARTITION PRUNING — the mechanism that makes star-schema
    * joins survive 100 TB: the fact table is laid out partitioned by
    * date (the standard warehouse layout this sink writes here), the
    * dim side's filter selects a few dates at RUNTIME, and Catalyst
    * injects the dim's build-side keys as a partition filter into the
    * fact SCAN (`dynamicpruning` subquery) — so the fact reads only
    * the matching date directories instead of all of them. Without
    * DPP this is a full corpus scan whose rows die in the join.
    * PlanSpec locks the dynamicpruning expression into the fact scan.
    * The dim's date set derives deterministically from the data
    * (epoch-day mod 7 < 2 — "weekend" dates); the oracle applies the
    * same predicate directly.
    */
  def q184DynamicPartitionPruning(s: SparkSession, d: String): DataFrame = {
    val dir = graft.core.TempDirs.scoped("graft_q184_") + "/fact"
    Tables.events(s, d)
      .select(col("event_id"), col("event_type"),
        round(col("value") * 100).cast("long").as("cents"),
        to_date(col("ts")).as("event_date"))
      .write.partitionBy("event_date").parquet(dir)
    val fact = s.read.parquet(dir)
    val dim = Tables.events(s, d)
      .select(to_date(col("ts")).as("d_date")).distinct()
      .filter(pmod(datediff(col("d_date"), lit("1970-01-01").cast("date")),
        lit(7)) < 2)
    fact.join(dim, col("event_date") === col("d_date"))
      .groupBy(date_format(col("event_date"), "yyyy-MM-dd").as("day"))
      .agg(count(lit(1)).as("n"), sum(col("cents")).as("sum_cents"))
  }

  val q184Sql: String =
    """SELECT strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day,
      |  CAST(count(*) AS BIGINT) AS n,
      |  CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents
      |FROM events
      |WHERE datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) % 7 < 2
      |GROUP BY 1""".stripMargin

  // ---------------------------------------------------------------- q191
  /** CORRUPT-RECORD HANDLING at the source (PERMISSIVE mode +
    * `columnNameOfCorruptRecord`) — the schema-on-read half of the
    * quarantine contract (P5, `ops/Quarantine`): a real feed always
    * contains malformed lines, and DROPPING them silently (the
    * reference's `except` habit) loses data lineage. The gate writes
    * a JSON-lines feed where every 7th event id is deterministically
    * truncated mid-string (always invalid JSON), reads it back with
    * an explicit schema carrying the corrupt-record column, and
    * gates the full accounting: every malformed line lands in
    * `_corrupt`, every valid line parses — nothing vanishes. Per-row
    * parse, no shuffle until the count.
    */
  def q191CorruptRecords(s: SparkSession, d: String): DataFrame = {
    val dir = graft.core.TempDirs.scoped("graft_q191_") + "/jsonl"
    Tables.events(s, d)
      .select(col("event_id"),
        to_json(struct(col("event_id"), col("event_type"))).as("line"))
      .select(when(pmod(col("event_id"), lit(7)) === 0,
          expr("substring(line, 1, length(line) - 2)"))
        .otherwise(col("line")).as("value"))
      .write.text(dir)
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("event_type", StringType),
      StructField("_corrupt_record", StringType)))
    s.read.schema(schema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(dir)
      .select(when(col("_corrupt_record").isNotNull, lit("_corrupt"))
        .otherwise(col("event_type")).as("category"))
      .groupBy(col("category")).agg(count(lit(1)).as("n"))
  }

  val q191Sql: String =
    """SELECT CASE WHEN event_id % 7 = 0 THEN '_corrupt' ELSE event_type END
      |    AS category,
      |  CAST(count(*) AS BIGINT) AS n
      |FROM events GROUP BY 1""".stripMargin

  val entries: Map[String, ((SparkSession, String) => DataFrame, String)] = Map(
    "q96_orc_roundtrip" -> (q96OrcRoundtrip _, q96Sql),
    "q97_csv_roundtrip" -> (q97CsvRoundtrip _, q97Sql),
    "q102_avro_roundtrip" -> (q102AvroRoundtrip _, q102Sql),
    "q111_bucketed_join" -> (q111BucketedJoin _, q111Sql),
    "q167_binary_files" -> (q167BinaryFiles _, q167Sql),
    "q178_xml_roundtrip" -> (q178XmlRoundtrip _, q178Sql),
    "q184_dynamic_partition_pruning" -> (q184DynamicPartitionPruning _, q184Sql),
    "q191_corrupt_records" -> (q191CorruptRecords _, q191Sql),
  )
}
