package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.{AdvancedQueries, Breadth, CdcQueries, CurationQueries, EngineQueries, ExtQueries, Extended, Relational, SourceQueries, SqlSurface, StreamingQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every operator claimed in SURVEY.md §2 has an entry in `queries`;
  * those expressible in ANSI SQL also have a DuckDB oracle in
  * `oracleSql` (same column names on both sides — the driver sorts
  * columns by name before hashing).
  */
object SparkEntry {

  private def groups: Seq[Map[String, ((SparkSession, String) => DataFrame, String)]] =
    Seq(Relational.entries, CdcQueries.entries, ExtQueries.entries,
        Extended.entries, SqlSurface.entries, Breadth.entries,
        StreamingQueries.entries, SourceQueries.entries, EngineQueries.entries,
        AdvancedQueries.entries, CurationQueries.entries)

  private lazy val all: Map[String, ((SparkSession, String) => DataFrame, String)] =
    groups.reduce(_ ++ _)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0:
    * the reference's full CDC pipeline (enrich -> flatten -> LWW dedup ->
    * soft-delete filter -> analytics).
    */
  def entry(spark: SparkSession): DataFrame =
    CdcQueries.q20VideoAnalytics(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map { case (k, (fn, _)) => k -> fn }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    all.collect { case (k, (_, sql)) if sql.nonEmpty => k -> sql }
}
