package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation: two-phase salted aggregation. A hot key that would
  * pin one reducer is split across `salt` sub-keys; phase 1 aggregates
  * (key, salt) partitions (parallel across the cluster), phase 2 merges
  * the per-salt partials — both phases are hash aggregates with
  * map-side combine, and every supported merge is associative, so the
  * result is exactly the unsalted aggregate.
  *
  * (AQE's skew-join handling covers joins; this is the groupBy-side
  * equivalent for pathological key distributions.)
  */
object Skew {

  /** Supported: sum / count / min / max (associative merges). avg =
    * post-divide sum by count at the call site.
    */
  def saltedAggregate(df: DataFrame, keys: Seq[String], salt: Int,
                      aggs: Map[String, String]): DataFrame = {
    require(salt > 0, "salt must be positive")
    val bad = aggs.values.toSet -- Set("sum", "count", "min", "max")
    require(bad.isEmpty, s"unsupported aggs: $bad")

    // Salt from ROW CONTENT, not the key (identical keys must scatter)
    // and not monotonically_increasing_id (nondeterministic: on a
    // shuffle-fetch failure, recomputed map tasks would re-salt the
    // same rows differently, and reducers that already fetched partial
    // output observe duplicated/missing rows — the SPARK-23207 class
    // of retry hazard, exactly on the large-cluster path this operator
    // exists for). xxhash64 over every column reproduces identical
    // shuffle output on retry; fully-identical duplicate rows share a
    // salt, which only matters if a hot key is hot from byte-identical
    // copies — the documented trade for retry correctness.
    val salted = df.withColumn("__salt",
      pmod(xxhash64(df.columns.map(col).toIndexedSeq: _*), lit(salt.toLong)))
    val partial: Seq[Column] = aggs.toSeq.map {
      case (c, "sum")   => sum(col(c)).as(s"__p_$c")
      case (c, "count") => count(col(c)).as(s"__p_$c")
      case (c, "min")   => min(col(c)).as(s"__p_$c")
      case (c, "max")   => max(col(c)).as(s"__p_$c")
    }
    val merged: Seq[Column] = aggs.toSeq.map {
      case (c, "sum")   => sum(col(s"__p_$c")).as(s"sum_$c")
      case (c, "count") => sum(col(s"__p_$c")).as(s"count_$c")
      case (c, "min")   => min(col(s"__p_$c")).as(s"min_$c")
      case (c, "max")   => max(col(s"__p_$c")).as(s"max_$c")
    }
    salted
      .groupBy((keys :+ "__salt").map(col): _*)
      .agg(partial.head, partial.tail: _*)
      .groupBy(keys.map(col): _*)
      .agg(merged.head, merged.tail: _*)
  }

  /** Skew-safe equi-join for a dim side too big to broadcast but small
    * enough to replicate `salt` ways: the fact side salts each row by
    * row id (identical hot keys scatter across `salt` reducers), the
    * dim side is replicated once per salt value, and the join runs on
    * (key, salt) — so a hot key's rows spread over `salt` partitions
    * instead of pinning one. Exactly the rows of the unsalted join.
    * (AQE skew handling splits oversized partitions after the fact;
    * this is the explicit pre-plan form for known-pathological keys.)
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
                 salt: Int): DataFrame = {
    require(salt > 0, "salt must be positive")
    // deterministic content-hash salt — see saltedAggregate for why
    // monotonically_increasing_id is a retry-correctness hazard here
    val saltedFact = fact.withColumn("__salt",
      pmod(xxhash64(fact.columns.map(col).toIndexedSeq: _*), lit(salt.toLong)))
    val replicatedDim = dim.withColumn("__salt",
      explode(array((0 until salt).map(i => lit(i.toLong)): _*)))
    saltedFact.join(replicatedDim, Seq(key, "__salt")).drop("__salt")
  }
}
