package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph analytics over edge frames — the authority-scoring side of
  * corpus curation (web-crawl pretraining pipelines weight documents
  * by link authority before sampling; the reference has no graph ops,
  * so this is a pure capability extension like Dedup/Similarity).
  *
  * Numerics discipline: ranks are FIXED-POINT LONGS (micro-units), all
  * updates are integer multiply/divide/sum — associative, commutative,
  * and therefore identical on any partitioning, any task order, and
  * any engine (the q73/q75 exact-arithmetic pattern). Floating-point
  * PageRank cannot promise a stable cross-engine hash.
  */
object Graph {

  /** Fixed-round power-iteration PageRank over a directed edge frame
    * (`src`, `dst`; parallel edges count as weight). Per round:
    *
    *   rank'(v) = 150000 + (85 * Σ_{(u,v)∈E} (rank(u) div outdeg(u))) div 100
    *
    * i.e. damping 0.85 with base 0.15, everything in micro-units
    * (initial rank 1_000_000 per node). One equi-join + one
    * map-side-combinable sum per round — the canonical distributed
    * PageRank shape; contribution traffic is O(|E|) rows of two longs.
    * Dangling-node mass leaks (no redistribution) — acceptable and
    * DOCUMENTED for authority ranking (ordering is what matters), and
    * it keeps the oracle replay exact.
    *
    * `iters` is a fixed round count, not a convergence test: authority
    * weighting needs a deterministic budget, and fixed rounds make the
    * whole computation replayable as chained SQL CTEs (see q88's
    * generated oracle).
    */
  def pageRank(edges: DataFrame, iters: Int): DataFrame = {
    val outdeg = edges.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
    val withDeg = edges.join(outdeg, "src")
    val nodes = edges.select(col("src").as("node"))
      .unionByName(edges.select(col("dst").as("node"))).distinct()
    var ranks = nodes.withColumn("r", lit(1000000L))
    var freePrev: () => Unit = () => ()
    (0 until iters).foreach { i =>
      val contrib = withDeg.join(ranks, withDeg("src") === ranks("node"))
        .select(col("dst").as("node"), expr("r div outdeg").as("c"))
      val inSum = contrib.groupBy(col("node")).agg(sum(col("c")).as("s"))
      ranks = nodes.join(inSum, Seq("node"), "left")
        .select(col("node"),
          (lit(150000L) + expr("(85 * coalesce(s, 0L)) div 100")).as("r"))
      // `ranks` is referenced ONCE per round, so the Catalyst tree grows
      // linearly (unlike the CC loop's union+join doubling) — a handful
      // of rounds plans fine and stays auditable as one plan (PlanSpec
      // reads the per-round partial aggregates). Larger iteration
      // budgets still get lineage truncation, with superseded
      // checkpoints' blocks freed deterministically (see Lineage).
      if ((i + 1) % 8 == 0 && i != iters - 1) {
        val (ck, free) = Lineage.checkpoint(ranks)
        freePrev()
        freePrev = free
        ranks = ck
      }
    }
    ranks
  }
}
