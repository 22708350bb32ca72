package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.JaccardFunctions.jaccardSim

/** EXACT set-similarity join with PPJoin-style prefix filtering
  * (Xiao et al., "Efficient Similarity Joins for Near Duplicate
  * Detection", WWW'08 — public algorithm): all pairs with Jaccard >=
  * tau, with NO false negatives (the guarantee MinHash-LSH, q26,
  * trades away for speed) and no all-pairs comparison (what the brute
  * oracle, q27's shape, pays).
  *
  * The filter: order the token universe rarest-first by document
  * frequency. A record with |r| distinct tokens keeps only its first
  * `|r| - ceil(tau * |r|) + 1` tokens under that order as its PREFIX;
  * two sets with Jaccard >= tau MUST share at least one prefix token
  * (if they shared none, the intersection is confined to the
  * non-prefix suffixes, too small to reach tau). Candidates are then
  * an EQUI-JOIN on prefix tokens — and because prefixes hold each
  * record's globally rarest tokens, the join's per-key fan-out is
  * bounded by construction (a stop-word-frequency token never lands in
  * a prefix unless the record is nearly all stop words).
  *
  * Scale shape at 100 TB:
  *  - token document frequencies: one map-side-combinable aggregate;
  *  - the global token ranking is VOCABULARY-scale, not corpus-scale
  *    (a single-partition window over distinct tokens — same class as
  *    the k-means centroid collect, metadata not data);
  *  - prefix extraction: per-record window (partitioned by doc);
  *  - candidates: equi-join on prefix token + the size-ratio filter
  *    tau * max(|a|,|b|) <= min(|a|,|b|) (Jaccard <= min/max, so
  *    unbalanced pairs drop before verification);
  *  - verification: one [[graft.functions.JaccardSimilarity]] probe
  *    per DISTINCT candidate pair on the full shingle arrays.
  */
object SetSimJoin {

  /** `docs` must carry (`idCol`: bigint, `setCol`: array<string> of
    * DISTINCT elements). Returns (id_a, id_b, jaccard) with
    * id_a < id_b and jaccard >= tau — exact, verified.
    */
  def pairs(docs: DataFrame, idCol: String, setCol: String, tau: Double): DataFrame = {
    val base = docs.select(col(idCol).as("id"), col(setCol).as("sh"))
      .withColumn("n", size(col("sh")))
    val toks = base.select(col("id"), col("n"), explode(col("sh")).as("tok"))
    val df = toks.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    // Global rarest-first rank: vocabulary-scale single-partition sort
    // (ties broken by token text so the ranking is deterministic).
    val ranked = df.withColumn("rank",
      row_number().over(Window.orderBy(col("df"), col("tok"))))
    // prefix length = n - ceil(tau*n) + 1 tokens, rarest first
    val prefLen = (col("n") - ceil(col("n") * lit(tau)) + lit(1)).cast("int")
    val prefix = toks.join(ranked.select(col("tok"), col("rank")), "tok")
      .withColumn("pos",
        row_number().over(Window.partitionBy(col("id")).orderBy(col("rank"))))
      .filter(col("pos") <= prefLen)
      .select(col("tok"), col("id"), col("n"))
    val cand = prefix.as("a").join(prefix.as("b"), "tok")
      .filter(col("a.id") < col("b.id"))
      // size-ratio bound: jaccard <= min/max, so tau*max <= min or prune
      .filter(greatest(col("a.n"), col("b.n")) * lit(tau)
                <= least(col("a.n"), col("b.n")))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
    cand
      .join(base.select(col("id").as("id_a"), col("sh").as("sh_a")), "id_a")
      .join(base.select(col("id").as("id_b"), col("sh").as("sh_b")), "id_b")
      .select(col("id_a"), col("id_b"), jaccardSim(col("sh_a"), col("sh_b")).as("jaccard"))
      .filter(col("jaccard") >= lit(tau))
  }
}
