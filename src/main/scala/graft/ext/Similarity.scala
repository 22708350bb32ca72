package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions.cosineSim

/** Similarity search over an embedding column (Array[Float]).
  *
  *  - Brute-force top-k: broadcast the (small) query set against the
  *    corpus — one scan of the corpus, no shuffle of the embeddings;
  *    the custom codegen'd CosineSimilarity expression keeps the
  *    O(|corpus| * |queries| * dim) loop inside whole-stage codegen.
  *    This is the exact baseline.
  *  - Sign-random-projection LSH ANN: deterministic hyperplanes (fixed
  *    seed, spec-fixed java.util.Random LCG) assign every vector a
  *    bucket; candidate generation is an equi-join on the bucket id.
  *    At 100 TB the corpus is bucketed once (narrow shuffle on an int
  *    key) and each query probes one bucket — the scale path.
  *
  * Ranking discipline for oracle parity: rank by round(cosine, 6) DESC
  * with vec_id tiebreak — sub-1e-6 float jitter can never flip ranks.
  */
object Similarity {

  /** Deterministic LSH hyperplanes: java.util.Random's LCG is
    * spec-fixed, so these are stable across JVMs/runs and can be
    * embedded as literals in oracle SQL.
    */
  def planes(nPlanes: Int, dim: Int, seed: Long = 42L): Array[Array[Double]] = {
    val r = new java.util.Random(seed)
    Array.fill(nPlanes, dim)(r.nextDouble() * 2.0 - 1.0)
  }

  /** dot(embedding (float), plane (double literal)) via an in-order
    * fold — same accumulation order as the DuckDB twin.
    */
  private def planeDot(emb: Column, plane: Array[Double]): Column = {
    val planeLit = array(plane.map(lit): _*)
    aggregate(
      zip_with(emb.cast("array<double>"), planeLit, (x, y) => x * y),
      lit(0.0), (acc, v) => acc + v)
  }

  /** Sign-LSH bucket id: bit p set iff dot(v, plane_p) >= 0. */
  def lshBucket(emb: Column, ps: Array[Array[Double]]): Column =
    ps.zipWithIndex.map { case (p, i) =>
      when(planeDot(emb, p) >= 0.0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)

  private def ranked(scored: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy(col("qid")).orderBy(col("cos6").desc, col("cid").asc)
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("cid"), col("cos6"))
  }

  /** Exact top-k neighbors for each query vector (qid < nQueries). */
  def knnBrute(emb: DataFrame, nQueries: Long, k: Int): DataFrame = {
    val q = emb.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"))
    val c = emb.select(col("vec_id").as("cid"), col("embedding").as("ce"))
    val scored = c.crossJoin(broadcast(q)).filter(col("cid") =!= col("qid"))
      .withColumn("cos6", round(cosineSim(col("qe"), col("ce")), 6))
    ranked(scored, k)
  }

  /** ANN via multi-probe LSH: each query probes its own bucket plus
    * every hamming-1 neighbor bucket (sign flips of one hyperplane —
    * the buckets a true neighbor most likely landed in). The corpus is
    * bucketed ONCE (linear pass); only the tiny query side explodes by
    * (nPlanes+1) probes. Approximate by design (recall measured in
    * tests); same ranking discipline as knnBrute.
    */
  def annLsh(emb: DataFrame, nQueries: Long, k: Int,
             ps: Array[Array[Double]]): DataFrame = {
    val withBucket = emb.withColumn("bucket", lshBucket(col("embedding"), ps))
    val probeList = array(col("bucket") +:
      ps.indices.map(p => col("bucket").bitwiseXOR(lit(1L << p))): _*)
    val q = withBucket.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"),
              explode(probeList).as("bucket"))
    val c = withBucket
      .select(col("vec_id").as("cid"), col("embedding").as("ce"), col("bucket"))
    val scored = c.join(broadcast(q), Seq("bucket")).filter(col("cid") =!= col("qid"))
      .withColumn("cos6", round(cosineSim(col("qe"), col("ce")), 6))
    ranked(scored, k)
  }

  /** Embedding near-duplicate pairs: cosine >= threshold over a bounded
    * id range (brute baseline; the LSH path above is the scale route).
    */
  def embeddingNearDups(emb: DataFrame, idCap: Long, threshold: Double): DataFrame = {
    val sub = emb.filter(col("vec_id") < idCap)
    val a = sub.select(col("vec_id").as("id_a"), col("embedding").as("ea"))
    val b = sub.select(col("vec_id").as("id_b"), col("embedding").as("eb"))
    a.crossJoin(b).filter(col("id_a") < col("id_b"))
      .withColumn("cos6", round(cosineSim(col("ea"), col("eb")), 6))
      .filter(col("cos6") >= threshold)
      .select(col("id_a"), col("id_b"), col("cos6"))
  }

  /** SQL literal for the planes, full shortest-roundtrip precision. */
  def planesSqlLiteral(ps: Array[Array[Double]]): String =
    ps.map(_.map(_.toString).mkString("[", ", ", "]")).mkString("[", ", ", "]")

  /** Argmax-cosine cell assignment — the aggregate (never a window)
    * shape shared with `Extended.ivfAssignCells`: (cos6, cent_idx)
    * packed into one long keeps the argmax a primitive max() in a
    * 2-phase HashAggregate. Ties break toward the lower cent_idx.
    */
  def assignCells(emb: DataFrame, cents: DataFrame, k: Int): DataFrame = assignIdx(emb, cents, k)

  private def assignIdx(emb: DataFrame, cents: DataFrame, k: Int): DataFrame = {
    val m = lit(k.toLong)
    val cos6i = round(round(cosineSim(col("__v"), col("cent")), 6) * 1e6, 0).cast("long")
    emb.crossJoin(broadcast(cents))
      .withColumn("packed", cos6i * m + (m - lit(1L) - col("cent_idx")))
      .groupBy(col("__id"), col("__v"))
      .agg(max(col("packed")).as("p"))
      .withColumn("cent_idx", (m - lit(1L) - pmod(col("p"), m)).cast("int"))
      .select(col("__id"), col("__v"), col("cent_idx"))
  }

  /** Deterministic distributed k-means (Lloyd's) for IVF centroid
    * training. Two determinism guarantees float k-means cannot give:
    *
    *  - FIXED-POINT MEANS: components are scaled to integer
    *    micro-units before averaging, so per-cell sums are exact
    *    BIGINTs — associative and commutative, hence identical on any
    *    partitioning, any task order, any cluster size (a double sum
    *    is none of those);
    *  - DETERMINISTIC INIT + TIES: seeds are the k lowest-id vectors;
    *    assignment ties break toward the lower cell.
    *
    * Empty cells keep their previous centroid. Centroids collapse to
    * the driver between rounds (k x dim floats — metadata-scale); the
    * per-round work is one broadcast crossJoin + two hash aggregates
    * over the corpus, all map-side combinable.
    *
    * Returns (cent_idx: int, cent: array<float>).
    */
  def kmeansCentroids(emb: DataFrame, idCol: String, vecCol: String,
                      k: Int, iters: Int): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val vecs = emb.select(col(idCol).as("__id"), col(vecCol).as("__v"))
    def toDf(cs: Seq[(Int, Seq[Float])]): DataFrame =
      cs.toDF("cent_idx", "cent").select(
        col("cent_idx"), col("cent").cast("array<float>"))
    var cents: Seq[(Int, Seq[Float])] = vecs.orderBy(col("__id").asc).limit(k)
      .select(col("__v")).as[Seq[Float]].collect()
      .zipWithIndex.map { case (v, i) => (i, v) }.toSeq
    (1 to iters).foreach { _ =>
      val assigned = assignIdx(vecs, toDf(cents), k)
      val means = assigned
        .select(col("cent_idx"), posexplode(col("__v")).as(Seq("pos", "x")))
        .withColumn("xm", round(col("x") * 1e6).cast("long")) // exact micro-units
        .groupBy(col("cent_idx"), col("pos"))
        .agg(sum(col("xm")).as("s"), count(lit(1)).as("c"))
        .withColumn("m", (col("s").cast("double") / col("c") / 1e6).cast("float"))
        .groupBy(col("cent_idx"))
        .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("pm"))
        .select(col("cent_idx"), expr("transform(pm, e -> e.m)").as("cent"))
        .as[(Int, Seq[Float])].collect().toMap
      cents = cents.map { case (i, old) => (i, means.getOrElse(i, old)) }
    }
    toDf(cents)
  }
}
