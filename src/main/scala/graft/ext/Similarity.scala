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

  /** Deterministic near-dup benchmark corpus: every 5th base vector
    * (vec_id % 5 == 0, vec_id < idCap) gets a jittered copy at
    * vec_id + copyOffset — per-component scale 1 + 0.03*((vec_id*31+i)%7-3),
    * computed in double and rounded back to float32 (both correctly-
    * rounded IEEE ops, so the DuckDB twin is bit-identical). The copies
    * land at cosine ~0.998 to their original while the densest
    * background pair tops out ~0.6, so at threshold 0.9 the qualifying
    * set is EXACTLY the planted (original, copy) pairs — a clean,
    * SF-independent near-dup gate (the corpus itself is dup-free, same
    * injection idiom as the q91 curation funnel).
    */
  def plantedNearDupCorpus(emb: DataFrame, idCap: Long,
                           copyOffset: Long = 100000L): DataFrame = {
    val base = emb.filter(col("vec_id") < idCap)
      .select(col("vec_id"), col("embedding"))
    val copies = base.filter(col("vec_id") % 5 === 0)
      .withColumn("jittered", expr(
        """transform(embedding, (x, i) ->
          |  CAST(CAST(x AS DOUBLE) *
          |       (1.0D + 0.03D * CAST((vec_id * 31 + i) % 7 - 3 AS DOUBLE))
          |       AS FLOAT))""".stripMargin))
      .select((col("vec_id") + lit(copyOffset)).as("vec_id"),
              col("jittered").as("embedding"))
    base.unionByName(copies)
  }

  /** Embedding near-duplicate pairs, brute baseline: all-pairs cosine
    * >= threshold. O(n^2) by construction — the exactness oracle for
    * [[nearDupPairsLsh]], never the path you'd run at scale.
    */
  def nearDupPairsBrute(corpus: DataFrame, threshold: Double): DataFrame = {
    val a = corpus.select(col("vec_id").as("id_a"), col("embedding").as("ea"))
    val b = corpus.select(col("vec_id").as("id_b"), col("embedding").as("eb"))
    a.crossJoin(b).filter(col("id_a") < col("id_b"))
      .withColumn("cos6", round(cosineSim(col("ea"), col("eb")), 6))
      .filter(col("cos6") >= threshold)
      .select(col("id_a"), col("id_b"), col("cos6"))
  }

  /** Banded sign-LSH near-dup pair ENUMERATION — the scale path for
    * [[nearDupPairsBrute]]. `ps` holds bands * b hyperplanes sliced
    * into `bands` tables of b sign bits each; a pair is a candidate
    * iff all b bits agree in at least one table, i.e. candidates come
    * from an EQUI-JOIN on the (table, bucket) key — never a cross
    * join. Candidates are deduped per pair, then verified with the
    * exact codegen'd cosine, so precision is always exact; recall is
    * the banding guarantee p^b-per-table (the q99 gate hash-checks
    * recall == 100% against the brute DuckDB oracle on the planted
    * corpus). At 100 TB: the corpus is scanned once, exploded *bands
    * ways, shuffled on a 2-int key; per-bucket self-joins hold ~n/2^b
    * rows per table — subquadratic candidate volume (collision prob
    * ~0.5^b for background pairs) and no broadcast of the big side.
    *
    * Why the gate threshold is 0.9, not q32-r3's 0.4: at cosine 0.4
    * the pair angle is ~66 deg, per-plane sign agreement is ~0.63,
    * and NO bucketing scheme (sign-LSH, multiprobe, metric-pivot
    * bounds) prunes — exact recall there costs more candidate volume
    * than the cross join. LSH pair enumeration is a near-dup tool;
    * the planted corpus makes the gate a real near-dup task.
    */
  def nearDupPairsLsh(corpus: DataFrame, threshold: Double,
                      ps: Array[Array[Double]], bands: Int): DataFrame =
    nearDupFromIndex(signBuckets(corpus, ps, bands), threshold)

  /** The sign-LSH INDEX rows of a corpus: one (vec_id, embedding, t,
    * bk) row per band table — the explode side of [[nearDupPairsLsh]],
    * split out so an INCREMENTAL index (a MergeSink table maintained
    * per micro-batch, q107) computes bucket rows for arriving vectors
    * only and stores them; the enumeration then runs off the stored
    * index via [[nearDupFromIndex]]. Deterministic in (ps, bands), so
    * index rows computed batch-at-a-time equal the one-shot bucketing.
    */
  def signBuckets(corpus: DataFrame, ps: Array[Array[Double]], bands: Int): DataFrame = {
    require(ps.length % bands == 0, s"${ps.length} planes not divisible into $bands bands")
    val b = ps.length / bands
    val bits = ps.zipWithIndex.map { case (p, i) =>
      when(planeDot(col("embedding"), p) >= 0.0, lit(1L << (i % b))).otherwise(lit(0L))
    }
    val tableBuckets = (0 until bands).map { t =>
      struct(lit(t).as("t"), bits.slice(t * b, (t + 1) * b).reduce(_ + _).as("bk"))
    }
    corpus
      .select(col("vec_id"), col("embedding"),
              explode(array(tableBuckets: _*)).as("tb"))
      .select(col("vec_id"), col("embedding"),
              col("tb.t").as("t"), col("tb.bk").as("bk"))
  }

  /** Candidate enumeration + exact-cosine verify over [[signBuckets]]
    * rows (fresh or read back from a maintained index table).
    * `maxBucket` engages the stop-bucket guard (Dedup.capBuckets) on
    * the (t, bk) key — a degenerate bucket (e.g. the all-zero-vector
    * bucket, or any region of embedding space 100x denser than the
    * median) otherwise contributes quadratic candidate volume; the
    * default enumerates every bucket.
    */
  def nearDupFromIndex(index: DataFrame, threshold: Double,
                       maxBucket: Int = Int.MaxValue): DataFrame = {
    val capped =
      if (maxBucket == Int.MaxValue) index
      else Dedup.capBuckets(index, Seq("t", "bk"), maxBucket)
    val l = capped.select(col("t"), col("bk"),
      col("vec_id").as("id_a"), col("embedding").as("ea"))
    val r = capped.select(col("t"), col("bk"),
      col("vec_id").as("id_b"), col("embedding").as("eb"))
    l.join(r, Seq("t", "bk")).filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("ea"), col("eb"))
      .dropDuplicates("id_a", "id_b") // collide in >1 table -> verify once
      .withColumn("cos6", round(cosineSim(col("ea"), col("eb")), 6))
      .filter(col("cos6") >= threshold)
      .select(col("id_a"), col("id_b"), col("cos6"))
  }

  /** SQL literal for the planes, full shortest-roundtrip precision. */
  def planesSqlLiteral(ps: Array[Array[Double]]): String =
    ps.map(_.map(_.toString).mkString("[", ", ", "]")).mkString("[", ", ", "]")

  /** DuckDB twin of [[plantedNearDupCorpus]]: base/jit/corpus CTE
    * bodies (bind inside a WITH). Same constants, same float32
    * round-trip, bit-identical corpus.
    */
  def plantedCorpusSqlCtes(idCap: Long): String =
    s"""base AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < $idCap),
       |  jit AS (SELECT vec_id, list_transform(generate_series(1, len(embedding)),
       |      i -> CAST(CAST(embedding[i] AS DOUBLE) *
       |               (1.0 + 0.03 * CAST((vec_id * 31 + (i - 1)) % 7 - 3 AS DOUBLE)) AS FLOAT)) AS je
       |    FROM base WHERE vec_id % 5 = 0),
       |  corpus AS (SELECT vec_id, embedding FROM base
       |             UNION ALL SELECT vec_id + 100000 AS vec_id, je AS embedding FROM jit)""".stripMargin

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
