package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication for training-data pipelines, scale-first:
  *
  *  - exact: hash-groupBy on content digest (map-side combine; at
  *    100 TB this shuffles one digest row per distinct doc, not text).
  *  - MinHash + LSH banding: per-doc signatures (linear scan), band
  *    keys, shuffle join on (band, key) — candidate pairs only, never
  *    an all-pairs product. Verification re-computes exact Jaccard on
  *    the (small) candidate set.
  *  - SimHash: 16-bit signature; near-pairs via pigeonhole on 4-bit
  *    nibbles (hamming <= 3 guarantees one equal nibble), again a
  *    shuffle join on a small key instead of a cross join.
  *  - brute-force n-gram Jaccard kept for oracle/recall checks on
  *    bounded id ranges.
  *
  * Hashing is md5 over shingle strings — portable to the DuckDB oracle
  * (identical hex output), unlike engine-specific hash().
  */
object Dedup {
  import TextAnalysis.{shingles, tokens}

  /** Exact-dup groups: content digest -> copy count + canonical id. */
  def exactGroups(docs: DataFrame): DataFrame =
    docs.groupBy(md5(col("text").cast("binary")).as("content_hash"))
      .agg(count(lit(1)).as("n_copies"), min(col("doc_id")).as("keep_doc_id"))

  /** Exact dedup: one surviving row per identical text — the min-id
    * row (full-row min-struct tiebreak, so exact duplicate rows also
    * collapse). Single hash aggregate with map-side combine: each
    * executor reduces to one candidate per local digest before the
    * shuffle — no join back, no window sort.
    */
  def exactDedup(docs: DataFrame): DataFrame = {
    val payload = struct(col("doc_id") +: docs.columns.filterNot(_ == "doc_id").map(col).toSeq: _*)
    docs.groupBy(md5(col("text").cast("binary")).as("__fp"))
      .agg(min(payload).as("__keep"))
      .select(docs.columns.map(c => col(s"__keep.$c")).toSeq: _*)
  }

  /** MinHash signature columns mh0..mh{k-1}: min over shingles of
    * md5(shingle + "#i") — k independent permutations via salt.
    */
  def withMinhash(docs: DataFrame, k: Int): DataFrame = {
    val sh = shingles(tokens(col("text")), 3)
    (0 until k).foldLeft(docs.withColumn("__sh", sh)) { (df, i) =>
      df.withColumn(s"mh$i",
        array_min(transform(col("__sh"), s => md5(concat(s, lit(s"#$i")).cast("binary")))))
    }.drop("__sh")
  }

  /** LSH band keys: (doc_id, band, band_key) with band_key =
    * md5(concat of the band's signature rows).
    */
  def lshBands(sigs: DataFrame, bands: Int, rowsPerBand: Int): DataFrame = {
    val bandStructs = (0 until bands).map { b =>
      val cols = (0 until rowsPerBand).map(r => col(s"mh${b * rowsPerBand + r}"))
      struct(lit(b).as("band"), md5(concat(cols: _*).cast("binary")).as("band_key"))
    }
    sigs.select(col("doc_id"), explode(array(bandStructs: _*)).as("bk"))
      .select(col("doc_id"), col("bk.band"), col("bk.band_key"))
  }

  /** Distinct candidate pairs (a < b) sharing any band bucket —
    * equi-join on (band, band_key): shuffles only small key rows.
    */
  def lshCandidates(bandsDf: DataFrame): DataFrame = {
    val l = bandsDf.select(col("doc_id").as("id_a"), col("band"), col("band_key"))
    val r = bandsDf.select(col("doc_id").as("id_b"), col("band"), col("band_key"))
    l.join(r, Seq("band", "band_key")).filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b")).distinct()
  }

  /** Exact word-3-gram Jaccard between doc pairs (given as id columns),
    * emitted as a raw double (int/int division — bit-identical
    * cross-engine).
    */
  def withJaccard(pairs: DataFrame, docs: DataFrame): DataFrame = {
    val sh = docs.select(col("doc_id"), shingles(tokens(col("text")), 3).as("sh"))
    val a = sh.select(col("doc_id").as("id_a"), col("sh").as("sh_a"))
    val b = sh.select(col("doc_id").as("id_b"), col("sh").as("sh_b"))
    pairs.join(a, "id_a").join(b, "id_b")
      .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))))
      .withColumn("jaccard",
        col("inter").cast("double") /
          (size(col("sh_a")) + size(col("sh_b")) - col("inter")))
      .drop("sh_a", "sh_b", "inter")
  }

  /** Full MinHash-LSH near-dup pipeline: signatures -> bands ->
    * candidates -> exact-Jaccard verify >= threshold.
    */
  def minhashNearDups(docs: DataFrame, k: Int, bands: Int, threshold: Double): DataFrame = {
    require(k % bands == 0, s"k=$k not divisible by bands=$bands")
    val cands = lshCandidates(lshBands(withMinhash(docs, k), bands, k / bands))
    withJaccard(cands, docs).filter(col("jaccard") >= threshold)
  }

  /** Brute-force Jaccard pairs over a bounded id range (oracle /
    * recall baseline — NOT the scale path).
    */
  def bruteJaccardPairs(docs: DataFrame, idCap: Long, threshold: Double): DataFrame = {
    val sub = docs.filter(col("doc_id") < idCap)
    val ids = sub.select(col("doc_id").as("id_a"))
      .crossJoin(sub.select(col("doc_id").as("id_b")))
      .filter(col("id_a") < col("id_b"))
    withJaccard(ids, sub).filter(col("jaccard") >= threshold)
  }

  /** Per-doc 16-bit SimHash signatures. */
  def withSimhash(docs: DataFrame): DataFrame =
    docs.withColumn("simhash", TextAnalysis.simhash16(tokens(col("text"))))

  /** SimHash near-pairs with hamming distance <= maxHamming (< 4):
    * pigeonhole on the four 4-bit nibbles — any pair within hamming 3
    * shares at least one unchanged nibble, so an equi-join on
    * (nibble_idx, nibble_value) finds all of them without a cross join.
    */
  def simhashNearPairs(sigs: DataFrame, maxHamming: Int): DataFrame = {
    require(maxHamming < 4, "4-nibble pigeonhole covers hamming <= 3")
    val nibbles = sigs.select(col("doc_id"), col("simhash"),
        explode(array((0 until 4).map(j =>
          struct(lit(j).as("nib"),
            shiftright(col("simhash"), 4 * j).bitwiseAND(lit(15L)).as("nv"))): _*)).as("n"))
      .select(col("doc_id"), col("simhash"), col("n.nib"), col("n.nv"))
    val l = nibbles.select(col("doc_id").as("id_a"), col("simhash").as("sh_a"), col("nib"), col("nv"))
    val r = nibbles.select(col("doc_id").as("id_b"), col("simhash").as("sh_b"), col("nib"), col("nv"))
    l.join(r, Seq("nib", "nv")).filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("sh_a"), col("sh_b")).distinct()
      .withColumn("hamming", bit_count(col("sh_a").bitwiseXOR(col("sh_b"))))
      .filter(col("hamming") <= maxHamming)
      .select(col("id_a"), col("id_b"), col("hamming"))
  }
}
