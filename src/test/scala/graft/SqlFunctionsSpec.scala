package graft

import graft.ext.GraftExtensions
import graft.functions.{ShingleFunctions, SimHashFunctions}
import org.apache.spark.sql.functions._

/** The SparkSessionExtensions surface: the engine's native Catalyst
  * expressions must be reachable from plain SQL text, and agree with
  * the Column API (same Expression class underneath).
  */
class SqlFunctionsSpec extends SparkSpec {

  private lazy val s = {
    val ns = spark.newSession()
    GraftExtensions.register(ns)
    ns
  }

  test("cosine_sim / dot_product SQL functions evaluate the codegen expressions") {
    import s.implicits._
    Seq((Array(3f, 4f), Array(3f, 4f)), (Array(1f, 0f), Array(0f, 1f)))
      .toDF("a", "b").createOrReplaceTempView("vecs")
    val rows = s.sql("SELECT cosine_sim(a, b) AS c, dot_product(a, b) AS d FROM vecs")
      .collect().map(r => (r.getDouble(0), r.getDouble(1))).toSet
    assert(rows == Set((1.0, 25.0), (0.0, 0.0)))
  }

  test("word_shingles + jaccard_sim compose in SQL") {
    val j = s.sql(
      """SELECT jaccard_sim(word_shingles(split('a b c d', ' '), 2),
        |                   word_shingles(split('a b c x', ' '), 2)) AS js""".stripMargin)
      .first().getDouble(0)
    assert(j == 0.5) // {ab,bc,cd} vs {ab,bc,cx}: 2 common / 4 total
  }

  test("jaccard_sim deduplicates arbitrary (non-distinct) inputs") {
    // duplicates must not inflate the union: {a,b} vs {a,c} = 1/3
    // regardless of how many copies each array carries
    val j = s.sql(
      """SELECT jaccard_sim(array('a','a','a','b'), array('a','c','c')) AS js""")
      .first().getDouble(0)
    assert(j == 1.0 / 3.0)
    // identical multisets with different duplication: still exactly 1
    val j2 = s.sql(
      """SELECT jaccard_sim(array('x','x','y'), array('y','x','y','y')) AS js""")
      .first().getDouble(0)
    assert(j2 == 1.0)
  }

  test("simhash48 via SQL matches the Column API on the same input") {
    import s.implicits._
    val df = Seq("the quick brown fox jumps over the lazy dog").toDF("txt")
    df.createOrReplaceTempView("docs")
    val sqlHash = s.sql("SELECT simhash48(word_shingles(split(txt, ' '), 2)) AS h FROM docs")
      .first().getLong(0)
    val colHash = df.select(
        SimHashFunctions.simhash48(
          ShingleFunctions.wordShingles(split(col("txt"), " "), 2)).as("h"))
      .first().getLong(0)
    assert(sqlHash == colHash)
  }

  test("extension class applies cleanly to a SparkSessionExtensions instance") {
    // the spark.sql.extensions=graft.ext.GraftExtensions path: same
    // builder lambda Spark invokes at session construction
    new GraftExtensions().apply(new org.apache.spark.sql.SparkSessionExtensions)
  }

  test("nfc_normalize composes combining sequences, passes NFC strings through") {
    import s.implicits._
    // "e" + combining acute must compose to the 1-codepoint é
    val row = s.sql("SELECT nfc_normalize('café') AS n, " +
      "octet_length(nfc_normalize('café')) AS b").first()
    assert(row.getString(0) == "café" && row.getInt(1) == 5)
    // already-NFC input is returned unchanged (fast path)
    assert(s.sql("SELECT nfc_normalize('plain ascii')").first().getString(0)
      == "plain ascii")
    // Column API reaches the same expression
    val via = Seq("naïve").toDF("t")
      .select(graft.functions.NfcFunctions.nfcNormalize($"t")).first().getString(0)
    assert(via == "naïve")
  }

  test("morton_interleave via SQL matches the Column API and rejects a non-literal bits") {
    val z = s.sql("SELECT morton_interleave(10L, 5L, 8) AS z").head().getLong(0)
    assert(z == 0x66L, s"expected 0x66, got $z")
    assert(z == graft.functions.MortonInterleave.interleave(10L, 5L, 8))
    intercept[Exception] {
      s.sql("SELECT morton_interleave(1L, 1L, CAST(rand() * 8 AS INT))").collect()
    }
  }

  test("word_shingles rejects a non-literal n") {
    import s.implicits._
    Seq(("x y z", 2)).toDF("txt", "n").createOrReplaceTempView("bad")
    intercept[Exception] {
      s.sql("SELECT word_shingles(split(txt, ' '), n) FROM bad").collect()
    }
  }

  test("jaro_winkler_sim matches DuckDB's measured byte-level semantics") {
    import graft.functions.StringSimilarity.jaroWinkler
    import org.apache.spark.unsafe.types.UTF8String.{fromString => u}
    def jw(a: String, b: String) = jaroWinkler(u(a), u(b))
    // reference values measured from DuckDB v1.0 jaro_winkler_similarity
    val cases = Seq(
      ("martha", "marhta") -> 0.9611111111111111,  // classic transposition
      ("DWAYNE", "DUANE") -> 0.8400000000000001,
      ("DIXON", "DICKSONX") -> 0.8133333333333332,
      ("abc", "abc") -> 1.0,
      ("", "abc") -> 0.0,
      ("", "") -> 0.0,                              // DuckDB convention
      ("abc", "xyz") -> 0.0,
      ("a", "ab") -> 0.8500000000000001,            // boost with prefix 1
      ("crate", "trace") -> 0.7333333333333334,     // jaro > 0.7 but prefix 0
      ("abcdef", "abwxyz") -> 0.5555555555555555,   // below boost threshold
      ("abcdefgh", "abcdefxy") -> 0.9,              // prefix capped at 4
      ("héllo", "hello") -> 0.8400000000000001,     // BYTE semantics (é = 2 bytes)
      ("blu gear", "blue gear") -> 0.9449074074074074) // odd mismatch count: t = floor(3/2)
    cases.foreach { case ((a, b), want) =>
      assert(math.abs(jw(a, b) - want) < 1e-12, s"jw($a, $b) = ${jw(a, b)}, want $want")
      assert(jw(a, b) == jw(b, a), s"jw not symmetric on ($a, $b)")
    }
    // SQL registration path evaluates the same expression
    val viaSql = s.sql("SELECT jaro_winkler_sim('martha', 'marhta') AS j").head().getDouble(0)
    assert(math.abs(viaSql - 0.9611111111111111) < 1e-12)
  }

  test("damerau_levenshtein is the TRUE (unrestricted) distance, matching DuckDB") {
    import graft.functions.StringSimilarity.damerauLevenshtein
    import org.apache.spark.unsafe.types.UTF8String.{fromString => u}
    def dl(a: String, b: String) = damerauLevenshtein(u(a), u(b))
    // dl("ca","abc") = 2 is THE unrestricted-vs-OSA discriminator
    // (OSA says 3); all values measured from DuckDB v1.0
    val cases = Seq(
      ("ca", "abc") -> 2, ("abc", "ca") -> 2,
      ("ab", "ba") -> 1, ("abcd", "acbd") -> 1,
      ("", "abc") -> 3, ("abc", "") -> 3, ("", "") -> 0,
      ("abc", "abc") -> 0, ("kitten", "sitting") -> 3,
      ("martha", "marhta") -> 1)
    cases.foreach { case ((a, b), want) =>
      assert(dl(a, b) == want, s"dl($a, $b) = ${dl(a, b)}, want $want")
      assert(dl(a, b) == dl(b, a), s"dl not symmetric on ($a, $b)")
    }
    val viaSql = s.sql("SELECT damerau_levenshtein('ca', 'abc') AS d").head().getInt(0)
    assert(viaSql == 2)
  }

  test("string-similarity scratch reuse: repeated calls, fallback path, and the DP cap") {
    import graft.functions.StringSimilarity.{damerauLevenshtein, jaroWinkler, MaxDpCells, ScratchLen}
    import org.apache.spark.unsafe.types.UTF8String.{fromString => u}
    // repeated same-thread calls must not bleed scratch state between
    // rows (the da alphabet index and the jw match flags are re-zeroed)
    val pairs = Seq(("martha", "marhta"), ("kitten", "sitting"), ("ab", "ba"), ("abc", "xyz"))
    val first = pairs.map { case (a, b) => (damerauLevenshtein(u(a), u(b)), jaroWinkler(u(a), u(b))) }
    (1 to 3).foreach { _ =>
      val again = pairs.map { case (a, b) => (damerauLevenshtein(u(a), u(b)), jaroWinkler(u(a), u(b))) }
      assert(again == first, "scratch reuse changed results across calls")
    }
    // inputs past ScratchLen take the allocation fallback and must agree
    // with a scratch-sized computation of the same logical edit
    val long1 = "x" * (ScratchLen + 10)
    val long2 = "x" * (ScratchLen + 10 - 3)
    assert(damerauLevenshtein(u(long1), u(long2)) == 3)
    assert(jaroWinkler(u(long1), u(long1)) == 1.0)
    // past the DP-cell cap the expression fails with a clear message,
    // never an overflow or a giant allocation
    val huge = "y" * 8000
    val e = intercept[IllegalArgumentException] {
      damerauLevenshtein(u(huge), u(huge))
    }
    assert(e.getMessage.contains("candidate-pair verifier"))
    assert((8000L + 2) * (8000L + 2) > MaxDpCells) // the case genuinely exceeds the cap
  }
}
