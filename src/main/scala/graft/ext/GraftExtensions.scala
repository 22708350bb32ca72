package graft.ext

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import graft.functions.{CosineSimilarity, DamerauLevenshtein, DotProduct, JaccardSimilarity, JaroWinkler, MortonInterleave, NfcNormalize, SimHash48, WordShingles}

/** SparkSessionExtensions entry point: registers the engine's native
  * Catalyst expressions as SQL functions, so the `spark.sql(...)` path
  * reaches the same codegen'd operators as the Column API
  * (SURVEY.md §2.10 — the custom-Expression tier of the UDF ladder).
  *
  * Activate per session with
  *   .config("spark.sql.extensions", "graft.ext.GraftExtensions")
  * or programmatically via `SparkSession.builder().withExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, "")

  private def intArg(e: Expression, fn: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$fn: expected integer literal, got $other")
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)

    ext.injectFunction((
      FunctionIdentifier("cosine_sim"),
      info("cosine_sim", "cosine_sim(array<float>, array<float>) - cosine similarity, 0.0 on zero norm"),
      (args: Seq[Expression]) => CosineSimilarity(args(0), args(1))))

    ext.injectFunction((
      FunctionIdentifier("dot_product"),
      info("dot_product", "dot_product(array<float>, array<float>) - double-accumulated dot product"),
      (args: Seq[Expression]) => DotProduct(args(0), args(1))))

    ext.injectFunction((
      FunctionIdentifier("simhash48"),
      info("simhash48", "simhash48(array<string>) - 48-bit SimHash of a token array"),
      (args: Seq[Expression]) => SimHash48(args(0))))

    ext.injectFunction((
      FunctionIdentifier("nfc_normalize"),
      info("nfc_normalize", "nfc_normalize(string) - Unicode NFC normalization (UAX #15)"),
      (args: Seq[Expression]) => NfcNormalize(args(0))))

    ext.injectFunction((
      FunctionIdentifier("word_shingles"),
      info("word_shingles", "word_shingles(array<string>, n) - distinct word n-gram shingles"),
      (args: Seq[Expression]) =>
        WordShingles(args(0), intArg(args(1), "word_shingles"))))

    ext.injectFunction((
      FunctionIdentifier("jaccard_sim"),
      info("jaccard_sim", "jaccard_sim(array<string>, array<string>) - exact Jaccard over distinct elements"),
      (args: Seq[Expression]) => JaccardSimilarity(args(0), args(1))))

    ext.injectFunction((
      FunctionIdentifier("morton_interleave"),
      info("morton_interleave", "morton_interleave(bigint, bigint, bits) - Z-order bit interleave of the low `bits` bits"),
      (args: Seq[Expression]) =>
        MortonInterleave(args(0), args(1), intArg(args(2), "morton_interleave"))))

    ext.injectFunction((
      FunctionIdentifier("jaro_winkler_sim"),
      info("jaro_winkler_sim", "jaro_winkler_sim(string, string) - Jaro-Winkler similarity over UTF-8 bytes (p=0.1, prefix<=4, boost above 0.7)"),
      (args: Seq[Expression]) => JaroWinkler(args(0), args(1))))

    ext.injectFunction((
      FunctionIdentifier("damerau_levenshtein"),
      info("damerau_levenshtein", "damerau_levenshtein(string, string) - true (unrestricted) Damerau-Levenshtein distance over UTF-8 bytes"),
      (args: Seq[Expression]) => DamerauLevenshtein(args(0), args(1))))
  }
}

object GraftExtensions {
  /** Same registrations for an already-running session (tests, REPL). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    if (!spark.experimental.extraStrategies.contains(graft.plans.AsOfJoinStrategy)) {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ graft.plans.AsOfJoinStrategy
    }
    val reg: FunctionRegistry = spark.sessionState.functionRegistry
    def add(name: String, builder: Seq[Expression] => Expression): Unit =
      reg.registerFunction(
        FunctionIdentifier(name),
        new ExpressionInfo(classOf[GraftExtensions].getName, null, name),
        builder)
    val self = new GraftExtensions
    add("cosine_sim", args => CosineSimilarity(args(0), args(1)))
    add("dot_product", args => DotProduct(args(0), args(1)))
    add("simhash48", args => SimHash48(args(0)))
    add("word_shingles", args => WordShingles(args(0), self.intArg(args(1), "word_shingles")))
    add("jaccard_sim", args => JaccardSimilarity(args(0), args(1)))
    add("nfc_normalize", args => NfcNormalize(args(0)))
    add("morton_interleave",
      args => MortonInterleave(args(0), args(1), self.intArg(args(2), "morton_interleave")))
    add("jaro_winkler_sim", args => JaroWinkler(args(0), args(1)))
    add("damerau_levenshtein", args => DamerauLevenshtein(args(0), args(1)))
  }
}
