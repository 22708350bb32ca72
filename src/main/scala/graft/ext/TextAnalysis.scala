package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text analysis for large-scale training-data pipelines: tokenization,
  * shingling, language-ID (marker-word heuristic), quality scoring,
  * BPE-ish token counting, and document fingerprinting.
  *
  * Everything is pure column expressions (codegen'd, no UDFs), and each
  * primitive has a DuckDB twin (same constants, same arithmetic) in
  * `Sql` so queries built from these are oracle-checkable. Numeric
  * discipline: only +,*,/,min/max and integer counts — no
  * transcendentals, so results are bit-identical cross-engine.
  *
  * The corpus is the `documents` table: lowercase [a-z0-9 ] text
  * (verified), 10-99 tokens per doc.
  */
object TextAnalysis {

  val Stopwords: Seq[String] = Seq("the", "a", "and", "of", "to", "in", "is", "for")

  /** Marker words per language for the n-gram/stopword language-ID
    * heuristic. Evaluation order (en, es, de, fr) is the deterministic
    * tie-break.
    */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "and", "of", "to"),
    "es" -> Seq("el", "la", "de", "que", "y"),
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "fr" -> Seq("le", "les", "et", "en", "des"))

  def tokens(text: Column): Column = split(text, " ")

  /** Distinct word n-gram shingles; whole-suffix shingle for texts
    * shorter than n tokens (clamps, same as DuckDB's l[i:j]). Native
    * single-pass expression — see functions.WordShingles.
    */
  def shingles(toks: Column, n: Int): Column =
    graft.functions.ShingleFunctions.wordShingles(toks, n)

  /** Count of tokens contained in `words` (with multiplicity). */
  def countIn(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => t.isin(words.map(w => lit(w)): _*)))

  /** BPE-ish subword count: runs of letters, runs of digits, or a
    * single other non-space char.
    */
  val BpePattern = "[a-z]+|[0-9]+|[^a-z0-9 ]"
  def bpeTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit(BpePattern), lit(0)))

  def digitTokenCount(toks: Column): Column =
    size(filter(toks, t => t.rlike("^[0-9]+$")))

  /** Deterministic quality score in [0,1]: length component, non-digit
    * component, stopword-density component. Pure rational arithmetic.
    */
  def qualityScore(nTokens: Column, nDigit: Column, nStop: Column): Column =
    lit(0.5) * least(nTokens.cast("double") / 50.0, lit(1.0)) +
      lit(0.3) * (lit(1.0) - nDigit.cast("double") / nTokens) +
      lit(0.2) * least(nStop.cast("double") / nTokens * 5.0, lit(1.0))

  /** Predicted language: argmax of marker-word counts with fixed
    * precedence; "und" (undetermined) when every score is zero.
    */
  def langId(toks: Column): Column = {
    val scores = LangMarkers.map { case (lang, ws) => lang -> countIn(toks, ws) }
    val nonZero = scores.map(_._2).reduce(_ + _) > 0
    val best = scores.tails.collect { case (lang, s) +: rest =>
      (lang, rest.map(_._2).foldLeft(s === s)((acc, o) => acc && s >= o))
    }.toSeq
    when(!nonZero, lit("und")).otherwise(
      best.init.foldRight(lit(best.last._1)) { case ((lang, cond), els) =>
        when(cond, lit(lang)).otherwise(els)
      })
  }

  /** Exact content fingerprint. */
  def md5Fingerprint(text: Column): Column = md5(text.cast("binary"))

  /** Winnowing-style fingerprint: min hash over word-3-gram shingles —
    * equal for documents sharing their minimal shingle (MinHash k=1).
    */
  def winnowFingerprint(text: Column): Column =
    array_min(transform(shingles(tokens(text), 3), s => md5(s.cast("binary"))))

  /** SimHash bit width. 48 bits (not 16): at 5k+ docs a 16-bit space
    * collides constantly and the near-pair join explodes (measured:
    * 3M+ candidate pairs, 40 s at sf0.1); 48 bits with 12-bit
    * pigeonhole blocks keeps random block-collisions at ~2.4e-4.
    */
  val SimhashBits = 48

  /** 64 hex chars of hash material per token: md5(t#0) || md5(t#1).
    * Computed ONCE per token and materialized; every SimHash bit then
    * reads one char — hashing per (token x bit) was the q29 hotspot
    * (48 md5/token, 24 s at sf0.1).
    */
  def tokenHashHex(t: Column): Column =
    concat(md5(concat(t, lit("#0")).cast("binary")),
           md5(concat(t, lit("#1")).cast("binary")))

  /** SimHash over a materialized array of tokenHashHex strings: bit j
    * is the majority over tokens of the parity of hex char j+1.
    */
  def simhashFromHashes(hashes: Column): Column =
    (0 until SimhashBits).map { j =>
      val ones = size(filter(hashes, h =>
        ascii(substring(h, j + 1, 1)) % 2 === 1))
      when(ones * 2 >= size(hashes), lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** DuckDB twins of the expressions above (same constants/order). */
  object Sql {
    val toks = "string_split(text, ' ')"
    def inList(ws: Seq[String]): String = ws.map(w => s"'$w'").mkString("(", ", ", ")")
    def countIn(ws: Seq[String]): String =
      s"len(list_filter($toks, t -> t IN ${inList(ws)}))"
    val nTokens = s"len($toks)"
    val bpeCount = s"len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]'))"
    val nDigit = s"len(list_filter($toks, t -> regexp_matches(t, '^[0-9]+$$')))"
    /** shingles over a bound list variable (use in a CTE: ts = string_split). */
    def shinglesOf(ts: String): String =
      s"list_distinct(list_transform(generate_series(1, greatest(len($ts) - 2, 1)), " +
        s"i -> array_to_string($ts[i:i+2], ' ')))"
    def winnowOf(sh: String): String =
      s"list_aggregate(list_transform($sh, s -> md5(s)), 'min')"
    def minhashOf(sh: String, salt: Int): String =
      s"list_aggregate(list_transform($sh, s -> md5(s || '#$salt')), 'min')"
    val quality =
      s"(0.5 * least(CAST($nTokens AS DOUBLE) / 50.0, 1.0) " +
        s"+ 0.3 * (1.0 - CAST($nDigit AS DOUBLE) / $nTokens) " +
        s"+ 0.2 * least(CAST(${countIn(Stopwords)} AS DOUBLE) / $nTokens * 5.0, 1.0))"
    val langId: String = {
      val scores = LangMarkers.map { case (lang, ws) => lang -> countIn(ws) }
      val total = scores.map(_._2).mkString(" + ")
      val chain = scores.tails.collect { case (lang, s) +: rest if rest.nonEmpty =>
        val conds = rest.map { case (_, o) => s"$s >= $o" }.mkString(" AND ")
        s"WHEN $conds THEN '$lang'"
      }.mkString(" ")
      s"(CASE WHEN ($total) = 0 THEN 'und' $chain ELSE '${LangMarkers.last._1}' END)"
    }
    /** token-hash CTE body: bind as  th AS (SELECT doc_id, <tokenHashes> AS hs FROM documents) */
    val tokenHashes: String =
      s"list_transform($toks, t -> md5(t || '#0') || md5(t || '#1'))"
    /** SimHash over a bound hash-array variable (same bits as
      * simhashFromHashes).
      */
    def simhashOf(hs: String): String =
      (0 until SimhashBits).map { j =>
        s"(CASE WHEN len(list_filter($hs, h -> ascii(substr(h, ${j + 1}, 1)) % 2 = 1)) * 2" +
          s" >= len($hs) THEN CAST(${1L << j} AS BIGINT) ELSE 0 END)"
      }.mkString("(", " + ", ")")
    /** 28-bit integer shingle hash from the md5 prefix: portable via
      * ('0x' || substr)::BIGINT.
      */
    def shingleHashOf(s: String): String =
      s"CAST(('0x' || substr(md5($s), 1, 7)) AS BIGINT)"
  }
}
