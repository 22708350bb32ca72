package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, DoubleType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native string-similarity expressions for the entity-resolution /
  * fuzzy-matching tier (the record-linkage verifiers that run on
  * BLOCKED candidate pairs — q120's discipline: candidates come from
  * an equi-join on a blocking key, these expressions only ever score
  * the candidates, never all pairs).
  *
  * Spark ships only `levenshtein`; these add the other two classics a
  * dedup/linkage pipeline reaches for, each as a codegen'd Catalyst
  * expression (a Scala UDF would box both strings per row and break
  * whole-stage codegen):
  *
  *  - [[JaroWinkler]] — Jaro similarity with the Winkler common-prefix
  *    boost (p = 0.1, prefix capped at 4, boost only above 0.7), the
  *    name-matching standard.
  *  - [[DamerauLevenshtein]] — TRUE Damerau-Levenshtein (unrestricted:
  *    adjacent transposition counts 1 even with later edits between —
  *    dl("ca","abc") = 2 where optimal-string-alignment says 3).
  *
  * Both operate on the raw UTF-8 BYTES of the inputs (no decode):
  * that is exactly DuckDB's semantics (measured: its
  * jaro_winkler_similarity('héllo','hello') = 0.84, the byte-level
  * answer), which keeps the oracle twins bit-comparable, and for the
  * ASCII identifier/name columns these verifiers run on, bytes and
  * code points coincide. All arithmetic is IEEE double in a fixed
  * evaluation order, so cross-engine results agree to the 6-decimal
  * rounding every similarity gate emits.
  */
object StringSimilarity {

  /** Inputs up to this many BYTES per side run on per-thread scratch
    * buffers (zero allocation on the per-row hot path — tasks are
    * single-threaded, so a ThreadLocal is race-free); longer inputs
    * fall back to per-call allocation. 512 covers every identifier /
    * name / title column these verifiers are for with room to spare;
    * the per-thread cost is one (514x514)-int DP matrix (~1 MB).
    */
  val ScratchLen = 512

  /** Hard ceiling on the Damerau-Levenshtein DP size: (|a|+2)*(|b|+2)
    * cells, computed in Long so it cannot overflow Int first. 2^24
    * cells (64 MB of ints, ~4k x 4k bytes) is already far beyond any
    * sane candidate-pair verification; above it the expression FAILS
    * with a clear message instead of OOM-ing or throwing
    * NegativeArraySizeException from silent int overflow (the old
    * behavior when someone pointed it at document text).
    */
  val MaxDpCells: Long = 1L << 24

  private final class DlScratch {
    val d = new Array[Int]((ScratchLen + 2) * (ScratchLen + 2))
    val da = new Array[Int](256)
  }
  private val dlScratch = ThreadLocal.withInitial[DlScratch](() => new DlScratch)
  private val jwScratch = ThreadLocal.withInitial[(Array[Boolean], Array[Boolean])](() =>
    (new Array[Boolean](ScratchLen), new Array[Boolean](ScratchLen)))

  /** Jaro-Winkler similarity over UTF-8 bytes. 0.0 when either input
    * is empty (DuckDB convention, including both-empty).
    */
  def jaroWinkler(a: UTF8String, b: UTF8String): Double = {
    val x = a.getBytes; val y = b.getBytes
    val la = x.length; val lb = y.length
    if (la == 0 || lb == 0) return 0.0
    val window = math.max(math.max(la, lb) / 2 - 1, 0)
    // match flags come from per-thread scratch for short inputs; the
    // algorithm only reads indices < la / < lb, which are re-zeroed here
    val (xm, ym) =
      if (la <= ScratchLen && lb <= ScratchLen) {
        val (sx, sy) = jwScratch.get()
        java.util.Arrays.fill(sx, 0, la, false)
        java.util.Arrays.fill(sy, 0, lb, false)
        (sx, sy)
      } else (new Array[Boolean](la), new Array[Boolean](lb))
    var m = 0
    var i = 0
    while (i < la) {
      val lo = math.max(0, i - window)
      val hi = math.min(lb - 1, i + window)
      var j = lo
      var found = false
      while (j <= hi && !found) {
        if (!ym(j) && x(i) == y(j)) {
          xm(i) = true; ym(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    // transpositions: matched chars out of order, counted as FLOOR of
    // half the mismatched positions (the classic integer halving —
    // measured to be DuckDB's semantics: 'blu gear' vs 'blue gear'
    // has 3 mismatched matches -> t = 1 -> 0.944907, not t = 1.5)
    var half = 0
    var j = 0
    i = 0
    while (i < la) {
      if (xm(i)) {
        while (!ym(j)) j += 1
        if (x(i) != y(j)) half += 1
        j += 1
      }
      i += 1
    }
    val t = half / 2
    val md = m.toDouble
    val jaro = (md / la + md / lb + (md - t) / md) / 3.0
    if (jaro <= 0.7) jaro
    else {
      var l = 0
      while (l < 4 && l < la && l < lb && x(l) == y(l)) l += 1
      jaro + l * 0.1 * (1.0 - jaro)
    }
  }

  /** TRUE Damerau-Levenshtein distance over UTF-8 bytes (the
    * alphabet-indexed DP; alphabet = 256 byte values). O(|a|*|b|) —
    * a candidate-pair verifier, never a corpus-pair scorer.
    */
  def damerauLevenshtein(a: UTF8String, b: UTF8String): Int = {
    val x = a.getBytes; val y = b.getBytes
    val la = x.length; val lb = y.length
    if (la == 0) return lb
    if (lb == 0) return la
    val cells = (la + 2L) * (lb + 2L)
    if (cells > MaxDpCells) throw new IllegalArgumentException(
      s"damerau_levenshtein inputs too long (|a|=$la, |b|=$lb bytes -> $cells DP cells, " +
        s"cap $MaxDpCells): this is an O(|a|*|b|) candidate-pair verifier — block or " +
        "truncate inputs before scoring, never apply it to document text")
    val inf = la + lb
    // short inputs run on per-thread scratch: the DP initializes every
    // cell of its (la+2) x (lb+2) logical window before reading it, so
    // only the alphabet-index array needs re-zeroing between rows
    val scratch = if (la <= ScratchLen && lb <= ScratchLen) dlScratch.get() else null
    val da =
      if (scratch != null) { java.util.Arrays.fill(scratch.da, 0); scratch.da }
      else new Array[Int](256)
    // d is (la+2) x (lb+2), flattened row-major
    val w = lb + 2
    val d = if (scratch != null) scratch.d else new Array[Int](cells.toInt)
    d(0) = inf
    var i = 0
    while (i <= la) { d((i + 1) * w) = inf; d((i + 1) * w + 1) = i; i += 1 }
    var j = 0
    while (j <= lb) { d(j + 1) = inf; d(w + j + 1) = j; j += 1 }
    i = 1
    while (i <= la) {
      var db = 0
      j = 1
      while (j <= lb) {
        val k = da(y(j - 1) & 0xFF)
        val l = db
        var cost = 1
        if (x(i - 1) == y(j - 1)) { cost = 0; db = j }
        val subst = d(i * w + j) + cost
        val insert = d((i + 1) * w + j) + 1
        val delete = d(i * w + j + 1) + 1
        val transp = d(k * w + l) + (i - 1 - k) + 1 + (j - 1 - l)
        d((i + 1) * w + j + 1) =
          math.min(math.min(subst, insert), math.min(delete, transp))
        j += 1
      }
      da(x(i - 1) & 0xFF) = i
      i += 1
    }
    d((la + 1) * w + lb + 1)
  }
}

abstract class StringSimilarityBinary extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"expected (string, string), got (${left.dataType}, ${right.dataType})")
}

case class JaroWinkler(left: Expression, right: Expression)
    extends StringSimilarityBinary {
  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any =
    StringSimilarity.jaroWinkler(
      a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.StringSimilarity.jaroWinkler($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

case class DamerauLevenshtein(left: Expression, right: Expression)
    extends StringSimilarityBinary {
  override def dataType: DataType = IntegerType

  override def nullSafeEval(a: Any, b: Any): Any =
    StringSimilarity.damerauLevenshtein(
      a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.StringSimilarity.damerauLevenshtein($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object StringSimilarityFunctions {
  def jaroWinkler(a: Column, b: Column): Column =
    ColumnBridge.column(JaroWinkler(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  def damerauLevenshtein(a: Column, b: Column): Column =
    ColumnBridge.column(DamerauLevenshtein(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
