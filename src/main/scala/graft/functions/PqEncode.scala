package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native PQ ENCODER: all `nSub` subspace codes of one embedding in a
  * single codegen'd pass against a plan-embedded codebook.
  *
  * The DataFrame formulation this replaces cross-joined every vector
  * with the broadcast (cent_idx, s) codebook frame — nCents x nSub
  * (= 128) rows PER VECTOR, each evaluating a non-codegen
  * `aggregate(zip_with(slice...))` lambda chain, then a hash aggregate
  * to take the packed argmin. That shape was the scale probe's
  * heaviest entry (q211 sf10: 137.8 s, of which the encode dominates;
  * q205/q207/q210 pay it too). Here the whole argmin runs inside
  * whole-stage codegen reading floats straight from the unsafe array
  * buffer: one output row per vector, nSub codes, no join, no
  * aggregate, no shuffle.
  *
  * BIT-PARITY with the replaced form and the DuckDB oracle is the
  * contract, so the numerics are replicated exactly:
  *
  *  - per-subspace distance: LEFT-TO-RIGHT double accumulation of
  *    (float->double diffs)^2 — the same order as the old
  *    `aggregate(..., (acc, x) => acc + x)` fold and DuckDB's
  *    list_reduce;
  *  - the distance is snapped EXACTLY like the old column chain
  *    `round(round(dist, 6) * 1e6, 0).cast("long")`: two HALF_UP
  *    BigDecimal roundings through [[PqEncodeCodes.snap6i]], which
  *    reproduces Spark's `Round` (BigDecimal.valueOf + setScale
  *    HALF_UP) so composition with the oracle's `round(dist, 6)` is
  *    unchanged;
  *  - argmin = min over packed `dist6i * nCents + cent_idx` — the
  *    identical lexicographic (distance, index) tie-break.
  *
  * Null semantics differ from the old form in one corner the gates
  * never exercise: a NULL embedding row used to surface as a NULL
  * code after the min-aggregate; here the expression is null-safe
  * (NULL in -> NULL array out), and a posexplode caller drops the
  * row. Embeddings are non-null by schema in every gate and testdata
  * drop — and both corners are PINNED by spec (AdvancedSpec), not just
  * documented: a NULL embedding yields a NULL code array (posexplode
  * drop is the caller's explicit choice), and an embedding SHORTER
  * than nSub x subDim fails fast with a clear message instead of
  * reading past the unsafe buffer (the old slice/zip_with form
  * silently degraded to null distances there).
  */
case class PqEncodeCodes(
    child: Expression,
    codebook: Array[Float], // flattened [cent][dim], nCents x (nSub*subDim)
    nSub: Int,
    subDim: Int,
    nCents: Int) extends UnaryExpression {

  require(codebook.length == nCents * nSub * subDim,
    s"codebook length ${codebook.length} != $nCents x $nSub x $subDim")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"expected array<float>, got $t")
  }

  override def nullSafeEval(input: Any): Any =
    PqEncodeCodes.computeCodes(
      input.asInstanceOf[ArrayData], codebook, nSub, subDim, nCents)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("pqCodebook", codebook, "float[]")
    nullSafeCodeGen(ctx, ev, e =>
      s"""${ev.value} = graft.functions.PqEncodeCodes.computeCodes(
         |  $e, $cbRef, $nSub, $subDim, $nCents);""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PqEncodeCodes {
  /** `round(round(d, 6) * 1e6, 0)` as a long — byte-exact twin of
    * Spark's Round (java BigDecimal.valueOf + HALF_UP), composed the
    * same way the old column chain composed it.
    */
  def snap6i(d: Double): Long =
    java.math.BigDecimal
      .valueOf(java.math.BigDecimal.valueOf(d)
        .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue() * 1e6)
      .setScale(0, java.math.RoundingMode.HALF_UP)
      .longValue()

  /** All subspace codes of one vector; static so generated code calls
    * one method per row (the 128 distance loops dominate, not the
    * call). Packed-min argmin, identical to min(dist6i*nCents+idx).
    */
  def computeCodes(emb: ArrayData, cb: Array[Float],
                   nSub: Int, subDim: Int, nCents: Int): ArrayData = {
    val dim = nSub * subDim
    // Fail fast on a malformed vector: the unsafe getFloat below would
    // otherwise read past the array buffer (AIOOBE deep inside
    // generated code, or worse, garbage floats). The replaced
    // slice/zip_with formulation degraded to null distances here; a
    // short embedding is corrupt input, not a null, so the defined
    // behavior is a loud error naming the row's shape.
    if (emb.numElements() < dim)
      throw new IllegalArgumentException(
        s"PqEncodeCodes: embedding has ${emb.numElements()} elements, " +
          s"need >= $dim ($nSub subspaces x $subDim dims)")
    val out = new Array[Long](nSub)
    var s = 0
    while (s < nSub) {
      var bestPacked = Long.MaxValue
      var c = 0
      while (c < nCents) {
        var acc = 0.0
        var i = 0
        val base = s * subDim
        while (i < subDim) {
          val d = emb.getFloat(base + i).toDouble - cb(c * dim + base + i).toDouble
          acc += d * d
          i += 1
        }
        val packed = snap6i(acc) * nCents + c
        if (packed < bestPacked) bestPacked = packed
        c += 1
      }
      // pmod(bestPacked, nCents): dist6i >= 0 so plain mod is the pmod
      out(s) = bestPacked % nCents
      s += 1
    }
    new GenericArrayData(out)
  }
}
