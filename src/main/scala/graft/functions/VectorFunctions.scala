package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Native Catalyst expressions for Array[Float] embedding math.
  *
  * A Scala UDF here would deserialize each ArrayData into a
  * Seq[Float] per row and break whole-stage codegen; these expressions
  * read floats straight out of the unsafe array buffer inside the
  * generated loop — the similarity-search hot path stays in one
  * codegen stage end-to-end.
  *
  * Numerics: accumulate in double, sequential order. All ops used
  * (+, *, /, sqrt) are IEEE-754 correctly-rounded, so results are
  * bit-identical to any engine that evaluates the same expression in
  * the same order — which is what keeps the DuckDB oracle hash-stable
  * without rounding tricks.
  */
abstract class FloatVectorBinary extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): TypeCheckResult =
    if (children.forall(_.dataType match {
          case ArrayType(FloatType, _) => true
          case _ => false
        }))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"expected array<float> inputs, got ${children.map(_.dataType).mkString(", ")}")
}

/** cosine(a, b) = dot/(|a|*|b|); 0.0 when either norm is 0. */
case class CosineSimilarity(left: Expression, right: Expression) extends FloatVectorBinary {
  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var nx = 0.0; var ny = 0.0; var i = 0
    while (i < n) {
      val xi = x.getFloat(i).toDouble
      val yi = y.getFloat(i).toDouble
      dot += xi * yi; nx += xi * xi; ny += yi * yi; i += 1
    }
    if (nx == 0.0 || ny == 0.0) 0.0 else dot / (math.sqrt(nx) * math.sqrt(ny))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val (i, n, dot, nx, ny, x, y) = (ctx.freshName("i"), ctx.freshName("n"),
        ctx.freshName("dot"), ctx.freshName("nx"), ctx.freshName("ny"),
        ctx.freshName("x"), ctx.freshName("y"))
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0, $nx = 0.0, $ny = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $x = (double) $a.getFloat($i);
         |  double $y = (double) $b.getFloat($i);
         |  $dot += $x * $y; $nx += $x * $x; $ny += $y * $y;
         |}
         |${ev.value} = ($nx == 0.0 || $ny == 0.0)
         |  ? 0.0 : $dot / (java.lang.Math.sqrt($nx) * java.lang.Math.sqrt($ny));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** dot(a, b) in double accumulation. */
case class DotProduct(left: Expression, right: Expression) extends FloatVectorBinary {
  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var i = 0
    while (i < n) { dot += x.getFloat(i).toDouble * y.getFloat(i).toDouble; i += 1 }
    dot
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val (i, n, dot) = (ctx.freshName("i"), ctx.freshName("n"), ctx.freshName("dot"))
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $dot += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |}
         |${ev.value} = $dot;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object VectorFunctions {
  def cosineSim(a: Column, b: Column): Column =
    ColumnBridge.column(CosineSimilarity(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  def dotProduct(a: Column, b: Column): Column =
    ColumnBridge.column(DotProduct(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** DuckDB-side cosine over float lists, double accumulation in element
    * order — the SQL twin of CosineSimilarity for oracle checks.
    * Dot AND norms all range over the shared prefix, exactly like the
    * Spark expression (norms over the full arrays would diverge for
    * unequal lengths); `list_sum` of the empty prefix is NULL in
    * DuckDB, so it is coalesced to 0 -> the 0.0 guard, matching Spark.
    */
  def cosineSqlDuck(a: String, b: String): String = {
    val series = s"generate_series(1, least(len($a), len($b)))"
    val nx = s"coalesce(list_sum(list_transform($series, i -> CAST($a[i] AS DOUBLE) * CAST($a[i] AS DOUBLE))), 0)"
    val ny = s"coalesce(list_sum(list_transform($series, i -> CAST($b[i] AS DOUBLE) * CAST($b[i] AS DOUBLE))), 0)"
    val dot = s"list_sum(list_transform($series, i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)))"
    s"""(CASE WHEN $nx = 0 OR $ny = 0 THEN 0.0
       | ELSE $dot / (sqrt($nx) * sqrt($ny))
       | END)""".stripMargin.replaceAll("\n", " ")
  }
}
