package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expression: cosine similarity of two
  * `array<double>` columns, with whole-stage codegen.
  *
  * This is the tier-(b) extension path (SURVEY.md §2.11): the
  * higher-order-function formulation used by the oracle-checked
  * contract queries is three separate `aggregate(zip_with(...))`
  * lambda chains (interpreted per element); this expression fuses
  * dot product and both norms into one generated loop over the unsafe
  * array data — the form you want in the hot path of a 100 TB ANN
  * sweep. Accumulation order (index 0..n-1, double adds) is identical
  * to the HOF version and to the DuckDB oracle's
  * `list_sum(list_transform(...))`, so results match bit-for-bit and
  * the same oracle SQL validates both implementations.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  // AbstractDataType (and so ExpectsInputTypes) is private[sql]; the
  // type contract is enforced here instead. Callers cast float arrays
  // with `.cast("array<double>")` — no implicit coercion is inserted.
  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType): Boolean = t match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<double> arguments, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "cosine_sim"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val nx = x.numElements()
    val ny = y.numElements()
    val n = math.min(nx, ny)
    var dot = 0.0
    var xx = 0.0
    var yy = 0.0
    var i = 0
    while (i < n) {
      val xi = x.getDouble(i)
      val yi = y.getDouble(i)
      dot += xi * yi
      xx += xi * xi
      yy += yi * yi
      i += 1
    }
    i = n
    while (i < nx) { val xi = x.getDouble(i); xx += xi * xi; i += 1 }
    i = n
    while (i < ny) { val yi = y.getDouble(i); yy += yi * yi; i += 1 }
    dot / (math.sqrt(xx) * math.sqrt(yy))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val xx = ctx.freshName("xx")
      val yy = ctx.freshName("yy")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0, $xx = 0.0, $yy = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xi = $a.getDouble($i);
         |  double $yi = $b.getDouble($i);
         |  $dot += $xi * $yi; $xx += $xi * $xi; $yy += $yi * $yi;
         |}
         |for (int $i = $n; $i < $a.numElements(); $i++) {
         |  double $xi = $a.getDouble($i); $xx += $xi * $xi;
         |}
         |for (int $i = $n; $i < $b.numElements(); $i++) {
         |  double $yi = $b.getDouble($i); $yy += $yi * $yi;
         |}
         |${ev.value} = $dot / (java.lang.Math.sqrt($xx) * java.lang.Math.sqrt($yy));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)
}

object CosineSimilarity {
  /** Register `cosine_sim(a, b)` in the session's function registry so
    * plain `expr("cosine_sim(...)")` / SQL can use it. Idempotent.
    */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cosine_sim",
      exprs => CosineSimilarity(exprs(0), exprs(1)),
      "built-in")
}
