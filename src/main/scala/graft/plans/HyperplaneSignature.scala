package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native hyperplane-sign LSH signature: `hyperplane_sig(e, nbits)` →
  * '0'/'1' string of `nbits` sign bits over the deterministic integer
  * hyperplane family of graft.operators.SimilarityExtras (plane j<8:
  * `((i*31 + j*17) mod 7) - 3`; j≥8: the distinct stride/offset family
  * — see SimilarityExtras' scaladoc for why the two families).
  *
  * Bit-identical to the HOF `bucketSql` formulation the DuckDB oracle
  * mirrors: same left-to-right accumulation over dimensions 0..63 in
  * IEEE doubles, same `>= 0` sign test (NativeEquivalenceSpec proves
  * it), but one tight JVM loop instead of nbits × 64 interpreted
  * lambda frames per row — the per-row hot path of a full-corpus LSH
  * sweep. CodegenFallback is fine: the cost is the fused loop, which
  * is compiled JVM code either way.
  */
case class HyperplaneSignature(child: Expression, bits: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "hyperplane_sig"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType | FloatType, _) if bits >= 1 && bits <= 64 =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float|double> and 1 <= nbits <= 64, " +
        s"got ${t.simpleString} / $bits")
  }

  @transient private lazy val isFloat =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  /** Plane coefficient — MUST stay in lockstep with
    * SimilarityExtras.bucketSql and its DuckDB twin.
    */
  private def coef(i: Int, j: Int): Int =
    if (j < 8) ((i * 31 + j * 17) % 7) - 3
    else {
      val m = j - 8
      val h = m % 5 + 1 + (if (m % 5 >= 2) 1 else 0)
      val k = m / 5 + 1
      ((i * h + k) % 7) - 3
    }

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    // the HOF iterates dimensions 0..63 regardless of array length
    // (element_at past the end nulls the sum); data is 64-dim, so the
    // clamp only guards malformed rows
    val dims = math.min(arr.numElements(), 64)
    val out = new Array[Char](bits)
    var j = 0
    while (j < bits) {
      var acc = 0.0
      var i = 0
      while (i < dims) {
        val x = if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
        acc += x * coef(i, j)
        i += 1
      }
      out(j) = if (acc >= 0) '1' else '0'
      j += 1
    }
    UTF8String.fromString(new String(out))
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object HyperplaneSignature {
  /** Register `hyperplane_sig(e, nbits)` (nbits must be an int
    * literal). Idempotent.
    */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "hyperplane_sig",
      exprs => HyperplaneSignature(exprs.head, exprs(1) match {
        case Literal(v: Int, IntegerType) => v
        case other => throw new IllegalArgumentException(
          s"hyperplane_sig nbits must be an integer literal, got $other")
      }),
      "built-in")
}
