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
  * `((i*31 + j*17) mod 7) - 3`; j≥8: the mod-11 stride/offset family
  * — see SimilarityExtras.planeCoef, the shared source of truth).
  *
  * Bit-identical to the HOF `bucketSql` formulation the DuckDB oracle
  * mirrors: same left-to-right accumulation over dimensions 0..63 in
  * IEEE doubles, same `>= 0` sign test (NativeEquivalenceSpec proves
  * it), but one tight JVM loop instead of nbits × 64 interpreted
  * lambda frames per row — the per-row hot path of a full-corpus LSH
  * sweep. CodegenFallback is fine: the cost is the fused loop, which
  * is compiled JVM code either way.
  *
  * Null semantics also mirror the HOF — on a NULL array or any NULL
  * element in dims 0..63 the HOF's accumulator goes NULL for every bit
  * and `CASE WHEN NULL >= 0` takes the ELSE branch, yielding the
  * all-'0' signature; this expression reproduces that (never NULL
  * out), so a regenerated fixture with a malformed row cannot silently
  * split native from oracle. On an array SHORTER than 64 the HOF
  * errors under ANSI (`element_at` past the end); the native instead
  * degrades to the same all-'0' — strictly softer, and consistent with
  * the null-propagation shape the pre-ANSI HOF had.
  */
case class HyperplaneSignature(child: Expression, bits: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StringType
  override def nullable: Boolean = false
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

  @transient private lazy val allZero: UTF8String =
    UTF8String.fromString("0" * bits)

  // plane matrix hoisted out of the per-row loop; planeCoef is the
  // shared source of truth with the HOF/oracle formulations
  @transient private lazy val planes: Array[Array[Int]] =
    Array.tabulate(bits, 64)((j, i) =>
      graft.operators.SimilarityExtras.planeCoef(i, j))

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    // HOF parity on malformed rows: NULL array, short array, or a NULL
    // element nulls the HOF accumulator for EVERY bit → all-'0'
    if (v == null) return allZero
    val arr = v.asInstanceOf[ArrayData]
    if (arr.numElements() < 64) return allZero
    var i = 0
    while (i < 64) {
      if (arr.isNullAt(i)) return allZero
      i += 1
    }
    val out = new Array[Char](bits)
    var j = 0
    while (j < bits) {
      val p = planes(j)
      var acc = 0.0
      i = 0
      while (i < 64) {
        val x = if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
        acc += x * p(i)
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
