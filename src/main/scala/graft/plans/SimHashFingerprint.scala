package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native SimHash fingerprint: `simhash_fp(tokenHashes)` → 32-char
  * '0'/'1' string, where bit j is the sign of Σ over tokens of
  * (nibble j of the token's md5 hex ≥ 8 ? +1 : −1).
  *
  * Bit-identical to the per-dimension higher-order `aggregate`
  * formulation the oracle mirrors (hex digit index ≥ 9 in
  * '0123456789abcdef' ⟺ nibble value ≥ 8), but one pass per token
  * updating all 32 counters instead of 32 interpreted lambda scans.
  */
case class SimHashFingerprint(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "simhash_fp"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${t.simpleString}")
  }

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val counts = new Array[Int](32)
    var i = 0
    while (i < n) {
      val h = arr.getUTF8String(i).toString
      val m = math.min(32, h.length)
      var j = 0
      while (j < m) {
        val c = h.charAt(j)
        val hi = c >= '8' && c <= '9' || c >= 'a' && c <= 'f'
        counts(j) += (if (hi) 1 else -1)
        j += 1
      }
      i += 1
    }
    val bits = new Array[Char](32)
    var j = 0
    while (j < 32) {
      bits(j) = if (counts(j) >= 0) '1' else '0'
      j += 1
    }
    UTF8String.fromString(new String(bits))
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object SimHashFingerprint {
  /** Register `simhash_fp(hashes)`. Idempotent. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "simhash_fp",
      exprs => SimHashFingerprint(exprs.head),
      "built-in")
}
