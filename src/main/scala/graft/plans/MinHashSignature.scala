package graft.plans

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native MinHash signature expression: `minhash_sig(shingles)` →
  * array of `k` hex strings (default 8 — the contract scheme; an
  * optional second LITERAL argument overrides it:
  * `minhash_sig(shingles, 16)`), where component j is the
  * lexicographic min over shingles of md5(j || ':' || shingle).
  *
  * Semantically identical to the nested higher-order-function
  * formulation in graft.operators.DedupExtras (same md5-of-UTF8,
  * same lowercase hex, same min), but evaluated as one tight JVM loop
  * with a reused MessageDigest instead of k × |shingles| interpreted
  * lambda frames — the hot-path form for the 100 TB dedup sweep.
  * CodegenFallback is fine here: the cost is the digest loop itself,
  * which is compiled JVM code either way.
  *
  * The k parameter exists for [[graft.operators.LshPlanner]]-chosen
  * banding schemes (a b × r factorization needs k = b·r signature
  * components); components are INDEX-STABLE across k — component j is
  * the same hash family member at any k, so a k=8 signature is a
  * prefix of the k=16 one.
  */
case class MinHashSignature(child: Expression, k: Int = 8)
    extends UnaryExpression with CodegenFallback {

  require(k >= 1, s"minhash_sig: k=$k")

  // containsNull: an empty shingle array yields null components — the
  // same behavior as array_min(transform(empty)) in the HOF form.
  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "minhash_sig"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${t.simpleString}")
  }

  @transient private lazy val hexDigits = "0123456789abcdef".toCharArray

  private def hex(bytes: Array[Byte]): String = {
    val out = new Array[Char](bytes.length * 2)
    var i = 0
    while (i < bytes.length) {
      out(2 * i) = hexDigits((bytes(i) >> 4) & 0xf)
      out(2 * i + 1) = hexDigits(bytes(i) & 0xf)
      i += 1
    }
    new String(out)
  }

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val mins = new Array[String](k)
    val md = MessageDigest.getInstance("MD5")
    var i = 0
    while (i < n) {
      val s = arr.getUTF8String(i).toString
      var j = 0
      while (j < k) {
        md.reset()
        md.update((j.toString + ":" + s).getBytes(StandardCharsets.UTF_8))
        val h = hex(md.digest())
        if (mins(j) == null || h.compareTo(mins(j)) < 0) mins(j) = h
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins.map(UTF8String.fromString))
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object MinHashSignature {
  /** Register `minhash_sig(shingles[, k])`. Idempotent. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "minhash_sig",
      {
        case Seq(c) => MinHashSignature(c)
        case Seq(c, org.apache.spark.sql.catalyst.expressions
            .Literal(k: Int, org.apache.spark.sql.types.IntegerType)) =>
          MinHashSignature(c, k)
        case other => throw new IllegalArgumentException(
          s"minhash_sig(shingles[, k-literal]): got ${other.size} args")
      },
      "built-in")
}
