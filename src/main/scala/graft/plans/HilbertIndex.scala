package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, JavaCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{DataType, IntegerType, LongType}

/** Native Catalyst expression: Hilbert-curve index of N int bucket ids.
  *
  * Drop-in alternative to `InterleaveBits` (Morton/Z-order) as the
  * clustering key in `operators/ZOrder`. The Hilbert curve's defining
  * property — consecutive indices are ALWAYS spatially adjacent (one
  * unit step in exactly one dimension), where the Z-curve periodically
  * jumps across the key space — gives each contiguous index range (i.e.
  * each output file) a tighter bounding box, so footer min/max stats
  * prune a bit more than Z-order on the same data. The encoding is
  * Skilling's public-domain transpose algorithm (J. Skilling,
  * "Programming the Hilbert curve", AIP Conf. Proc. 707, 2004): rotate/
  * reflect the axes into "transpose" form, then bit-interleave exactly
  * as Morton does — so this expression reuses `InterleaveBits.scatter`
  * and plain long ordering follows the curve.
  *
  * Codegen evaluates the children inline and calls the static
  * [[HilbertIndex.encode]] kernel — the per-row cost is O(dims × bits)
  * integer ops either way, and keeping the loop in one audited kernel
  * means eval, codegen, and the spec's reference all share it.
  */
case class HilbertIndex(children: Seq[Expression], bitsPerDim: Int)
    extends Expression {

  private def n = children.size

  override def checkInputDataTypes(): TypeCheckResult = {
    if (children.isEmpty)
      TypeCheckResult.TypeCheckFailure(s"$prettyName requires at least one bucket column")
    else if (bitsPerDim < 1 || n * bitsPerDim > 63)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires 1 <= dims*bits <= 63, got $n*$bitsPerDim")
    else if (children.forall(_.dataType == IntegerType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires int bucket ids, got " +
        children.map(_.dataType.simpleString).mkString(", "))
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = children.exists(_.nullable)
  override def prettyName: String = "hilbert_index"

  override def eval(input: InternalRow): Any = {
    val axes = new Array[Int](n)
    var d = 0
    while (d < n) {
      val v = children(d).eval(input)
      if (v == null) return null
      axes(d) = v.asInstanceOf[Int]
      d += 1
    }
    HilbertIndex.encode(axes, bitsPerDim)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val isNull = ctx.freshName("hiNull")
    val value = ctx.freshName("hiValue")
    val axes = ctx.freshName("hiAxes")
    val perChild = children.zipWithIndex.map { case (c, d) =>
      val g = c.genCode(ctx)
      s"""
         |if (!$isNull) {
         |  ${g.code}
         |  if (${g.isNull}) { $isNull = true; } else { $axes[$d] = ${g.value}; }
         |}
       """.stripMargin
    }
    ev.copy(
      code = code"""
        boolean $isNull = false;
        long $value = 0L;
        int[] $axes = new int[$n];
        ${perChild.mkString("\n")}
        if (!$isNull) {
          $value = graft.plans.HilbertIndex.encode($axes, $bitsPerDim);
        }
      """,
      isNull = JavaCode.isNullVariable(isNull),
      value = JavaCode.variable(value, LongType))
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression = copy(children = newChildren)
}

object HilbertIndex {

  /** Hilbert index of one bucket tuple (each axis in [0, 2^bits)).
    * Skilling's AxesToTranspose followed by the Morton interleave of
    * the transposed axes. MUTATES a private copy, not the caller's
    * array view of it — safe to call from generated code.
    */
  def encode(axesIn: Array[Int], bits: Int): Long = {
    val n = axesIn.length
    val x = java.util.Arrays.copyOf(axesIn, n)
    // AxesToTranspose (Skilling 2004): undo excess rotations/reflections
    var q = 1 << (bits - 1)
    while (q > 1) {
      val p = q - 1
      var i = 0
      while (i < n) {
        if ((x(i) & q) != 0) {
          x(0) ^= p // invert low bits of axis 0
        } else {
          val t = (x(0) ^ x(i)) & p
          x(0) ^= t
          x(i) ^= t // exchange low bits with axis 0
        }
        i += 1
      }
      q >>= 1
    }
    // Gray encode
    var i = 1
    while (i < n) { x(i) ^= x(i - 1); i += 1 }
    var t = 0
    q = 1 << (bits - 1)
    while (q > 1) {
      if ((x(n - 1) & q) != 0) t ^= q - 1
      q >>= 1
    }
    i = 0
    while (i < n) { x(i) ^= t; i += 1 }
    // transpose form interleaves exactly like Morton
    var z = 0L
    i = 0
    while (i < n) { z |= InterleaveBits.scatter(x(i), i, n, bits); i += 1 }
    z
  }

  /** Register `hilbert_index(bits, c1, c2, ...)` (bits must be an int
    * literal) in the session's function registry. Idempotent.
    */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "hilbert_index",
      exprs => HilbertIndex(exprs.tail, exprs.head match {
        case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, IntegerType) => v
        case other => throw new IllegalArgumentException(
          s"hilbert_index bits must be an integer literal, got $other")
      }),
      "built-in")
}
