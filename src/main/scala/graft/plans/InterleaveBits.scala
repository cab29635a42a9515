package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, JavaCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{DataType, IntegerType, LongType}

/** Native Catalyst expression: bit-interleave N int bucket ids into one
  * long Z-value (Morton code), with whole-stage codegen.
  *
  * This is the clustering key behind multi-dimensional data layout
  * (`operators/ZOrder`): sorting by the interleaved value places rows
  * that are close in EVERY dimension into the same output files, so
  * parquet footer min/max statistics prune scans for predicates on any
  * subset of the dimensions — the property a single-column sort only
  * provides for its leading column. At 100 TB this is the difference
  * between a point-box query reading a few files and reading the whole
  * table for any filter that doesn't lead the sort key.
  *
  * Bit layout (MSB-first, so plain long ordering == Z-curve ordering):
  * input bit `j` (0-indexed from LSB) of dimension `d` (0-indexed,
  * dimension 0 most significant within a group) lands at output bit
  * `j * n + (n - 1 - d)`. `n * bitsPerDim` must stay within 63 bits so
  * the value is non-negative and range-partitionable as a plain long.
  * Any null input yields a null Z-value; layout callers coalesce nulls
  * into bucket 0 first so no row is dropped from the written output.
  */
case class InterleaveBits(children: Seq[Expression], bitsPerDim: Int)
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
  override def prettyName: String = "interleave_bits"
  override def foldable: Boolean = children.forall(_.foldable)

  override def eval(input: InternalRow): Any = {
    var z = 0L
    var d = 0
    while (d < n) {
      val v = children(d).eval(input)
      if (v == null) return null
      z |= InterleaveBits.scatter(v.asInstanceOf[Int], d, n, bitsPerDim)
      d += 1
    }
    z
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val isNull = ctx.freshName("ibNull")
    val value = ctx.freshName("ibValue")
    val perChild = children.zipWithIndex.map { case (c, d) =>
      val g = c.genCode(ctx)
      s"""
         |if (!$isNull) {
         |  ${g.code}
         |  if (${g.isNull}) {
         |    $isNull = true;
         |  } else {
         |    for (int j = 0; j < $bitsPerDim; j++) {
         |      $value |= ((long) ((${g.value} >>> j) & 1)) << (j * $n + ${n - 1 - d});
         |    }
         |  }
         |}
       """.stripMargin
    }
    ev.copy(
      code = code"""
        boolean $isNull = false;
        long $value = 0L;
        ${perChild.mkString("\n")}
      """,
      isNull = JavaCode.isNullVariable(isNull),
      value = JavaCode.variable(value, LongType))
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression = copy(children = newChildren)
}

object InterleaveBits {

  /** Bits of `v` below `bits` scattered to their interleaved positions
    * for dimension `d` of `n`. Shared by eval and the spec's reference
    * oracle so the generated code is checked against the same scatter.
    */
  def scatter(v: Int, d: Int, n: Int, bits: Int): Long = {
    var z = 0L
    var j = 0
    while (j < bits) {
      z |= ((v >>> j) & 1).toLong << (j * n + (n - 1 - d))
      j += 1
    }
    z
  }

  /** Reference interleave of one bucket tuple (spec oracle). */
  def ref(values: Seq[Int], bits: Int): Long = {
    val n = values.size
    values.zipWithIndex.map { case (v, d) => scatter(v, d, n, bits) }
      .foldLeft(0L)(_ | _)
  }

  /** Register `interleave_bits(bits, c1, c2, ...)` (bits must be an int
    * literal) in the session's function registry. Idempotent.
    */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "interleave_bits",
      exprs => InterleaveBits(exprs.tail, exprs.head match {
        case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, IntegerType) => v
        case other => throw new IllegalArgumentException(
          s"interleave_bits bits must be an integer literal, got $other")
      }),
      "built-in")
}
