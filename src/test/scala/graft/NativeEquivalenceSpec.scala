package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.MinHashSignature
import graft.sources.Tables

/** The native minhash_sig expression must be bit-identical to the
  * higher-order-function formulation it replaced (which the DuckDB
  * oracle still mirrors).
  */
class NativeEquivalenceSpec extends AnyFunSuite {
  import SparkTestBase._

  test("simhash_fp equals the per-dimension HOF formulation on every doc") {
    graft.plans.SimHashFingerprint.register(spark)
    val hof =
      """array_join(transform(sequence(1, 32), j ->
        |  CASE WHEN aggregate(hs,
        |    0, (acc, h) -> acc + (CASE WHEN
        |      instr('0123456789abcdef', substring(h, j, 1)) >= 9
        |      THEN 1 ELSE -1 END)) >= 0
        |  THEN '1' ELSE '0' END), '')""".stripMargin
    val diff = Tables.documents(spark, sf0001)
      .select(col("doc_id"),
        expr("transform(split(text, ' '), t -> md5(cast(t as binary)))").as("hs"))
      .select(expr("simhash_fp(hs)").as("native"), expr(hof).as("hof"))
      .filter(col("native") =!= col("hof"))
      .count()
    assert(diff === 0)
  }

  test("minhash_sig equals the HOF md5-min formulation on every doc") {
    MinHashSignature.register(spark)
    val shingles =
      """array_distinct(transform(
        |  sequence(1, greatest(size(split(text, ' ')) - 2, 1)),
        |  i -> concat_ws(' ', slice(split(text, ' '), i, 3))))""".stripMargin
    val hof =
      """transform(sequence(0, 7),
        |  j -> array_min(transform(sh,
        |    s -> md5(cast(concat(cast(j as string), ':', s) as binary)))))""".stripMargin
    val diff = Tables.documents(spark, sf0001)
      .select(col("doc_id"), expr(shingles).as("sh"))
      .select(col("doc_id"),
        expr("minhash_sig(sh)").as("native"), expr(hof).as("hof"))
      .filter(col("native") =!= col("hof"))
      .count()
    assert(diff === 0)
  }

  test("hyperplane_sig equals the HOF bucket formulation at 8/12/16/24 bits") {
    graft.plans.HyperplaneSignature.register(spark)
    // bit-identity matters: the contract queries compare UNROUNDED
    // accumulated doubles against >= 0, so the native loop must run
    // the exact IEEE op sequence of the HOF the oracle mirrors.
    // 16 and 24 exercise every mod-11 stride h=1..5 and every offset
    // k=1..4 of the j>=8 plane family — branches no contract SF reaches
    for (nbits <- Seq(8, 12, 16, 24)) {
      val diff = Tables.embeddings(spark, sf0001)
        .select(col("vec_id"), col("embedding").as("e"))
        .select(
          expr(s"hyperplane_sig(e, $nbits)").as("native"),
          expr(graft.operators.SimilarityExtras.bucketSql(nbits)).as("hof"))
        .filter(col("native") =!= col("hof"))
        .count()
      assert(diff === 0, s"at $nbits bits")
    }
  }

  test("hyperplane_sig mirrors HOF null semantics on malformed rows") {
    graft.plans.HyperplaneSignature.register(spark)
    // A NULL array or NULL element poisons the HOF accumulator for
    // every bit (CASE WHEN NULL >= 0 → ELSE '0') → all-'0' signature;
    // the native loop must agree, so a regenerated fixture with a
    // malformed row cannot silently split native from oracle. (A SHORT
    // array makes the HOF *error* under ANSI — element_at past the
    // end — so there the native's all-'0' is strictly softer, asserted
    // separately below.)
    def mk(clause: String) = spark.sql(
      s"""SELECT id, $clause AS e
         |FROM VALUES (1), (2) AS t(id) WHERE id = 1""".stripMargin)
    val evaluable = Seq(
      "cast(null as array<double>)",
      """transform(sequence(0, 63), i ->
        |  CASE WHEN i = 17 THEN cast(null as double)
        |       ELSE cast(i as double) - 31.5d END)""".stripMargin,
      "transform(sequence(0, 63), i -> cast(i as double) - 40.0d)")
    val out = evaluable.map { clause =>
      mk(clause)
        .select(expr("hyperplane_sig(e, 12)").as("native"),
          expr(graft.operators.SimilarityExtras.bucketSql(12)).as("hof"))
        .head()
    }
    out.zip(evaluable).foreach { case (r, c) =>
      assert(r.getString(0) === r.getString(1), c)
    }
    assert(out.take(2).forall(_.getString(0) == "0" * 12))
    assert(out(2).getString(0) !== "0" * 12)
    // short array: HOF errors under ANSI; native degrades to all-'0'
    val short = mk("array(1.0d, -2.0d, 3.0d)")
    assert(short.select(expr("hyperplane_sig(e, 12)")).head().getString(0)
      === "0" * 12)
    intercept[Exception] {
      short.select(expr(graft.operators.SimilarityExtras.bucketSql(12))).head()
    }
  }
}
