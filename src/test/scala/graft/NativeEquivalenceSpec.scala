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
}
