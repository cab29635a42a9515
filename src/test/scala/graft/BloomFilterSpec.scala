package graft

import org.scalatest.funsuite.AnyFunSuite

/** The Bloom pre-filter join (plans/BloomFilterFns, q_join_bloom) has
  * two load-bearing properties beyond the oracle hash:
  *
  *  - NO FALSE NEGATIVES: every fact row whose key exists on the dim
  *    side passes the probe (a Bloom filter only over-approximates), so
  *    the join after the probe loses nothing — this is what makes the
  *    rewrite result-invariant at any fpp;
  *  - the probe actually PRUNES: rows with keys absent from the dim
  *    side are mostly dropped before the join's exchange — the whole
  *    point of shipping the sketch instead of shuffling the fact table.
  */
class BloomFilterSpec extends AnyFunSuite {
  import SparkTestBase._

  test("bloom probe passes every true key and prunes most non-keys") {
    plans.BloomFilterFns.register(spark)
    spark.read.parquet(s"$sf0001/supplier.parquet")
      .filter("s_suppkey <= 3").select("s_suppkey")
      .createOrReplaceTempView("bf_dim")
    spark.read.parquet(s"$sf0001/lineitem.parquet")
      .select("l_suppkey").createOrReplaceTempView("bf_fact")

    val probed = spark.sql(
      """SELECT COUNT(*) FROM bf_fact
        |WHERE bloom_contains(
        |  (SELECT bloom_agg(xxhash64(s_suppkey)) FROM bf_dim),
        |  xxhash64(l_suppkey))""".stripMargin).head.getLong(0)
    val exact = spark.sql(
      """SELECT COUNT(*) FROM bf_fact
        |WHERE l_suppkey IN (SELECT s_suppkey FROM bf_dim)""".stripMargin)
      .head.getLong(0)
    val total = spark.table("bf_fact").count()

    assert(probed >= exact, "a Bloom filter must never drop a true key")
    // 3 of 10 suppliers are in the dim: with the default fpp (~3%) the
    // probe keeps ~exact + 3% of the rest, far below the full scan
    assert(probed < total,
      "the probe must prune rows whose keys are absent from the dim side")
  }

  test("probe expression sits in the plan as a scalar-subquery filter") {
    plans.BloomFilterFns.register(spark)
    val df = spark.sql(
      """SELECT * FROM bf_fact
        |WHERE bloom_contains(
        |  (SELECT bloom_agg(xxhash64(s_suppkey)) FROM bf_dim),
        |  xxhash64(l_suppkey))""".stripMargin)
    val plan = df.queryExecution.optimizedPlan.toString
    assert(plan.contains("might_contain") && plan.contains("scalar-subquery"),
      s"expected a might_contain probe over a scalar subquery, got:\n$plan")
  }
}
