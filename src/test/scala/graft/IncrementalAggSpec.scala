package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.IncrementalAgg
import graft.sources.Tables

/** Materialized-rollup maintenance: refresh == full recompute on a
  * crafted retraction log (group death and birth) and on a
  * fixture-scale base/changes split, chained refreshes, and the
  * bounded-shuffle plan.
  */
class IncrementalAggSpec extends AnyFunSuite {
  import SparkTestBase._

  private def canon(df: DataFrame): Seq[String] =
    df.orderBy(df.columns.map(col): _*).collect().toSeq.map(_.toString)

  test("crafted retractions: group death, group birth, exact sums") {
    import spark.implicits._
    val facts = Seq(("a", 10L), ("a", 20L), ("b", 5L), ("b", 7L),
      ("c", 100L)).toDF("g", "x")
    val changes = Seq(
      ("b", 5L, "D"), ("b", 7L, "D"), // retract ALL of b
      ("d", 42L, "I"),                // brand-new group
      ("a", 10L, "D"), ("a", 1L, "I") // churn inside a
    ).toDF("g", "x", "op")

    val refreshed = IncrementalAgg.refresh(
      IncrementalAgg.init(facts, Seq("g"), Seq("x")),
      changes, Seq("g"), Seq("x"))
    val got = refreshed.collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got === Map("a" -> ((2L, 21L)), "c" -> ((1L, 100L)),
      "d" -> ((1L, 42L))))
    assert(!got.contains("b"), "fully-retracted group must vanish")
  }

  // fixture-scale: split orders into base/changes, maintain a rollup
  // over o_orderstatus with exact integer-cents sums
  private def ordersCents: DataFrame =
    Tables.orders(spark, sf0001).select(col("o_orderkey"),
      col("o_orderstatus").as("g"),
      (col("o_totalprice") * 100).cast("long").as("cents"))

  test("fixture refresh equals full recompute") {
    val all = ordersCents
    val base = all.filter(col("o_orderkey") % 4 =!= 0)
    val inserts = all.filter(col("o_orderkey") % 4 === 0)
      .withColumn("op", lit("I"))
    val deletes = base.filter(col("o_orderkey") % 7 === 0)
      .withColumn("op", lit("D"))
    val changes = inserts.unionByName(deletes)

    val newFacts = all.filter(col("o_orderkey") % 4 === 0 ||
      col("o_orderkey") % 7 =!= 0)
    val expected = IncrementalAgg.init(
      newFacts.drop("o_orderkey"), Seq("g"), Seq("cents"))
    val refreshed = IncrementalAgg.refresh(
      IncrementalAgg.init(base.drop("o_orderkey"), Seq("g"), Seq("cents")),
      changes.drop("o_orderkey"), Seq("g"), Seq("cents"))
    assert(canon(refreshed).nonEmpty)
    assert(canon(refreshed) === canon(expected))
  }

  test("refreshes chain: two incremental days equal one recompute") {
    val all = ordersCents.drop("o_orderkey")
    val base = ordersCents.filter(col("o_orderkey") % 3 === 0).drop("o_orderkey")
    val day1 = ordersCents.filter(col("o_orderkey") % 3 === 1)
      .drop("o_orderkey").withColumn("op", lit("I"))
    val day2 = ordersCents.filter(col("o_orderkey") % 3 === 2)
      .drop("o_orderkey").withColumn("op", lit("I"))
    val chained = IncrementalAgg.refresh(
      IncrementalAgg.refresh(
        IncrementalAgg.init(base, Seq("g"), Seq("cents")),
        day1, Seq("g"), Seq("cents")),
      day2, Seq("g"), Seq("cents"))
    assert(canon(chained) ===
      canon(IncrementalAgg.init(all, Seq("g"), Seq("cents"))))
  }

  test("refresh plans at most two exchanges (delta + merge)") {
    import spark.implicits._
    val state = IncrementalAgg.init(
      Seq(("a", 1L)).toDF("g", "x"), Seq("g"), Seq("x"))
    val changes = Seq(("a", 2L, "I")).toDF("g", "x", "op")
    val explained = IncrementalAgg
      .refresh(state, changes, Seq("g"), Seq("x"))
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("simple"))
    val shuffles = "Exchange ".r.findAllIn(explained).size
    assert(shuffles <= 2, s"refresh over-shuffles ($shuffles):\n$explained")
  }
}
