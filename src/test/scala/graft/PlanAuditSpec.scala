package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.PlanAudit
import graft.sources.Tables

/** The plan linter: each rule fires on a deliberately offending query,
  * clean queries audit clean, and the full contract's finding set is
  * pinned so a new scale-killer fails the suite by name.
  */
class PlanAuditSpec extends AnyFunSuite {
  import SparkTestBase._

  test("cartesian-product fires on a real cross join") {
    // suppress the broadcast fallback so the planner actually picks
    // CartesianProduct (fixture tables fit the broadcast threshold)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val l = Tables.customer(spark, sf0001)
      val r = Tables.orders(spark, sf0001)
      val rules = PlanAudit.audit(l.crossJoin(r)).map(_.rule).toSet
      assert(rules.contains("cartesian-product"))
    } finally
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("global-window and single-partition-exchange fire together") {
    val w = org.apache.spark.sql.expressions.Window
      .orderBy("o_totalprice")
    val df = Tables.orders(spark, sf0001)
      .withColumn("rn", row_number().over(w))
    val rules = PlanAudit.audit(df).map(_.rule).toSet
    assert(rules.contains("global-window"))
    assert(rules.contains("single-partition-exchange"))
  }

  test("scala-udf fires on an opaque UDF") {
    val u = udf((s: String) => s.length)
    val df = Tables.customer(spark, sf0001)
      .select(u(col("c_mktsegment")).as("n"))
    assert(PlanAudit.audit(df).map(_.rule).toSet === Set("scala-udf"))
  }

  test("a disciplined query audits clean") {
    val clean = Tables.orders(spark, sf0001)
      .groupBy("o_orderstatus")
      .agg(sum((col("o_totalprice") * 100).cast("long")).as("cents"))
    assert(PlanAudit.audit(clean).isEmpty)
    // broadcast NLJ (1-row dimension cross) is NOT a cartesian finding
    val dim = Tables.orders(spark, sf0001).agg(max("o_totalprice").as("m"))
    val withDim = Tables.orders(spark, sf0001).crossJoin(broadcast(dim))
    assert(!PlanAudit.audit(withDim).map(_.rule).contains("cartesian-product"))
  }

  test("contract-wide audit: the exemption set is pinned") {
    val findings = SparkEntry.queries.keys.toSeq.sorted.flatMap { n =>
      val fs = PlanAudit.audit(SparkEntry.queries(n)(spark, sf0001))
        .map(_.rule).distinct.map(r => s"$n/$r")
      Materialize.releaseAll()
      fs
    }
    val pinned = Set.empty[String]
    assert(findings.toSet === pinned,
      s"contract findings drifted:\n${findings.sorted.mkString("\n")}")
  }
}
