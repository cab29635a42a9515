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

  test("round-12 pipeline modules audit clean") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf0001)

    // span dedup: the corpus-sized shuffles are partial-combined aggs
    // and a co-hashed join — nothing single-partition, no UDFs
    assert(PlanAudit.audit(operators.SpanDedup
      .coverageReport(docs, "doc_id", "text", 6)).isEmpty)

    // packing: prefix-sum offsets + one chunk hash agg
    val model = operators.Bpe.train(spark, sf0001, 20)
    val encoded = operators.Bpe.encodeIds(docs, "text", model)
      .select("doc_id", "token_ids")
    assert(PlanAudit.audit(operators.Packing
      .packTokens(encoded, "doc_id", "token_ids", 256, 999)).isEmpty)

    // weighted sampling / epoch shuffle: top-k and one range exchange
    val weighted = docs.select(col("doc_id"),
      (length(col("text")) + 1).cast("double").as("w"))
    assert(PlanAudit.audit(operators.Sampling
      .weightedSample(weighted, "doc_id", "w", 25, 42L)).isEmpty)
    assert(PlanAudit.audit(operators.Sampling
      .epochShuffle(docs.select("doc_id"), "doc_id", 1L, 4)).isEmpty)

    // RRF fusion consumes only bounded top-k frames: its
    // single-partition rank windows must still audit clean because
    // each sits above a LIMIT (a bounded reduction, PlanAudit's own
    // structural judgment — not a by-name exemption)
    val lex = Seq(("d1", 2.0), ("d2", 1.0)).toDF("id", "score")
    assert(PlanAudit.audit(operators.HybridSearch
      .rrf(Seq(lex, lex), "id", 5)).isEmpty)
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
