package graft

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bucketing = the persisted form of the reference's hash partitioner
  * (SURVEY.md §2.7/§4): writing both join sides bucketed by their join
  * key lets Spark plan the join with NO exchange on either side — at
  * 100 TB that turns the nightly fact-fact join from a full two-sided
  * shuffle into a local per-bucket merge. This spec proves the claim on
  * the physical plan, not just by assertion: same join, bucketed scan
  * vs plain scan, zero ShuffleExchange operators vs two.
  */
class BucketingSpec extends AnyFunSuite {
  import SparkTestBase._

  private def shuffles(df: org.apache.spark.sql.DataFrame): Int =
    df.queryExecution.executedPlan.collect { case e: ShuffleExchangeExec => e }.size

  test("bucketed-by-join-key tables join with zero exchanges") {
    val orders = spark.read.parquet(s"$sf0001/orders.parquet")
    val customer = spark.read.parquet(s"$sf0001/customer.parquet")
    orders.write.mode("overwrite")
      .bucketBy(8, "o_custkey").sortBy("o_custkey")
      .saveAsTable("orders_bkt")
    customer.write.mode("overwrite")
      .bucketBy(8, "c_custkey").sortBy("c_custkey")
      .saveAsTable("customer_bkt")
    try {
      // bucketed joins require the static planner (AQE re-plans from
      // shuffle statistics it never gets to observe here), and the
      // sf0.001 sides are small enough to broadcast — disable that so
      // the spec exercises the shuffle-vs-bucket trade a fact-fact
      // join faces at scale
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val bkt = spark.table("orders_bkt")
        .join(spark.table("customer_bkt"),
          col("o_custkey") === col("c_custkey"))
        .groupBy("c_mktsegment").agg(count(lit(1)).as("n"))
      val plain = orders
        .join(customer, col("o_custkey") === col("c_custkey"))
        .groupBy("c_mktsegment").agg(count(lit(1)).as("n"))

      // the join itself is exchange-free on bucketed scans: only the
      // downstream groupBy(c_mktsegment) repartitions. The plain scans
      // shuffle both join sides AND the aggregate.
      assert(shuffles(bkt) === 1)
      assert(shuffles(plain) === 3)

      val got = bkt.orderBy("c_mktsegment").collect().map(r => (r.getString(0), r.getLong(1)))
      val exp = plain.orderBy("c_mktsegment").collect().map(r => (r.getString(0), r.getLong(1)))
      assert(got.sameElements(exp))
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS orders_bkt")
      spark.sql("DROP TABLE IF EXISTS customer_bkt")
    }
  }

  test("mismatched bucket counts fall back to a shuffled join") {
    val orders = spark.read.parquet(s"$sf0001/orders.parquet")
    val customer = spark.read.parquet(s"$sf0001/customer.parquet")
    orders.write.mode("overwrite")
      .bucketBy(8, "o_custkey").saveAsTable("orders_bkt8")
    customer.write.mode("overwrite")
      .bucketBy(4, "c_custkey").saveAsTable("customer_bkt4")
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val j = spark.table("orders_bkt8")
        .join(spark.table("customer_bkt4"),
          col("o_custkey") === col("c_custkey"))
      // Spark shuffles (at least) the smaller side to align buckets
      assert(shuffles(j) >= 1)
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS orders_bkt8")
      spark.sql("DROP TABLE IF EXISTS customer_bkt4")
    }
  }
}
