package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Tables

/** Co-located joins via bucketing: two tables bucketed on the join key
  * with the same bucket count must join with NO shuffle exchange — the
  * pre-partitioning strategy that replaces the reference's per-job hash
  * repartitioning for repeated joins at scale.
  */
class BucketingSpec extends AnyFunSuite {
  import SparkTestBase._

  test("bucketed-by-key join plans without a shuffle exchange") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    // Force a non-broadcast join and a static plan for inspection.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      Tables.orders(spark, sf0001)
        .write.bucketBy(4, "o_custkey").sortBy("o_custkey")
        .mode("overwrite").saveAsTable("orders_bucketed")
      Tables.customer(spark, sf0001)
        .write.bucketBy(4, "c_custkey").sortBy("c_custkey")
        .mode("overwrite").saveAsTable("customer_bucketed")

      val joined = spark.table("orders_bucketed")
        .join(spark.table("customer_bucketed"),
          col("o_custkey") === col("c_custkey"))
      val shuffles = joined.queryExecution.executedPlan.collect {
        case e: ShuffleExchangeExec => e
      }
      assert(shuffles.isEmpty,
        s"expected shuffle-free bucketed join:\n${joined.queryExecution.executedPlan}")

      // and it is still correct:
      val expected = Tables.orders(spark, sf0001)
        .join(Tables.customer(spark, sf0001),
          col("o_custkey") === col("c_custkey")).count()
      assert(joined.count() === expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10MB")
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      spark.sql("DROP TABLE IF EXISTS orders_bucketed")
      spark.sql("DROP TABLE IF EXISTS customer_bucketed")
    }
  }
}
