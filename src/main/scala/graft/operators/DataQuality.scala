package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Data-quality constraint suite (SURVEY.md §2.12): the Deequ-style
  * audit a pipeline runs before promoting a batch — referential
  * integrity, key uniqueness, domain and null-rate checks — emitted as
  * one report row per constraint.
  *
  * Each check is the cheapest plan that answers it: uniqueness and
  * domain checks are single partial-combined aggregates over one scan;
  * FK checks are one equi-join each (no hint — the dimension side
  * broadcasts while it fits and AQE falls back to a key-partitioned
  * join at scale) counting probe rows and misses in the same pass, so
  * n_checked never costs a second scan. The per-constraint rows are
  * 1-row aggregates unioned on the driver plan — the union itself
  * moves five rows, nothing more.
  */
object DataQuality {

  private def report(name: String, agg: DataFrame): DataFrame =
    agg.select(lit(name).as("constraint_name"), col("n_checked"),
      col("n_violations"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_dq_constraints" -> ((s, d) => {
      val orders = Tables.orders(s, d)
      val cust = Tables.customer(s, d)
      val li = Tables.lineitem(s, d)
      val ev = Tables.events(s, d)
      val c1 = report("orders_custkey_fk",
        orders.join(cust, orders("o_custkey") === cust("c_custkey"), "left")
          .agg(count(lit(1)).as("n_checked"),
            sum(when(cust("c_custkey").isNull, 1L).otherwise(0L))
              .as("n_violations")))
      val c2 = report("customer_key_unique",
        cust.agg(count(lit(1)).as("n_checked"),
          (count(lit(1)) - countDistinct(col("c_custkey")))
            .as("n_violations")))
      val c3 = report("orders_totalprice_positive",
        orders.agg(count(lit(1)).as("n_checked"),
          sum(when(col("o_totalprice") <= 0, 1L).otherwise(0L))
            .as("n_violations")))
      val c4 = report("events_user_nonnull",
        ev.agg(count(lit(1)).as("n_checked"),
          sum(when(col("user_id").isNull, 1L).otherwise(0L))
            .as("n_violations")))
      val c5 = report("lineitem_orderkey_fk",
        li.join(orders, li("l_orderkey") === orders("o_orderkey"), "left")
          .agg(count(lit(1)).as("n_checked"),
            sum(when(orders("o_orderkey").isNull, 1L).otherwise(0L))
              .as("n_violations")))
      c1.unionAll(c2).unionAll(c3).unionAll(c4).unionAll(c5)
        .withColumn("ok",
          when(col("n_violations") === 0, 1L).otherwise(0L))
        .orderBy("constraint_name")
    })
  )

  val oracle: Map[String, String] = Map(
    "q_dq_constraints" ->
      """WITH c1 AS (SELECT 'orders_custkey_fk' AS constraint_name,
        |    CAST(COUNT(*) AS BIGINT) AS n_checked,
        |    CAST(COUNT(*) FILTER (c.c_custkey IS NULL) AS BIGINT)
        |      AS n_violations
        |  FROM orders o LEFT JOIN customer c
        |    ON o.o_custkey = c.c_custkey),
        |c2 AS (SELECT 'customer_key_unique', CAST(COUNT(*) AS BIGINT),
        |    CAST(COUNT(*) - COUNT(DISTINCT c_custkey) AS BIGINT)
        |  FROM customer),
        |c3 AS (SELECT 'orders_totalprice_positive',
        |    CAST(COUNT(*) AS BIGINT),
        |    CAST(COUNT(*) FILTER (o_totalprice <= 0) AS BIGINT)
        |  FROM orders),
        |c4 AS (SELECT 'events_user_nonnull', CAST(COUNT(*) AS BIGINT),
        |    CAST(COUNT(*) FILTER (user_id IS NULL) AS BIGINT)
        |  FROM events),
        |c5 AS (SELECT 'lineitem_orderkey_fk', CAST(COUNT(*) AS BIGINT),
        |    CAST(COUNT(*) FILTER (o.o_orderkey IS NULL) AS BIGINT)
        |  FROM lineitem l LEFT JOIN orders o
        |    ON l.l_orderkey = o.o_orderkey)
        |SELECT *, CAST(CASE WHEN n_violations = 0 THEN 1 ELSE 0 END
        |    AS BIGINT) AS ok
        |FROM (SELECT * FROM c1 UNION ALL SELECT * FROM c2
        |  UNION ALL SELECT * FROM c3 UNION ALL SELECT * FROM c4
        |  UNION ALL SELECT * FROM c5)
        |ORDER BY constraint_name""".stripMargin
  )
}
