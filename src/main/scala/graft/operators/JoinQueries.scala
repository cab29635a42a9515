package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Money._
import graft.sources.Tables

/** SURVEY.md §2.3 joins.
  *
  * The reference implements exactly one join algorithm: the reduce-side
  * repartition join — maple tags rows "D1:"/"D2:" under the join key,
  * juice cross-products the two tagged sets per key (SURVEY.md §2.3,
  * [SPEC][MR]). Declared as `join(...)` here, Catalyst instead picks the
  * right physical strategy per side: nation/region/customer broadcast
  * (no shuffle of the fact side at all), and only genuinely large×large
  * joins pay a shuffle. That choice — broadcast the bounded dimension,
  * shuffle only facts — is the core of surviving a 100 TB fact table.
  * Dimension tables are broadcast explicitly where their size is known
  * to be bounded by the schema (region=5, nation=25 rows at every SF).
  */
object JoinQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // The CS425 "SQL join" demo: equi inner join.
    "q_join_inner" -> ((s, d) =>
      Tables.orders(s, d)
        .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
        .select(col("o_orderkey"), col("c_name"),
          cents(col("o_totalprice")).as("price_c"))
        .orderBy("o_orderkey")),

    // 3-way chained join + agg. region/nation are fixed-cardinality —
    // always broadcast, so the only shuffle is the final groupBy.
    "q_join_multi" -> ((s, d) =>
      Tables.customer(s, d)
        .join(broadcast(Tables.nation(s, d)),
          col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.region(s, d)),
          col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name")
        .agg(count(lit(1)).as("n_customers"))
        .orderBy("r_name")),

    // Left outer: every customer, 0 for the orderless.
    "q_join_left" -> ((s, d) =>
      Tables.customer(s, d)
        .join(Tables.orders(s, d), col("o_custkey") === col("c_custkey"), "left")
        .groupBy("c_custkey", "c_name")
        .agg(count(col("o_orderkey")).as("n_orders"))
        .orderBy("c_custkey")),

    // Anti: customers with no high-value (>490k) order. left_anti only
    // shuffles join keys, never payload columns; the filter restricts
    // the build side before the shuffle.
    "q_join_anti" -> ((s, d) =>
      Tables.customer(s, d)
        .join(Tables.orders(s, d).filter(col("o_totalprice") > 490000),
          col("o_custkey") === col("c_custkey"), "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")),

    // Semi: customers with at least one 'F'-status order. The status
    // filter is pushed below the join so only matching orders shuffle.
    "q_join_semi" -> ((s, d) =>
      Tables.customer(s, d)
        .join(
          Tables.orders(s, d).filter(col("o_orderstatus") === "F"),
          col("o_custkey") === col("c_custkey"), "left_semi")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey"))
  )

  val oracle: Map[String, String] = Map(
    "q_join_inner" ->
      s"""SELECT o_orderkey, c_name, ${sqlCents("o_totalprice")} AS price_c
         |FROM orders JOIN customer ON o_custkey = c_custkey
         |ORDER BY o_orderkey""".stripMargin,
    "q_join_multi" ->
      """SELECT r_name, CAST(COUNT(*) AS BIGINT) AS n_customers
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name ORDER BY r_name""".stripMargin,
    "q_join_left" ->
      """SELECT c_custkey, c_name, CAST(COUNT(o_orderkey) AS BIGINT) AS n_orders
        |FROM customer LEFT JOIN orders ON o_custkey = c_custkey
        |GROUP BY c_custkey, c_name ORDER BY c_custkey""".stripMargin,
    "q_join_anti" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey AND o_totalprice > 490000)
        |ORDER BY c_custkey""".stripMargin,
    "q_join_semi" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |              WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
        |ORDER BY c_custkey""".stripMargin
  )
}
