package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Money._
import graft.sources.Tables

/** SURVEY.md §2.4 extension aggregates: pivot, exact percentiles, and
  * ordered string aggregation.
  *
  * Pivot compiles to one hash aggregate over conditional counts (the
  * value list is declared, so no extra distinct-values job runs);
  * `percentile` is a rank-selected DISCRETE percentile (row_number
  * against ceil(n·p)) — deliberately not interpolated, because the two
  * engines' interpolation differs in the last ulp; string aggregation
  * sorts collected values before joining so the result is
  * partition-order independent.
  */
object AggExtras {

  private val eventTypes = Seq("click", "error", "purchase", "signup", "view")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Per-user event-type matrix (explicit value list → single-pass).
    "q_pivot" -> ((s, d) => {
      val pivoted = Tables.events(s, d)
        .filter(col("user_id") < 20)
        .groupBy("user_id")
        .pivot("event_type", eventTypes)
        .agg(count(lit(1)))
      eventTypes.foldLeft(pivoted) { (df, t) =>
        df.withColumn(s"n_$t", coalesce(col(t), lit(0L))).drop(t)
      }.orderBy("user_id")
    }),

    // Discrete (rank-selected) median / p90 of order value per status,
    // in cents. Deliberately NOT linear-interpolated percentile: the
    // two engines' interpolation differs in the last ulp (observed: one
    // cent at sf0.1 p90), while rank selection is integer-exact.
    "q_percentile" -> ((s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("o_orderstatus")
        .orderBy(col("o_totalprice"), col("o_orderkey"))
      Tables.orders(s, d)
        .select(col("o_orderstatus"), col("o_totalprice"), col("o_orderkey"))
        .withColumn("rn", row_number().over(w))
        .withColumn("n", count(lit(1)).over(
          org.apache.spark.sql.expressions.Window.partitionBy("o_orderstatus")))
        .groupBy("o_orderstatus")
        .agg(
          max(when(col("rn") === ceil(col("n") * 0.5), cents(col("o_totalprice"))))
            .as("median_c"),
          max(when(col("rn") === ceil(col("n") * 0.9), cents(col("o_totalprice"))))
            .as("p90_c"))
        .orderBy("o_orderstatus")
    }),

    // Correlated-subquery class: orders priced far above their status
    // group's mean — decorrelated as aggregate-then-join (the form the
    // optimizer rewrites correlated scalar subqueries into; at scale
    // the 3-row aggregate broadcasts).
    "q_subquery_corr" -> ((s, d) => {
      val avgByStatus = Tables.orders(s, d)
        .groupBy(col("o_orderstatus").as("st"))
        .agg(avg(col("o_totalprice")).as("avg_p"))
      Tables.orders(s, d)
        .join(broadcast(avgByStatus), col("o_orderstatus") === col("st"))
        .filter(col("o_totalprice") > lit(1.8) * col("avg_p"))
        .select(col("o_orderkey"), col("o_orderstatus"),
          cents(col("o_totalprice")).as("price_c"))
        .orderBy("o_orderkey")
    }),

    // Nations per region as a deterministic (sorted) comma list.
    "q_stringagg" -> ((s, d) =>
      Tables.nation(s, d)
        .join(broadcast(Tables.region(s, d)),
          col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name")
        .agg(array_join(array_sort(collect_list(col("n_name"))), ",")
          .as("nations"))
        .orderBy("r_name"))
  )

  val oracle: Map[String, String] = Map(
    "q_pivot" ->
      """SELECT user_id,
        |  CAST(COUNT(*) FILTER (event_type = 'click') AS BIGINT) AS n_click,
        |  CAST(COUNT(*) FILTER (event_type = 'error') AS BIGINT) AS n_error,
        |  CAST(COUNT(*) FILTER (event_type = 'purchase') AS BIGINT) AS n_purchase,
        |  CAST(COUNT(*) FILTER (event_type = 'signup') AS BIGINT) AS n_signup,
        |  CAST(COUNT(*) FILTER (event_type = 'view') AS BIGINT) AS n_view
        |FROM events WHERE user_id < 20 GROUP BY user_id ORDER BY user_id""".stripMargin,
    "q_percentile" ->
      s"""WITH r AS (
         |  SELECT o_orderstatus, o_totalprice,
         |    ROW_NUMBER() OVER (PARTITION BY o_orderstatus
         |                       ORDER BY o_totalprice, o_orderkey) AS rn,
         |    COUNT(*) OVER (PARTITION BY o_orderstatus) AS n
         |  FROM orders)
         |SELECT o_orderstatus,
         |  MAX(CASE WHEN rn = CEIL(n * 0.5) THEN ${sqlCents("o_totalprice")} END) AS median_c,
         |  MAX(CASE WHEN rn = CEIL(n * 0.9) THEN ${sqlCents("o_totalprice")} END) AS p90_c
         |FROM r GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "q_subquery_corr" ->
      s"""WITH avg_by_status AS (
         |  SELECT o_orderstatus AS st, AVG(o_totalprice) AS avg_p
         |  FROM orders GROUP BY 1)
         |SELECT o.o_orderkey, o.o_orderstatus,
         |  ${sqlCents("o.o_totalprice")} AS price_c
         |FROM orders o JOIN avg_by_status a ON o.o_orderstatus = a.st
         |WHERE o.o_totalprice > 1.8 * a.avg_p
         |ORDER BY o.o_orderkey""".stripMargin,
    "q_stringagg" ->
      """SELECT r_name, string_agg(n_name, ',' ORDER BY n_name) AS nations
        |FROM nation JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name ORDER BY r_name""".stripMargin
  )
}
