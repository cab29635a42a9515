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
    }),

    // Sketch error bounds, contract-pinned: HLL++ distinct counts and
    // GK approx-percentiles previously lived only in SketchSpec (their
    // raw values can never hash-match a different engine BY DESIGN —
    // different sketch internals). This query makes the approx surface
    // visible to the driver gate anyway by emitting the BOUND CHECK,
    // not the sketch: per order status it computes the sketch AND the
    // exact answer and outputs 1/0 flags. HLL (rsd=2%) is checked at
    // 5% relative count error. The percentile sketch is checked on the
    // guarantee GK actually makes — RANK, not value (a value tolerance
    // is distribution-dependent and flaked at sf0.001 where the two
    // middle order prices sit > 1% apart): the returned median's rank
    // window [count(< v), count(≤ v)] must straddle 0.5·n to within
    // n/accuracy. The oracle emits the exact counts plus constant-1
    // flags — a sketch that ever degrades past its documented bound
    // flips a flag and fails the hash compare. The exact passes exist
    // only to PIN the sketch; at 100 TB you ship the sketch alone
    // (that is the point of it), so the expensive columns here are the
    // test harness, not the production plan. The rank check's second
    // scan joins the 3-row sketch frame back by broadcast.
    "q_sketch_bounds" -> ((s, d) => {
      val cents = graft.functions.Money.cents(col("o_totalprice"))
      val orders = Tables.orders(s, d)
      // The sketch aggregate and the exact count-distinct run as TWO
      // aggregates joined on the 3-row status frame, never one: mixing
      // a distinct agg with non-distinct ones makes Spark key the
      // partial phase by (group, distinct-col), i.e. one partial GK
      // sketch + HLL register set PER (status, custkey) pair — ~45k
      // sketch objects at sf0.1, measured 2.1 s vs 0.8 s split (the
      // standalone-timing trap: .count() over the combined aggregate
      // PRUNES the sketch functions, so it benchmarks as fast).
      val skA = orders
        .groupBy(col("o_orderstatus").as("st"))
        .agg(count(lit(1)).as("n_rows"),
          approx_count_distinct(col("o_custkey"), 0.02).as("hll"),
          percentile_approx(cents, lit(0.5), lit(1000)).as("med_approx"))
      val skB = orders
        .groupBy(col("o_orderstatus").as("st"))
        .agg(countDistinct(col("o_custkey")).as("n_distinct_exact"))
      val sk = skA.join(skB, "st")
      val eps = lit(1.0) / 1000
      orders.select(col("o_orderstatus").as("st"), cents.as("c"))
        .join(broadcast(sk), "st")
        .groupBy(col("st"), col("n_rows"), col("n_distinct_exact"),
          col("hll"), col("med_approx"))
        .agg(sum(when(col("c") < col("med_approx"), 1L).otherwise(0L))
            .as("cnt_lt"),
          sum(when(col("c") <= col("med_approx"), 1L).otherwise(0L))
            .as("cnt_le"))
        .select(col("st"), col("n_rows"), col("n_distinct_exact"),
          when(abs(col("hll") - col("n_distinct_exact"))
            .cast("double") / col("n_distinct_exact") <= 0.05, 1L)
            .otherwise(0L).as("hll_ok"),
          // ± one extra rank beyond ε·n: Spark's ApproximatePercentile
          // targets p·(n−1) (0-indexed) while 0.5·n is the 1-indexed
          // median rank — a definitional convention gap of up to one
          // rank at even n (measured: rank 256 of 514 where 0.5·n =
          // 257), not a sketch error. The returned value's rank straddle
          // is [cnt_lt+1, cnt_le]: the low side checks cnt_le ≥
          // (0.5−ε)n − 1, and the high side checks cnt_lt+1 ≤ (0.5+ε)n
          // + 1, i.e. cnt_lt ≤ (0.5+ε)n — the same single definitional
          // rank of slack on both sides.
          when(col("cnt_le").cast("double") >=
              (lit(0.5) - eps) * col("n_rows") - 1 &&
            col("cnt_lt").cast("double") <=
              (lit(0.5) + eps) * col("n_rows"), 1L)
            .otherwise(0L).as("pctl_ok"))
        .orderBy("st")
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
        |ORDER BY constraint_name""".stripMargin,

    // The oracle asserts the sketches stay within bound by emitting
    // constant-1 flags beside the exact counts — see the query comment.
    "q_sketch_bounds" ->
      """SELECT o_orderstatus AS st, CAST(COUNT(*) AS BIGINT) AS n_rows,
        |  CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_distinct_exact,
        |  CAST(1 AS BIGINT) AS hll_ok, CAST(1 AS BIGINT) AS pctl_ok
        |FROM orders GROUP BY o_orderstatus ORDER BY st""".stripMargin
  )
}
