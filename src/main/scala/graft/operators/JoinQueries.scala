package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
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
        .orderBy("c_custkey")),

    // Full outer: per-(user, day) purchase counts ⟗ error counts —
    // either side may be absent (0-filled). Both sides are AGGREGATED
    // BEFORE the join, so the full-outer shuffle carries one count row
    // per (user, day), never raw events; at 100 TB that is the
    // difference between joining two compacted summaries and
    // full-outer-joining the event log against itself.
    "q_join_full" -> ((s, d) => {
      val ev = Tables.events(s, d)
      def daily(t: String, alias: String) =
        ev.filter(col("event_type") === t)
          .groupBy(col("user_id"), to_date(col("ts")).as("day"))
          .agg(count(lit(1)).as(alias))
      val p = daily("purchase", "n_purch")
      val e = daily("error", "n_err")
        .select(col("user_id").as("e_user"), col("day").as("e_day"),
          col("n_err"))
      p.join(e,
          col("user_id") === col("e_user") && col("day") === col("e_day"),
          "full_outer")
        .select(
          coalesce(col("user_id"), col("e_user")).as("user_id"),
          date_format(coalesce(col("day"), col("e_day")), "yyyy-MM-dd")
            .as("day"),
          coalesce(col("n_purch"), lit(0L)).as("n_purch"),
          coalesce(col("n_err"), lit(0L)).as("n_err"))
        .orderBy("user_id", "day")
    }),

    // As-of join: each purchase event paired with the user's most
    // recent error event at or before it. Implemented as the
    // union-and-carry-forward formulation — both streams merge into one
    // (user, time)-sorted sequence and a running `last(..., ignoreNulls)`
    // carries the error attributes forward — so the whole join is ONE
    // shuffle by user + a sort within partitions, never a per-row probe
    // or range join; this is the formulation that survives 100 TB. The
    // oracle runs the IDENTICAL window algebra (not DuckDB's ASOF JOIN,
    // whose tie semantics need not match). Ties at equal timestamp:
    // errors sort before purchases (k=0<1), so a same-microsecond error
    // matches; among same-ts errors the larger event_id wins (the sort
    // ends in the unique event id, making carry-forward deterministic).
    "q_join_asof" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val errors = ev.filter(col("event_type") === "error")
        .select(col("user_id"), unix_micros(col("ts")).as("t"),
          lit(0).as("k"), col("event_id").as("err_id"),
          lit(null).cast("long").as("pid"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), unix_micros(col("ts")).as("t"),
          lit(1).as("k"), lit(null).cast("long").as("err_id"),
          col("event_id").as("pid"))
      val carry = Window.partitionBy("user_id")
        .orderBy(col("t"), col("k"), coalesce(col("err_id"), col("pid")))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      errors.unionAll(purchases)
        // both carries in ONE projection so they land in a single
        // Window node over one sort — split withColumns planned as two
        // Window operators with a redundant re-sort between them
        .select(col("user_id"), col("t"), col("k"), col("pid"),
          last(col("err_id"), ignoreNulls = true).over(carry)
            .as("err_event_id"),
          last(when(col("k") === 0, col("t")), ignoreNulls = true).over(carry)
            .as("err_t"))
        .filter(col("k") === 1 && col("err_event_id").isNotNull)
        .select(col("pid").as("event_id"), col("user_id"),
          col("err_event_id"), (col("t") - col("err_t")).as("gap_us"))
        .orderBy("event_id")
    }),

    // Range (band) self-join: same-user event pairs at most one hour
    // apart. The inequality is turned into an EQUI join by time
    // bucketing: each left row is emitted into its own hour bucket and
    // the next (a ≤1h-later partner can live in no other), the right
    // side keeps its single bucket, and the join key is (user, bucket)
    // — so the pair product is bounded per (user, hour) and the plan is
    // an ordinary shuffled equi-join, not a quadratic theta join. Each
    // qualifying pair matches in exactly one bucket (the partner's), so
    // no post-join dedup is needed.
    "q_join_range" -> ((s, d) => {
      val W = 3600000000L // 1 hour in µs
      val ev = Tables.events(s, d)
        .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("t"))
      val left = ev
        .select(col("event_id").as("event_id1"), col("user_id").as("uid1"),
          col("t").as("t1"))
        .withColumn("bucket",
          explode(array(expr(s"t1 div $W"), expr(s"t1 div $W + 1"))))
      val right = ev
        .select(col("event_id").as("event_id2"), col("user_id").as("uid2"),
          col("t").as("t2"), expr(s"t div $W").as("bucket"))
      left.join(right,
          left("uid1") === right("uid2") && left("bucket") === right("bucket"))
        .filter(
          (col("t1") < col("t2") ||
            (col("t1") === col("t2") && col("event_id1") < col("event_id2"))) &&
            col("t2") - col("t1") <= W)
        .select(col("event_id1"), col("event_id2"),
          col("uid1").as("user_id"), (col("t2") - col("t1")).as("gap_us"))
        .orderBy("event_id1", "event_id2")
    }),

    // Salted skew-safe join, contract-pinned: revenue per supplier via
    // Salting.saltedEquiJoin against a PLAIN-join oracle, proving the
    // salt-and-replicate rewrite is result-invariant. l_suppkey is the
    // archetypal hot key (|lineitem|/|supplier| rows each — 600 per
    // supplier at sf0.1, and real skew only widens that); the salt
    // spreads each supplier's fan-in over 8 tasks while the replicated
    // small side stays |supplier|×8 rows. AQE's byte-based skew split
    // is the first line of defense — this is the shape for when the
    // key histogram, not the partition bytes, is the problem.
    "q_join_salted" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
        .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
          cents(col("l_extendedprice")).as("price_c"))
      val sup = Tables.supplier(s, d)
        .select(col("s_suppkey").as("l_suppkey"), col("s_name"))
      Salting.saltedEquiJoin(li, sup, "l_suppkey",
          saltFrom = col("l_orderkey") * 8 + col("l_linenumber"), nSalts = 8)
        .groupBy("s_name")
        .agg(count(lit(1)).as("n_items"), sum(col("price_c")).as("rev_cents"))
        .orderBy("s_name")
    }),

    // Bloom-filter runtime-filtered join, contract-pinned against a
    // PLAIN-join oracle: the fact side is pre-filtered by a Bloom
    // sketch of the (already filtered) dim side's join keys BEFORE the
    // join's exchange, so at 100 TB the shuffle carries only lineitem
    // rows that can possibly match — the manual, guaranteed form of
    // Spark's InjectRuntimeFilter heuristic (plans/BloomFilterFns).
    // The sketch is built by a distributed aggregate (partial Bloom
    // filters OR-merge map-side; no key list centralizes) and lands in
    // the plan as a scalar subquery, materialized once. False
    // positives pass the probe but are dropped by the real join, so
    // the rewrite is result-invariant for any fpp — exactly what the
    // oracle hash proves.
    "q_join_bloom" -> ((s, d) => {
      graft.plans.BloomFilterFns.register(s)
      Tables.supplier(s, d)
        .join(broadcast(Tables.nation(s, d)),
          col("s_nationkey") === col("n_nationkey"))
        .filter(col("n_name").isin("NATION_1", "NATION_2", "NATION_3"))
        .select(col("s_suppkey"), col("s_name"))
        .createOrReplaceTempView("bloom_dim")
      Tables.lineitem(s, d)
        .select(col("l_suppkey"), cents(col("l_extendedprice")).as("price_c"))
        .createOrReplaceTempView("bloom_fact")
      s.sql("""
        SELECT s.s_suppkey, s.s_name,
          COUNT(*) AS n_items, SUM(f.price_c) AS revenue_c
        FROM (SELECT * FROM bloom_fact
              WHERE bloom_contains(
                (SELECT bloom_agg(xxhash64(s_suppkey)) FROM bloom_dim),
                xxhash64(l_suppkey))) f
        JOIN bloom_dim s ON f.l_suppkey = s.s_suppkey
        GROUP BY s.s_suppkey, s.s_name
        ORDER BY s.s_suppkey""")
    }),

    // TPC-H Q14-style promo revenue share per brand — the last unused
    // fixture table (part) under the hash gate. part scales WITH the
    // fact table (it is a product catalog, not a fixed-cardinality
    // dimension like region/nation), so unlike the other dim joins it
    // gets NO broadcast hint: the planner broadcasts while the catalog
    // fits and falls back to a key-partitioned join when it doesn't —
    // exactly the call we want made from runtime stats at 100 TB. The
    // promo share is conditional-sum ÷ total-sum of exact integer
    // cents in one aggregate pass, one IEEE division → 4 dp.
    "q_join_dim_part" -> ((s, d) => {
      val promo = sum(when(col("p_type") === "PROMO",
        cents(col("l_extendedprice"))).otherwise(0L))
      Tables.lineitem(s, d)
        .join(Tables.part(s, d), col("l_partkey") === col("p_partkey"))
        .groupBy("p_brand")
        .agg(count(lit(1)).as("n_items"),
          sumCents(col("l_extendedprice")).as("revenue_c"),
          round(promo.cast("double") /
            sumCents(col("l_extendedprice")).cast("double"), 4)
            .as("promo_share"))
        .orderBy("p_brand")
    }),

    // TPC-H Q5-shaped star join (round 9, wave 9): revenue per nation
    // from LOCAL suppliers (s_nationkey = c_nationkey) in one region.
    // The region filter reaches the fact table EARLY: region⨝nation
    // (≤ 25 rows) broadcasts onto customer first, so ~4/5 of customers
    // — and through the o_custkey join ~4/5 of orders and lineitems —
    // are pruned before any fact-fact shuffle. Only orders⨝customer
    // and lineitem⨝orders shuffle on their keys; supplier joins last
    // on the already-reduced stream. Revenue stays exact: discounts
    // are integer hundredths, so Σ price_c·(100 − disc_c) is an
    // integer "cent-percent" sum — no float money anywhere.
    "q_join_star" -> ((s, d) => {
      val cust = Tables.customer(s, d)
        .select(col("c_custkey"), col("c_nationkey"))
        .join(broadcast(
          Tables.nation(s, d)
            .join(broadcast(Tables.region(s, d)
                .filter(col("r_name") === "ASIA")),
              col("n_regionkey") === col("r_regionkey"))
            .select(col("n_nationkey"), col("n_name"))),
          col("c_nationkey") === col("n_nationkey"))
      val ord = Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_custkey"))
        .join(cust, col("o_custkey") === col("c_custkey"))
      Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_suppkey"),
          col("l_extendedprice"), col("l_discount"))
        .join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(Tables.supplier(s, d).select(col("s_suppkey"),
            col("s_nationkey")),
          col("l_suppkey") === col("s_suppkey") &&
            col("s_nationkey") === col("c_nationkey"))
        .groupBy("n_name")
        .agg(count(lit(1)).as("n_items"),
          sum(cents(col("l_extendedprice")) *
            (lit(100L) - cents(col("l_discount")))).as("rev_cp"))
        .orderBy(col("rev_cp").desc, col("n_name"))
    }),

    // TPC-H Q3-shaped shipping-priority query (round 10): the canonical
    // multi-fact join + aggregate + top-k composition — segment-filtered
    // customers ⨝ date-filtered orders ⨝ date-filtered lineitems,
    // revenue per order, top-10 by revenue. All three filters are plain
    // scan predicates, so they push into the parquet reads BEFORE any
    // shuffle; customer scales with the fact tables (like `part`), so
    // no broadcast hint — the planner broadcasts while it fits and
    // falls back to key-partitioned joins from runtime stats. The
    // grouping key (o_orderkey) is the high-cardinality join key, so
    // the lineitem⨝orders exchange doubles as the aggregation exchange
    // (one fact-fact shuffle total), and the final top-10 compiles to
    // TakeOrderedAndProject — per-partition heaps forward 10 rows each,
    // no global sort. Revenue is the exact integer cent-percent sum
    // (q_join_star's idiom): Σ price_c·(100 − disc_c), no float money.
    "q_join_priority" -> ((s, d) => {
      val cust = Tables.customer(s, d)
        .filter(col("c_mktsegment") === "BUILDING")
        .select(col("c_custkey"))
      val ord = Tables.orders(s, d)
        .filter(expr("to_date(o_orderdate) < date'1998-06-01'"))
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"),
          col("o_orderpriority"))
        .join(cust, col("o_custkey") === col("c_custkey"))
      Tables.lineitem(s, d)
        .filter(expr("to_date(l_shipdate) > date'1998-06-01'"))
        .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
        .join(ord, col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(sum(cents(col("l_extendedprice")) *
          (lit(100L) - cents(col("l_discount")))).as("rev_cp"))
        .select(col("o_orderkey"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_date"),
          col("o_orderpriority"), col("rev_cp"))
        .orderBy(col("rev_cp").desc, col("order_date"), col("o_orderkey"))
        .limit(10)
    })
  )

  val oracle: Map[String, String] = Map(
    "q_join_full" ->
      """WITH p AS (
        |  SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS day,
        |    COUNT(*) AS n_purch
        |  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2),
        |e AS (
        |  SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS day,
        |    COUNT(*) AS n_err
        |  FROM events WHERE event_type = 'error' GROUP BY 1, 2)
        |SELECT COALESCE(p.user_id, e.user_id) AS user_id,
        |  strftime(COALESCE(p.day, e.day), '%Y-%m-%d') AS day,
        |  CAST(COALESCE(n_purch, 0) AS BIGINT) AS n_purch,
        |  CAST(COALESCE(n_err, 0) AS BIGINT) AS n_err
        |FROM p FULL OUTER JOIN e ON p.user_id = e.user_id AND p.day = e.day
        |ORDER BY user_id, day""".stripMargin,
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
        |ORDER BY c_custkey""".stripMargin,
    // same union-and-carry-forward algebra as the Spark side — NOT
    // DuckDB's ASOF JOIN, whose tie handling is not contractually
    // pinned to ours
    "q_join_asof" ->
      """WITH u AS (
        |  SELECT user_id, epoch_us(ts) AS t, 0 AS k,
        |         event_id AS err_id, CAST(NULL AS BIGINT) AS pid
        |  FROM events WHERE event_type = 'error'
        |  UNION ALL
        |  SELECT user_id, epoch_us(ts), 1, NULL, event_id
        |  FROM events WHERE event_type = 'purchase'),
        |w AS (
        |  SELECT user_id, t, k, pid,
        |    LAST_VALUE(err_id IGNORE NULLS) OVER
        |      (PARTITION BY user_id ORDER BY t, k, COALESCE(err_id, pid)
        |       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS err_event_id,
        |    LAST_VALUE(CASE WHEN k = 0 THEN t END IGNORE NULLS) OVER
        |      (PARTITION BY user_id ORDER BY t, k, COALESCE(err_id, pid)
        |       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS err_t
        |  FROM u)
        |SELECT pid AS event_id, user_id, err_event_id, t - err_t AS gap_us
        |FROM w WHERE k = 1 AND err_event_id IS NOT NULL
        |ORDER BY event_id""".stripMargin,
    "q_join_range" ->
      """SELECT a.event_id AS event_id1, b.event_id AS event_id2, a.user_id,
        |       epoch_us(b.ts) - epoch_us(a.ts) AS gap_us
        |FROM events a JOIN events b
        |  ON a.user_id = b.user_id
        | AND (epoch_us(a.ts) < epoch_us(b.ts)
        |      OR (epoch_us(a.ts) = epoch_us(b.ts) AND a.event_id < b.event_id))
        | AND epoch_us(b.ts) - epoch_us(a.ts) <= 3600000000
        |ORDER BY event_id1, event_id2""".stripMargin,
    // plain join on purpose: the oracle proves the salted rewrite is
    // result-invariant
    "q_join_salted" ->
      s"""SELECT s_name, CAST(COUNT(*) AS BIGINT) AS n_items,
         |  ${sqlSumCents("l_extendedprice")} AS rev_cents
         |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
         |GROUP BY s_name ORDER BY s_name""".stripMargin,
    // plain join on purpose: the oracle proves the Bloom pre-filter is
    // result-invariant (false positives die in the join)
    "q_join_bloom" ->
      s"""SELECT s.s_suppkey, s.s_name, CAST(COUNT(*) AS BIGINT) AS n_items,
         |  CAST(SUM(${sqlCents("l.l_extendedprice")}) AS BIGINT) AS revenue_c
         |FROM lineitem l
         |JOIN (SELECT s_suppkey, s_name FROM supplier
         |      JOIN nation ON s_nationkey = n_nationkey
         |      WHERE n_name IN ('NATION_1','NATION_2','NATION_3')) s
         |  ON l.l_suppkey = s.s_suppkey
         |GROUP BY 1, 2 ORDER BY 1""".stripMargin,
    "q_join_dim_part" ->
      s"""SELECT p.p_brand, CAST(COUNT(*) AS BIGINT) AS n_items,
         |  CAST(SUM(${sqlCents("l.l_extendedprice")}) AS BIGINT) AS revenue_c,
         |  ROUND(CAST(SUM(CASE WHEN p.p_type = 'PROMO'
         |      THEN ${sqlCents("l.l_extendedprice")} ELSE 0 END) AS DOUBLE)
         |    / CAST(SUM(${sqlCents("l.l_extendedprice")}) AS DOUBLE), 4)
         |    AS promo_share
         |FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
         |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_join_star" ->
      s"""SELECT n_name, CAST(COUNT(*) AS BIGINT) AS n_items,
         |  CAST(SUM(${sqlCents("l_extendedprice")}
         |    * (100 - ${sqlCents("l_discount")})) AS BIGINT) AS rev_cp
         |FROM region
         |JOIN nation ON n_regionkey = r_regionkey
         |JOIN customer ON c_nationkey = n_nationkey
         |JOIN orders ON o_custkey = c_custkey
         |JOIN lineitem ON l_orderkey = o_orderkey
         |JOIN supplier ON s_suppkey = l_suppkey
         |  AND s_nationkey = c_nationkey
         |WHERE r_name = 'ASIA'
         |GROUP BY n_name ORDER BY rev_cp DESC, n_name""".stripMargin,

    "q_join_priority" ->
      s"""SELECT o_orderkey,
         |  strftime(date_trunc('day', o_orderdate), '%Y-%m-%d')
         |    AS order_date,
         |  o_orderpriority,
         |  CAST(SUM(${sqlCents("l_extendedprice")}
         |    * (100 - ${sqlCents("l_discount")})) AS BIGINT) AS rev_cp
         |FROM customer
         |JOIN orders ON o_custkey = c_custkey
         |JOIN lineitem ON l_orderkey = o_orderkey
         |WHERE c_mktsegment = 'BUILDING'
         |  AND CAST(o_orderdate AS DATE) < DATE '1998-06-01'
         |  AND CAST(l_shipdate AS DATE) > DATE '1998-06-01'
         |GROUP BY 1, 2, 3
         |ORDER BY rev_cp DESC, order_date, o_orderkey LIMIT 10""".stripMargin
  )
}
