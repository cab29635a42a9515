package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Money._
import graft.sources.{Stats, Tables}

/** SURVEY.md §2.9 event-time windows over the stream-shaped `events`
  * table.
  *
  * The reference is strictly batch [SPEC][MR]; these are the event-time
  * shapes its applications would express as chained MapReduce jobs,
  * written so the identical logic lifts onto Structured Streaming
  * (tumbling groupBy ≡ `window(ts, '1 hour')`; see
  * graft.streaming.StreamingWindows for the readStream twin).
  *
  * Ordering inside windows uses the microsecond-truncated timestamp plus
  * `event_id` as tiebreak: the raw parquet value is nanosecond and the
  * oracle engine truncates to µs, so ties must be broken identically on
  * both sides (SURVEY.md §7.4/§7.5).
  */
object WindowQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Tumbling 1-hour window × event_type: count + sum(value) cents.
    // A pure hash aggregate — partial→final, one shuffle on (hour, type).
    "q_window_tumbling" -> ((s, d) =>
      Tables.events(s, d)
        .groupBy(
          date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH").as("hour"),
          col("event_type"))
        .agg(
          count(lit(1)).as("n"),
          sumCents(col("value")).as("sum_value_c"))
        .orderBy("hour", "event_type")),

    // Ranking window: each user's first event.
    "q_window_rank" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      Tables.events(s, d)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select("user_id", "event_id", "event_type")
        .orderBy("user_id")
    }),

    // Analytic frame: running event count per user (sample user_id < 20).
    // The filter is applied below the window (it is on the partition key,
    // so the pushdown is semantics-preserving and prunes the shuffle).
    "q_window_analytic" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.events(s, d)
        .filter(col("user_id") < 20)
        .select(col("user_id"), col("event_id"),
          count(lit(1)).over(w).as("running_n"))
        .orderBy("user_id", "event_id")
    }),

    // Decile bucketing: ntile(10) semantics per status over the full
    // (price, key) order — the quantile-bucket assignment used for
    // value banding and equal-frequency histograms. The unique-key
    // ORDER BY suffix makes the standard first-(n mod 10)-buckets-get-
    // one-extra division identical in both engines; output summarizes
    // each decile to (count, min, max) cents.
    //
    // NOT expressed as ntile() over (partition by status): the status
    // key has 3 values, so that window funnels the whole table through
    // 3 tasks. Instead RankSelect.withGlobalRank computes each row's
    // exact global rank via bucket histogram + prefix sum + in-bucket
    // rank (groups × buckets parallel tasks), and the decile is the
    // closed-form ntile of that rank: with q = n div 10 and r = n mod
    // 10, tiles 1..r hold q+1 rows and tiles r+1..10 hold q rows.
    "q_window_ntile" -> ((s, d) => {
      val ord = Tables.orders(s, d)
        .select(col("o_orderstatus").as("st"), col("o_totalprice"),
          col("o_orderkey"))
      RankSelect.withGlobalRank(ord, "st", "o_totalprice", "o_orderkey",
          RankSelect.bucketsFor(Stats.rowCount(s, d, "orders")))
        .withColumn("decile", expr(
          """CASE WHEN __rank <= (__n % 10) * (__n div 10 + 1)
            |     THEN (__rank + (__n div 10)) div (__n div 10 + 1)
            |     ELSE (__n % 10) +
            |       (__rank - (__n % 10) * (__n div 10 + 1)
            |         + greatest(__n div 10, 1) - 1) div greatest(__n div 10, 1)
            |END""".stripMargin).cast("long"))
        .groupBy("st", "decile")
        .agg(count(lit(1)).as("n"), min(cents(col("__v"))).as("min_c"),
          max(cents(col("__v"))).as("max_c"))
        .orderBy("st", "decile")
    }),

    // percent_rank per status over the full (price, key) order — the
    // empirical-CDF assignment (value → quantile position) used for
    // rank normalization of features. Same scale discipline as ntile:
    // never `percent_rank() over (partition by status)` (3 full-table
    // window tasks) — RankSelect.withGlobalRank supplies the exact
    // global rank from the two-phase bucket histogram, and pct_rank =
    // (rank-1)/(n-1) is one IEEE division of exact integers → 4 dp,
    // identical in both engines (the unique-key ORDER BY suffix makes
    // rank = row_number, which is what PERCENT_RANK degenerates to).
    "q_window_cume" -> ((s, d) => {
      val ord = Tables.orders(s, d)
        .select(col("o_orderstatus").as("st"), col("o_totalprice"),
          col("o_orderkey"))
      RankSelect.withGlobalRank(ord, "st", "o_totalprice", "o_orderkey",
          RankSelect.bucketsFor(Stats.rowCount(s, d, "orders")))
        .select(col("__k").cast("long").as("o_orderkey"),
          col("st").as("o_orderstatus"),
          round((col("__rank") - 1).cast("double") /
            (col("__n") - 1).cast("double"), 4).as("pct_rank"))
        .orderBy("o_orderkey")
    }),

    // FIRST_VALUE/LAST_VALUE with an explicit unbounded-both-sides
    // frame (round 10, wave 28) — the entry/exit-point primitive
    // (landing event vs final event per user) the other window queries
    // don't exercise: row_number picks ONE row, this paints every row
    // with the partition's boundary values. The window partitions by
    // user_id (data-proportional, never a low-cardinality funnel) and
    // the values collapse to one row per user in the following
    // aggregate; ties resolved by the repo's (ts, event_id) total
    // order on both engines.
    "q_window_firstlast" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      Tables.events(s, d)
        .select(col("user_id"),
          first(col("event_type")).over(w).as("first_type"),
          last(col("event_type")).over(w).as("last_type"))
        .groupBy("user_id", "first_type", "last_type")
        .agg(count(lit(1)).as("n_events"))
        .orderBy("user_id")
    })
  )

  val oracle: Map[String, String] = Map(
    "q_window_ntile" ->
      s"""WITH t AS (
         |  SELECT o_orderstatus AS st, ${sqlCents("o_totalprice")} AS c,
         |    NTILE(10) OVER (PARTITION BY o_orderstatus
         |      ORDER BY o_totalprice, o_orderkey) AS decile
         |  FROM orders)
         |SELECT st, CAST(decile AS BIGINT) AS decile,
         |  CAST(COUNT(*) AS BIGINT) AS n, MIN(c) AS min_c, MAX(c) AS max_c
         |FROM t GROUP BY st, decile ORDER BY st, decile""".stripMargin,
    "q_window_tumbling" ->
      s"""SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H') AS hour,
         |  event_type, CAST(COUNT(*) AS BIGINT) AS n,
         |  ${sqlSumCents("value")} AS sum_value_c
         |FROM events GROUP BY hour, event_type
         |ORDER BY hour, event_type""".stripMargin,
    "q_window_rank" ->
      """SELECT user_id, event_id, event_type FROM (
        |  SELECT user_id, event_id, event_type,
        |    ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
        |  FROM events
        |) WHERE rn = 1 ORDER BY user_id""".stripMargin,
    "q_window_analytic" ->
      """SELECT user_id, event_id,
        |  CAST(COUNT(*) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS running_n
        |FROM events WHERE user_id < 20
        |ORDER BY user_id, event_id""".stripMargin,
    "q_window_cume" ->
      """SELECT o_orderkey, o_orderstatus,
        |  ROUND(PERCENT_RANK() OVER (PARTITION BY o_orderstatus
        |    ORDER BY o_totalprice, o_orderkey), 4) AS pct_rank
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "q_window_firstlast" ->
      """WITH fl AS (
        |  SELECT user_id,
        |    FIRST_VALUE(event_type) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |      AS first_type,
        |    LAST_VALUE(event_type) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |      AS last_type
        |  FROM events)
        |SELECT user_id, first_type, last_type,
        |  CAST(COUNT(*) AS BIGINT) AS n_events
        |FROM fl GROUP BY 1, 2, 3 ORDER BY user_id""".stripMargin
  )
}
