package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.functions.Money._
import graft.sources.Tables

/** SURVEY.md §2.8 scalar functions (string / date / math / JSON).
  *
  * The reference has no scalar-function library — every scalar op lives
  * inside user map/reduce executables as ad-hoc string code (SURVEY.md
  * §2.8, [SPEC]). Here each class of scalar work is a codegen'd builtin
  * from `org.apache.spark.sql.functions`, which keeps the whole pipeline
  * inside one WholeStageCodegen span — no fork/exec per line, no UDF
  * serialization boundary.
  *
  * Date/time outputs are formatted strings, not raw timestamps: both
  * engines agree bit-for-bit on 'yyyy-MM' strings, while raw timestamp
  * physical encodings differ (SURVEY.md §7.4).
  */
object ScalarQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_scalar_string" -> ((s, d) =>
      Tables.customer(s, d)
        .select(
          col("c_custkey"),
          upper(col("c_name")).as("name_u"),
          substring(col("c_name"), 1, 8).as("name_pre"),
          length(col("c_name")).cast(LongType).as("name_len"),
          concat_ws("#", col("c_name"), col("c_mktsegment")).as("name_seg"))
        .orderBy("c_custkey")),

    "q_scalar_date" -> ((s, d) =>
      Tables.orders(s, d)
        .groupBy(date_format(date_trunc("month", col("o_orderdate")), "yyyy-MM")
          .as("month"))
        .agg(count(lit(1)).as("n"))
        .orderBy("month")),

    "q_scalar_math" -> ((s, d) =>
      Tables.lineitem(s, d)
        .filter(col("l_orderkey") < 100)
        .select(
          col("l_orderkey"),
          col("l_linenumber"),
          round(col("l_extendedprice") * (lit(1) - col("l_discount")) * 100, 0)
            .cast(LongType).as("rev_c"),
          floor(col("l_quantity")).cast(LongType).as("qty_floor"),
          round(abs(col("l_discount") - 0.05), 4).as("disc_abs"))
        // full-row sort key — (orderkey, linenumber) is NOT unique in
        // the synthetic fixture (see q_scan_project note)
        .orderBy("l_orderkey", "l_linenumber", "rev_c", "qty_floor",
          "disc_abs")),

    // events.props is a one-key JSON object {"k": <int>} (FIXTURES.md).
    "q_json_extract" -> ((s, d) =>
      Tables.events(s, d)
        .groupBy("event_type")
        .agg(sum(get_json_object(col("props"), "$.k").cast(LongType))
          .as("sum_k"))
        .orderBy("event_type")),

    // NESTED JSON with an explicit schema — the from_json path a real
    // events pipeline hits first (q_json_extract covers only one-key
    // get_json_object). The fixture's props is flat, so the query first
    // RE-SERIALIZES each event into the nested envelope an upstream
    // producer would emit ({"et", "meta": {"uid", "k"}, "vals": [v,
    // 2v]}), then parses it back with from_json + a full DDL schema and
    // traverses object.object, object.field and array[index] paths.
    // Parity: each engine parses the envelope IT printed — double →
    // JSON → double is bit-exact per engine (shortest round-trip
    // printing both sides), ×2 is an exact power-of-two scale, and the
    // compared aggregates are integer cents/counts. Per-row projection
    // + one partial-combined aggregate; json never crosses the shuffle
    // (only (et, k, cents) leave the map side).
    "q_json_nested" -> ((s, d) => {
      val env = Tables.events(s, d)
        .select(to_json(struct(
          col("event_type").as("et"),
          struct(col("user_id").as("uid"),
            get_json_object(col("props"), "$.k").cast(LongType).as("k"))
            .as("meta"),
          array(col("value"), col("value") * 2).as("vals"))).as("j"))
      env
        .select(from_json(col("j"),
          "et STRING, meta STRUCT<uid: BIGINT, k: BIGINT>, vals ARRAY<DOUBLE>",
          Map.empty[String, String]).as("p"))
        .select(col("p.et").as("event_type"), col("p.meta.uid").as("uid"),
          col("p.meta.k").as("k"), element_at(col("p.vals"), 2).as("v2"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_events"),
          sum(col("k")).as("sum_k"),
          Money.sumCents(col("v2")).as("sum_v2_cents"),
          max(col("uid")).as("max_uid"))
        .orderBy("event_type")
    }),

    // Array + map scalar functions over the embedding column: size,
    // min/max, HOF-folded mean and L2 norm (the left-to-right
    // cast-per-element accumulation the cosine queries pinned), and a
    // map-literal lookup (Spark `map_from_arrays` + `element_at`; the
    // oracle spells the same 4-entry lookup as CASE — DuckDB's MAP
    // extraction returns lists, not scalars). Pure per-row projection,
    // no shuffle but the output sort.
    "q_scalar_array" -> ((s, d) =>
      Tables.embeddings(s, d)
        .filter(col("vec_id") < 100)
        .select(col("vec_id"), col("embedding").as("e"), col("label"))
        .select(col("vec_id"),
          size(col("e")).cast(LongType).as("dim"),
          round(array_min(col("e")).cast("double"), 4).as("v_min"),
          round(array_max(col("e")).cast("double"), 4).as("v_max"),
          round(expr(
            "aggregate(e, cast(0.0 as double), (a, x) -> a + cast(x as double))")
            / 64, 4).as("v_mean"),
          round(sqrt(expr(
            "aggregate(e, cast(0.0 as double), (a, x) -> a + cast(x as double) * cast(x as double))")),
            4).as("l2"),
          element_at(
            map_from_arrays(
              array(lit(0), lit(1), lit(2), lit(3)),
              array(lit("q0"), lit("q1"), lit("q2"), lit("q3"))),
            pmod(col("label"), lit(4))).as("quad"))
        .orderBy("vec_id"))
  )

  val oracle: Map[String, String] = Map(
    "q_scalar_array" ->
      """SELECT vec_id, CAST(len(embedding) AS BIGINT) AS dim,
        |  ROUND(CAST(list_min(embedding) AS DOUBLE), 4) AS v_min,
        |  ROUND(CAST(list_max(embedding) AS DOUBLE), 4) AS v_max,
        |  ROUND(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE))) / 64, 4) AS v_mean,
        |  ROUND(sqrt(list_sum(list_transform(embedding,
        |    x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE)))), 4) AS l2,
        |  CASE label % 4 WHEN 0 THEN 'q0' WHEN 1 THEN 'q1'
        |       WHEN 2 THEN 'q2' ELSE 'q3' END AS quad
        |FROM embeddings WHERE vec_id < 100 ORDER BY vec_id""".stripMargin,
    "q_scalar_string" ->
      """SELECT c_custkey, UPPER(c_name) AS name_u,
        |  SUBSTRING(c_name, 1, 8) AS name_pre,
        |  CAST(LENGTH(c_name) AS BIGINT) AS name_len,
        |  c_name || '#' || c_mktsegment AS name_seg
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "q_scalar_date" ->
      """SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m') AS month,
        |  CAST(COUNT(*) AS BIGINT) AS n
        |FROM orders GROUP BY month ORDER BY month""".stripMargin,
    "q_scalar_math" ->
      """SELECT l_orderkey, l_linenumber,
        |  CAST(ROUND(l_extendedprice * (1 - l_discount) * 100, 0) AS BIGINT) AS rev_c,
        |  CAST(FLOOR(l_quantity) AS BIGINT) AS qty_floor,
        |  ROUND(ABS(l_discount - 0.05), 4) AS disc_abs
        |FROM lineitem WHERE l_orderkey < 100
        |ORDER BY l_orderkey, l_linenumber, rev_c, qty_floor, disc_abs"""
        .stripMargin,
    "q_json_extract" ->
      """SELECT event_type,
        |  CAST(SUM(CAST(props->>'k' AS BIGINT)) AS BIGINT) AS sum_k
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q_json_nested" ->
      """WITH env AS (
        |  SELECT to_json(struct_pack(
        |      et := event_type,
        |      meta := struct_pack(uid := user_id,
        |                          k := CAST(props->>'$.k' AS BIGINT)),
        |      vals := [value, value * 2])) AS j
        |  FROM events),
        |parsed AS (
        |  SELECT j->>'$.et' AS et,
        |    CAST(j->>'$.meta.uid' AS BIGINT) AS uid,
        |    CAST(j->>'$.meta.k' AS BIGINT) AS k,
        |    CAST(j->>'$.vals[1]' AS DOUBLE) AS v2
        |  FROM env)
        |SELECT et AS event_type, CAST(COUNT(*) AS BIGINT) AS n_events,
        |  CAST(SUM(k) AS BIGINT) AS sum_k,
        |  CAST(SUM(CAST(CAST(v2 AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT)
        |    AS sum_v2_cents,
        |  CAST(MAX(uid) AS BIGINT) AS max_uid
        |FROM parsed GROUP BY et ORDER BY et""".stripMargin
  )
}
