package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic guarantees of the round-4 temporal joins on a planted
  * mini events table, plus the two-phase batch-ANN equivalence:
  *
  *  - q_join_asof tie rules: an error at the SAME microsecond as a
  *    purchase matches it; among several equal-ts errors the largest
  *    event_id wins; purchases with no prior error are dropped.
  *  - q_join_range boundary rules: a gap of exactly 1 h is included,
  *    1 h + 1 µs is not; pairs spanning an hour-bucket boundary are
  *    found (the explode-to-two-buckets path); equal-ts pairs appear
  *    once, ordered by event_id; no pair is emitted twice.
  *  - q_sim_ann_batch's salted partial top-k must select EXACTLY the
  *    rows a single global window would — salting is a physical
  *    optimization, never a semantic one.
  */
class TemporalJoinSemanticsSpec extends AnyFunSuite {
  import SparkTestBase._

  /** Events written in the events-table schema with ts as raw
    * epoch-nanos longs — the same shape Tables.events sees after the
    * nanosAsLong read of the driver's parquet (FIXTURES.md gotcha 1).
    */
  private lazy val eventsDir: String = {
    import spark.implicits._
    def ns(us: Long): Long = us * 1000L
    val H = 3600000000L // 1 h in µs
    val rows = Seq(
      // user 1: tie semantics
      (5L, ns(100L), 1L, "purchase", 1.0, "{}"),   // before any error
      (20L, ns(5000L), 1L, "error", 1.0, "{}"),    // equal-ts error pair
      (21L, ns(5000L), 1L, "error", 1.0, "{}"),
      (30L, ns(5000L), 1L, "purchase", 1.0, "{}"), // same-µs purchase
      (40L, ns(9000L), 1L, "purchase", 1.0, "{}"),
      // user 2: plain case
      (50L, ns(1000L), 2L, "error", 1.0, "{}"),
      (51L, ns(2000L), 2L, "purchase", 1.0, "{}"),
      // user 3: range-join boundaries (bucket edge at t=H)
      (100L, ns(0L), 3L, "click", 1.0, "{}"),
      (101L, ns(H), 3L, "click", 1.0, "{}"),       // exactly 1 h after 100
      (102L, ns(H + 1L), 3L, "click", 1.0, "{}"),  // 1 h + 1 µs after 100
      (103L, ns(2L * H), 3L, "click", 1.0, "{}"),  // equal-ts pair
      (104L, ns(2L * H), 3L, "click", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val dir = java.nio.file.Files.createTempDirectory("graft-events").toString
    rows.coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("q_join_asof: same-µs error matches; max event_id wins ties; no-error purchases drop") {
    val out = SparkEntry.queries("q_join_asof")(spark, eventsDir)
      .collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(out === Map(
      30L -> (1L, 21L, 0L),    // same-µs error counts, id 21 > 20 wins
      40L -> (1L, 21L, 4000L), // carried forward to the later purchase
      51L -> (2L, 50L, 1000L)))
    assert(!out.contains(5L)) // purchase before any error is dropped
  }

  test("q_join_range: inclusive 1h bound, cross-bucket pairs, equal-ts once, no dups") {
    val H = 3600000000L
    val pairs = SparkEntry.queries("q_join_range")(spark, eventsDir)
      .filter(col("user_id") === 3)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(3)))
      .toSeq
    assert(pairs === pairs.distinct, "a pair was emitted twice")
    // (100, 102) is absent: its gap is 1 h + 1 µs, just over the bound
    assert(pairs.toSet === Set(
      (100L, 101L, H), // exactly 1 h — inclusive, and crosses a bucket edge
      (101L, 102L, 1L),
      (101L, 103L, H),
      (101L, 104L, H),
      (102L, 103L, H - 1L),
      (102L, 104L, H - 1L),
      (103L, 104L, 0L))) // equal ts: once, ordered by event_id
  }

  test("q_sim_ann_batch: salted two-phase top-k equals the single-window top-k") {
    graft.plans.CosineSimilarity.register(spark)
    val emb = sources.Tables.embeddings(spark, sf0001)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("e"))
    val probes = emb.filter(col("vec_id") < 8)
      .select(col("vec_id").as("probe_id"), col("e").as("p"))
    val naive = emb.filter(col("vec_id") >= 8)
      .crossJoin(broadcast(probes))
      .select(col("probe_id"), col("vec_id"),
        expr("cosine_sim(e, p)").as("sim_raw"))
      .withColumn("rn", row_number().over(
        Window.partitionBy("probe_id").orderBy(col("sim_raw").desc, col("vec_id"))))
      .filter(col("rn") <= 5)
      .select(col("probe_id"), col("vec_id"), round(col("sim_raw"), 4).as("sim"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val twoPhase = SparkEntry.queries("q_sim_ann_batch")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(twoPhase === naive)
  }
}
