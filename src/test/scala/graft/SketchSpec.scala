package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Tables

/** Approximate (sketch) aggregates — deliberately NON-contract
  * (SURVEY.md §2.4): HLL++ and KLL-style sketch payloads are
  * engine-specific by construction, so cross-engine hash equality is
  * impossible; the correct check is the published error bound against
  * the exact answer, which is what this spec pins. At 100 TB these are
  * the cardinality/quantile forms that replace exact distinct/sort
  * when the answer only needs to be within a few percent: both
  * partial-aggregate map-side into constant-size state and never
  * shuffle more than the sketch.
  */
class SketchSpec extends AnyFunSuite {
  import SparkTestBase._

  test("approx_count_distinct stays within its rsd bound") {
    val ev = Tables.events(spark, sf001)
    val exact = ev.select(countDistinct(col("user_id"))).head().getLong(0)
    val approx = ev.select(approx_count_distinct(col("user_id"), 0.02))
      .head().getLong(0)
    // 0.02 rsd ⇒ ±3σ = 6%; generous but deterministic for fixed input
    assert(math.abs(approx - exact).toDouble / exact <= 0.06,
      s"approx=$approx exact=$exact")
  }

  test("approx_percentile brackets the exact rank-selected median") {
    val li = Tables.lineitem(spark, sf001)
      .select(col("l_extendedprice").cast("double").as("p"))
    val approx = li.select(
      expr("approx_percentile(p, 0.5, 1000)")).head().getDouble(0)
    val sorted = li.orderBy("p").collect().map(_.getDouble(0))
    val exact = sorted(((sorted.length - 1) * 0.5).toInt)
    // accuracy 1000 ⇒ rank error ≤ n/1000; translate to a value window
    val tol = math.max(2, sorted.length / 1000)
    val lo = sorted(math.max(0, ((sorted.length - 1) * 0.5).toInt - tol))
    val hi = sorted(math.min(sorted.length - 1,
      ((sorted.length - 1) * 0.5).toInt + tol))
    assert(approx >= lo && approx <= hi,
      s"approx=$approx outside [$lo, $hi] around exact=$exact")
  }

  test("HLL sketch MERGE: per-group sketches union to the one-pass answer") {
    // The 100 TB rollup pattern: persist one hll_sketch_agg payload per
    // partition-group (here event_type), answer any group combination
    // later by hll_union_agg over the stored sketches — no re-scan of
    // the facts. Datasketches HLL union is register-wise max, so a
    // union over ANY partition of the rows yields byte-identical
    // registers to the single-pass sketch: the estimates must be EQUAL,
    // not merely close. This is the associativity that makes sketch
    // rollups linear at scale.
    val ev = Tables.events(spark, sf001)
    val onePass = ev.select(
      expr("hll_sketch_estimate(hll_sketch_agg(user_id, 12))"))
      .head().getLong(0)
    val merged = ev.groupBy("event_type")
      .agg(expr("hll_sketch_agg(user_id, 12)").as("sk"))
      .select(expr("hll_sketch_estimate(hll_union_agg(sk, true))"))
      .head().getLong(0)
    assert(merged === onePass,
      s"union-of-group-sketches $merged != one-pass sketch $onePass")
    // and the estimate itself honors the published bound vs exact
    val exact = ev.select(countDistinct(col("user_id"))).head().getLong(0)
    assert(math.abs(merged - exact).toDouble / exact <= 0.06,
      s"merged=$merged exact=$exact")
  }

  test("multi-quantile percentile_approx array brackets every exact rank") {
    // one GK pass answering FOUR quantiles at once — the shape a
    // profiling rollup ships instead of four sorted scans
    val li = Tables.lineitem(spark, sf001)
      .select(col("l_extendedprice").cast("double").as("p"))
    val qs = Seq(0.25, 0.5, 0.75, 0.95)
    val got = li.select(
      expr("approx_percentile(p, array(0.25D, 0.5D, 0.75D, 0.95D), 1000)"))
      .head().getSeq[Double](0)
    val sorted = li.orderBy("p").collect().map(_.getDouble(0))
    val tol = math.max(2, sorted.length / 1000)
    qs.zip(got).foreach { case (q, v) =>
      val r = ((sorted.length - 1) * q).toInt
      val lo = sorted(math.max(0, r - tol))
      val hi = sorted(math.min(sorted.length - 1, r + tol))
      assert(v >= lo && v <= hi, s"q=$q got=$v outside [$lo, $hi]")
    }
  }

  test("sketches partial-aggregate: per-group HLL equals global merge") {
    // groupwise sketches summed over groups ≈ global sketch — the
    // map-side-combine property that makes HLL linear at scale
    val ev = Tables.events(spark, sf001)
    val global = ev.select(approx_count_distinct(col("user_id"), 0.02))
      .head().getLong(0)
    val grouped = ev.groupBy("event_type")
      .agg(approx_count_distinct(col("user_id"), 0.02).as("d"))
      .collect().map(_.getLong(1))
    // users appear under several event types, so the sum over groups
    // must be ≥ the global distinct (no sketch "loses" members)
    assert(grouped.sum >= global)
  }
}
