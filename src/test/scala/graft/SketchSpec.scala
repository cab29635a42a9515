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
