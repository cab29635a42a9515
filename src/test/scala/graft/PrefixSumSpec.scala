package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{PrefixSum, RankSelect}

/** PrefixSum's two-phase global cumulative sum must agree EXACTLY with
  * the single-task `sum over (order by v)` window it replaces, stay
  * invariant to the bucket count (which only sets parallelism), and
  * survive the degenerate all-one-value input (every row buckets to 0).
  * Also pins the weighted-rank/PrefixSum agreement: the weighted median
  * selected by RankSelect.selectWeightedRanks equals the first value
  * whose PrefixSum running weight reaches half the total.
  */
class PrefixSumSpec extends AnyFunSuite {
  import SparkTestBase._

  // duplicate-heavy values so ties straddle would-be bucket boundaries,
  // two count columns with different distributions
  private lazy val counts = {
    import spark.implicits._
    (1L to 2000L).map { i =>
      ((i / 3) * 7 % 499, i % 5 + 1, if (i % 4 == 0) 2L else 0L)
    }.toDF("v", "c1", "c2")
      .groupBy("v").agg(sum("c1").as("c1"), sum("c2").as("c2"))
  }

  private def naive = counts
    .withColumn("cw1", sum("c1").over(Window.orderBy("v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    .withColumn("cw2", sum("c2").over(Window.orderBy("v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)))

  test("globalCumsum equals the single-task global window") {
    val expected = naive.select("v", "cw1", "cw2")
      .orderBy("v").collect().toSeq.map(_.toString)
    val got = PrefixSum.globalCumsum(counts, "v", Seq("c1", "c2"),
        buckets = 64)
      .select(col("v"), col("__cw_c1").as("cw1"), col("__cw_c2").as("cw2"))
      .orderBy("v").collect().toSeq.map(_.toString)
    assert(got === expected)
  }

  test("globalCumsum is bucket-count invariant") {
    val at = Seq(1, 16, 1024).map { b =>
      PrefixSum.globalCumsum(counts, "v", Seq("c1"), buckets = b)
        .select(col("v"), col("__cw_c1"))
        .orderBy("v").collect().toSeq.map(_.toString)
    }
    assert(at(0) === at(1))
    assert(at(1) === at(2))
  }

  test("globalCumsum handles a single distinct value") {
    import spark.implicits._
    val one = Seq((42L, 3L), (42L, 4L)).toDF("v", "c")
      .groupBy("v").agg(sum("c").as("c"))
    val got = PrefixSum.globalCumsum(one, "v", Seq("c"), buckets = 8)
      .select("v", "__cw_c").collect()
    assert(got.length === 1 && got(0).getLong(1) === 7L)
  }

  test("selectWeightedRanks median equals PrefixSum half-total crossing") {
    import spark.implicits._
    val rows = (1L to 3000L)
      .map { i => ("g", (i / 11) * 13 % 797, i % 7 + 1) }
      .toDF("g", "v", "w")
    val collapsed = rows.groupBy("v")
      .agg(sum(col("w").cast("long")).as("w"))
    val total = collapsed.agg(sum("w")).head().getLong(0)
    val expected = PrefixSum.globalCumsum(collapsed, "v", Seq("w"))
      .filter(col("__cw_w") * 2 >= total)
      .agg(min("v")).head().getLong(0)
    val got = RankSelect
      .selectWeightedRanks(rows, "g", "v", "w", Seq("p50" -> 0.5),
        buckets = 32)
      .head().getAs[Long]("__v")
    assert(got === expected)
    Materialize.releaseAll()
  }
}
