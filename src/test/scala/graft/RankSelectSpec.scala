package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.RankSelect

/** RankSelect's two-phase distributed selection must agree EXACTLY with
  * the naive per-group window it replaces — including under the skew it
  * exists for (one group holding almost all rows) and heavy value ties
  * (equal values must share a bucket, so in-bucket order still
  * concatenates to the global order). Results must also be invariant to
  * the bucket count, which only sets the parallelism/task-size trade.
  */
class RankSelectSpec extends AnyFunSuite {
  import SparkTestBase._

  // 3 groups, one hot (90% of rows), duplicate-heavy values (v = i/7)
  // so ties straddle would-be bucket boundaries.
  private lazy val skewed = {
    import spark.implicits._
    (1L to 3000L).map { i =>
      val g = if (i % 10 != 0) "HOT" else if (i % 20 == 0) "A" else "B"
      (g, (i / 7) * 3 % 997, i)
    }.toDF("g", "v", "k")
  }

  private def naiveRank = skewed.withColumn("rank",
    row_number().over(Window.partitionBy("g").orderBy(col("v"), col("k"))))

  test("withGlobalRank equals the naive per-group window rank") {
    val expected = naiveRank
      .select("g", "v", "k", "rank")
      .orderBy("g", "rank").collect().toSeq.map(_.toString)
    val got = RankSelect.withGlobalRank(skewed, "g", "v", "k", buckets = 64)
      .select(col("g"), col("__v").as("v"), col("__k").as("k"),
        col("__rank").as("rank"))
      .orderBy("g", "rank").collect().toSeq.map(_.toString)
    assert(got === expected)
    Materialize.releaseAll()
  }

  test("selectRanks picks exactly the naive rank-ceil(n*p) row per group") {
    val n = skewed.groupBy("g").agg(count(lit(1)).as("n"))
    val expected = naiveRank.join(n, "g")
      .filter(col("rank") === ceil(col("n") * 0.5) ||
        col("rank") === ceil(col("n") * 0.99))
      .select(col("g"), col("v"))
      .orderBy("g", "v").collect().toSeq.map(_.toString)
    val got = RankSelect
      .selectRanks(skewed, "g", "v", "k",
        Seq("p50" -> 0.5, "p99" -> 0.99), buckets = 64)
      .select(col("g"), col("__v").as("v"))
      .orderBy("g", "v").collect().toSeq.map(_.toString)
    assert(got === expected)
    Materialize.releaseAll()
  }

  // selectRanksGivenStats' contract: the supplied stats only need to
  // COVER the values (with the exact non-null count) — exact bounds, a
  // widened cover, and even a NARROWED cover (lo raised above the true
  // min, hi lowered below the true max: out-of-cover values clamp to
  // the edge buckets via buildFrom's greatest()/least(), bucketing
  // stays monotone) must all pick the identical rows as the
  // self-deriving selectRanks.
  test("selectRanksGivenStats equals selectRanks under exact and widened covers") {
    val expected = RankSelect
      .selectRanks(skewed, "g", "v", "k", Seq("p50" -> 0.5, "p99" -> 0.99),
        buckets = 64)
      .orderBy("g", "__tag").collect().toSeq.map(_.toString)
    val exact = skewed.groupBy("g").agg(
      min(col("v").cast("double")).as("__lo"),
      max(col("v").cast("double")).as("__hi"),
      count(lit(1)).as("__n"))
    val widened = exact.select(col("g"),
      (col("__lo") - 500).as("__lo"), (col("__hi") + 1000).as("__hi"),
      col("__n"))
    // narrowed: __lo ABOVE the true min / __hi BELOW the true max —
    // exercises the greatest()-clamp (values below __lo → bucket 0)
    // and the least()-cap (values above __hi → bucket buckets-1)
    val narrowed = exact.select(col("g"),
      (col("__lo") + 100).as("__lo"), (col("__hi") - 100).as("__hi"),
      col("__n"))
    Seq(exact, widened, narrowed).foreach { st =>
      val got = RankSelect
        .selectRanksGivenStats(skewed, "g", "v", "k",
          Seq("p50" -> 0.5, "p99" -> 0.99), st, buckets = 64)
        .orderBy("g", "__tag").collect().toSeq.map(_.toString)
      assert(got === expected)
    }
    Materialize.releaseAll()
  }

  test("results are bucket-count invariant") {
    def run(b: Int) = RankSelect
      .selectRanks(skewed, "g", "v", "k", Seq("p50" -> 0.5), buckets = b)
      .orderBy("g").collect().toSeq.map(_.toString)
    val r = Seq(2, 17, 1024).map(run)
    assert(r(0) === r(1) && r(1) === r(2))
    Materialize.releaseAll()
  }

  test("single-value groups (lo == hi) collapse to one bucket, still exact") {
    import spark.implicits._
    val flat = (1L to 100L).map(i => ("only", 42L, i)).toDF("g", "v", "k")
    val got = RankSelect
      .selectRanks(flat, "g", "v", "k", Seq("p50" -> 0.5), buckets = 64)
      .collect()
    assert(got.length === 1 && got(0).getLong(2) === 42L)
    Materialize.releaseAll()
  }

  test("several targets landing in ONE bucket still rank independently") {
    // buckets = 1 forces every target into bucket 0 — the __tag-
    // partitioned rank window must give each target a full private
    // copy of the bucket's order, not a shared mis-numbered one
    val n = skewed.groupBy("g").agg(count(lit(1)).as("n"))
    val expected = naiveRank.join(n, "g")
      .filter(col("rank") === ceil(col("n") * 0.25) ||
        col("rank") === ceil(col("n") * 0.75))
      .select(col("g"), col("v"))
      .orderBy("g", "v").collect().toSeq.map(_.toString)
    val got = RankSelect
      .selectRanks(skewed, "g", "v", "k",
        Seq("q1" -> 0.25, "q3" -> 0.75), buckets = 1)
      .select(col("g"), col("__v").as("v"))
      .orderBy("g", "v").collect().toSeq.map(_.toString)
    assert(got === expected)
    Materialize.releaseAll()
  }

  test("NULL group / NULL value rows are excluded from count and ranks") {
    import spark.implicits._
    val dirty = skewed.union(
      Seq[(String, java.lang.Long, java.lang.Long)](
        (null, 1L, 9001L), ("HOT", null, 9002L), (null, null, 9003L))
        .toDF("g", "v", "k"))
    def run(df: org.apache.spark.sql.DataFrame) = RankSelect
      .selectRanks(df, "g", "v", "k", Seq("p50" -> 0.5), buckets = 64)
      .orderBy("g").collect().toSeq.map(_.toString)
    assert(run(dirty) === run(skewed))
    val ranked = RankSelect.withGlobalRank(dirty, "g", "v", "k", buckets = 64)
    assert(ranked.filter(col("__k") >= 9001L).count() === 0L)
    assert(ranked.count() === skewed.count())
    Materialize.releaseAll()
  }

  test("bucketsFor ladder holds expected in-bucket size bounded") {
    assert(RankSelect.bucketsFor(0L) === 1024)
    assert(RankSelect.bucketsFor(1024L * 65536L) === 1024)
    assert(RankSelect.bucketsFor(1024L * 65536L + 1) === 2048)
    assert(RankSelect.bucketsFor(Long.MaxValue) === (1 << 20))
  }
}
