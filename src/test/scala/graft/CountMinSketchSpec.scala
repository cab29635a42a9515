package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.CountMinSketch

/** Count-Min sketch laws on a real token stream: never an
  * underestimate, bounded overestimate, exact merge (counter addition
  * equals sketching the concatenation), and bounded sparse size. All
  * deterministic — the seeded xxhash64 rows are fixed functions.
  */
class CountMinSketchSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private val D = 4
  private val W = 1024

  private lazy val tokens = spark.read
    .parquet(s"${SparkTestBase.sf0001}/documents.parquet")
    .select(explode(expr("filter(split(text, ' '), t -> t <> '')")).as("w"))
    .withColumn("g", lit(1))

  test("estimates never undercount and overshoot within the e/width bound") {
    val exact = tokens.groupBy("g", "w").agg(count(lit(1)).as("true_cnt"))
    val n = tokens.count()
    val sk = CountMinSketch.sketch(tokens, Seq("g"), "w", D, W)

    // sparse representation stays bounded
    assert(sk.count() <= D.toLong * W)

    val probes = exact.select("g", "w")
    val joined = CountMinSketch.estimate(sk, probes, Seq("g"), "w", D, W)
      .join(exact, Seq("g", "w"))
      .select(col("w"), col("est"), col("true_cnt"))
      .collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      val (est, t) = (r.getLong(1), r.getLong(2))
      assert(est >= t, s"undercounted ${r.getString(0)}: $est < $t")
    }
    // CMS bound: overshoot ≤ e/width · n w.h.p. — allow 2x slack on
    // the measured corpus (deterministic once green)
    val bound = math.ceil(2 * math.E / W * n).toLong
    val worst = joined.map(r => r.getLong(1) - r.getLong(2)).max
    assert(worst <= bound, s"overshoot $worst above bound $bound (n=$n)")

    // an absent key's estimate is only hash-collision noise
    val ghost = spark.range(1).select(lit(1).as("g"),
      lit("__never_a_token__").as("w"))
    val ghostEst = CountMinSketch.estimate(sk, ghost, Seq("g"), "w", D, W)
      .select("est").head().getLong(0)
    assert(ghostEst <= bound)
  }

  test("merging partial sketches equals sketching the whole, exactly") {
    val Array(a, b) = tokens.randomSplit(Array(0.5, 0.5), seed = 11)
    val merged = CountMinSketch.merge(
      CountMinSketch.sketch(a, Seq("g"), "w", D, W),
      CountMinSketch.sketch(b, Seq("g"), "w", D, W))
    val whole = CountMinSketch.sketch(a.unionAll(b), Seq("g"), "w", D, W)
    val diff = merged.withColumnRenamed("cnt", "m")
      .join(whole, Seq("g", "depth", "bucket"), "full")
      .filter(coalesce(col("m"), lit(-1L)) =!= coalesce(col("cnt"), lit(-1L)))
    assert(diff.count() === 0)
  }
}
