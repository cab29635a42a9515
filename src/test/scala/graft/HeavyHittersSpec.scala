package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.HeavyHitters

/** Pins the two guarantees the two-pass heavy-hitters design rests on:
  * the per-partition Misra–Gries union is a SUPERSET of every item
  * with true count > n/(k+1) (under adversarial skew and a capacity
  * small enough to force constant decrements), and the end-to-end
  * `frequentItems` output is EXACTLY the direct group-count-filter
  * aggregate — invariant to the input partitioning, which only shapes
  * the candidate set, never the recounted answer.
  */
class HeavyHittersSpec extends AnyFunSuite {
  import SparkTestBase._

  // Zipf-flavored stream: item i appears ~ 6000/i times, plus a sea of
  // singletons that keeps every counter slot contested.
  private lazy val skewed = {
    import spark.implicits._
    val heavy = (1 to 40).flatMap(i => Seq.fill(6000 / i)(s"w$i"))
    val tail = (1 to 8000).map(i => s"rare$i")
    spark.sparkContext.parallelize(
      new scala.util.Random(7).shuffle(heavy ++ tail), 6)
      .toDS()
  }

  test("Misra–Gries union covers every item above n/(k+1)") {
    val k = 5
    val summary = HeavyHitters.summarize(skewed, k)
    val n = summary.filter(col("is_total"))
      .agg(sum("cnt")).head().getLong(0)
    assert(n === skewed.count())
    val cands = summary.filter(!col("is_total"))
      .select("word").distinct().collect().map(_.getString(0)).toSet
    val mustSurvive = skewed.toDF("word").groupBy("word").count()
      .filter(col("count") * (k + 1) > n)
      .collect().map(_.getString(0)).toSet
    assert(mustSurvive.nonEmpty) // the fixture actually exercises the bound
    assert(mustSurvive.subsetOf(cands),
      s"lost heavy items: ${mustSurvive.diff(cands)}")
  }

  test("frequentItems equals the direct aggregate and is partition-invariant") {
    val den = 6
    val n = skewed.count()
    val direct = skewed.toDF("word").groupBy("word")
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") * den > n)
      .select(col("word"), col("cnt"),
        round(col("cnt").cast("double") / n, 4).as("share"))
      .orderBy(col("cnt").desc, col("word"))
      .collect().toSeq
    assert(direct.nonEmpty)
    Seq(1, 13).foreach { parts =>
      val got = HeavyHitters.frequentItems(
        skewed.repartition(parts), k = 8, den = den).collect().toSeq
      assert(got === direct, s"mismatch at $parts partitions")
      Materialize.releaseAll()
    }
  }

  test("capacity below the threshold guarantee is rejected") {
    intercept[IllegalArgumentException] {
      HeavyHitters.frequentItems(skewed, k = 3, den = 6)
    }
  }
}
