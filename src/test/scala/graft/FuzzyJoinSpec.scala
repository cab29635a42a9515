package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{FuzzyJoin, PlanAudit}

/** The deletion-neighborhood similarity join: exact equality with a
  * brute-force edit-distance join at d=1 and d=2 (typos, drops,
  * insertions, transposition-as-two-edits), no-false-negative blocking
  * by construction, and a cartesian-free plan.
  */
class FuzzyJoinSpec extends AnyFunSuite {
  import SparkTestBase._

  // a "registry" and a "feed" with planted misspellings
  private def names = {
    import spark.implicits._
    val registry = Seq("johnson", "smith", "garcia", "miller", "davis",
      "martinez", "lopez", "wilson", "anderson", "thomas")
      .toDF("name")
    val feed = Seq(
      "jonson",    // deletion of h: d=1 to johnson
      "smyth",     // substitution: d=1 to smith
      "garcias",   // insertion: d=1 to garcia
      "milier",    // substitution: d=1 to miller
      "davsi",     // transposition: d=2 to davis
      "martinez",  // exact
      "lpez",      // deletion: d=1 to lopez
      "wilsonn",   // insertion: d=1 to wilson
      "andersen",  // substitution: d=1 to anderson
      "xqzvbl"     // matches nothing
    ).toDF("name")
    (registry, feed)
  }

  private def bruteForce(d: Int): Set[(String, String, Int)] = {
    val (registry, feed) = names
    val rs = registry.collect().map(_.getString(0))
    val fs = feed.collect().map(_.getString(0))
    def lev(a: String, b: String): Int = {
      val dp = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0
      }
      for (i <- 1 to a.length; j <- 1 to b.length)
        dp(i)(j) = math.min(math.min(dp(i - 1)(j) + 1, dp(i)(j - 1) + 1),
          dp(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      dp(a.length)(b.length)
    }
    (for (f <- fs; r <- rs; dd = lev(f, r) if dd <= d)
      yield (f, r, dd)).toSet
  }

  private def viaJoin(d: Int): Set[(String, String, Int)] = {
    val (registry, feed) = names
    FuzzyJoin.fuzzyJoin(feed, "name", registry, "name", d)
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2)))
      .toSet
  }

  test("d=1 equals the brute-force edit-distance join") {
    val got = viaJoin(1)
    assert(got === bruteForce(1))
    // sanity on the planted cases
    val pairs = got.map(t => (t._1, t._2))
    assert(pairs.contains(("jonson", "johnson")))
    assert(pairs.contains(("smyth", "smith")))
    assert(pairs.contains(("martinez", "martinez")))
    assert(!pairs.exists(_._1 == "xqzvbl"))
    assert(!pairs.contains(("davsi", "davis"))) // transposition is d=2
  }

  test("d=2 equals brute force and picks up the transposition") {
    val got = viaJoin(2)
    assert(got === bruteForce(2))
    assert(got.map(t => (t._1, t._2)).contains(("davsi", "davis")))
  }

  test("the variant bucket join is cartesian-free and UDF-free") {
    val (registry, feed) = names
    val findings = PlanAudit
      .audit(FuzzyJoin.fuzzyJoin(feed, "name", registry, "name", 2))
      .map(_.rule).toSet
    assert(!findings.contains("cartesian-product"))
    assert(!findings.contains("scala-udf"))
  }

  test("fixture-scale self-linkage stays exact") {
    // mktsegment values with one planted typo column: every original
    // must link to itself (d=0 ≤ 1) and to its typo'd form
    val base = graft.sources.Tables.customer(spark, sf0001)
      .select(col("c_mktsegment").as("name")).distinct()
    val typod = base.select(concat(col("name"), lit("x")).as("name"))
    val got = FuzzyJoin.fuzzyJoin(typod, "name", base, "name", 1)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    val originals = base.collect().map(_.getString(0)).toSet
    assert(got === originals.map(o => (o + "x", o)))
  }
}
