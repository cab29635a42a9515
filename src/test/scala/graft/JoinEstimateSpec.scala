package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.JoinEstimate
import graft.sources.Tables

/** Join-size estimation vs executed joins: never-undershoot and the
  * overshoot ceiling, disjoint keys, skew quadratics, and
  * below-capacity exactness of the distinct-overlap estimate.
  */
class JoinEstimateSpec extends AnyFunSuite {
  import SparkTestBase._

  private val (depth, width) = (4, 2048)

  private def cmsEst(a: org.apache.spark.sql.DataFrame, ak: String,
      b: org.apache.spark.sql.DataFrame, bk: String): Long =
    JoinEstimate.joinCardinality(a, ak, b, bk, depth, width)
      .head().getLong(0)

  test("orders x customer: never undershoots, bounded overshoot") {
    val o = Tables.orders(spark, sf0001)
    val c = Tables.customer(spark, sf0001)
    val truth = o.join(c, col("o_custkey") === col("c_custkey")).count()
    val est = cmsEst(o, "o_custkey", c, "c_custkey")
    assert(est >= truth, s"CMS inner product undershot: $est < $truth")
    val ceiling = truth +
      (math.E / width * o.count() * c.count()).toLong + 1
    assert(est <= ceiling, s"overshoot beyond the e/w bound: $est")
  }

  test("lineitem x orders (fk fan-out): same guarantees at 6k x 1.5k") {
    val l = Tables.table(spark, sf0001, "lineitem")
    val o = Tables.orders(spark, sf0001)
    val truth = l.join(o, col("l_orderkey") === col("o_orderkey")).count()
    val est = cmsEst(l, "l_orderkey", o, "o_orderkey")
    assert(est >= truth)
    assert(est <= truth + (math.E / width * l.count() * o.count()).toLong + 1)
  }

  test("disjoint key ranges estimate (near) zero") {
    import spark.implicits._
    val a = (1L to 1000L).toDF("k")
    val b = (100001L to 101000L).toDF("k")
    val est = cmsEst(a, "k", b, "k")
    // only hash-collision cross terms remain; e/w bound applies to 0
    assert(est <= (math.E / width * 1000 * 1000).toLong + 1)
  }

  test("skewed keys count quadratically, as the real join would") {
    import spark.implicits._
    val hot = Seq.fill(500)(7L) ++ (1L to 100L)
    val a = hot.toDF("k")
    val truthSelf = a.as("x").join(a.as("y"), "k").count()
    val est = cmsEst(a, "k", a, "k")
    assert(est >= truthSelf && truthSelf >= 500L * 500L)
  }

  test("keyOverlap: exact below capacity, close above it") {
    import spark.implicits._
    // below capacity (k=256 > 150 distinct): exact
    val o = Tables.orders(spark, sf0001)
    val c = Tables.customer(spark, sf0001)
    val exactOverlap = o.select(col("o_custkey").as("k"))
      .intersect(c.select(col("c_custkey").as("k"))).count()
    val est = JoinEstimate.keyOverlap(o, "o_custkey", c, "c_custkey",
      k = 256).head().getDouble(0)
    assert(est === exactOverlap.toDouble)

    // above capacity: within 15% on a 4k/6k-key overlap
    val a = (1L to 6000L).toDF("k")
    val b = (2001L to 8000L).toDF("k")
    val est2 = JoinEstimate.keyOverlap(a, "k", b, "k", k = 256)
      .head().getDouble(0)
    assert(math.abs(est2 - 4000.0) / 4000.0 < 0.15, s"est2=$est2")
  }
}
