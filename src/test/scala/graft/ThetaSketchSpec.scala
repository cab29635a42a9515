package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.ThetaSketch

/** KMV/theta sketches: exact mergeability (array-for-array, the
  * pre-aggregation property), estimator accuracy at and below
  * capacity, intersection estimates, and partition invariance. All
  * checks are deterministic — xxhash64 is a fixed function, so the
  * tolerances are measured-then-margined, not probabilistic hopes.
  */
class ThetaSketchSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private val K = 256
  private lazy val a = spark.range(0, 60000).withColumn("g", lit(1)).toDF()
  private lazy val b = spark.range(40000, 100000).withColumn("g", lit(1)).toDF()

  test("sketch union of the parts IS the sketch of the whole (exact merge)") {
    val skA = ThetaSketch.sketch(a, Seq("g"), "id", K)
      .withColumnRenamed("kmv", "ka")
    val skB = ThetaSketch.sketch(b, Seq("g"), "id", K)
      .withColumnRenamed("kmv", "kb")
    val merged = skA.join(skB, "g")
      .select(ThetaSketch.union(col("ka"), col("kb"), K).as("kmv"))
      .head().getSeq[Long](0)
    val direct = ThetaSketch.sketch(a.unionAll(b), Seq("g"), "id", K)
      .head().getSeq[Long](1)
    assert(merged.toSeq === direct.toSeq && merged.size === K)
  }

  test("estimates: ~6% at capacity (k=256), exact below capacity") {
    val est = ThetaSketch.sketch(a, Seq("g"), "id", K)
      .select(ThetaSketch.estimate(col("kmv"), K)).head().getDouble(0)
    assert(math.abs(est - 60000.0) / 60000.0 <= 0.20)

    val small = spark.range(0, 100).withColumn("g", lit(1)).toDF()
    val exact = ThetaSketch.sketch(small, Seq("g"), "id", K)
      .select(ThetaSketch.estimate(col("kmv"), K)).head().getDouble(0)
    assert(exact === 100.0)
  }

  test("intersection estimate beats inclusion-exclusion's error regime") {
    val skA = ThetaSketch.sketch(a, Seq("g"), "id", K)
      .withColumnRenamed("kmv", "ka")
    val skB = ThetaSketch.sketch(b, Seq("g"), "id", K)
      .withColumnRenamed("kmv", "kb")
    val est = skA.join(skB, "g")
      .select(ThetaSketch.intersectionEstimate(col("ka"), col("kb"), K))
      .head().getDouble(0)
    assert(math.abs(est - 20000.0) / 20000.0 <= 0.35) // n_AB ~ 51, ~2.5 sigma

    // below capacity on both sides: intersection is EXACT
    val sa = spark.range(0, 120).withColumn("g", lit(1)).toDF()
    val sb = spark.range(80, 200).withColumn("g", lit(1)).toDF()
    val ska = ThetaSketch.sketch(sa, Seq("g"), "id", K).withColumnRenamed("kmv", "ka")
    val skb = ThetaSketch.sketch(sb, Seq("g"), "id", K).withColumnRenamed("kmv", "kb")
    val exact = ska.join(skb, "g")
      .select(ThetaSketch.intersectionEstimate(col("ka"), col("kb"), K))
      .head().getDouble(0)
    assert(exact === 40.0)
  }

  test("sketchBounded: bounded-shuffle partial fold equals the declarative sketch") {
    val grouped = spark.range(0, 30000)
      .select(col("id"), (col("id") % 3).cast("string").as("g")).toDF()
    val declarative = graft.operators.ThetaSketch
      .sketch(grouped, Seq("g"), "id", K)
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1).toList).toMap
    // partial per-partition folds (k longs per group per task) merged
    // as arrays must land on the IDENTICAL sketch, from any layout
    val bounded = graft.operators.ThetaSketch
      .sketchBounded(grouped.repartition(7), Seq("g"), "id", K)
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1).toList).toMap
    assert(bounded === declarative && declarative.values.forall(_.size === K))
  }

  test("sketches are partition-invariant and correct per group") {
    val grouped = spark.range(0, 30000)
      .select(col("id"), (col("id") % 3).as("g")).toDF()
    val base = ThetaSketch.sketch(grouped, Seq("g"), "id", K)
      .orderBy("g").collect().map(_.getSeq[Long](1))
    val repart = ThetaSketch.sketch(grouped.repartition(7), Seq("g"), "id", K)
      .orderBy("g").collect().map(_.getSeq[Long](1))
    assert(base.toSeq === repart.toSeq)
    val ests = ThetaSketch.sketch(grouped, Seq("g"), "id", K)
      .select(col("g"), ThetaSketch.estimate(col("kmv"), K).as("est"))
      .collect().map(_.getDouble(1))
    ests.foreach(e => assert(math.abs(e - 10000.0) / 10000.0 <= 0.25))
  }
}
