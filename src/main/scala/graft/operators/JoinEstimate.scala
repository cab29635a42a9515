package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Join-size estimation from mergeable sketches — answering "how big
  * would A ⋈ B be?" WITHOUT running the join, the planning question
  * every 100 TB pipeline asks before committing a shuffle (pick
  * broadcast vs sort-merge, provision shuffle partitions, veto a
  * runaway fact×fact join in CI).
  *
  * Two estimators over sketches this engine already ships:
  *
  *  - [[joinCardinality]] — the Cormode–Muthukrishnan Count-Min inner
  *    product: |A ⋈ B| = Σ_k f_A(k)·f_B(k), estimated per depth row as
  *    Σ_buckets cntA·cntB and taken as the MIN across depths. Hash
  *    collisions only ever ADD cross terms, so the estimate NEVER
  *    undershoots, and overshoots by ≤ (e/width)·|A|·|B| with high
  *    probability — one bounded (depth·width)-row join of two counter
  *    tables, each buildable once per table and mergeable across
  *    partitions/days like any CMS.
  *  - [[keyOverlap]] — how many DISTINCT keys the two sides share
  *    (referential-integrity coverage, anti-join sizing): the theta
  *    intersection estimate over two KMV sketches, exact whenever both
  *    sides stayed below sketch capacity.
  *
  * Both sketches are built with the SAME seeded hash family by
  * construction (the shared CMS/Theta builders), so build and probe
  * can never disagree. JoinEstimateSpec pins the never-undershoot
  * bound against executed joins, the documented overshoot ceiling, a
  * disjoint-key case, below-capacity exactness, and skew behavior
  * (the inner product sees hot keys quadratically, exactly as the real
  * join would).
  */
object JoinEstimate {

  /** Estimated |a ⋈ b| on `aKey = bKey` as one (est, depth_used) row.
    * Cost: two CMS builds (one pass each, mergeable/reusable) + a
    * depth·width-bounded counter join. Never an underestimate.
    */
  def joinCardinality(a: DataFrame, aKey: String, b: DataFrame,
      bKey: String, depth: Int = 4, width: Int = 2048): DataFrame = {
    val skA = CountMinSketch.sketch(
      a.select(col(aKey).as("__k")), Nil, "__k", depth, width)
      .withColumnRenamed("cnt", "__ca")
    val skB = CountMinSketch.sketch(
      b.select(col(bKey).as("__k")), Nil, "__k", depth, width)
      .withColumnRenamed("cnt", "__cb")
    // inner join: a bucket absent on either side contributes 0
    skA.join(skB, Seq("depth", "bucket"))
      .groupBy("depth")
      .agg(sum(col("__ca") * col("__cb")).as("__ip"))
      .agg(min("__ip").as("est"))
  }

  /** Estimated number of DISTINCT join keys present on BOTH sides, as
    * one (est,) row; exact when both sides' distinct counts are ≤ k.
    */
  def keyOverlap(a: DataFrame, aKey: String, b: DataFrame,
      bKey: String, k: Int = 256): DataFrame = {
    val skA = ThetaSketch.sketch(
      a.select(lit(1).as("__g"), col(aKey).as("__k")), Seq("__g"), "__k", k)
      .withColumnRenamed("kmv", "__ka")
    val skB = ThetaSketch.sketch(
      b.select(lit(1).as("__g"), col(bKey).as("__k")), Seq("__g"), "__k", k)
      .withColumnRenamed("kmv", "__kb")
    skA.join(skB, Seq("__g"))
      .select(ThetaSketch.intersectionEstimate(
        col("__ka"), col("__kb"), k).as("est"))
  }
}
