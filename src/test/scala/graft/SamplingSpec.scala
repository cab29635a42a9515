package graft

import org.apache.spark.sql.execution.TakeOrderedAndProjectExec

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Sampling

/** Seed-keyed sampling invariants: exact Efraimidis–Spirakis inclusion
  * probabilities (k=1 ⇒ P = w/Σw, checked statistically over a seed
  * grid in ONE job), partitioning invariance (the property Spark's own
  * partition-index-seeded `rand()`/`sample` does NOT have), nested
  * Bernoulli samples, deterministic epoch permutations, and the
  * top-k / single-exchange plan shapes.
  */
class SamplingSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def weighted3 = Seq(("a", 1.0), ("b", 2.0), ("c", 7.0))
    .toDF("id", "w")

  test("k=1 inclusion probability is w/Σw (4000-seed grid, one job)") {
    val seeds = spark.range(4000).select(col("id").as("seed"))
    // u01 with a COLUMN seed (the module's u01 takes a literal seed; the
    // grid sweeps seeds per row) — same formula, per-seed draw.
    val wins = weighted3.crossJoin(broadcast(seeds))
      .withColumn("key",
        log((pmod(xxhash64(col("id"), col("seed")), lit(1L << 53))
          .cast("double") + 1.0) / lit((1L << 53).toDouble + 1.0)) /
          col("w"))
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("seed").orderBy(col("key").desc, col("id"))))
      .filter(col("rk") === 1)
      .groupBy("id").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = wins.values.sum.toDouble
    assert(total === 4000.0)
    assert(math.abs(wins("a") / total - 0.1) < 0.05, s"a: ${wins("a")}")
    assert(math.abs(wins("b") / total - 0.2) < 0.05, s"b: ${wins("b")}")
    assert(math.abs(wins("c") / total - 0.7) < 0.05, s"c: ${wins("c")}")
  }

  test("weightedSample: partitioning-invariant, weight gates, top-k plan") {
    val base = sources.Tables.documents(spark, SparkTestBase.sf0001)
      .select(col("doc_id"), (length(col("text")) + 1).cast("double").as("w"))
    val a = Sampling.weightedSample(base.repartition(3), "doc_id", "w", 25, 42L)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val b = Sampling.weightedSample(base.repartition(11), "doc_id", "w", 25, 42L)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a === b, "sample membership must not depend on partitioning")
    assert(a.size === 25)

    // zero/negative weights are never sampled even at k = all rows
    val gated = Sampling.weightedSample(
      Seq((1L, 0.0), (2L, -3.0), (3L, 1.0)).toDF("doc_id", "w"),
      "doc_id", "w", 10, 7L).select("doc_id").as[Long].collect().toSet
    assert(gated === Set(3L))

    val plan = Sampling.weightedSample(base, "doc_id", "w", 25, 42L)
      .queryExecution.executedPlan
    assert(plan.collectFirst { case t: TakeOrderedAndProjectExec => t }.nonEmpty,
      s"weighted sample must plan as partial top-k, not a global sort:\n$plan")
  }

  test("hashSample: reproducible, partitioning-invariant, nested, sized") {
    val base = sources.Tables.documents(spark, SparkTestBase.sf0001)
      .select("doc_id")
    def ids(frac: Double, parts: Int): Set[Long] =
      Sampling.hashSample(base.repartition(parts), "doc_id", frac, 9L)
        .as[Long].collect().toSet
    val s20 = ids(0.2, 4)
    assert(s20 === ids(0.2, 13), "membership must not depend on partitioning")
    assert(s20.subsetOf(ids(0.5, 4)), "samples at growing fractions nest")
    // 500 docs at 0.2: binomial mean 100, ±5σ ≈ ±45
    assert(s20.size > 55 && s20.size < 145, s"got ${s20.size}")
  }

  test("epochShuffle: deterministic per epoch, permutes across epochs") {
    val base = sources.Tables.documents(spark, SparkTestBase.sf0001)
      .select("doc_id")
    def order(epoch: Long, parts: Int): Seq[Long] =
      Sampling.epochShuffle(base.repartition(parts), "doc_id", epoch, 4)
        .as[Long].collect().toSeq
    val e1 = order(1L, 3)
    assert(e1 === order(1L, 8), "epoch order must be partitioning-invariant")
    val e2 = order(2L, 3)
    assert(e1 !== e2, "different epochs must permute differently")
    assert(e1.sorted === e2.sorted, "a shuffle is a permutation: same rows")

    // exactly one exchange: the range partition on the shuffle key
    // (string-count over the explain — the AQE wrapper hides Exchange
    // nodes from executedPlan.collect before materialization)
    val explained = Sampling.epochShuffle(base, "doc_id", 1L, 4)
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("simple"))
    assert("Exchange ".r.findAllIn(explained).size === 1,
      s"epoch shuffle is ONE range exchange:\n$explained")
  }
}
