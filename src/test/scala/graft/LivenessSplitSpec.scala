package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
import org.apache.spark.sql.execution.window.WindowExec
import org.apache.spark.sql.catalyst.plans.LeftAnti
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{IncrementalIndex, IncrementalIvf, IncrementalLsh}

/** PLAN-SHAPE pins for the liveness split: a post-compaction index
  * lookup must resolve liveness with shuffle volume independent of the
  * folded-corpus size. Concretely, on a compacted root:
  *
  *  - NO rank-1 window may scan the folded `_compact` tree (the folded
  *    corpus never enters a Window exchange — only the ≤ compactEvery
  *    fresh changelog segments do);
  *  - the folded member side joins the fresh-key set via a BROADCAST
  *    anti hash join (never a shuffled join keyed on the live corpus);
  *  - with every segment folded (no fresh batches), the lookup plan
  *    carries no Window at all — it is a pure pruned scan.
  *
  * These are the physical-plan encodings of round-15's "weak" scale
  * finding; the value-level equivalences live in the per-index specs.
  */
class LivenessSplitSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private def windows(df: DataFrame) =
    df.queryExecution.sparkPlan.collect { case w: WindowExec => w }

  private def windowScansFolded(df: DataFrame): Boolean =
    windows(df).exists(w => w.collect { case f: FileSourceScanExec => f }
      .exists(_.relation.location.rootPaths
        .exists(_.toString.contains("_compact"))))

  private def hasBroadcastAnti(df: DataFrame): Boolean =
    df.queryExecution.sparkPlan.collect {
      case j: BroadcastHashJoinExec if j.joinType == LeftAnti => j
    }.nonEmpty

  test("IVF search liveness never windows the folded corpus") {
    import spark.implicits._
    val root = java.nio.file.Files
      .createTempDirectory("graft-split-ivf").toString + "/ivf"
    def vec(i: Long): Seq[Double] =
      Seq(math.cos(i * 0.7), math.sin(i * 0.7), (i % 5).toDouble / 5.0)
    IncrementalIvf.initialize(spark,
      (1L to 40L).map(i => (i, vec(i))).toDF("vec_id", "e"),
      root, k = 3, iters = 2)
    IncrementalIvf.applyBatch(spark, root,
      (41L to 50L).map(i => (i, vec(i), "I")).toDF("vec_id", "e", "op"),
      1L)
    IncrementalIvf.compact(spark, root, 1L)
    // fresh batch on top of the folded base: the mixed-view lookup
    IncrementalIvf.applyBatch(spark, root,
      Seq((51L, vec(51L), "I"), (3L, Seq.empty[Double], "D"))
        .toDF("vec_id", "e", "op"), 2L)

    val mixed = IncrementalIvf.liveMembers(spark, root, Some(Seq(0, 1)))
    assert(!windowScansFolded(mixed),
      "the folded member/changelog tree must never feed a rank window")
    assert(hasBroadcastAnti(mixed),
      "folded members must anti-join the fresh-key set via broadcast")
    assert(windows(mixed).nonEmpty,
      "the fresh changelog still resolves through its own rank window")

    // fully folded: the lookup is a pure pruned scan — no window, no
    // per-query changelog resolution at all
    IncrementalIvf.compact(spark, root, 2L)
    val folded = IncrementalIvf.liveMembers(spark, root, Some(Seq(0, 1)))
    assert(windows(folded).isEmpty,
      "a fully-compacted lookup must carry no window operator")
    // and the answers are the ones the value specs pin
    assert(IncrementalIvf.search(spark, root, vec(7L), topK = 3,
      nprobe = 3).count() === 3L)
  }

  test("LSH candidate liveness never windows the folded corpus") {
    import spark.implicits._
    val root = java.nio.file.Files
      .createTempDirectory("graft-split-lsh").toString + "/lsh"
    val mk = (i: Long) => (i, s"tok$i alpha beta gamma delta tok${i % 7}")
    IncrementalLsh.applyBatch(spark, root,
      (1L to 30L).map(mk).toDF("doc_id", "text").withColumn("op", lit("I")),
      0L)
    IncrementalLsh.compact(spark, root, 0L)
    IncrementalLsh.applyBatch(spark, root,
      (31L to 35L).map(mk).toDF("doc_id", "text").withColumn("op", lit("I")),
      1L)

    val probes = (101L to 103L).map(mk).toDF("doc_id", "text")
    val mixed = IncrementalLsh.candidates(spark, root, probes)
    assert(!windowScansFolded(mixed) && hasBroadcastAnti(mixed))

    IncrementalLsh.compact(spark, root, 1L)
    val folded = IncrementalLsh.candidates(spark, root, probes)
    assert(windows(folded).isEmpty,
      "a fully-compacted candidate lookup must carry no window")
    Materialize.releaseAll()
  }

  test("inverted-index postings liveness never windows the folded corpus") {
    import spark.implicits._
    val root = java.nio.file.Files
      .createTempDirectory("graft-split-idx").toString
    IncrementalIndex.applyBatch(spark, root,
      (1L to 20L).map(i => (i, s"w$i common words here", "I"))
        .toDF("doc_id", "text", "op"), 0L)
    IncrementalIndex.compact(spark, root, 0L)
    IncrementalIndex.applyBatch(spark, root,
      Seq((21L, "common fresh doc", "I"), (5L, "", "D"))
        .toDF("doc_id", "text", "op"), 1L)

    val mixed = IncrementalIndex.currentPostings(spark, root)
    assert(!windowScansFolded(mixed) && hasBroadcastAnti(mixed))

    IncrementalIndex.compact(spark, root, 1L)
    val folded = IncrementalIndex.currentPostings(spark, root)
    assert(windows(folded).isEmpty,
      "a fully-compacted postings read must carry no window")
  }
}
