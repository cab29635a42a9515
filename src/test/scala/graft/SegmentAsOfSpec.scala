package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{IncrementalIndex, IncrementalIvf, IncrementalLsh,
  InvertedIndex, IvfIndex}

/** TIME TRAVEL over the segment-log indexes: the view as of batch B is
  * each key's newest version ≤ B — reproducible history for ranking
  * regressions and replayed consumers, bounded by compaction exactly
  * like the landing zone's as-of read is bounded by vacuum retention.
  */
class SegmentAsOfSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  test("inverted-index as-of equals a rebuild of each historical corpus") {
    import spark.implicits._
    val root = java.nio.file.Files
      .createTempDirectory("graft-asof-idx").toString
    val states = Seq(
      Map(1L -> "the quick fox", 2L -> "lazy dog"),
      Map(1L -> "the quick fox", 2L -> "sly cat", 3L -> "dog park"),
      Map(1L -> "the quick fox", 3L -> "dog park"))
    IncrementalIndex.applyBatch(spark, root,
      Seq((1L, "the quick fox", "I"), (2L, "lazy dog", "I"))
        .toDF("doc_id", "text", "op"), 0L)
    IncrementalIndex.applyBatch(spark, root,
      Seq((2L, "sly cat", "U"), (3L, "dog park", "I"))
        .toDF("doc_id", "text", "op"), 1L)
    IncrementalIndex.applyBatch(spark, root,
      Seq((2L, "", "D")).toDF("doc_id", "text", "op"), 2L)

    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toString).sorted.toSeq
    states.zipWithIndex.foreach { case (corpus, b) =>
      assert(rows(IncrementalIndex.currentPostingsAsOf(spark, root, b)) ===
        rows(InvertedIndex.build(corpus.toSeq.toDF("doc_id", "text"),
          "doc_id", "text")), s"as-of batch $b")
    }
    assert(rows(IncrementalIndex.currentPostingsAsOf(spark, root, 2L)) ===
      rows(IncrementalIndex.currentPostings(spark, root)),
      "as-of head == the live read")

    // compaction bounds the travel: views BELOW the horizon are folded
    // history and fail loudly; the view AT the horizon is exactly the
    // folded tree, and views above still resolve
    IncrementalIndex.compact(spark, root, upTo = 1L)
    val e = intercept[IllegalArgumentException] {
      IncrementalIndex.currentPostingsAsOf(spark, root, 0L).collect()
    }
    assert(e.getMessage.contains("folded away"))
    assert(rows(IncrementalIndex.currentPostingsAsOf(spark, root, 1L)) ===
      rows(InvertedIndex.build(states(1).toSeq.toDF("doc_id", "text"),
        "doc_id", "text")),
      "the at-horizon view is the folded tree itself")
    assert(rows(IncrementalIndex.currentPostingsAsOf(spark, root, 2L)) ===
      rows(InvertedIndex.build(states(2).toSeq.toDF("doc_id", "text"),
        "doc_id", "text")))

    // the fold keeps a key's AT-HORIZON version even when a fresh
    // batch later superseded it (ranking the global newest first and
    // then filtering by the horizon would silently drop it and destroy
    // the as-of view between horizon and supersession — the round-16
    // review catch): doc 3 updates at batch 3, the log folds to 2, and
    // the as-of-2 view must still show doc 3's old text
    IncrementalIndex.applyBatch(spark, root,
      Seq((3L, "dog kennel", "U")).toDF("doc_id", "text", "op"), 3L)
    IncrementalIndex.compact(spark, root, upTo = 2L)
    assert(rows(IncrementalIndex.currentPostingsAsOf(spark, root, 2L)) ===
      rows(InvertedIndex.build(states(2).toSeq.toDF("doc_id", "text"),
        "doc_id", "text")),
      "the at-horizon version of a later-superseded key must survive the fold")
    assert(rows(IncrementalIndex.currentPostings(spark, root)) ===
      rows(InvertedIndex.build(
        (states(2) + (3L -> "dog kennel")).toSeq.toDF("doc_id", "text"),
        "doc_id", "text")),
      "and the live view serves the superseding version")
  }

  test("IVF searchAsOf reproduces each historical member set") {
    import spark.implicits._
    val root = java.nio.file.Files
      .createTempDirectory("graft-asof-ivf").toString + "/ivf"
    def vec(i: Long): Seq[Double] = {
      val axis = (i % 3).toInt
      val v = Array.fill(4)(0.0)
      v(axis) = 1.0; v((axis + 1) % 4) = 0.01 * (i % 7)
      v.toSeq
    }
    val s0 = (1L to 20L).map(i => i -> vec(i)).toMap
    IncrementalIvf.initialize(spark,
      s0.toSeq.toDF("vec_id", "e"), root, k = 3, iters = 2)
    val s1 = s0 ++ Map(21L -> vec(21L), 5L -> vec(6L)) - 9L
    IncrementalIvf.applyBatch(spark, root,
      Seq((21L, vec(21L), "I"), (5L, vec(6L), "U"),
        (9L, Seq.empty[Double], "D")).toDF("vec_id", "e", "op"), 1L)

    def expected(live: Map[Long, Seq[Double]], probe: Seq[Double]) = {
      val cent = spark.read.parquet(s"$root/centroids")
      val p = array(probe.map(lit): _*)
      val cells = cent.withColumn("__p", p)
        .withColumn("cs", expr("cosine_sim(c, __p)"))
        .orderBy(col("cs").desc, col("cell"))
        .limit(2).select("cell").collect().map(_.getInt(0)).toSeq
      IvfIndex.assignTo(live.toSeq.toDF("vec_id", "e"), cent)
        .filter(col("cell").isin(cells: _*))
        .withColumn("__p", p)
        .withColumn("sim", round(expr("cosine_sim(e, __p)"), 4))
        .orderBy(col("sim").desc, col("vec_id")).limit(5)
        .select("vec_id", "sim")
        .collect().map(_.toString).toSeq
    }
    def got(asOf: Long, probe: Seq[Double]) = IncrementalIvf
      .searchAsOf(spark, root, probe, 5, 2, asOf)
      .collect().map(_.toString).toSeq
    Seq(5L, 9L, 21L).foreach { pid =>
      assert(got(0L, vec(pid)) === expected(s0, vec(pid)),
        s"as-of 0, probe $pid")
      assert(got(1L, vec(pid)) === expected(s1, vec(pid)),
        s"as-of 1, probe $pid")
    }
  }

  test("coded IVF searchAdcAsOf reproduces the pre-batch code set") {
    import spark.implicits._
    val root = java.nio.file.Files
      .createTempDirectory("graft-asof-adc").toString + "/ivf"
    def vec(i: Long): Seq[Double] = {
      val axis = (i % 3).toInt
      val v = Array.fill(4)(0.0)
      v(axis) = 1.0; v((axis + 1) % 4) = 0.01 * (i % 7)
      v.toSeq
    }
    IncrementalIvf.initializeCoded(spark,
      (1L to 20L).map(i => (i, vec(i))).toDF("vec_id", "e"),
      root, k = 3, iters = 2, m = 2, ksub = 4, pqIters = 2)
    // snapshot the LIVE answers before batch 1 — the as-of oracle
    // (frozen centroids + codebook make the comparison exact)
    val probes = Seq(5L, 9L, 21L).map(vec)
    val before = probes.map(p =>
      IncrementalIvf.searchAdc(spark, root, p, 5, 2)
        .collect().map(_.toString).toSeq)
    IncrementalIvf.applyBatchCoded(spark, root,
      Seq((21L, vec(21L), "I"), (5L, vec(6L), "U"),
        (9L, Seq.empty[Double], "D")).toDF("vec_id", "e", "op"), 1L)
    probes.zip(before).foreach { case (p, want) =>
      assert(IncrementalIvf.searchAdcAsOf(spark, root, p, 5, 2, 0L)
        .collect().map(_.toString).toSeq === want,
        "as-of 0 must answer exactly what the live search answered " +
          "before batch 1")
    }
    // and the live view really moved (the deleted vector is gone)
    val liveNow = IncrementalIvf.searchAdc(spark, root, vec(9L), 20, 3)
      .collect().map(_.getLong(0)).toSet
    assert(!liveNow.contains(9L))
  }

  test("LSH candidatesAsOf sees the pre-takedown corpus") {
    import spark.implicits._
    val root = java.nio.file.Files
      .createTempDirectory("graft-asof-lsh").toString + "/lsh"
    val text = "alpha beta gamma delta epsilon zeta eta theta"
    IncrementalLsh.applyBatch(spark, root,
      Seq((1L, text, "I"), (2L, "totally different words here", "I"))
        .toDF("doc_id", "text", "op"), 0L)
    IncrementalLsh.applyBatch(spark, root,
      Seq((1L, "", "D")).toDF("doc_id", "text", "op"), 1L)

    val probes = Seq((99L, text)).toDF("doc_id", "text")
    val now = IncrementalLsh.candidates(spark, root, probes)
      .collect().map(_.getLong(1)).toSet
    assert(!now.contains(1L), "the takedown is gone from the live view")
    val before = IncrementalLsh.candidatesAsOf(spark, root, probes, 0L)
      .collect().map(_.getLong(1)).toSet
    assert(before.contains(1L),
      "the as-of view must still surface the later-deleted doc")
    // liveDocIds reflects the live view (the rebuild's corpus join key)
    assert(IncrementalLsh.liveDocIds(spark, root)
      .collect().map(_.getLong(0)).toSet === Set(2L))
  }
}
