package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{IncrementalIvf, IvfIndex}

/** Incremental IVF under a FIXED quantizer is exact, so the contract
  * is equality, not recall: search over the maintained index must
  * equal the same search over a from-scratch assignment of the live
  * vectors to the same centroids — through adds, a cell-moving
  * update, and a delete.
  */
class IncrementalIvfSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private val dim = 4
  /** Deterministic synthetic vector near axis (id % 3). */
  private def vec(id: Long): Seq[Double] = {
    val axis = (id % 3).toInt
    val v = Array.fill(dim)(0.0)
    v(axis) = 1.0
    v((axis + 1) % dim) = 0.01 * (id % 7)
    v.toSeq
  }

  private def df(rows: Seq[(Long, Seq[Double], String)]): DataFrame = {
    import spark.implicits._
    rows.toDF("vec_id", "e", "op")
  }

  /** The from-scratch twin: assign the live vectors to the SAME fixed
    * centroids, prune to the same probed cells, score identically.
    */
  private def expected(root: String, live: Map[Long, Seq[Double]],
      probe: Seq[Double], topK: Int, nprobe: Int): Seq[(Long, Double)] = {
    import spark.implicits._
    val cent = spark.read.parquet(s"$root/centroids")
    val p = array(probe.map(lit): _*)
    val cells = cent.withColumn("__p", p)
      .withColumn("cell_sim", expr("cosine_sim(c, __p)"))
      .orderBy(col("cell_sim").desc, col("cell"))
      .limit(nprobe).select("cell").collect().map(_.getInt(0)).toSeq
    IvfIndex.assignTo(live.toSeq.toDF("vec_id", "e"), cent)
      .filter(col("cell").isin(cells: _*))
      .withColumn("__p", p)
      .withColumn("sim", round(expr("cosine_sim(e, __p)"), 4))
      .orderBy(col("sim").desc, col("vec_id"))
      .limit(topK)
      .select("vec_id", "sim").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
  }

  test("incremental IVF equals the fixed-quantizer from-scratch twin") {
    val root = java.nio.file.Files
      .createTempDirectory("graft-incivf").toString + "/ivf"
    import spark.implicits._

    var live: Map[Long, Seq[Double]] =
      (1L to 30L).map(i => i -> vec(i)).toMap
    IncrementalIvf.initialize(spark,
      live.toSeq.toDF("vec_id", "e"), root, k = 3, iters = 2)

    val probes = Seq(vec(1L), vec(2L), vec(3L))
    def check(): Unit = probes.foreach { pr =>
      Seq(1, 3).foreach { nprobe =>
        val got = IncrementalIvf.search(spark, root, pr, 8, nprobe)
          .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
        assert(got === expected(root, live, pr, 8, nprobe),
          s"probe $pr nprobe=$nprobe")
      }
      // nprobe = all cells ⇒ the exact brute-force top-k of the corpus
      val all = IncrementalIvf.search(spark, root, pr, live.size, 3)
        .collect().map(_.getLong(0)).toSet
      assert(all === live.keySet, "all-cells probe must see every live vector")
    }
    check()

    // batch 1: pure adds
    val b1 = (31L to 40L).map(i => (i, vec(i), "I"))
    IncrementalIvf.applyBatch(spark, root, df(b1), 1L)
    live ++= b1.map(r => r._1 -> r._2)
    check()

    // batch 2: an update that MOVES a vector to a different cell, and
    // a delete
    val moved = vec(6L) // id 5 jumps from its axis-2 cluster to axis-0's
    IncrementalIvf.applyBatch(spark, root,
      df(Seq((5L, moved, "U"), (7L, Seq.empty[Double], "D"))), 2L)
    live = live - 7L + (5L -> moved)
    check()

    // the move is visible in the live assignment, the delete is gone
    val members = IncrementalIvf.liveMembers(spark, root)
      .select("vec_id", "cell").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(members.size === live.size)
    assert(!members.contains(7L))
    val cent = spark.read.parquet(s"$root/centroids")
    val expectCell = IvfIndex.assignTo(
        Seq((5L, moved)).toDF("vec_id", "e"), cent)
      .select("cell").head.getInt(0)
    assert(members(5L) === expectCell)

    // segment layout is cell-partitioned (the probe-pruning surface)
    val seg = new java.io.File(s"$root/members/seq=1")
    assert(seg.isDirectory &&
      seg.listFiles().exists(_.getName.startsWith("cell=")))
  }

  test("compaction preserves answers, vacuums the log, guards the horizon") {
    val root = java.nio.file.Files
      .createTempDirectory("graft-incivf-c").toString + "/ivf"
    import spark.implicits._

    var live: Map[Long, Seq[Double]] =
      (1L to 30L).map(i => i -> vec(i)).toMap
    IncrementalIvf.initialize(spark,
      live.toSeq.toDF("vec_id", "e"), root, k = 3, iters = 2)
    IncrementalIvf.applyBatch(spark, root,
      df((31L to 40L).map(i => (i, vec(i), "I"))), 1L)
    live ++= (31L to 40L).map(i => i -> vec(i))
    val moved = vec(6L)
    IncrementalIvf.applyBatch(spark, root,
      df(Seq((5L, moved, "U"), (7L, Seq.empty[Double], "D"))), 2L)
    live = live - 7L + (5L -> moved)

    def check(): Unit = Seq(vec(1L), vec(2L), vec(3L)).foreach { pr =>
      Seq(1, 3).foreach { nprobe =>
        val got = IncrementalIvf.search(spark, root, pr, 8, nprobe)
          .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
        assert(got === expected(root, live, pr, 8, nprobe),
          s"probe $pr nprobe=$nprobe")
      }
    }

    // fold batches 0..1; batch 2's move/delete stays a fresh segment
    // that must still override the folded rows for ids 5 and 7
    IncrementalIvf.compact(spark, root, 1L)
    check()
    def segs(sub: String): Set[String] = {
      val d = new java.io.File(s"$root/$sub")
      if (!d.isDirectory) Set.empty
      else d.listFiles().map(_.getName).filter(_.startsWith("seq=")).toSet
    }
    assert(segs("members") === Set("seq=2"), "folded member segments vacuumed")
    assert(segs("vecs") === Set("seq=2"), "folded changelog segments vacuumed")
    // the folded tree keeps the cell= partition dirs (probe pruning)
    val folded = new java.io.File(s"$root/_compact/1/members")
    assert(folded.isDirectory &&
      folded.listFiles().exists(_.getName.startsWith("cell=")))

    // batches land on top of the compacted base
    IncrementalIvf.applyBatch(spark, root,
      df(Seq((41L, vec(41L), "I"), (5L, Seq.empty[Double], "D"))), 3L)
    live = live - 5L + (41L -> vec(41L))
    check()

    // a second compaction folds fresh segments into a new tree and
    // drops the old one; re-running it is a no-op
    IncrementalIvf.compact(spark, root, 3L)
    check()
    assert(!new java.io.File(s"$root/_compact/1").exists(),
      "superseded compact tree deleted")
    assert(segs("members").isEmpty && segs("vecs").isEmpty)
    IncrementalIvf.compact(spark, root, 3L)
    check()

    // a delete-only batch on the compacted base writes no member
    // segment (a zero-row partitionBy leaves an unreadable husk) and
    // still tombstones the folded row
    IncrementalIvf.applyBatch(spark, root,
      df(Seq((41L, Seq.empty[Double], "D"))), 4L)
    live -= 41L
    check()
    assert(!new java.io.File(s"$root/members/seq=4").exists,
      "a delete-only batch must not leave a member husk")

    // a batch id at/below the horizon is a PROVABLY committed
    // redelivery (compaction refuses torn folds, ids are monotone):
    // the apply absorbs it as a no-op — state untouched, no segment
    // written; backwards compaction stays rejected loudly
    IncrementalIvf.applyBatch(spark, root,
      df(Seq((99L, vec(99L), "I"))), 3L)
    check()
    assert(!new java.io.File(s"$root/vecs/seq=3").exists,
      "a below-horizon redelivery must not write a segment")
    intercept[IllegalArgumentException] {
      IncrementalIvf.compact(spark, root, 1L)
    }
  }

  test("quantizationReport flags a drifted arrival distribution") {
    val root = java.nio.file.Files
      .createTempDirectory("graft-incivf-d").toString + "/ivf"
    import spark.implicits._

    IncrementalIvf.initialize(spark,
      (1L to 30L).map(i => (i, vec(i))).toDF("vec_id", "e"),
      root, k = 3, iters = 2)
    def overallSim(): Double = IncrementalIvf
      .quantizationReport(spark, root)
      .filter(col("cell") === -1).select("mean_sim").head.getDouble(0)
    val atTrain = overallSim()
    assert(atTrain > 0.99, s"in-distribution fit should be tight: $atTrain")

    // in-distribution adds keep the fit tight — no false retrain
    // signal; compactEvery=1 folds the log inline (2 fresh segments
    // exceed the bound; the fold stops at batchId − 1)
    IncrementalIvf.applyBatch(spark, root,
      df((31L to 40L).map(i => (i, vec(i), "I"))), 1L, compactEvery = 1)
    assert(new java.io.File(s"$root/_compacted").exists,
      "the 2nd fresh segment triggers the fold")
    assert(overallSim() > 0.99)

    // the self-contained signal: in-distribution state stays quiet
    val (fire0, base0, cur0) = IncrementalIvf.retrainSignal(spark, root)
    assert(!fire0 && base0 > 0.99 && cur0 > 0.99)

    // arrivals from an axis the quantizer never saw degrade the mean
    // assignment similarity — the retrain trigger
    val ood = (41L to 50L).map { i =>
      val v = Array.fill(dim)(0.0); v(3) = 1.0; (i, v.toSeq, "I")
    }
    IncrementalIvf.applyBatch(spark, root, df(ood), 2L)
    val drifted = overallSim()
    assert(drifted < atTrain - 0.05,
      s"OOD arrivals must degrade the monitor: $atTrain -> $drifted")
    // per-cell rows cover every live cell alongside the overall row
    val cells = IncrementalIvf.quantizationReport(spark, root)
      .select("cell").collect().map(_.getInt(0)).toSet
    assert(cells.contains(-1) && (cells - (-1)).nonEmpty)
    // ...and the signal fires against the recorded training baseline
    val (fire1, base1, cur1) = IncrementalIvf.retrainSignal(spark, root)
    assert(fire1 && base1 - cur1 > 0.05)
  }

  test("coded members (incremental IVFADC) equal the from-scratch coded twin") {
    import graft.operators.ProductQuantizer
    val root = java.nio.file.Files
      .createTempDirectory("graft-incivf-pq").toString + "/ivf"
    import spark.implicits._
    val m = 2

    IncrementalIvf.initializeCoded(spark,
      (1L to 30L).map(i => (i, vec(i))).toDF("vec_id", "e"),
      root, k = 3, iters = 2, m = m, ksub = 4, pqIters = 2)
    var live: Map[Long, Seq[Double]] =
      (1L to 30L).map(i => i -> vec(i)).toMap

    // the frozen tables the oracle shares with the index
    lazy val centroids = spark.read.parquet(s"$root/centroids")
    lazy val codebook = spark.read.parquet(s"$root/pq_codebook")

    def expectedAdc(probe: Seq[Double], topK: Int,
        nprobe: Int): Seq[(Long, Double)] = {
      val p = array(probe.map(lit): _*)
      val cells = centroids.withColumn("__p", p)
        .withColumn("cs", expr("cosine_sim(c, __p)"))
        .orderBy(col("cs").desc, col("cell"))
        .limit(nprobe).select("cell").collect().map(_.getInt(0)).toSeq
      val liveDF = live.toSeq.toDF("vec_id", "e")
      val cand = IvfIndex.assignTo(liveDF, centroids)
        .filter(col("cell").isin(cells: _*)).select("vec_id")
      ProductQuantizer.adcScoreCodes(
          ProductQuantizer.encode(liveDF, codebook, m)
            .join(cand, Seq("vec_id")),
          ProductQuantizer.adcLut(codebook, probe, m))
        .select(col("vec_id"), round(col("approx_sim"), 4).as("s"))
        .orderBy(col("s").desc, col("vec_id")).limit(topK)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    }
    def gotAdc(probe: Seq[Double], topK: Int,
        nprobe: Int): Seq[(Long, Double)] =
      IncrementalIvf.searchAdc(spark, root, probe, topK, nprobe)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq

    assert(gotAdc(vec(5L), 5, 2) === expectedAdc(vec(5L), 5, 2))

    // batch 1: adds, an update that MOVES a vector's cell, a delete
    val b1 = Seq((31L, vec(31L), "I"), (32L, vec(32L), "I"),
      (7L, vec(8L), "U"), (9L, Seq.empty[Double], "D"))
    IncrementalIvf.applyBatchCoded(spark, root, df(b1), 1L)
    live = live ++ Map(31L -> vec(31L), 32L -> vec(32L), 7L -> vec(8L)) - 9L
    Seq(1L, 2L, 8L).foreach { pid =>
      assert(gotAdc(vec(pid), 6, 2) === expectedAdc(vec(pid), 6, 2),
        s"ADC equality after mutation batch, probe $pid")
    }

    // the production shape: ADC shortlist + exact rerank against an
    // EXTERNAL vector store — with all cells probed and a pool wider
    // than the live set this must equal brute-force exact cosine
    val store = live.toSeq.toDF("vec_id", "e")
    val probe = vec(2L)
    val p = array(probe.map(lit): _*)
    val exact = store.withColumn("__p", p)
      .select(col("vec_id"), round(expr("cosine_sim(e, __p)"), 4).as("sim"))
      .orderBy(col("sim").desc, col("vec_id")).limit(5)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val reranked = IncrementalIvf.searchAdcRerank(spark, root, probe,
        store, 5, nprobe = 3, pool = 100)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(reranked === exact,
      "all-cells + wide-pool rerank must recover exact search")

    // compaction folds coded members without changing any answer, and
    // later coded batches land on the compacted base
    val before = gotAdc(vec(1L), 8, 3)
    IncrementalIvf.compact(spark, root, upTo = 1L)
    assert(gotAdc(vec(1L), 8, 3) === before)
    IncrementalIvf.applyBatchCoded(spark, root,
      df(Seq((40L, vec(40L), "I"))), 2L)
    live += 40L -> vec(40L)
    assert(gotAdc(vec(40L), 6, 2) === expectedAdc(vec(40L), 6, 2))
  }

  test("coded retrain cutover rebuilds codes from the external store") {
    val parent = java.nio.file.Files
      .createTempDirectory("graft-incivf-ccut").toString + "/cann"
    import spark.implicits._
    val m = 2

    IncrementalIvf.initializeCodedAliased(spark,
      (1L to 30L).map(i => (i, vec(i))).toDF("vec_id", "e"),
      parent, k = 3, iters = 2, m = m, ksub = 4, pqIters = 2)
    val oodVec: Long => Seq[Double] = { i =>
      val v = Array.fill(dim)(0.0); v(3) = 1.0; v(2) = 0.01 * (i % 5)
      v.toSeq
    }
    // the coded drift signal: the write-time fit log of the training
    // batch matches its own baseline — quiet before any drift
    val g0 = IncrementalIvf.activeRoot(spark, parent)
    val (fire0, base0, cur0) = IncrementalIvf.retrainSignalCoded(spark, g0)
    assert(!fire0 && math.abs(base0 - cur0) < 1e-6,
      s"in-distribution state must stay quiet: $base0 vs $cur0")

    IncrementalIvf.applyBatchCoded(spark,
      IncrementalIvf.activeRoot(spark, parent),
      df((31L to 40L).map(i => (i, oodVec(i), "I"))), 1L)

    // arrivals from a subspace the frozen codebook never saw degrade
    // their write-time reconstruction fit — the CODED retrain trigger
    // (no vectors in the index, no external store touched: the monitor
    // reads only the per-batch one-row fit partials). The DEFAULT
    // window fires because the corpus-sized bootstrap batch is
    // excluded — n-weighting it in would drown the drifted arrivals
    // and mask the signal for the first window−1 batches
    val (fire1, base1, cur1) =
      IncrementalIvf.retrainSignalCoded(spark, g0)
    assert(fire1 && base1 - cur1 > 0.05,
      s"OOD arrivals must fire the coded signal: $base1 -> $cur1")

    // the external full-vector store is the rebuild's vector source
    val store = ((1L to 30L).map(i => (i, vec(i))) ++
      (31L to 40L).map(i => (i, oodVec(i)))).toDF("vec_id", "e")
    val newRoot = IncrementalIvf.retrainCutoverCoded(spark, parent,
      store, k = 4, iters = 2, m = m, ksub = 4, pqIters = 2)
    assert(newRoot.endsWith("/g1") &&
      IncrementalIvf.activeRoot(spark, parent) === newRoot)

    // the loop closes: the rebuilt generation's codebook was trained
    // on the drifted live set, its baseline re-recorded — quiet again
    val (fire2, base2, cur2) =
      IncrementalIvf.retrainSignalCoded(spark, newRoot)
    assert(!fire2 && base2 - cur2 < 0.05,
      s"post-cutover fit must match the fresh baseline: $base2 vs $cur2")

    // the rebuilt coded index equals a from-scratch coded init on the
    // same live set with the same parameters (both trainers are
    // deterministic)
    val scratch = java.nio.file.Files
      .createTempDirectory("graft-incivf-cscr").toString + "/ivf"
    IncrementalIvf.initializeCoded(spark, store, scratch,
      k = 4, iters = 2, m = m, ksub = 4, pqIters = 2)
    def adc(root: String) = IncrementalIvf
      .searchAdc(spark, root, oodVec(33L), 6, 2)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(adc(newRoot) === adc(scratch) && adc(newRoot).nonEmpty)
  }

  test("retrain cutover: old generation serves until the atomic alias flip") {
    val parent = java.nio.file.Files
      .createTempDirectory("graft-incivf-cut").toString + "/ann"
    import spark.implicits._

    // bootstrap on the axis-0/1/2 distribution
    IncrementalIvf.initializeAliased(spark,
      (1L to 30L).map(i => (i, vec(i))).toDF("vec_id", "e"),
      parent, k = 3, iters = 2)
    val g0 = IncrementalIvf.activeRoot(spark, parent)
    assert(g0.endsWith("/g0"))

    // arrivals from an axis the quantizer never saw → retrain fires
    val oodVec: Long => Seq[Double] = { i =>
      val v = Array.fill(dim)(0.0); v(3) = 1.0; v(2) = 0.01 * (i % 5)
      v.toSeq
    }
    IncrementalIvf.applyBatchActive(spark, parent,
      df((31L to 40L).map(i => (i, oodVec(i), "I"))), 1L)
    val (fire, _, _) = IncrementalIvf.retrainSignal(spark, g0)
    assert(fire, "the OOD arrivals must trigger the retrain decision")
    val preFlip = IncrementalIvf.searchActive(spark, parent,
      oodVec(31L), 5, 2).collect().map(_.toString).toSeq

    // crash-before-flip: a half-built generation (quantizer trained,
    // re-add incomplete) must leave the old root active and searches
    // byte-identical
    val live = IncrementalIvf.liveMembers(spark, g0).select("vec_id", "e")
    IncrementalIvf.initializeQuantizer(spark, live, s"$parent/g7",
      k = 4, iters = 2)
    assert(IncrementalIvf.activeRoot(spark, parent) === g0,
      "an unflipped rebuild must not move the alias")
    assert(IncrementalIvf.searchActive(spark, parent, oodVec(31L), 5, 2)
      .collect().map(_.toString).toSeq === preFlip)

    // the real cutover: k=4 captures the new axis; the crashed g7
    // orphan just bumps the generation counter
    val newRoot = IncrementalIvf.retrainCutover(spark, parent,
      k = 4, iters = 2)
    assert(newRoot === s"$parent/g8")
    assert(IncrementalIvf.activeRoot(spark, parent) === newRoot)

    // post-flip searches equal a from-scratch maintained index built
    // from the same live set with the same (k, iters) — buildFrom is
    // deterministic, so this is exact equality
    val scratch = java.nio.file.Files
      .createTempDirectory("graft-incivf-scr").toString + "/ivf"
    val liveRows = ((1L to 30L).map(i => i -> vec(i)) ++
      (31L to 40L).map(i => i -> oodVec(i)))
    IncrementalIvf.initialize(spark,
      liveRows.toDF("vec_id", "e"), scratch, k = 4, iters = 2)
    def hits(root: String) = IncrementalIvf
      .search(spark, root, oodVec(35L), 6, 2)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(hits(newRoot) === hits(scratch))
    assert(hits(newRoot).nonEmpty)

    // the new quantizer actually fits the drifted distribution again
    val (fire2, _, _) = IncrementalIvf.retrainSignal(spark, newRoot)
    assert(!fire2, "the retrained index must be quiet")

    // the feed continues with monotone ids across the flip
    IncrementalIvf.applyBatchActive(spark, parent,
      df(Seq((41L, oodVec(41L), "I"))), 2L)
    assert(IncrementalIvf.liveMembers(spark, newRoot).count() === 41L)

    // generation GC keeps only the active root
    IncrementalIvf.cleanupGenerations(spark, parent)
    val f = new org.apache.hadoop.fs.Path(parent)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val gens = f.listStatus(new org.apache.hadoop.fs.Path(parent)).toSeq
      .map(_.getPath.getName).filter(_.startsWith("g")).sorted
    assert(gens === Seq("g8"))
  }

  test("compact refuses to fold past a torn batch (redelivery would wedge)") {
    val root = java.nio.file.Files
      .createTempDirectory("graft-incivf-w").toString + "/ivf"
    import spark.implicits._

    IncrementalIvf.initialize(spark,
      (1L to 12L).map(i => (i, vec(i))).toDF("vec_id", "e"),
      root, k = 3, iters = 2)

    // batch 4's first delivery died between the member write and the
    // vecs changelog commit — present but uncommitted; folding at or
    // above it would delete its only copy and wedge the redelivery
    Seq((99L, vec(99L), 0)).toDF("vec_id", "e", "cell")
      .write.partitionBy("cell").parquet(s"$root/members/seq=4")
    val e = intercept[IllegalArgumentException] {
      IncrementalIvf.compact(spark, root, upTo = 4L)
    }
    assert(e.getMessage.contains("torn"))

    // strictly below is fine; the redelivery then commits and compacts
    IncrementalIvf.compact(spark, root, upTo = 0L)
    IncrementalIvf.applyBatch(spark, root,
      df(Seq((99L, vec(99L), "I"))), 4L)
    IncrementalIvf.compact(spark, root, upTo = 4L)
    val live = ((1L to 12L) :+ 99L).map(i => i -> vec(i)).toMap
    val got = IncrementalIvf.search(spark, root, vec(99L), 5, 2)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got === expected(root, live, vec(99L), 5, 2))
    // re-run AT the published horizon = crashed-cleanup retry: must
    // converge without re-folding over the tree readers resolve from
    IncrementalIvf.compact(spark, root, upTo = 4L)
    assert(IncrementalIvf.search(spark, root, vec(99L), 5, 2)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq === got)
  }

  test("searchAdcRerankStore: the rerank fetch is I/O-pruned to the shortlist's buckets") {
    import spark.implicits._
    import org.apache.spark.sql.types._
    import graft.streaming.UpsertFileSink
    val base = java.nio.file.Files
      .createTempDirectory("graft-incivf-rrstore").toString
    val root = s"$base/ivf"
    val vstore = s"$base/v"
    val nB = 8
    val all = (1L to 60L).map(i => (i, vec(i)))
    IncrementalIvf.initializeCoded(spark, all.toDF("vec_id", "e"),
      root, k = 4, iters = 2, m = 2, ksub = 4, pqIters = 2)
    UpsertFileSink.upsertBatchBucketed(
      all.toDF("vec_id", "e")
        .withColumn("op", lit("U")).withColumn("seq", lit(0L)),
      0L, vstore, Seq("vec_id"), nB)
    val handle = UpsertFileSink.BucketedStore(vstore,
      StructType(Seq(StructField("vec_id", LongType),
        StructField("e", ArrayType(DoubleType)))),
      keyCols = Seq("vec_id"))
    val probe = vec(2L)

    // the handle path answers EXACTLY what the bare-frame path does
    // (same shortlist, same exact-cosine rerank) — the handle changes
    // only the fetch I/O
    val viaStore = IncrementalIvf.searchAdcRerankStore(spark, root,
        probe, handle, topK = 5, nprobe = 2, pool = 5)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val viaFrame = IncrementalIvf.searchAdcRerank(spark, root, probe,
        all.toDF("vec_id", "e"), topK = 5, nprobe = 2, pool = 5)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(viaStore === viaFrame && viaStore.nonEmpty)

    // THE I/O PIN (the round-17 weak finding, closed): every file the
    // plan reads from the STORE lives under a shortlist bucket dir —
    // per-query store I/O proportional to the shortlist, never a
    // store-wide listing
    val wanted = IncrementalIvf.searchAdc(spark, root, probe, 5, 2)
      .select(UpsertFileSink.bucketCol(Seq("vec_id"), nB).as("b"))
      .distinct().collect().map(_.getInt(0)).toSet
    assert(wanted.size < nB,
      "fixture must leave some buckets untouched for the pin to bite")
    val storeFiles = IncrementalIvf.searchAdcRerankStore(spark, root,
        probe, handle, topK = 5, nprobe = 2, pool = 5)
      .inputFiles.filter(_.contains(vstore))
    assert(storeFiles.nonEmpty)
    storeFiles.foreach(f => assert(wanted.exists(b =>
      f.contains(s"/buckets/$b/")),
      s"rerank read a store file outside the shortlist's buckets: $f"))
    Materialize.releaseAll()
  }
}
