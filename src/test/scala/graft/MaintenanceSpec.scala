package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{IncrementalIndex, IncrementalIvf, Maintenance}

/** One maintenance call per store, never failing on in-flight work:
  * the out-of-band fold picks the safe target below any torn
  * redelivery instead of tripping the wedge guard, cleanup converges,
  * and generation GC reclaims only below the active alias.
  */
class MaintenanceSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  test("maintain folds to the newest committed batch and converges cleanup") {
    import spark.implicits._
    val root = java.nio.file.Files
      .createTempDirectory("graft-maint-idx").toString
    IncrementalIndex.applyBatch(spark, root,
      Seq((1L, "alpha beta", "I"), (2L, "beta gamma", "I"))
        .toDF("doc_id", "text", "op"), 0L)
    IncrementalIndex.applyBatch(spark, root,
      Seq((3L, "gamma delta", "I")).toDF("doc_id", "text", "op"), 1L)
    val before = IncrementalIndex.currentPostings(spark, root)
      .collect().map(_.toString).sorted.toSeq

    val rep = Maintenance.maintainIndex(spark, root)
      .collect().map(r => (r.getString(1), r.getString(2))).toSeq
    assert(rep.exists(r => r._1 == "compact" && r._2.contains("horizon 1")),
      s"both committed batches must fold: $rep")
    assert(IncrementalIndex.currentPostings(spark, root)
      .collect().map(_.toString).sorted.toSeq === before)

    // nothing new: the next pass is an explicit noop (and still safe)
    val rep2 = Maintenance.maintainIndex(spark, root)
      .collect().map(_.getString(1)).toSeq
    assert(rep2 === Seq("noop"))
  }

  test("maintain degrades below a torn redelivery instead of wedging") {
    import spark.implicits._
    val root = java.nio.file.Files
      .createTempDirectory("graft-maint-torn").toString
    IncrementalIndex.applyBatch(spark, root,
      Seq((1L, "alpha beta", "I")).toDF("doc_id", "text", "op"), 0L)
    IncrementalIndex.applyBatch(spark, root,
      Seq((2L, "beta gamma", "I")).toDF("doc_id", "text", "op"), 1L)
    // batch 3's first delivery died before its docs commit — a direct
    // compact(3) would refuse (the wedge guard); maintain must fold
    // everything SAFELY below it instead
    Seq(("torn", 9L, 1L, 2L)).toDF("token", "doc_id", "tf", "dl")
      .withColumn("db", pmod(hash(col("doc_id")), lit(16)))
      .withColumn("tb", pmod(hash(col("token")), lit(16)))
      .write.partitionBy("db", "tb").parquet(s"$root/postings/seq=3")
    val rep = Maintenance.maintainIndex(spark, root)
      .collect().map(r => (r.getString(1), r.getString(2))).head
    assert(rep._1 === "compact" && rep._2.contains("horizon 1"),
      s"the fold must stop below the torn batch: $rep")
    // the torn segment survives for its redelivery, which then lands
    IncrementalIndex.applyBatch(spark, root,
      Seq((9L, "torn twice", "I")).toDF("doc_id", "text", "op"), 3L)
    val rep2 = Maintenance.maintainIndex(spark, root)
      .collect().map(r => (r.getString(1), r.getString(2))).head
    assert(rep2._1 === "compact" && rep2._2.contains("horizon 3"))
  }

  test("retainNewest keeps an as-of replay window below the fold") {
    import spark.implicits._
    import graft.operators.IncrementalLsh
    val root = java.nio.file.Files
      .createTempDirectory("graft-maint-retain").toString + "/lsh"
    val mk = (i: Long) => (i, s"tok$i alpha beta gamma delta tok${i % 7}")
    IncrementalLsh.applyBatch(spark, root,
      (1L to 10L).map(mk).toDF("doc_id", "text").withColumn("op", lit("I")),
      0L)
    IncrementalLsh.applyBatch(spark, root,
      (11L to 14L).map(mk).toDF("doc_id", "text").withColumn("op", lit("I")),
      1L)
    // a composed refresh replaying batch 1 probes this store AS OF
    // batch 0 — maintenance with retainNewest=1 folds only to 0, so
    // that probe keeps answering after the cron ran
    val rep = Maintenance.maintainLsh(spark, root, retainNewest = 1)
      .collect().map(r => (r.getString(1), r.getString(2))).head
    assert(rep._1 === "compact" && rep._2.contains("horizon 0"),
      s"retainNewest=1 must fold below the head: $rep")
    val probes = Seq(mk(101L)).toDF("doc_id", "text")
    assert(IncrementalLsh.candidatesAsOf(spark, root, probes, 0L)
      .count() >= 0L) // resolves — no horizon wedge
    // ...whereas a head fold would have wedged exactly that probe
    IncrementalLsh.compact(spark, root, 1L)
    val e = intercept[IllegalArgumentException] {
      IncrementalLsh.candidatesAsOf(spark, root, probes, 0L).count()
    }
    assert(e.getMessage.contains("folded away"))
    // nothing retainable left: the next retained pass is a noop
    assert(Maintenance.maintainLsh(spark, root, retainNewest = 1)
      .collect().map(_.getString(1)).head === "noop")
  }

  test("maintainPipeline bakes the composed retention coupling in") {
    import spark.implicits._
    import graft.operators.{IncrementalIndex, IncrementalLsh}
    import graft.streaming.UpsertFileSink
    val base = java.nio.file.Files
      .createTempDirectory("graft-maint-pipe").toString
    val mk = (i: Long) => (i, s"tok$i alpha beta gamma delta tok${i % 7}")
    // landing zone (2 batches), lsh (2 batches), index (2 batches)
    (0L to 1L).foreach { b =>
      UpsertFileSink.upsertBatchBucketed(
        (1L to 6L).map(k => (k, s"v$k-b$b", "U", 1L))
          .toDF("doc_id", "text", "op", "seq"),
        b, s"$base/landing", Seq("doc_id"), 4)
      IncrementalLsh.applyBatch(spark, s"$base/lsh",
        (b * 10 + 1 to b * 10 + 5).map(mk).toDF("doc_id", "text")
          .withColumn("op", lit("I")), b)
      IncrementalIndex.applyBatch(spark, s"$base/idx",
        (b * 10 + 1 to b * 10 + 5).map(mk)
          .toDF("doc_id", "text").withColumn("op", lit("I")), b)
    }
    // a second bucketed zone as the vector store — its report row
    // must be distinguishable from the doc zone's
    UpsertFileSink.upsertBatchBucketed(
      (1L to 4L).map(k => (k, Seq(k.toDouble), "U", 1L))
        .toDF("vec_id", "e", "op", "seq"),
      0L, s"$base/vecs", Seq("vec_id"), 4)
    val rep = Maintenance.maintainPipeline(spark,
      Maintenance.PipelineStores(
        landing = Some(s"$base/landing"),
        vectors = Some(s"$base/vecs"),
        index = Some(s"$base/idx"),
        lsh = Some(s"$base/lsh")))
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getString(2))).toSeq
    assert(rep.map(_._1).toSet ===
      Set("landing", "vectors", "index", "lsh"))
    // the lsh store keeps the as-of replay window (folds to 0, not 1)
    assert(rep.exists(r => r._1 == "lsh" && r._2 == "compact" &&
      r._3.contains("horizon 0")), s"lsh must retain the head: $rep")
    // ...so a replayed refresh's as-of probe still resolves
    assert(IncrementalLsh.candidatesAsOf(spark, s"$base/lsh",
      Seq(mk(101L)).toDF("doc_id", "text"), 0L).count() >= 0L)
    // the index (never probed as-of by the refresh) folds to its head
    assert(rep.exists(r => r._1 == "index" && r._2 == "compact" &&
      r._3.contains("horizon 1")), s"index folds to the head: $rep")
    // replays stay floored: a retention below 1 is refused loudly
    intercept[IllegalArgumentException] {
      Maintenance.maintainPipeline(spark,
        Maintenance.PipelineStores(lsh = Some(s"$base/lsh")),
        minRetainBatches = 0)
    }

    // an operator whose OWN consumers read the index as-of (hybrid
    // as-of serving) opens the window with indexAsOfRetain — a twin
    // index fed the same two batches folds only to 0, and the as-of
    // read the default fold-to-head would have wedged keeps answering
    (0L to 1L).foreach { b =>
      IncrementalIndex.applyBatch(spark, s"$base/idx2",
        (b * 10 + 1 to b * 10 + 5).map(mk)
          .toDF("doc_id", "text").withColumn("op", lit("I")), b)
    }
    val rep2 = Maintenance.maintainPipeline(spark,
      Maintenance.PipelineStores(index = Some(s"$base/idx2")),
      indexAsOfRetain = 1)
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getString(2))).toSeq
    assert(rep2.exists(r => r._1 == "index" && r._2 == "compact" &&
      r._3.contains("horizon 0")),
      s"indexAsOfRetain=1 must fold below the head: $rep2")
    assert(IncrementalIndex.statsFrame(spark, s"$base/idx2",
      asOf = Some(0L)).head.getLong(0) === 5L,
      "the retained as-of stats view must still answer")
    // the default (0) on the first pipeline's index already folded to
    // the head above — that as-of view is gone, loudly
    val e2 = intercept[IllegalArgumentException] {
      IncrementalIndex.statsFrame(spark, s"$base/idx",
        asOf = Some(0L)).head
    }
    assert(e2.getMessage.contains("folded away"))
  }

  test("maintain on a bucketed landing zone checkpoints then vacuums") {
    import spark.implicits._
    import graft.streaming.UpsertFileSink
    import org.apache.spark.sql.types._
    val root = java.nio.file.Files
      .createTempDirectory("graft-maint-land").toString + "/zone"
    val nB = 4
    (0L to 3L).foreach { b =>
      UpsertFileSink.upsertBatchBucketed(
        (1L to 8L).map(k => (k, s"v$k-b$b", "U", 1L))
          .toDF("key", "value", "op", "seq"),
        b, root, Seq("key"), nB)
    }
    val schema = StructType(Seq(StructField("key", LongType),
      StructField("value", StringType)))
    val before = UpsertFileSink.readSnapshotBucketed(spark, root, schema)
      .collect().map(_.toString).sorted.toSeq

    val rep = Maintenance.maintainLanding(spark, root).head
    assert(rep.getString(1) === "checkpoint+vacuum" &&
      rep.getString(2).contains("head 3"))
    // a checkpoint rolled up, old versions vacuumed beyond retention,
    // the snapshot unchanged, and an as-of read of the retained
    // predecessor still resolves (the anchored-retention contract)
    assert(new java.io.File(s"$root/_commits").listFiles()
      .exists(_.getName.startsWith("checkpoint.")))
    assert(UpsertFileSink.readSnapshotBucketed(spark, root, schema)
      .collect().map(_.toString).sorted.toSeq === before)
    assert(UpsertFileSink
      .readSnapshotBucketedAsOf(spark, root, schema, 2L).count() === 8L)

    // COUNTED cadence: an immediate second call sees no committed
    // marker above the new checkpoint head — it vacuums only, never
    // rolls a manifest per cron tick against an idle zone
    val rep2 = Maintenance.maintainLanding(spark, root).head
    assert(rep2.getString(1) === "vacuum",
      s"an idle zone must not re-checkpoint: $rep2")
    assert(new java.io.File(s"$root/_commits").listFiles()
      .count(_.getName.startsWith("checkpoint.")) === 1,
      "two immediate maintain calls must write exactly one checkpoint")
    // a new committed batch re-arms the cadence
    UpsertFileSink.upsertBatchBucketed(
      Seq((1L, "v1-b4", "U", 1L)).toDF("key", "value", "op", "seq"),
      4L, root, Seq("key"), nB)
    assert(Maintenance.maintainLanding(spark, root).head.getString(1)
      === "checkpoint+vacuum")
  }

  test("maintain on an aliased parent compacts the active generation and GCs") {
    import spark.implicits._
    val parent = java.nio.file.Files
      .createTempDirectory("graft-maint-ivf").toString + "/ann"
    def vec(i: Long): Seq[Double] =
      Seq(1.0 + (i % 3), (i % 5).toDouble, 1.0)
    IncrementalIvf.initializeAliased(spark,
      (1L to 20L).map(i => (i, vec(i))).toDF("vec_id", "e"),
      parent, k = 2, iters = 1)
    IncrementalIvf.applyBatchActive(spark, parent,
      (21L to 25L).map(i => (i, vec(i), "I")).toDF("vec_id", "e", "op"),
      1L)
    // a stale generation to reclaim (below the active one)
    IncrementalIvf.retrainCutover(spark, parent, k = 2, iters = 1)
    assert(new java.io.File(s"$parent/g0").exists)

    // generation GC is opt-in EVERYWHERE (the Shell's posture): the
    // default pass folds but leaves the stale generation for
    // in-flight readers
    val repSafe = Maintenance.maintainIvf(spark, parent)
      .collect().map(_.getString(1)).toSeq
    assert(repSafe.contains("compact") &&
      !repSafe.contains("gc-generations"),
      s"the default must not GC generations: $repSafe")
    assert(new java.io.File(s"$parent/g0").exists)
    val rep = Maintenance.maintainIvf(spark, parent,
        gcGenerations = true)
      .collect().map(_.getString(1)).toSeq
    assert(rep.contains("gc-generations"),
      s"explicit GC expected: $rep")
    assert(!new java.io.File(s"$parent/g0").exists,
      "the below-active generation must be reclaimed")
    assert(IncrementalIvf.searchActive(spark, parent, vec(3L), 3, 2)
      .count() === 3L)
    // and the safe target really was the active root's head batch
    // (the cutover re-adds the live set at the old head id, 1)
    val active = IncrementalIvf.activeRoot(spark, parent)
    val marker = new java.io.File(s"$active/_compacted")
    val src = scala.io.Source.fromFile(marker)
    try assert(marker.exists && src.mkString.trim === "1")
    finally src.close()
  }
}
