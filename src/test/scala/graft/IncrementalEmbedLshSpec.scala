package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{IncrementalEmbedLsh, Maintenance}
import graft.sources.Tables

/** The incremental hyperplane-LSH candidate index must agree with the
  * CONTRACT banding (q_dedup_embed_banded) on formulas, and with a
  * from-scratch index on any CDC batch sequence — embedding
  * dedup-at-ingest cannot drift from dedup-at-rest, completing the
  * modality pair with [[IncrementalLshSpec]].
  */
class IncrementalEmbedLshSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private lazy val sf = SparkTestBase.sf0001

  private def emb(): DataFrame =
    Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("e"))

  private def pairsOf(df: DataFrame): Set[(Long, Long, Double)] =
    df.select(
        least(col("probe_id"), col("vec_id")).as("a"),
        greatest(col("probe_id"), col("vec_id")).as("b"),
        col("sim"))
      .distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  test("one-batch index probed with the corpus equals q_dedup_embed_banded") {
    val root = java.nio.file.Files
      .createTempDirectory("graft-incelsh-eq").toString + "/elsh"
    // the contract operator derives the band width from corpus size;
    // the index freezes the same value at creation
    val bb = graft.operators.SimilarityExtras
      .bandBits(emb().count())
    IncrementalEmbedLsh.applyBatch(spark, root,
      emb().withColumn("op", lit("I")), 0L, bandBits = bb)
    val got = pairsOf(IncrementalEmbedLsh.candidatesVerified(spark, root,
      emb(), emb(), minSim = 0.4))
    Materialize.releaseAll()
    val expect = SparkEntry.queries("q_dedup_embed_banded")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    Materialize.releaseAll()
    assert(got === expect && got.nonEmpty,
      "the index's verified candidate set must be the contract operator's")
  }

  test("CDC batches track a from-scratch index; compaction and maintain preserve answers") {
    import spark.implicits._
    val inc = java.nio.file.Files
      .createTempDirectory("graft-incelsh-cdc").toString + "/elsh"
    val all = emb().collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toSeq))
    var live = all.filter(_._1 % 2 == 0).toMap
    IncrementalEmbedLsh.applyBatch(spark, inc,
      live.toSeq.toDF("vec_id", "e").withColumn("op", lit("I")), 0L)

    // batch 1: add the odd half, move one vector onto another's
    // embedding (a guaranteed sim-1.0 near-dup), delete one
    val oddHalf = all.filter(_._1 % 2 == 1).toMap
    val victim = live.keys.min
    val stolen = oddHalf(oddHalf.keys.min)
    val deleted = live.keys.max
    val b1 = oddHalf.toSeq.map { case (id, e) => (id, e, "I") } ++
      Seq((victim, stolen, "U"), (deleted, Seq.empty[Double], "D"))
    IncrementalEmbedLsh.applyBatch(spark, inc,
      b1.toDF("vec_id", "e", "op"), 1L)
    live = live ++ oddHalf + (victim -> stolen) - deleted

    def store() = live.toSeq.toDF("vec_id", "e")
    def check(probes: DataFrame): Set[(Long, Long, Double)] = {
      val scratch = java.nio.file.Files
        .createTempDirectory("graft-incelsh-scr").toString + "/elsh"
      IncrementalEmbedLsh.applyBatch(spark, scratch,
        store().withColumn("op", lit("I")), 0L)
      val got = pairsOf(IncrementalEmbedLsh.candidatesVerified(spark,
        inc, probes, store(), 0.4))
      val expect = pairsOf(IncrementalEmbedLsh.candidatesVerified(spark,
        scratch, probes, store(), 0.4))
      Materialize.releaseAll()
      assert(got === expect)
      got
    }

    val probes = (Seq((900001L, stolen)) ++
      live.toSeq.filter(_._1 % 7 == 0)).toDF("vec_id", "e")
    val hits = check(probes)
    assert(!hits.exists(p => p._1 == deleted || p._2 == deleted),
      "a deleted vector must never surface as a candidate")
    assert(hits.exists(p =>
      (p._1 == 900001L || p._2 == 900001L) &&
        (p._1 == victim || p._2 == victim) && p._3 == 1.0),
      "the moved vector must match the probe carrying its new embedding")

    // maintain folds the log (the safe-target path); answers unchanged;
    // a below-horizon redelivery no-ops
    val rep = Maintenance.maintainEmbedLsh(spark, inc)
      .collect().map(_.getString(1)).toSeq
    assert(rep.contains("compact"))
    check(probes)
    IncrementalEmbedLsh.applyBatch(spark, inc,
      Seq((900777L, stolen, "I")).toDF("vec_id", "e", "op"), 1L)
    check(probes)
    assert(!new java.io.File(s"$inc/vecs/seq=1").exists,
      "a below-horizon redelivery must not write a segment")
    // the scheme is frozen: a mismatched writer fails loudly
    intercept[IllegalArgumentException] {
      IncrementalEmbedLsh.applyBatch(spark, inc,
        Seq((900009L, stolen, "I")).toDF("vec_id", "e", "op"), 9L,
        bandBits = 12)
    }
    // later batches land on the folded base
    IncrementalEmbedLsh.applyBatch(spark, inc,
      Seq((900002L, stolen, "I")).toDF("vec_id", "e", "op"), 2L)
    live += 900002L -> stolen
    check(probes)
  }

  test("scheme rebuild cutover: a wider banding replaces the original atomically") {
    import spark.implicits._
    val parent = java.nio.file.Files
      .createTempDirectory("graft-incelsh-bg").toString + "/elsh"
    IncrementalEmbedLsh.initializeAliased(spark, parent)
    val all = emb().filter(col("vec_id") % 5 === 0)
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toSeq))
    val (h1, h2) = all.splitAt(all.length / 2)
    // the operator sized bandBits=4 for the bootstrap corpus
    IncrementalEmbedLsh.applyBatchActive(spark, parent,
      h1.toSeq.toDF("vec_id", "e").withColumn("op", lit("I")), 0L,
      bandBits = 4)
    IncrementalEmbedLsh.applyBatchActive(spark, parent,
      h2.toSeq.toDF("vec_id", "e").withColumn("op", lit("I")), 1L,
      bandBits = 4)
    val probes = (Seq((990001L, all.head._2)) ++ all.take(20).toSeq)
      .toDF("vec_id", "e")
    assert(IncrementalEmbedLsh.candidatesActive(spark, parent, probes)
      .count() > 0)

    // the grown corpus needs the wider scheme; the active root's pins
    // refuse an in-place change (that is what the cutover is for)
    intercept[IllegalArgumentException] {
      IncrementalEmbedLsh.applyBatchActive(spark, parent,
        Seq((991L, all.head._2, "I")).toDF("vec_id", "e", "op"), 2L,
        bandBits = 8)
    }

    // blue/green rebuild at bandBits=8 FROM THE EXTERNAL VECTOR STORE
    // (the index never stored a vector); lookups cut over atomically
    val vectors = all.toSeq.toDF("vec_id", "e")
    val newRoot = IncrementalEmbedLsh.rebuildCutover(spark, parent,
      vectors, bands = 4, bandBits = 8)
    assert(IncrementalEmbedLsh.activeRoot(spark, parent) === newRoot)
    val scratch = java.nio.file.Files
      .createTempDirectory("graft-incelsh-bgscr").toString + "/elsh"
    IncrementalEmbedLsh.applyBatch(spark, scratch,
      vectors.withColumn("op", lit("I")), 0L, bandBits = 8)
    def rawPairs(df: DataFrame) = df
      .select(least(col("probe_id"), col("vec_id")),
        greatest(col("probe_id"), col("vec_id")))
      .distinct().collect().map(_.toString).toSet
    val got = rawPairs(
      IncrementalEmbedLsh.candidatesActive(spark, parent, probes))
    val expect = rawPairs(
      IncrementalEmbedLsh.candidates(spark, scratch, probes))
    Materialize.releaseAll()
    assert(got === expect,
      "post-flip lookups must serve the rebuilt scheme exactly")

    // the feed continues with monotone ids at the NEW scheme (the
    // bulk load landed at the old head id); the OLD scheme fails loud
    IncrementalEmbedLsh.applyBatchActive(spark, parent,
      Seq((990002L, all.head._2, "I")).toDF("vec_id", "e", "op"), 2L,
      bandBits = 8)
    intercept[IllegalArgumentException] {
      IncrementalEmbedLsh.applyBatchActive(spark, parent,
        Seq((990003L, all.head._2, "I")).toDF("vec_id", "e", "op"), 3L,
        bandBits = 4)
    }
    val hit = IncrementalEmbedLsh.candidatesActive(spark, parent,
      Seq((990009L, all.head._2)).toDF("vec_id", "e")).collect()
    assert(hit.exists(r => r.getLong(1) == 990002L))

    // the verify against a BUCKETED store handle equals the bare frame
    import graft.streaming.UpsertFileSink
    val vstore = java.nio.file.Files
      .createTempDirectory("graft-incelsh-vstore").toString + "/v"
    UpsertFileSink.upsertBatchBucketed(
      (all.toSeq ++ Seq((990002L, all.head._2))).toDF("vec_id", "e")
        .withColumn("op", lit("U")).withColumn("seq", lit(0L)),
      0L, vstore, Seq("vec_id"), nBuckets = 4)
    val handle = UpsertFileSink.BucketedStore(vstore,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("vec_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("e",
          org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.DoubleType)))),
      keyCols = Seq("vec_id"))
    val active = IncrementalEmbedLsh.activeRoot(spark, parent)
    val viaStore = pairsOf(IncrementalEmbedLsh.candidatesVerifiedStore(
      spark, active, probes, handle, minSim = 0.4))
    val viaFrame = pairsOf(IncrementalEmbedLsh.candidatesVerified(
      spark, active, probes,
      (all.toSeq ++ Seq((990002L, all.head._2))).toDF("vec_id", "e"),
      minSim = 0.4))
    Materialize.releaseAll()
    assert(viaStore === viaFrame && viaStore.nonEmpty,
      "the bucketed-handle verify must equal the bare-frame verify")

    // a never-fed aliased index refuses the cutover (id-0 reuse would
    // swallow the feed's first batch)
    val virgin = java.nio.file.Files
      .createTempDirectory("graft-incelsh-virgin").toString + "/elsh"
    IncrementalEmbedLsh.initializeAliased(spark, virgin)
    val e = intercept[IllegalArgumentException] {
      IncrementalEmbedLsh.rebuildCutover(spark, virgin,
        Seq((1L, Seq(1.0, 0.0))).toDF("vec_id", "e"), 4, 8)
    }
    assert(e.getMessage.contains("never received a batch"))
    // generation GC reclaims the superseded g0 after the quiesce window
    IncrementalEmbedLsh.cleanupGenerations(spark, parent)
    assert(!new java.io.File(s"$parent/g0").exists,
      "the superseded generation must be reclaimed")
  }
}
