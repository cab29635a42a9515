package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.HybridSearch

/** RRF fusion invariants: hand-computed fusion arithmetic, in-list tie
  * determinism, partitioning invariance, and the end-to-end hybrid
  * document search sanity (bounded, probe excluded, fused ordering).
  */
class HybridSearchSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("hand-computed RRF: two lists, c=60") {
    val lex = Seq(("d1", 9.0), ("d2", 8.0), ("d3", 7.0)).toDF("id", "score")
    val sem = Seq(("d2", 0.5), ("d4", 0.4)).toDF("id", "score")
    val got = HybridSearch.rrf(Seq(lex, sem), "id", 10)
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
    val exp = Seq(
      ("d2", 1.0 / 62 + 1.0 / 61, 2L),
      ("d1", 1.0 / 61, 1L),
      ("d4", 1.0 / 62, 1L),
      ("d3", 1.0 / 63, 1L))
    assert(got.length === 4)
    got.zip(exp).foreach { case ((gi, gs, gn), (ei, es, en)) =>
      assert(gi === ei)
      assert(math.abs(gs - es) < 1e-12, s"$gi: $gs vs $es")
      assert(gn === en)
    }
  }

  test("in-list score ties rank deterministically by id") {
    val tied = Seq(("z", 1.0), ("a", 1.0), ("m", 1.0)).toDF("id", "score")
    val got = HybridSearch.rrf(Seq(tied), "id", 3)
      .collect().map(r => (r.getString(0), r.getDouble(1)))
    // ranks: a=1, m=2, z=3 → rrf descending follows id order
    assert(got.map(_._1).toSeq === Seq("a", "m", "z"))
    assert(math.abs(got.head._2 - 1.0 / 61) < 1e-12)
  }

  test("fusion is partitioning-invariant and k-capped") {
    val a = Seq(("d1", 3.0), ("d2", 2.0), ("d3", 1.0)).toDF("id", "score")
    val b = Seq(("d3", 5.0), ("d1", 4.0)).toDF("id", "score")
    val x = HybridSearch.rrf(Seq(a.repartition(5), b.repartition(2)), "id", 2)
      .collect().map(_.toString).toSeq
    val y = HybridSearch.rrf(Seq(a.repartition(1), b.repartition(7)), "id", 2)
      .collect().map(_.toString).toSeq
    assert(x === y)
    assert(x.length === 2)
    intercept[IllegalArgumentException] {
      HybridSearch.rrf(Seq(a), "id", 5000)
    }
  }

  test("hybrid document search: bounded, probe-free, rrf-ordered") {
    val got = HybridSearch.searchDocuments(spark, SparkTestBase.sf0001,
      Seq("filter", "window"), probeDocId = 0L, k = 15)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
    assert(got.length === 15)
    assert(!got.map(_._1).contains(0L), "probe doc must not rank")
    assert(got.map(_._2).toSeq === got.map(_._2).sortBy(-_).toSeq)
    // every score is a sum over ≤2 lists of 1/(60+rank) terms
    got.foreach { case (_, s, n) =>
      assert(n >= 1L && n <= 2L)
      assert(s > 0.0 && s <= 2.0 / 61)
    }
    // fusion invents nothing: every fused doc came from one of the two
    // retrievers' top-k lists (15 + 15 candidates → top 15)
    assert(got.map(_._1).toSet.size === 15)
  }

  test("hybrid search over the MAINTAINED stores equals its legs fused directly") {
    import graft.operators.{IncrementalIndex, IncrementalIvf,
      InvertedIndex}
    import graft.sources.Tables
    val base = java.nio.file.Files
      .createTempDirectory("graft-msearch").toString
    val docs = Tables.documents(spark, SparkTestBase.sf0001)
      .select("doc_id", "text")
    val emb = Tables.embeddings(spark, SparkTestBase.sf0001)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("e"))

    // the ingest loop's stores: an ALIASED index fed in two CDC
    // batches, an aliased IVF bootstrapped from the embeddings
    IncrementalIndex.initializeAliased(spark, s"$base/idx")
    IncrementalIndex.applyBatchActive(spark, s"$base/idx",
      docs.filter(col("doc_id") % 2 === 0).withColumn("op", lit("I")), 0L)
    IncrementalIndex.applyBatchActive(spark, s"$base/idx",
      docs.filter(col("doc_id") % 2 === 1).withColumn("op", lit("I")), 1L)
    IncrementalIvf.initializeAliased(spark, emb, s"$base/ann",
      k = 4, iters = 2)

    val probe = emb.filter(col("vec_id") === 3L)
      .head.getSeq[Double](1).toSeq
    val got = HybridSearch.searchMaintained(spark, s"$base/idx",
        s"$base/ann", Seq("data", "model"), probe, k = 10, nprobe = 2)
      .collect().map(_.toString).toSeq

    // the same legs, fused directly — the composition adds only glue
    // (alias resolution, stats derivation, column mapping), and the
    // legs' own equality with from-scratch builds is pinned elsewhere
    val idxRoot = IncrementalIndex.activeRoot(spark, s"$base/idx")
    val (n, avgDl) = IncrementalIndex.stats(spark, idxRoot)
    val lexical = InvertedIndex.bm25Query(
      IncrementalIndex.currentPostings(spark, idxRoot), n, avgDl,
      Seq("data", "model"), 10)
    val semantic = IncrementalIvf.searchActive(spark, s"$base/ann",
        probe, 10, 2)
      .select(col("vec_id").as("doc_id"), col("sim").as("score"))
    val expect = HybridSearch.rrf(Seq(lexical, semantic), "doc_id", 10)
      .collect().map(_.toString).toSeq
    assert(got === expect && got.nonEmpty)
    // and the maintained lexical leg really is the full-rebuild BM25
    val full = InvertedIndex.build(docs, "doc_id", "text")
    val fullLex = InvertedIndex.bm25Query(full, n, avgDl,
      Seq("data", "model"), 10).collect().map(_.toString).toSeq
    assert(lexical.collect().map(_.toString).toSeq === fullLex)
  }

  test("coded (IVFADC) roots serve the hybrid semantic leg via ADC + rerank") {
    import graft.operators.{IncrementalIndex, IncrementalIvf}
    import graft.sources.Tables
    val base = java.nio.file.Files
      .createTempDirectory("graft-msearch-coded").toString
    val docs = Tables.documents(spark, SparkTestBase.sf0001)
      .select("doc_id", "text")
    val emb = Tables.embeddings(spark, SparkTestBase.sf0001)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("e"))
    IncrementalIndex.initializeAliased(spark, s"$base/idx")
    IncrementalIndex.applyBatchActive(spark, s"$base/idx",
      docs.withColumn("op", lit("I")), 0L)
    // the SAME vectors behind a coded root and a plain root: with the
    // rerank pool covering every probed-cell member, the ADC shortlist
    // + exact rerank must reproduce the plain root's exact leg, so the
    // FUSED answers agree (the done-criterion for the coded hybrid)
    IncrementalIvf.initializeCodedAliased(spark, emb, s"$base/coded",
      k = 4, iters = 2)
    IncrementalIvf.initializeAliased(spark, emb, s"$base/plain",
      k = 4, iters = 2)
    val probe = emb.filter(col("vec_id") === 3L)
      .head.getSeq[Double](1).toSeq
    val got = HybridSearch.searchMaintained(spark, s"$base/idx",
        s"$base/coded", Seq("data", "model"), probe, k = 10, nprobe = 2,
        vectors = Some(emb), rerankPool = 1000000)
      .collect().map(_.toString).toSeq
    val expect = HybridSearch.searchMaintained(spark, s"$base/idx",
        s"$base/plain", Seq("data", "model"), probe, k = 10, nprobe = 2)
      .collect().map(_.toString).toSeq
    assert(got === expect && got.nonEmpty,
      "a coded root at rerank pool >= cell population must fuse " +
        "identically to the plain root")
    // the PRODUCTION store shape — a bucketed-zone HANDLE — fuses
    // identically too (searchAdcRerankStore's I/O pruning is pinned in
    // IncrementalIvfSpec; here we pin that the hybrid path threads it)
    import graft.streaming.UpsertFileSink
    import org.apache.spark.sql.types._
    val vzone = s"$base/vzone"
    UpsertFileSink.upsertBatchBucketed(
      emb.withColumn("op", lit("U")).withColumn("seq", lit(0L)),
      0L, vzone, Seq("vec_id"), 8)
    val handle = UpsertFileSink.BucketedStore(vzone,
      StructType(Seq(StructField("vec_id", LongType),
        StructField("e", ArrayType(DoubleType)))),
      keyCols = Seq("vec_id"))
    val viaHandle = HybridSearch.searchMaintained(spark, s"$base/idx",
        s"$base/coded", Seq("data", "model"), probe, k = 10, nprobe = 2,
        rerankPool = 1000000, vectorStore = Some(handle))
      .collect().map(_.toString).toSeq
    assert(viaHandle === expect,
      "the bucketed-handle rerank must fuse identically to the frame")
    // a coded root without the external store fails LOUD — silently
    // serving raw ADC scores as the semantic leg would skew the fusion
    val e = intercept[IllegalArgumentException] {
      HybridSearch.searchMaintained(spark, s"$base/idx", s"$base/coded",
        Seq("data", "model"), probe, k = 10, nprobe = 2)
    }
    assert(e.getMessage.contains("coded"))
    Materialize.releaseAll()
  }

  test("searchMaintainedBatch: row-equal to per-probe searchMaintained, O(1) jobs in |probes|") {
    import graft.operators.{IncrementalIndex, IncrementalIvf}
    import graft.sources.Tables
    import graft.streaming.UpsertFileSink
    import org.apache.spark.sql.types._
    val base = java.nio.file.Files
      .createTempDirectory("graft-msearch-batch").toString
    val docs = Tables.documents(spark, SparkTestBase.sf0001)
      .select("doc_id", "text")
    val emb = Tables.embeddings(spark, SparkTestBase.sf0001)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("e"))
    IncrementalIndex.applyBatch(spark, s"$base/idx",
      docs.withColumn("op", lit("I")), 0L)
    IncrementalIvf.initialize(spark, emb, s"$base/ivf", k = 4, iters = 2)
    IncrementalIvf.initializeCoded(spark, emb, s"$base/coded",
      k = 4, iters = 2, m = 2, ksub = 4, pqIters = 2)
    val vzone = s"$base/vzone"
    UpsertFileSink.upsertBatchBucketed(
      emb.withColumn("op", lit("U")).withColumn("seq", lit(0L)),
      0L, vzone, Seq("vec_id"), 8)
    val handle = UpsertFileSink.BucketedStore(vzone,
      StructType(Seq(StructField("vec_id", LongType),
        StructField("e", ArrayType(DoubleType)))),
      keyCols = Seq("vec_id"))

    val termsOf = Map(2L -> Seq("data", "model"),
      3L -> Seq("filter", "window"), 5L -> Seq("data", "window"),
      7L -> Seq("model", "model", "data"), 11L -> Seq("window"),
      13L -> Seq("filter", "data"))
    val pids = termsOf.keys.toSeq.sorted
    val embOf = emb.filter(col("vec_id").isin(pids: _*))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toSeq).toMap
    import spark.implicits._
    def probesOf(ids: Seq[Long]) =
      ids.map(i => (i, termsOf(i), embOf(i)))
        .toDF("probe_id", "terms", "e")

    def norm(rows: Array[org.apache.spark.sql.Row], offset: Int)
        : Map[Long, Seq[(Long, Double, Long)]] =
      rows.map(r => (r.getLong(0), r.getLong(offset),
          BigDecimal(r.getDouble(offset + 1))
            .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble,
          r.getLong(offset + 2)))
        .groupBy(_._1)
        .map { case (p, rs) =>
          p -> rs.map(t => (t._2, t._3, t._4))
            .sortBy(t => (-t._2, t._1)).toSeq
        }

    // PLAIN root: batch == per-probe, probe by probe
    val batchPlain = norm(HybridSearch.searchMaintainedBatch(spark,
      s"$base/idx", s"$base/ivf", probesOf(pids), k = 8, nprobe = 2)
      .collect(), 1)
    pids.foreach { p =>
      val per = HybridSearch.searchMaintained(spark, s"$base/idx",
          s"$base/ivf", termsOf(p), embOf(p), k = 8, nprobe = 2)
        .collect().map(r => (r.getLong(0),
          BigDecimal(r.getDouble(1))
            .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble,
          r.getLong(2))).toSeq
      assert(batchPlain(p) === per && per.nonEmpty,
        s"plain-root batch answer for probe $p must equal per-probe")
    }

    // CODED root through the bucketed handle: batch == per-probe
    val batchCoded = norm(HybridSearch.searchMaintainedBatch(spark,
      s"$base/idx", s"$base/coded", probesOf(pids), k = 8, nprobe = 2,
      rerankPool = 40, vectorStore = Some(handle))
      .collect(), 1)
    pids.foreach { p =>
      val per = HybridSearch.searchMaintained(spark, s"$base/idx",
          s"$base/coded", termsOf(p), embOf(p), k = 8, nprobe = 2,
          rerankPool = 40, vectorStore = Some(handle))
        .collect().map(r => (r.getLong(0),
          BigDecimal(r.getDouble(1))
            .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble,
          r.getLong(2))).toSeq
      assert(batchCoded(p) === per && per.nonEmpty,
        s"coded-root batch answer for probe $p must equal per-probe")
    }
    // a coded root without the handle fails LOUD on the batch path
    val e = intercept[IllegalArgumentException] {
      HybridSearch.searchMaintainedBatch(spark, s"$base/idx",
        s"$base/coded", probesOf(pids), k = 8, nprobe = 2)
    }
    assert(e.getMessage.contains("vectorStore"))
    Materialize.releaseAll()

    // THE SCALE PIN: job count is O(1) in |probes| — tripling the
    // probe set must not add jobs beyond plan noise (the per-probe
    // path pays its full job chain per probe)
    def countJobs(body: => Unit): Int = {
      val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
      val l = new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          jobs.incrementAndGet(); ()
        }
      }
      spark.sparkContext.addSparkListener(l)
      try body finally {
        Thread.sleep(400)
        spark.sparkContext.removeSparkListener(l)
      }
      jobs.get()
    }
    val j2 = countJobs {
      HybridSearch.searchMaintainedBatch(spark, s"$base/idx",
        s"$base/ivf", probesOf(pids.take(2)), k = 8, nprobe = 2).collect()
      Materialize.releaseAll()
    }
    val j6 = countJobs {
      HybridSearch.searchMaintainedBatch(spark, s"$base/idx",
        s"$base/ivf", probesOf(pids), k = 8, nprobe = 2).collect()
      Materialize.releaseAll()
    }
    assert(j6 <= j2 + 2,
      s"3x the probes must not grow the job count: $j2 -> $j6")
  }

  test("searchMaintainedAsOf answers what a head at that batch answered, and is horizon-bounded") {
    import graft.operators.{IncrementalIndex, IncrementalIvf}
    import graft.sources.Tables
    val base = java.nio.file.Files
      .createTempDirectory("graft-msearch-asof").toString
    val docs = Tables.documents(spark, SparkTestBase.sf0001)
      .select("doc_id", "text")
    val emb = Tables.embeddings(spark, SparkTestBase.sf0001)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("e"))
    val firstDocs = docs.filter(col("doc_id") % 2 === 0)
    val firstEmb = emb.filter(col("vec_id") % 2 === 0)

    // the composed pipeline's shape: ONE feed drives both stores with
    // the same batch ids — batch 0 = the even half, batch 1 = the rest
    IncrementalIndex.applyBatch(spark, s"$base/idx",
      firstDocs.withColumn("op", lit("I")), 0L)
    IncrementalIvf.initialize(spark, firstEmb, s"$base/ivf",
      k = 4, iters = 2)
    IncrementalIndex.applyBatch(spark, s"$base/idx",
      docs.filter(col("doc_id") % 2 === 1).withColumn("op", lit("I")), 1L)
    IncrementalIvf.applyBatch(spark, s"$base/ivf",
      emb.filter(col("vec_id") % 2 === 1).withColumn("op", lit("I")), 1L)

    // TWIN stores that only ever saw batch 0 — the as-of answer must
    // equal the twins' LIVE answer (both legs time-travel coherently).
    // The twin IVF shares the FROZEN quantizer (copy the centroids
    // before any assignment — a re-trained quantizer would partition
    // the space differently and the comparison would test k-means
    // determinism, not time travel)
    IncrementalIndex.applyBatch(spark, s"$base/idx0",
      firstDocs.withColumn("op", lit("I")), 0L)
    val f = new org.apache.hadoop.fs.Path(base)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    org.apache.hadoop.fs.FileUtil.copy(
      f, new org.apache.hadoop.fs.Path(s"$base/ivf/centroids"),
      f, new org.apache.hadoop.fs.Path(s"$base/ivf0/centroids"),
      false, spark.sparkContext.hadoopConfiguration)
    IncrementalIvf.applyBatch(spark, s"$base/ivf0",
      firstEmb.withColumn("op", lit("I")), 0L)

    val probe = emb.filter(col("vec_id") === 2L).head.getSeq[Double](1).toSeq
    val asOfAns = HybridSearch.searchMaintainedAsOf(spark, s"$base/idx",
        s"$base/ivf", Seq("data", "model"), probe, k = 10, asOf = 0L,
        nprobe = 2)
      .collect().map(_.toString).toSeq
    val twinAns = HybridSearch.searchMaintained(spark, s"$base/idx0",
        s"$base/ivf0", Seq("data", "model"), probe, k = 10, nprobe = 2)
      .collect().map(_.toString).toSeq
    assert(asOfAns === twinAns && asOfAns.nonEmpty,
      "the composed as-of view must equal a head frozen at that batch")
    // and asOf at the live head answers the live view
    val liveAns = HybridSearch.searchMaintained(spark, s"$base/idx",
        s"$base/ivf", Seq("data", "model"), probe, k = 10, nprobe = 2)
      .collect().map(_.toString).toSeq
    val asOfHead = HybridSearch.searchMaintainedAsOf(spark, s"$base/idx",
        s"$base/ivf", Seq("data", "model"), probe, k = 10, asOf = 1L,
        nprobe = 2)
      .collect().map(_.toString).toSeq
    assert(asOfHead === liveAns)

    // a view folded away by compaction fails LOUDLY on the composed
    // path too — never a silently partial leg
    IncrementalIndex.compact(spark, s"$base/idx", 1L)
    val e = intercept[IllegalArgumentException] {
      HybridSearch.searchMaintainedAsOf(spark, s"$base/idx",
        s"$base/ivf", Seq("data", "model"), probe, k = 10, asOf = 0L,
        nprobe = 2).collect()
    }
    assert(e.getMessage.contains("folded away") ||
      e.getMessage.contains("horizon"))
    Materialize.releaseAll()
  }
}
