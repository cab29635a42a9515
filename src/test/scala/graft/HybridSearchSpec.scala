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
    // a coded root without the external store fails LOUD — silently
    // serving raw ADC scores as the semantic leg would skew the fusion
    val e = intercept[IllegalArgumentException] {
      HybridSearch.searchMaintained(spark, s"$base/idx", s"$base/coded",
        Seq("data", "model"), probe, k = 10, nprobe = 2)
    }
    assert(e.getMessage.contains("coded"))
    Materialize.releaseAll()
  }
}
