package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.ProductQuantizer

/** Product quantization: deterministic builds, the claimed compression
  * shape, and ADC recall against brute-force cosine. No DuckDB oracle
  * by design — quantization error is approximate by construction, so
  * the correct checks are structural + a recall bound (the IvfIndex
  * discipline).
  */
class ProductQuantizerSpec extends AnyFunSuite {
  import SparkTestBase._

  private lazy val model = ProductQuantizer.build(spark, sf0001)

  test("codes are the claimed shape: 8 codes of 4 bits per 64-dim vector") {
    val rows = model.codes
      .select(col("vec_id"), size(col("codes")).as("m"),
        array_min(col("codes")).as("lo"), array_max(col("codes")).as("hi"))
      .collect()
    assert(rows.length === 500)
    rows.foreach { r =>
      assert(r.getAs[Int]("m") === 8)
      assert(r.getAs[Int]("lo") >= 0 && r.getAs[Int]("hi") < 16)
    }
    // the codebook is the tiny broadcastable artifact: 8 × 16 rows
    assert(model.codebook.count() === 128L)
  }

  test("build is deterministic: a rebuild produces identical codes") {
    val again = ProductQuantizer.build(spark, sf0001)
    val a = model.codes.select(col("vec_id"), col("codes").cast("string"))
      .orderBy("vec_id").collect().toSeq
    val b = again.codes.select(col("vec_id"), col("codes").cast("string"))
      .orderBy("vec_id").collect().toSeq
    assert(a === b)
    Materialize.releaseAll()
  }

  test("ADC + exact rerank recall@10 vs brute-force cosine") {
    graft.plans.CosineSimilarity.register(spark)
    val emb = graft.sources.Tables.embeddings(spark, sf0001)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("e"))
    val probe = emb.filter(col("vec_id") === 0)
      .select(col("e").as("q"))
    val exact = emb.filter(col("vec_id") =!= 0)
      .crossJoin(broadcast(probe))
      .select(col("vec_id"), expr("cosine_sim(e, q)").as("sim"))
      .orderBy(col("sim").desc, col("vec_id"))
      .limit(10).select("vec_id").collect().map(_.getLong(0)).toSet
    // the production pipeline: codes-only ADC shortlist (50 of 499)
    // then exact cosine on the shortlist alone. Measured 0.7 on the
    // fixed fixture (raw ADC@10 alone is 0.2 — the 32×-compressed
    // codes are a filter, not a ranker); pinned with headroom for
    // fixture regeneration, and far above chance (10/499 ≈ 0.02).
    val reranked = ProductQuantizer
      .searchRerank(spark, sf0001, model, 0L, 10)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(reranked.size === 10)
    val recall = (exact & reranked).size / 10.0
    assert(recall >= 0.4,
      s"rerank recall@10 = $recall, exact=$exact got=$reranked")
    // the rerank's own ordering is exact cosine, so its top-10 must be
    // exactly the best 10 of its 50-candidate pool — sanity that the
    // exact pass really ran (an ADC-ordered result would differ)
    val pool = ProductQuantizer.searchAdc(spark, sf0001, model, 0L, 50)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val bestOfPool = emb.filter(col("vec_id").isin(pool.toSeq: _*))
      .crossJoin(broadcast(probe))
      .select(col("vec_id"), expr("cosine_sim(e, q)").as("sim"))
      .orderBy(col("sim").desc, col("vec_id"))
      .limit(10).select("vec_id").collect().map(_.getLong(0)).toSet
    assert(reranked === bestOfPool)
    Materialize.releaseAll()
  }

  test("IVFADC composition: cells prune, codes shortlist, rerank is exact") {
    graft.plans.CosineSimilarity.register(spark)
    val ivf = graft.operators.IvfIndex.build(spark, sf0001, 16, 2)
    val got = ProductQuantizer
      .searchIvfAdc(spark, sf0001, model, ivf, 0L, 10)
      .collect()
    assert(got.length === 10)
    // every hit must belong to one of the nprobe=4 probed cells — the
    // cell pruning really bounded the search
    val probeE = ivf.assigned.filter(col("vec_id") === 0)
      .select(col("e").as("p"))
    val probedCells = ivf.centroids.crossJoin(broadcast(probeE))
      .withColumn("cs", expr("cosine_sim(c, p)"))
      .orderBy(col("cs").desc, col("cell"))
      .limit(4).select("cell").collect().map(_.getInt(0)).toSet
    val cellOf = ivf.assigned.select("vec_id", "cell")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    got.foreach { r =>
      assert(probedCells.contains(cellOf(r.getLong(0))))
      // rerank emits EXACT 4-dp cosines, not ADC approximations
      val sim = r.getDouble(1)
      assert(sim >= -1.0 && sim <= 1.0)
    }
    // and within the probed cells the result recalls most of the
    // cell-restricted exact top-10 (IvfIndex.search is that truth)
    val cellExact = graft.operators.IvfIndex
      .search(spark, sf0001, 0L, 10, 16, 2, 4)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val overlap = (cellExact & got.map(_.getLong(0)).toSet).size / 10.0
    assert(overlap >= 0.4, s"IVFADC vs cell-exact overlap = $overlap")
    Materialize.releaseAll()
  }
}
