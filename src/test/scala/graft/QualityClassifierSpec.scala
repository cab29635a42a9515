package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.QualityClassifier

/** Learned quality scoring: the classifier must actually separate the
  * heuristic bands it was weakly supervised by (held-out AUC), stay
  * deterministic across retrains and partitionings, score map-side,
  * and the scalable AUC must equal a brute-force rank computation.
  */
class QualityClassifierSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import SparkTestBase.sf0001

  private lazy val trained = QualityClassifier.trainAndScore(spark, sf0001)

  test("held-out AUC beats chance by a wide margin") {
    val (_, scored) = trained
    val held = scored.filter(col("split") === "heldout")
    assert(held.count() > 50, "held-out set must be non-trivial")
    val a = QualityClassifier.auc(held, "quality_score", "label")
    assert(a > 0.8, s"held-out AUC $a: the classifier failed to learn " +
      "the quality signal")
    // and the score really orders documents: the top half of held-out
    // docs by score must be mostly positive
    val n = held.count()
    val topHalf = held.orderBy(col("quality_score").desc).limit((n / 2).toInt)
    val posShare = topHalf.agg(avg(col("label"))).head.getDouble(0)
    val base = held.agg(avg(col("label"))).head.getDouble(0)
    assert(posShare > base, s"top-half positive share $posShare must beat " +
      s"the base rate $base")
  }

  test("training and scoring are deterministic") {
    val (m1, s1) = QualityClassifier.trainAndScore(spark, sf0001)
    val (m2, _) = QualityClassifier.trainAndScore(spark, sf0001)
    assert(m1.lr.coefficients === m2.lr.coefficients,
      "L-BFGS over a deterministic frame must converge identically")
    assert(m1.lr.intercept === m2.lr.intercept)
    // partitioning invariance of map-side scoring
    val docs = sources.Tables.documents(spark, sf0001)
    val a = QualityClassifier.score(docs, "text", m1)
      .select("doc_id", "quality_score").orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val b = QualityClassifier.score(docs.repartition(13), "text", m1)
      .select("doc_id", "quality_score").orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(a === b)
    // sanity: s1 carries every doc exactly once
    assert(s1.count() === docs.count())
  }

  test("scoring is map-side: no exchange in the plan") {
    val (m, _) = trained
    val plan = QualityClassifier.score(
        sources.Tables.documents(spark, sf0001), "text", m)
      .select("doc_id", "quality_score")
      .queryExecution.executedPlan
    val exchanges = plan.collect {
      case e: org.apache.spark.sql.execution.exchange.Exchange => e
    }
    assert(exchanges.isEmpty, s"quality scoring must not shuffle:\n$plan")
  }

  test("honesty: the learned score carries content signal the bands cannot") {
    // The held-out AUC above is CIRCULAR by construction — the weak
    // labels come from the same heuristic bands the classifier is
    // evaluated against, so a high AUC only proves the bands are
    // learnable. This case pins the NON-circular claim: the hashed
    // token features let the model generalize band membership into
    // content. Build a corpus where vocabulary correlates with the
    // band verdict (in-band docs draw from a clean vocabulary,
    // out-of-band docs from a spam vocabulary), then probe with two
    // docs the bands mislabel IDENTICALLY — both 95 tokens, just past
    // the 90-token band edge, both all-lowercase (same length/alpha
    // features) — one written in the clean vocabulary, one in spam.
    // The bands give both 0; the learned score must order clean above
    // spam, i.e. the classifier adds information beyond the bands.
    import spark.implicits._
    val clean = Vector("the", "quick", "brown", "fox", "jumps", "over",
      "lazy", "river", "stone", "bright", "morning", "quiet", "garden")
    val spam = Vector("buy", "cheap", "click", "winner", "prize", "free",
      "offer", "deal", "casino", "jackpot", "bonus", "claim", "urgent")
    def doc(vocab: Vector[String], n: Int, salt: Int): String =
      (0 until n).map(i => vocab((i * 7 + salt) % vocab.length))
        .mkString(" ")
    val docs = (
      // 200 in-band clean docs (40-60 tokens) → heuristic label 1
      (0 until 200).map(i => (i.toLong, doc(clean, 40 + i % 21, i))) ++
      // 200 out-of-band spam docs (120+ tokens) → heuristic label 0
      (0 until 200).map(i => (1000L + i, doc(spam, 120 + i % 31, i)))
    ).toDF("doc_id", "text")
      .withColumn("label", QualityClassifier.heuristicLabel("text"))
    val model = QualityClassifier.train(docs, "text", "label",
      numFeatures = 1 << 9)

    val probes = Seq(
      (9001L, doc(clean, 95, 3)), // long but high-quality: bands say 0
      (9002L, doc(spam, 95, 3))   // long spam: bands also say 0
    ).toDF("doc_id", "text")
    // the bands really do mislabel both the same way
    val bandVerdicts = probes
      .select(QualityClassifier.heuristicLabel("text")).collect()
      .map(_.getDouble(0)).toSeq
    assert(bandVerdicts === Seq(0.0, 0.0), "probes must sit outside the bands")
    val got = QualityClassifier.score(probes, "text", model)
      .select("doc_id", "quality_score").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got(9001L) > got(9002L),
      s"learned score must order clean (${got(9001L)}) above spam " +
        s"(${got(9002L)}) where the bands see no difference")
  }

  test("save/load roundtrip scores bit-identically") {
    val (m, _) = trained
    val path = java.nio.file.Files
      .createTempDirectory("graft-qc-model").toString + "/model"
    QualityClassifier.save(spark, m, path)
    val loaded = QualityClassifier.load(spark, path)
    assert(loaded.numFeatures === m.numFeatures)
    val docs = sources.Tables.documents(spark, sf0001)
    val a = QualityClassifier.score(docs, "text", m)
      .select("doc_id", "quality_score").orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val b = QualityClassifier.score(docs, "text", loaded)
      .select("doc_id", "quality_score").orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(a === b)
  }

  test("scalable AUC equals the brute-force rank computation") {
    val (_, scored) = trained
    val rows = scored.select("quality_score", "label")
      .collect().map(r => (r.getDouble(0), r.getDouble(1)))
    // brute force: average ranks (ties averaged), AUC from rank sum
    val sorted = rows.sortBy(_._1)
    val ranks = new Array[Double](sorted.length)
    var i = 0
    while (i < sorted.length) {
      var j = i
      while (j < sorted.length && sorted(j)._1 == sorted(i)._1) j += 1
      val avgRank = (i + 1 + j) / 2.0
      (i until j).foreach(k => ranks(k) = avgRank)
      i = j
    }
    val np = sorted.count(_._2 == 1.0)
    val nn = sorted.length - np
    val rp = sorted.zip(ranks).filter(_._1._2 == 1.0).map(_._2).sum
    val ref = (rp - np.toDouble * (np + 1) / 2.0) / (np.toDouble * nn)
    val got = QualityClassifier.auc(scored, "quality_score", "label")
    assert(math.abs(got - ref) < 1e-9, s"got $got, brute force $ref")
  }
}
