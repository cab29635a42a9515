package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.CorpusPipeline

/** The composed curation pipeline: stage accounting is monotone and
  * consistent with the corpus output, the survivors are genuinely
  * deduplicated and quality-clean, the language/split tags match the
  * contract operators' own answers, and the whole thing is
  * deterministic.
  */
class CorpusPipelineSpec extends AnyFunSuite {
  import SparkTestBase._

  private lazy val curated = {
    val (corpus, report) = CorpusPipeline.curate(spark, sf0001)
    val c = corpus.collect().toSeq
    val r = report.collect().toSeq.map(x =>
      (x.getString(0), x.getLong(1), x.getLong(2)))
    Materialize.releaseAll()
    (c, r)
  }

  test("stage accounting is monotone and sums drops to the input count") {
    val (corpus, report) = curated
    val remaining = report.map(_._2)
    assert(remaining === remaining.sorted.reverse, s"not monotone: $report")
    assert(report.head._2 > 0 && remaining.last > 0)
    val total = report.head._2
    assert(total === remaining.last + report.map(_._3).sum)
    // the corpus IS the final stage's survivors
    assert(corpus.size.toLong === remaining.last)
  }

  test("survivors are dedup-clean and inside the quality bands") {
    val (corpus, _) = curated
    val ids = corpus.map(_.getLong(0))
    assert(ids.distinct.size === ids.size)
    // re-derive the survivor checks from the raw table
    val byId = spark.read.parquet(s"$sf0001/documents.parquet")
      .select(col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val texts = ids.map(byId)
    assert(texts.distinct.size === texts.size) // no two survivors share text
    corpus.foreach { r =>
      val n = r.getLong(3)
      assert(n >= 20 && n <= 90, s"doc ${r.getLong(0)} out of band: $n")
    }
  }

  test("tags agree with the contract operators that define them") {
    val (corpus, _) = curated
    // split shares: q_sample_split's thresholds target ~80/10/10
    val shares = corpus.groupBy(_.getString(4)).view.mapValues(_.size).toMap
    val n = corpus.size.toDouble
    assert(shares("train") / n > 0.6 && shares("train") / n < 0.95)
    assert(shares.getOrElse("val", 0) + shares.getOrElse("test", 0) > 0)
    // language argmax reproduces q_text_langid's verdict for survivors:
    // both sides use the same marker lexicon, so the prediction for any
    // surviving doc must match the confusion matrix's row for its lang
    val pred = corpus.groupBy(r => (r.getString(1), r.getString(2)))
      .view.mapValues(_.size.toLong).toMap
    assert(pred.nonEmpty && pred.keys.map(_._2).forall(
      Set("en", "es", "de", "fr", "zh")))
  }

  test("the pipeline is deterministic across runs") {
    def run(): (Seq[String], Seq[String]) = {
      val (c, r) = CorpusPipeline.curate(spark, sf0001)
      val out = (c.collect().toSeq.map(_.toString),
        r.collect().toSeq.map(_.toString))
      Materialize.releaseAll()
      out
    }
    assert(run() === run())
  }

  test("curateLearned: learned stage composes onto the same dedup cascade") {
    val (corpusDf, reportDf, _) = graft.operators.CorpusPipeline
      .curateLearned(spark, sf0001, tau = 0.5)
    val corpus = corpusDf.collect().toSeq
    val report = reportDf.collect().toSeq.map(x =>
      (x.getString(0), x.getLong(1), x.getLong(2)))
    Materialize.releaseAll()

    // the dedup prefix (stages 00-03) is BYTE-identical to the
    // heuristic pipeline's — only the final quality stage differs
    val (_, heuristicReport) = curated
    assert(report.take(4) === heuristicReport.take(4),
      "learned curation must not perturb the dedup cascade")
    assert(report(4)._1.startsWith("04_learned_quality"))

    // same accounting invariants as the heuristic report
    val remaining = report.map(_._2)
    assert(remaining === remaining.sorted.reverse)
    assert(report.head._2 === remaining.last + report.map(_._3).sum)
    assert(corpus.size.toLong === remaining.last && corpus.nonEmpty)

    // every survivor really clears the threshold, carries the score
    corpus.foreach { r =>
      val sc = r.getDouble(r.fieldIndex("quality_score"))
      assert(sc >= 0.5 && sc <= 1.0, s"doc ${r.getLong(0)} score $sc")
    }

    // deterministic end to end: fixed maxIter, hash features, no RNG
    val (c2, r2, _) = graft.operators.CorpusPipeline
      .curateLearned(spark, sf0001, tau = 0.5)
    val again = (c2.collect().toSeq.map(_.toString),
      r2.collect().toSeq.map(x =>
        (x.getString(0), x.getLong(1), x.getLong(2))))
    Materialize.releaseAll()
    assert(again._1 === corpus.map(_.toString))
    assert(again._2 === report)
  }

  test("curateLearned with an eval set appends the decontamination stage") {
    import spark.implicits._
    // take a doc the learned pipeline KEEPS and make a 5-gram of its
    // text the "benchmark" — the composed scrub must drop exactly the
    // docs sharing that span, with the accounting row to prove it
    val (baseCorpus, baseReport, _) = graft.operators.CorpusPipeline
      .curateLearned(spark, sf0001, tau = 0.5)
    val keptIds = baseCorpus.select("doc_id").collect()
      .map(_.getLong(0)).toSet
    Materialize.releaseAll()
    val someKept = keptIds.min
    val text = spark.read.parquet(s"$sf0001/documents.parquet")
      .filter(col("doc_id") === someKept)
      .select("text").head.getString(0)
    val evalDoc = text.split(" ").filter(_.nonEmpty).take(5).mkString(" ")
    val evalSet = Seq((999999L, evalDoc)).toDF("doc_id", "text")

    val (corpus, report, _) = graft.operators.CorpusPipeline
      .curateLearned(spark, sf0001, tau = 0.5,
        evalSet = Some(evalSet), deconW = 5)
    val kept2 = corpus.select("doc_id").collect().map(_.getLong(0)).toSet
    val rep = report.collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2)))
    Materialize.releaseAll()

    assert(rep.map(_._1).last === "05_decontaminate_w5")
    assert(rep.length === 6)
    // accounting: drops sum, monotone, corpus == final stage
    val remaining = rep.map(_._2)
    assert(remaining === remaining.sorted.reverse)
    assert(rep.head._2 === remaining.last + rep.map(_._3).sum)
    assert(kept2.size.toLong === remaining.last)
    // the probe doc is gone, the scrub only removed docs (no additions)
    assert(!kept2.contains(someKept))
    assert(kept2.subsetOf(keptIds))
    // stages 00-04 are byte-identical to the undecontaminated run
    assert(rep.take(5).toSeq === baseReport.collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2))).toSeq)
    Materialize.releaseAll()
  }

  test("paretoKeep: deterministic, score-monotone importance keep") {
    import spark.implicits._
    // scores spread over (0,1); ids fixed → draws fixed
    val scored = (1L to 2000L).map(i => (i, (i % 100) / 100.0 + 0.005))
      .toDF("doc_id", "quality_score")
    // alpha=2 (not the GPT-3 default 9) so the low-score keep
    // probability (2−s)^(−α) ≈ 0.28 is large enough for a 500-doc
    // fixture to realize some keeps — at α=9 it is ~0.3% and a zero
    // draw is the EXPECTED outcome, not a bug
    val kept = graft.operators.CorpusPipeline
      .paretoKeep(scored, "doc_id", "quality_score", alpha = 2.0, seed = 7L)
    val ids = kept.select("doc_id").collect().map(_.getLong(0)).toSet
    val ids2 = graft.operators.CorpusPipeline
      .paretoKeep(scored.repartition(13), "doc_id", "quality_score",
        alpha = 2.0, seed = 7L)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids === ids2, "keep set must not depend on partitioning")
    // keep rate is monotone in score: top-score quartile keeps far more
    // than the bottom quartile (the recipe TILTS, never excises)
    val byScore = scored.collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    val hi = byScore.filter(_._2 > 0.75).map(_._1)
    val lo = byScore.filter(_._2 < 0.25).map(_._1)
    val hiRate = hi.count(ids).toDouble / hi.length
    val loRate = lo.count(ids).toDouble / lo.length
    assert(hiRate > loRate + 0.2, s"hi=$hiRate lo=$loRate")
    assert(loRate > 0.0, "low scores must retain a nonzero chance")
  }

  test("tokenizeAndShard: curated corpus to exact training shards") {
    val (shards, model) = CorpusPipeline.tokenizeAndShard(
      spark, sf0001, numMerges = 40, seqLen = 256)
    val rows = shards.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getSeq[Int](2)))
    Materialize.releaseAll()
    assert(model.merges.length === 40)
    val eos = model.vocabIds.size

    val bySplit = rows.groupBy(_._1)
    assert(bySplit.keySet === Set("train", "val", "test"))
    bySplit.foreach { case (sp, chunks) =>
      // per split: consecutive seq_ids, every chunk but the tail full
      val ordered = chunks.sortBy(_._2)
      assert(ordered.map(_._2).toSeq === (0L until ordered.length),
        s"$sp seq_ids")
      ordered.init.foreach { case (_, _, ids) =>
        assert(ids.length === 256, s"$sp has a short non-tail chunk")
      }
      // every id is in-vocabulary or the EOS sentinel
      assert(ordered.flatMap(_._3).forall(id => id >= 0 && id <= eos))
    }

    // EOS count == surviving doc count, split by split (no doc lost
    // between curation and sharding)
    val (corpus, _) = CorpusPipeline.curate(spark, sf0001)
    val docCounts = corpus.collect()
      .groupBy(_.getString(4)).view.mapValues(_.length.toLong).toMap
    Materialize.releaseAll()
    bySplit.foreach { case (sp, chunks) =>
      assert(chunks.flatMap(_._3).count(_ === eos) ===
        docCounts.getOrElse(sp, 0L), s"$sp EOS count")
    }
  }

  test("writeEpochShards: trainer-ready epoch files, permuted + conserved") {
    import org.apache.spark.sql.functions._
    val root = java.nio.file.Files
      .createTempDirectory("graft-epoch-shards").toString
    val (model, counts) = CorpusPipeline.writeEpochShards(
      spark, sf0001, numMerges = 30, seqLen = 256, epoch = 1L,
      root, seqsPerFile = 5)
    Materialize.releaseAll()
    assert(counts.keySet === Set("train", "val", "test"))
    assert(counts.values.forall(_ >= 1))

    // the tokenizer artifact decodes with the exact producing model
    val loaded = graft.operators.Bpe.load(spark, s"$root/tokenizer")
    assert(loaded.merges.toSeq === model.merges.toSeq)

    // train split read-back == packShuffled of the same encoded frame
    val (shards, _) = CorpusPipeline.tokenizeAndShard(
      spark, sf0001, numMerges = 30, seqLen = 256)
    val eos = model.vocabIds.size
    val orderFaithful = shards.filter(col("split") === "train")
      .orderBy("seq_id").collect()
      .map(r => r.getSeq[Int](2)).flatten.toSeq
    Materialize.releaseAll()
    val back = spark.read.parquet(s"$root/train").orderBy("seq_id")
      .collect().map(r => r.getSeq[Int](1)).flatten.toSeq
    // same token multiset as the order-faithful pack (a permutation),
    // same EOS count, but a DIFFERENT order (epoch 1 really shuffles)
    assert(back.sorted === orderFaithful.sorted)
    assert(back.count(_ === eos) === orderFaithful.count(_ === eos))
    assert(back !== orderFaithful, "epoch 1 must permute the stream")

    // rerunning the same epoch overwrites with identical bytes
    val (_, counts2) = CorpusPipeline.writeEpochShards(
      spark, sf0001, numMerges = 30, seqLen = 256, epoch = 1L,
      root, seqsPerFile = 5)
    Materialize.releaseAll()
    assert(counts2 === counts)
    val back2 = spark.read.parquet(s"$root/train").orderBy("seq_id")
      .collect().map(r => r.getSeq[Int](1)).flatten.toSeq
    assert(back2 === back)
  }
}
