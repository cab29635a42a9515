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
