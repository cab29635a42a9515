package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Bpe, Packing}

/** Exactness invariants of GPT-style sequence packing: the chunked
  * stream reproduces the document stream bit-for-bit (no token lost,
  * duplicated, or reordered), chunk sizes are exact, EOS count equals
  * document count, layout is partitioning-invariant, and the plan
  * carries no global sort.
  */
class PackingSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def crafted = Seq(
    (1L, Seq(10, 11, 12)),
    (2L, Seq(20)),
    (3L, Seq(30, 31, 32, 33, 34)),
    (4L, Seq(40, 41))).toDF("doc_id", "token_ids")

  test("crafted stream: exact chunk layout at seqLen=4") {
    // stream (EOS=99): 10 11 12 99 | 20 99 30 31 | 32 33 34 99 | 40 41 99
    val rows = Packing.packTokens(crafted, "doc_id", "token_ids", 4, 99)
      .collect().map(r => (r.getLong(0), r.getSeq[Int](1).toList))
    assert(rows.toList === List(
      0L -> List(10, 11, 12, 99),
      1L -> List(20, 99, 30, 31),
      2L -> List(32, 33, 34, 99),
      3L -> List(40, 41, 99)))
  }

  test("fixture corpus: stream equality, sizes, EOS count, invariance") {
    val model = Bpe.train(spark, SparkTestBase.sf0001, 40)
    val eos = model.vocabIds.size
    val encoded = Bpe.encodeIds(
      sources.Tables.documents(spark, SparkTestBase.sf0001), "text", model)
      .select("doc_id", "token_ids")

    val packed = Packing.packTokens(encoded, "doc_id", "token_ids", 512, eos)
      .collect().map(r => (r.getLong(0), r.getSeq[Int](1)))
    val nDocs = encoded.count()

    // every chunk but the last is exactly seqLen; ids are consecutive
    assert(packed.map(_._1).toSeq === (0L until packed.length))
    packed.init.foreach { case (i, ids) =>
      assert(ids.length === 512, s"chunk $i")
    }

    // the concatenated chunks ARE the concatenated documents (+EOS)
    // in ascending doc_id order — bit-for-bit
    val streamBack = packed.sortBy(_._1).flatMap(_._2).toSeq
    val streamRef = encoded.orderBy("doc_id")
      .collect().flatMap(r => r.getSeq[Int](1) :+ eos).toSeq
    assert(streamBack === streamRef)
    assert(streamBack.count(_ === eos) === nDocs)

    // layout must not depend on input partitioning
    val alt = Packing.packTokens(encoded.repartition(11), "doc_id",
      "token_ids", 512, eos)
      .collect().map(r => (r.getLong(0), r.getSeq[Int](1)))
    assert(alt.toSeq === packed.toSeq)
  }

  test("writeShards: stream-ordered files, no global sort, exact read-back") {
    val model = Bpe.train(spark, SparkTestBase.sf0001, 30)
    val eos = model.vocabIds.size
    val encoded = Bpe.encodeIds(
      sources.Tables.documents(spark, SparkTestBase.sf0001), "text", model)
      .select("doc_id", "token_ids")
    val dir = java.nio.file.Files.createTempDirectory("graft-shards").toString
    val nFiles = Packing.writeShards(encoded, "doc_id", "token_ids",
      256, eos, dir, seqsPerFile = 10)

    val back = spark.read.parquet(dir)
    // read-back equals the sorted pack exactly
    val expect = Packing.packTokens(encoded, "doc_id", "token_ids", 256, eos)
      .collect().map(r => (r.getLong(0), r.getSeq[Int](1)))
    val got = back.orderBy("seq_id")
      .collect().map(r => (r.getLong(0), r.getSeq[Int](1)))
    assert(got.toSeq === expect.toSeq)
    assert(nFiles === (expect.length + 9) / 10)

    // files are stream-ordered: per-file seq_id ranges never overlap
    val ranges = back
      .groupBy(input_file_name().as("f"))
      .agg(min("seq_id").as("lo"), max("seq_id").as("hi"),
        count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    assert(ranges.map(_._3).sum === expect.length)
    ranges.sliding(2).foreach {
      case Array((_, hi1, _), (lo2, _, _)) => assert(hi1 < lo2)
      case _ =>
    }
  }

  test("no global sort in the packing plan (chunks reassemble locally)") {
    val explained = Packing.packTokens(crafted, "doc_id", "token_ids", 4, 99)
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("simple"))
    // the only Sort allowed is the bounded presentation orderBy(seq_id)
    // and PrefixSum's in-bucket windows — no Sort may sit above the
    // corpus-sized exploded token relation, which is everything under
    // the chunk hash aggregate. Assert structurally: the explode feeds
    // an aggregate, not a sort.
    val idx = explained.indexOf("Generate posexplode")
    assert(idx >= 0, s"expected posexplode in:\n$explained")
    val above = explained.substring(0, idx)
    val lastAgg = above.lastIndexOf("HashAggregate")
    val lastSort = above.lastIndexOf("Sort ")
    assert(lastAgg > lastSort || lastSort < 0,
      s"a Sort sits between the token explode and its aggregate:\n$explained")
  }
}
