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

  test("packTokensWithBoundaries: doc starts mark exactly each doc's first token") {
    // stream (EOS=99): 10 11 12 99 | 20 99 30 31 | 32 33 34 99 | 40 41 99
    //   chunk 0: doc1 starts at 0
    //   chunk 1: doc2 starts at 0, doc3 starts at 2 (doc3 spans into 2)
    //   chunk 2: NO start (all doc3's tail) -> empty doc_starts
    //   chunk 3: doc4 starts at 0
    val rows = Packing
      .packTokensWithBoundaries(crafted, "doc_id", "token_ids", 4, 99)
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Int](1).toList, r.getSeq[Int](2).toList))
    assert(rows.toList === List(
      (0L, List(10, 11, 12, 99), List(0)),
      (1L, List(20, 99, 30, 31), List(0, 2)),
      (2L, List(32, 33, 34, 99), List()),
      (3L, List(40, 41, 99), List(0))))

    // fixture-scale invariants: token stream identical to packTokens,
    // starts count == doc count, every start position's token begins a
    // document (cross-checked against cumulative offsets)
    val model = Bpe.train(spark, SparkTestBase.sf0001, 30)
    val eos = model.vocabIds.size
    val encoded = Bpe.encodeIds(
      sources.Tables.documents(spark, SparkTestBase.sf0001), "text", model)
      .select("doc_id", "token_ids")
    val withB = Packing
      .packTokensWithBoundaries(encoded, "doc_id", "token_ids", 512, eos)
      .collect().map(r => (r.getLong(0), r.getSeq[Int](1), r.getSeq[Int](2)))
    val plain = Packing.packTokens(encoded, "doc_id", "token_ids", 512, eos)
      .collect().map(r => (r.getLong(0), r.getSeq[Int](1)))
    assert(withB.map(t => (t._1, t._2)).toSeq === plain.toSeq)
    val nDocs = encoded.count()
    assert(withB.map(_._3.size).sum === nDocs,
      "every document starts exactly once across the chunks")
    // reconstruct global start offsets from (seq_id, in-chunk pos) and
    // compare with the prefix-sum reference
    val gotStarts = withB.flatMap { case (sid, _, ss) =>
      ss.map(p => sid * 512 + p) }.sorted.toSeq
    val lens = encoded.orderBy("doc_id").collect()
      .map(_.getSeq[Int](1).length + 1)
    val refStarts = lens.scanLeft(0L)(_ + _).init.toSeq
    assert(gotStarts === refStarts)
  }

  test("packShuffled: per-epoch determinism, permutation, conservation") {
    val model = Bpe.train(spark, SparkTestBase.sf0001, 40)
    val eos = model.vocabIds.size
    val encoded = Bpe.encodeIds(
      sources.Tables.documents(spark, SparkTestBase.sf0001), "text", model)
      .select("doc_id", "token_ids")

    def run(epoch: Long, parts: Int) =
      Packing.packShuffled(
        if (parts == 0) encoded else encoded.repartition(parts),
        "doc_id", "token_ids", 512, eos, epoch)
        .collect().map(r => (r.getLong(0), r.getSeq[Int](1)))

    val e0 = run(0, 0)
    // per-epoch determinism under ANY partitioning
    assert(run(0, 7).toSeq === e0.toSeq)
    // chunk ids consecutive; all but the tail exactly seqLen
    assert(e0.map(_._1).toSeq === (0L until e0.length))
    e0.init.foreach { case (i, ids) => assert(ids.length === 512, s"chunk $i") }

    // epoch 1 is a DIFFERENT permutation of the SAME token multiset
    // (and the same per-document runs — documents move whole)
    val e1 = run(1, 0)
    val s0 = e0.flatMap(_._2).toSeq
    val s1 = e1.flatMap(_._2).toSeq
    assert(s0 !== s1, "epoch 0 and 1 must order documents differently")
    assert(s0.sorted === s1.sorted, "permutation must conserve tokens")
    assert(s0.count(_ === eos) === s1.count(_ === eos))

    // the shuffled stream is the documents concatenated in ascending
    // (xxhash64(doc_id, epoch), doc_id) order — the epochShuffle key
    val ref = encoded
      .withColumn("k", xxhash64(col("doc_id"), lit(0L)))
      .orderBy("k", "doc_id")
      .collect().flatMap(r => r.getSeq[Int](1) :+ eos).toSeq
    assert(s0 === ref)
  }

  test("writeShardsShuffled: epoch files read back as the shuffled pack") {
    val model = Bpe.train(spark, SparkTestBase.sf0001, 30)
    val eos = model.vocabIds.size
    val encoded = Bpe.encodeIds(
      sources.Tables.documents(spark, SparkTestBase.sf0001), "text", model)
      .select("doc_id", "token_ids")
    val dir = java.nio.file.Files.createTempDirectory("graft-eshards").toString
    val nFiles = Packing.writeShardsShuffled(encoded, "doc_id", "token_ids",
      256, eos, epoch = 3L, dir, seqsPerFile = 10)
    val got = spark.read.parquet(dir).orderBy("seq_id")
      .collect().map(r => (r.getLong(0), r.getSeq[Int](1)))
    val expect = Packing.packShuffled(encoded, "doc_id", "token_ids",
      256, eos, epoch = 3L)
      .collect().map(r => (r.getLong(0), r.getSeq[Int](1)))
    assert(got.toSeq === expect.toSeq)
    assert(nFiles === (expect.length + 9) / 10)

    // trainer shards carry the attention-mask metadata: doc_starts
    // lands with the tokens, one start per document across the files,
    // every start slot holding that document's first token
    val back = spark.read.parquet(dir)
    assert(back.columns.contains("doc_starts"))
    val nStarts = back
      .select(explode(col("doc_starts"))).count()
    assert(nStarts === encoded.count())
  }

  test("no global sort in the packing plan (chunks reassemble locally)") {
    // the only Sort allowed is the bounded presentation orderBy(seq_id)
    // and PrefixSum's in-bucket windows — no Sort may sit above the
    // corpus-sized exploded token relation, which is everything under
    // the chunk hash aggregate. Assert structurally: the explode feeds
    // an aggregate, not a sort. Both pack variants share the shape.
    Seq(
      Packing.packTokens(crafted, "doc_id", "token_ids", 4, 99),
      Packing.packShuffled(crafted, "doc_id", "token_ids", 4, 99, epoch = 2L)
    ).foreach { packed =>
      val explained = packed.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("simple"))
      val idx = explained.indexOf("Generate posexplode")
      assert(idx >= 0, s"expected posexplode in:\n$explained")
      val above = explained.substring(0, idx)
      val lastAgg = above.lastIndexOf("HashAggregate")
      val lastSort = above.lastIndexOf("Sort ")
      assert(lastAgg > lastSort || lastSort < 0,
        s"a Sort sits between the token explode and its aggregate:\n$explained")
    }
  }
}
