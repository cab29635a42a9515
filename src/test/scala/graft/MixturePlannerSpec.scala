package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.MixturePlanner

/** Mixture planning must hit its token targets exactly in expectation
  * (inventory × (full epochs + remainder) = target by construction)
  * and deterministically in realization: full epochs are
  * unconditional, the partial pass is a hash-uniform draw, and a
  * domain whose target is a whole number of epochs is EXACT.
  */
class MixturePlannerSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  // web: 2000 docs × 10 toks (undersampled at weight .5)
  // books: 200 × 10 (2.5 epochs), code: 500 × 10 (exactly 1 epoch)
  private def docs: DataFrame = {
    import spark.implicits._
    ((1L to 2000L).map(i => (i, "web", 10L)) ++
      (3001L to 3200L).map(i => (i, "books", 10L)) ++
      (4001L to 4500L).map(i => (i, "code", 10L)))
      .toDF("doc_id", "domain", "n_toks")
  }
  private val weights = Map("web" -> 0.5, "books" -> 0.25, "code" -> 0.25)
  private val budget = 20000L

  private def thePlan =
    MixturePlanner.planFromDocs(spark, docs, "domain", "n_toks",
      weights, budget)

  test("plan arithmetic: targets, epochs, remainder fractions") {
    val p = thePlan.collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5))).toMap
    assert(p("web") === ((0.5, 20000L, 10000L, 0L, 0.5)))
    assert(p("books") === ((0.25, 2000L, 5000L, 2L, 0.5)))
    assert(p("code") === ((0.25, 5000L, 5000L, 1L, 0.0)))
  }

  test("materialize: exact epochs exact, partial passes concentrated") {
    val m = MixturePlanner.materialize(docs, thePlan,
      "doc_id", "domain", "n_toks", seed = 7L).cache()
    try {
      // code hits a whole epoch: every doc exactly once, zero error
      val code = m.filter(col("domain") === "code")
        .groupBy("doc_id").count().select("count").distinct().collect()
      assert(code.map(_.getLong(0)).toSeq === Seq(1L))
      // books: epochs 0 and 1 unconditional, epoch 2 a ~half draw
      val books = m.filter(col("domain") === "books")
      assert(books.filter(col("epoch") === 0).count() === 200L)
      assert(books.filter(col("epoch") === 1).count() === 200L)
      val partial = books.filter(col("epoch") === 2).count()
      assert(partial > 60L && partial < 140L, s"books partial: $partial")
      // no (doc, epoch) pair is ever emitted twice
      assert(m.count() === m.dropDuplicates(Seq("doc_id", "epoch")).count())
      // realized token mass lands near target for every domain
      val acc = MixturePlanner.account(m, thePlan).collect()
        .map(r => r.getString(0) -> (r.getLong(3), r.getLong(4),
          r.getDouble(5))).toMap
      assert(acc("code")._3 === 0.0)
      acc.foreach { case (d, (realized, target, err)) =>
        assert(err < 0.07, s"$d realized $realized vs $target (err $err)")
      }
    } finally m.unpersist(blocking = false)
  }

  test("materialization is deterministic and partitioning-invariant") {
    def rows(d: DataFrame) = MixturePlanner
      .materialize(d, thePlan, "doc_id", "domain", "n_toks", seed = 7L)
      .collect().map(_.toString).sorted.toSeq
    val a = rows(docs)
    assert(a === rows(docs))
    assert(a === rows(docs.repartition(13)))
    // a different seed draws a different partial pass
    val b = MixturePlanner
      .materialize(docs, thePlan, "doc_id", "domain", "n_toks", seed = 8L)
      .collect().map(_.toString).sorted.toSeq
    assert(a !== b)
  }

  test("expandTokens feeds the packer with exact token conservation") {
    import graft.operators.Packing
    val tokens = docs.select(col("doc_id"),
      expr("sequence(1, cast(n_toks as int))").as("ids"))
    val m = MixturePlanner.materialize(docs, thePlan,
      "doc_id", "domain", "n_toks", seed = 7L).cache()
    try {
      val expanded = MixturePlanner.expandTokens(m, tokens, "doc_id", "ids")
      assert(expanded.count() === m.count(),
        "one token row per emitted (doc, epoch) occurrence")
      val packed = Packing.packShuffled(expanded, "occ_id", "ids",
        seqLen = 128, eosId = 0, epoch = 0L)
      val packedMass = packed.agg(sum("n_tokens")).head.getLong(0)
      val manifestMass = m.agg(sum("n_toks")).head.getLong(0)
      // packing conserves the stream exactly: every occurrence's
      // tokens plus its one EOS land in some chunk
      assert(packedMass === manifestMass + m.count())
    } finally m.unpersist(blocking = false)
  }

  test("writeMixedEpochShards: budgeted train stream, unmixed val/test") {
    import graft.operators.CorpusPipeline
    val out = java.nio.file.Files
      .createTempDirectory("graft-mixshards").toString
    val (_, acct, counts) = CorpusPipeline.writeMixedEpochShards(
      spark, SparkTestBase.sf0001, numMerges = 50, seqLen = 64,
      epoch = 0L, out, seqsPerFile = 8,
      weights = Map("src0" -> 0.5, "src1" -> 0.5),
      budgetTokens = 6000L, seed = 3L)
    val rows = acct.collect()
      .map(r => r.getString(0) -> (r.getLong(3), r.getLong(4),
        r.getDouble(5))).toMap
    Materialize.releaseAll()
    // both sources land near their 3000-token targets (repeats needed:
    // each source's curated train split holds ~1000-1500 BPE tokens)
    assert(rows.keySet === Set("src0", "src1"))
    rows.foreach { case (d, (realized, target, err)) =>
      assert(target === 3000L && err < 0.2,
        s"$d realized $realized vs $target")
    }
    assert(counts("train") > 0 && counts("val") > 0 && counts("test") > 0)
    // the packed train stream holds roughly the budget (+ EOS mass)
    val packedMass = spark.read.parquet(s"$out/train")
      .agg(sum("n_tokens")).head.getLong(0)
    assert(packedMass > 5000L && packedMass < 8000L, s"mass $packedMass")
  }

  test("degenerate inputs are rejected or dropped") {
    import spark.implicits._
    intercept[IllegalArgumentException] {
      MixturePlanner.plan(spark,
        Seq(("web", 10L)).toDF("domain", "avail_tokens"),
        Map("web" -> 0.0), 100L)
    }
    // an UNWEIGHTED domain (junk) just doesn't participate; but a
    // WEIGHTED domain with no usable inventory fails loud — a typo'd
    // source name would otherwise silently forfeit its budget share
    val stats = Seq(("web", 10L), ("empty", 0L), ("junk", 5L))
      .toDF("domain", "avail_tokens")
    val p = MixturePlanner.plan(spark, stats, Map("web" -> 1.0), 100L)
      .select("domain").collect().map(_.getString(0)).toSet
    assert(p === Set("web"))
    intercept[IllegalArgumentException] {
      MixturePlanner.plan(spark, stats,
        Map("web" -> 1.0, "empty" -> 1.0), 100L)
    }
    intercept[IllegalArgumentException] {
      MixturePlanner.plan(spark, stats,
        Map("web" -> 1.0, "wbe" -> 1.0), 100L)
    }
    // an absurd repetition (huge budget over a tiny inventory, where a
    // 32-bit epoch count would overflow negative and explode a
    // descending sequence) is rejected before any explode runs
    val tiny = Seq((1L, "web", 10L)).toDF("doc_id", "domain", "n_toks")
    val absurd = MixturePlanner.planFromDocs(spark, tiny, "domain",
      "n_toks", Map("web" -> 1.0), 100_000_000_000L)
    assert(absurd.select("full_epochs").head.getLong(0) === 10_000_000_000L)
    intercept[IllegalArgumentException] {
      MixturePlanner.materialize(tiny, absurd, "doc_id", "domain",
        "n_toks", seed = 1L)
    }
  }
}
