package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Decontaminate

/** Decontamination exactness on crafted corpora: hand-computed hit and
  * covered-token counts (incl. overlapping spans whose interval union
  * must not double-count), a brute-force n-gram-set cross-check, the
  * published drop-any-hit scrub, tolerance behavior, and partitioning
  * invariance.
  */
class DecontaminateSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private val W = 5 // small w keeps fixtures readable; 13 is just a knob

  // an "eval benchmark" of two short passages
  private val evalDocs = Seq(
    (900L, "alpha bravo charlie delta echo foxtrot"),      // 6 toks, 2 spans
    (901L, "golf hotel india juliet kilo"))                 // 5 toks, 1 span

  // training docs:
  //  1: clean
  //  2: embeds eval 901's full 5-gram once
  //  3: embeds eval 900's first span twice (overlap via the 6-token
  //     passage → spans at offsets o and o+1 — union must count 6, not 10)
  //  4: shorter than w → structurally clean
  private val trainDocs = Seq(
    (1L, "one two three four five six seven eight"),
    (2L, "intro words golf hotel india juliet kilo outro tail"),
    (3L, "x alpha bravo charlie delta echo foxtrot y z"),
    (4L, "tiny doc here"))

  private def df(rows: Seq[(Long, String)]) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  private def ngrams(text: String, w: Int): Set[Seq[String]] =
    text.split(" ").filter(_.nonEmpty).sliding(w).filter(_.size == w)
      .map(_.toSeq).toSet

  test("report matches hand counts and a brute-force n-gram intersection") {
    val rep = Decontaminate.report(df(trainDocs), df(evalDocs),
      "doc_id", "text", w = W)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4))).toMap

    // hand counts
    assert(rep(1L) === ((8L, 0L, 0L, 0.0)))
    assert(rep(2L) === ((9L, 1L, 5L, round4(5.0 / 9))))
    // doc 3: eval 900 contributes spans at offsets 1 and 2 → 2 hits,
    // interval union [1,6) ∪ [2,7) = 6 tokens of 9
    assert(rep(3L) === ((9L, 2L, 6L, round4(6.0 / 9))))
    assert(rep(4L) === ((3L, 0L, 0L, 0.0)))

    // brute force: a doc has hits iff its n-gram set intersects the
    // eval n-gram union
    val evalGrams = evalDocs.flatMap(d => ngrams(d._2, W)).toSet
    trainDocs.foreach { case (id, text) =>
      val expectHits = ngrams(text, W).intersect(evalGrams).nonEmpty
      assert((rep(id)._2 > 0) === expectHits, s"doc $id")
    }
  }

  private def round4(d: Double) =
    BigDecimal(d).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("clean drops any-hit docs at the published 0.0 tolerance") {
    val kept = Decontaminate.clean(df(trainDocs), df(evalDocs),
      "doc_id", "text", w = W)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept === Set(1L, 4L))
    // a tolerance keeps the lightly-quoting doc but not the
    // mostly-contaminated one
    val tolerant = Decontaminate.clean(df(trainDocs), df(evalDocs),
      "doc_id", "text", w = W, maxFraction = 0.6)
    assert(tolerant.select("doc_id").collect().map(_.getLong(0)).toSet ===
      Set(1L, 2L, 4L))
  }

  test("partitioning and broadcast-mode invariance") {
    val a = Decontaminate.report(df(trainDocs), df(evalDocs),
      "doc_id", "text", w = W)
      .orderBy("doc_id").collect().map(_.toString).toSeq
    val b = Decontaminate.report(df(trainDocs).repartition(7),
      df(evalDocs).repartition(3), "doc_id", "text", w = W)
      .orderBy("doc_id").collect().map(_.toString).toSeq
    val c = Decontaminate.report(df(trainDocs), df(evalDocs),
      "doc_id", "text", w = W, broadcastEval = false)
      .orderBy("doc_id").collect().map(_.toString).toSeq
    assert(a === b && a === c)
  }

  test("the corpus side never shuffles under the broadcast semi-join") {
    val plan = Decontaminate.report(df(trainDocs), df(evalDocs),
        "doc_id", "text", w = W)
      .queryExecution.executedPlan
    val exchanges = plan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => e
    }
    // one shuffle for the per-doc aggregate and one for the final
    // left-outer join on doc_id are inherent; the SPAN STREAM itself
    // (corpus-token-sized) must reach the semi-join broadcast-side
    // only — i.e. no shuffle whose child is the explode
    val explodeShuffles = exchanges.filter(_.collectFirst {
      case g: org.apache.spark.sql.execution.GenerateExec => g
    }.isDefined)
    assert(explodeShuffles.size <= 2,
      s"span stream shuffled more than the agg+join pair:\n$plan")
  }

  test("the any-hit rule is exact — a fraction that rounds to 0.0 still drops") {
    // a 150,000-token doc quoting eval 901's 5-gram once: the DISPLAY
    // fraction rounds to 0.0000 (5/150000), but the published recipe
    // is any-hit-drops — the clean() threshold must compare exact
    // token masses, or precisely the longest docs leak eval data
    val longToks = (0 until 150000).map(i => s"tok$i").toArray
    Array.copy("golf hotel india juliet kilo".split(" "), 0,
      longToks, 70000, 5)
    val longDoc = Seq((7L, longToks.mkString(" ")))

    val rep = Decontaminate.report(df(longDoc), df(evalDocs),
      "doc_id", "text", w = W).head
    assert(rep.getLong(2) === 1L && rep.getDouble(4) === 0.0,
      "fixture must hit the rounding blind spot: one hit, 4-dp zero")
    val kept = Decontaminate.clean(df(longDoc), df(evalDocs),
      "doc_id", "text", w = W)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept.isEmpty, "one hit must drop the doc at tolerance 0.0")
  }
}
