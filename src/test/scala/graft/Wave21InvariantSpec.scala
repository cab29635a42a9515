package graft

import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants for the wave-21 queries at sf0.001 — algebraic
  * identities the row-hash oracle gate cannot express (it would pass a
  * query whose oracle shared the same bug). Each test derives the
  * invariant from an INDEPENDENT reading of the fixtures or from the
  * query's own output structure.
  */
class Wave21InvariantSpec extends AnyFunSuite {
  import SparkTestBase._

  private def rows(name: String): Seq[Seq[Any]] =
    try SparkEntry.queries(name)(spark, sf0001).collect().toSeq.map(_.toSeq)
    finally Materialize.releaseAll()

  test("q_assoc_rules: lift is symmetric and confidence recomputes from support") {
    val out = rows("q_assoc_rules")
      .map(r => ((r(0).asInstanceOf[Long], r(1).asInstanceOf[Long]),
        (r(2).asInstanceOf[Long], r(3).asInstanceOf[Double],
          r(4).asInstanceOf[Double]))).toMap
    assert(out.nonEmpty)
    // every directed rule has its mirror, with identical support and
    // lift (lift's formula is symmetric in (a, b); confidence is not)
    out.foreach { case ((a, b), (sup, _, lift)) =>
      val (supM, _, liftM) = out((b, a))
      assert(supM === sup && liftM === lift,
        s"mirror of ($a,$b) disagrees")
    }
    // conf = sup_ab / sup_a against an independent item-support count
    val isup = {
      val df = graft.sources.Tables.lineitem(spark, sf0001)
        .selectExpr("l_orderkey AS o", "l_partkey AS p").distinct()
        .groupBy("p").count().collect()
      df.map(r => r.getLong(0) -> r.getLong(1)).toMap
    }
    out.foreach { case ((a, _), (sup, conf, _)) =>
      // HALF_UP to match both engines' ROUND (math.rint would be
      // half-even and disagrees at exact ties like 5/32)
      val expect = BigDecimal(sup.toDouble / isup(a))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(conf === expect, s"conf of antecedent $a")
    }
  }

  test("q_agg_rfm: segments cover every customer with [1-5]{3} labels") {
    val out = rows("q_agg_rfm")
    val nCust = graft.sources.Tables.orders(spark, sf0001)
      .select("o_custkey").distinct().count()
    assert(out.map(_(1).asInstanceOf[Long]).sum === nCust)
    assert(out.forall(_(0).asInstanceOf[String].matches("[1-5]{3}")))
  }

  test("q_scd2_intervals: runs tile each user's stream exactly") {
    val out = rows("q_scd2_intervals")
      .map(r => (r(0).asInstanceOf[Long], r(1).asInstanceOf[Long],
        r(2).asInstanceOf[String], r(3).asInstanceOf[Long],
        Option(r(4)).map(_.asInstanceOf[Long]), r(5).asInstanceOf[Long]))
    // per user: run indexes are 1..k, consecutive states differ,
    // to_us chains to the next run's from_us with exactly one open tail
    out.groupBy(_._1).foreach { case (u, rs) =>
      val sorted = rs.sortBy(_._2)
      assert(sorted.map(_._2) === (1L to sorted.size).toSeq, s"user $u rn gap")
      sorted.sliding(2).foreach {
        case Seq(a, b) =>
          assert(a._3 !== b._3, s"user $u adjacent runs share a state")
          assert(a._5.contains(b._4), s"user $u interval chain broken")
        case _ => ()
      }
      assert(sorted.last._5.isEmpty, s"user $u open tail missing")
    }
    // run event counts sum to the user's total event count
    val perUser = graft.sources.Tables.events(spark, sf0001)
      .groupBy("user_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    out.groupBy(_._1).foreach { case (u, rs) =>
      assert(rs.map(_._6).sum === perUser(u), s"user $u event count")
    }
  }

  test("q_ml_confusion: matrix totals the corpus and predictions are in label range") {
    val out = rows("q_ml_confusion")
    val emb = graft.sources.Tables.embeddings(spark, sf0001)
    val n = emb.count()
    val labels = emb.select("label").distinct().collect()
      .map(_.getInt(0).toLong).toSet
    assert(out.map(_(2).asInstanceOf[Long]).sum === n)
    assert(out.forall(r => labels.contains(r(1).asInstanceOf[Long])))
  }

  test("q_window_rankchange: each month holds ranks 1..k once; prev ranks in 1..10") {
    val out = rows("q_window_rankchange")
      .map(r => (r(0).asInstanceOf[String], r(2).asInstanceOf[Long],
        Option(r(3)).map(_.asInstanceOf[Long])))
    out.groupBy(_._1).foreach { case (mon, rs) =>
      assert(rs.map(_._2).sorted === (1L to rs.size).toSeq, s"month $mon")
      assert(rs.size <= 10, s"month $mon oversize")
    }
    assert(out.flatMap(_._3).forall(r => r >= 1 && r <= 10))
  }
}
