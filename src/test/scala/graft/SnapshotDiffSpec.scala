package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{ChangeDataCapture, SnapshotDiff}
import graft.sources.Tables

/** Row-level snapshot reconciliation: crafted add/remove/change and
  * null transitions, self-diff emptiness, exact column attribution,
  * the digest-only status join, and the CDC round-trip.
  */
class SnapshotDiffSpec extends AnyFunSuite {
  import SparkTestBase._

  private def crafted = {
    import spark.implicits._
    val old = Seq(
      (1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L),
      (4L, null.asInstanceOf[String], 40L), (5L, "e", 50L))
      .toDF("k", "s", "x")
    val neu = Seq(
      (1L, "a", 10L),              // unchanged
      (2L, "B", 20L),              // s changed
      (3L, "c", 31L),              // x changed
      (4L, "d", 40L),              // null -> value transition
      (6L, "f", 60L))              // added; 5 removed
      .toDF("k", "s", "x")
    (old, neu)
  }

  test("statuses: added/removed/changed, null transitions included") {
    val (old, neu) = crafted
    val got = SnapshotDiff.diff(old, neu, Seq("k")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got === Map(2L -> "changed", 3L -> "changed", 4L -> "changed",
      5L -> "removed", 6L -> "added"))
  }

  test("column attribution names exactly the differing columns") {
    val (old, neu) = crafted
    val got = SnapshotDiff.attributeChanges(old, neu, Seq("k")).collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1).toList).toMap
    assert(got === Map(2L -> List("s"), 3L -> List("x"), 4L -> List("s")))
  }

  test("summary counts statuses and per-column changes") {
    val (old, neu) = crafted
    val got = SnapshotDiff.summary(old, neu, Seq("k")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === Map("added" -> 1L, "removed" -> 1L, "changed" -> 3L,
      "changed:s" -> 2L, "changed:x" -> 1L))
  }

  test("self-diff is empty; the status join moves digests, not payload") {
    val c = Tables.customer(spark, sf0001)
    assert(SnapshotDiff.diff(c, c, Seq("c_custkey")).count() === 0L)
    // the join's inputs carry (key, digest) only — no payload column
    // name appears in the join operator's output schema
    val qe = SnapshotDiff.diff(c, c, Seq("c_custkey")).queryExecution
    val joins = qe.sparkPlan.collect {
      case j: org.apache.spark.sql.execution.joins.BaseJoinExec => j
    }
    assert(joins.nonEmpty)
    joins.foreach { j =>
      val outCols = j.output.map(_.name).toSet
      assert(!outCols.exists(n => n.startsWith("c_") && n != "c_custkey"),
        s"payload columns crossed the status join: $outCols")
    }
  }

  test("diff against a CDC apply recovers the changelog's net effect") {
    import spark.implicits._
    val base = Tables.customer(spark, sf0001)
      .select(col("c_custkey").as("key"), col("c_mktsegment").as("value"))
    val changes = Seq(
      (10L, "SEG_X", "U", 1L), (20L, null.asInstanceOf[String], "D", 2L),
      (9001L, "SEG_NEW", "I", 3L),
      (30L, "A", "U", 4L), (30L, "B", "U", 5L)) // net: changed to B
      .toDF("key", "value", "op", "seq")
    val after = ChangeDataCapture.applyChangelog(base, changes, Seq("key"))
    val got = SnapshotDiff.diff(base, after, Seq("key")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got === Map(10L -> "changed", 20L -> "removed",
      9001L -> "added", 30L -> "changed"))
  }
}
