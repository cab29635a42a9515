package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.ChangeDataCapture
import graft.operators.ChangeDataCapture.{Change, Delete}
import graft.sources.Tables

/** The CDC-apply surface: latest-wins semantics against a plain-Scala
  * reference, idempotence and composability (the retry/checkpoint
  * properties), net-effect compaction, partition invariance, the
  * single-shuffle plan shape, and batch==stream equality of the view.
  */
class CdcSpec extends AnyFunSuite {
  import SparkTestBase._

  // base snapshot: customer keyed by c_custkey, one payload column
  private def base: DataFrame =
    Tables.customer(spark, sf0001)
      .select(col("c_custkey").as("key"),
        col("c_mktsegment").as("value"))

  /** Crafted changelog: updates, deletes, inserts of new keys, a
    * delete of an absent key, and multi-change keys whose final state
    * depends on seq order (update→delete→update and update→delete).
    */
  private def changes: DataFrame = {
    import spark.implicits._
    val rows =
      // updates for keys ≡ 0 (mod 10), deletes for keys ≡ 1 (mod 10)
      (10L to 150L by 10L).map(k => (k, s"UPD_$k", "U", 1000L + k)) ++
      (11L to 150L by 10L).map(k => (k, null: String, "D", 1000L + k)) ++
      // brand-new keys arrive as inserts
      (1001L to 1005L).map(k => (k, s"NEW_$k", "I", 2000L + k)) ++
      // delete of a key that never existed: must be a no-op
      Seq((999999L, null: String, "D", 3000L)) ++
      // conflicting histories: last change decides
      Seq((5L, "A", "U", 3001L), (5L, null: String, "D", 3002L),
        (5L, "B", "U", 3003L), // net: alive with B
        (7L, "C", "U", 3004L), (7L, null: String, "D", 3005L)) // net: gone
    rows.toDF("key", "value", "op", "seq")
  }

  /** Plain-Scala reference apply over collected rows. */
  private def expected: Map[Long, String] = {
    val b = base.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val latest = changes.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
      .groupBy(_._1).map { case (k, cs) => k -> cs.maxBy(_._4) }
    latest.foldLeft(b) { case (m, (k, (_, v, op, _))) =>
      if (op == "D") m - k else m.updated(k, v)
    }
  }

  private def asMap(df: DataFrame): Map[Long, String] =
    df.collect().map(r => r.getLong(0) -> r.getString(1)).toMap

  test("applyChangelog matches the plain-Scala latest-wins reference") {
    val got = asMap(ChangeDataCapture.applyChangelog(
      base, changes, Seq("key")))
    val exp = expected
    assert(exp.nonEmpty && got === exp)
    // the crafted edges landed: update→delete→update survives as B,
    // update→delete is gone, absent-key delete changed nothing
    assert(got(5L) === "B" && !got.contains(7L) && !got.contains(999999L))
    assert(got(1001L) === "NEW_1001" && got(10L) === "UPD_10")
    assert(!got.contains(11L))
  }

  test("apply is idempotent and composes across a seq split") {
    val once = ChangeDataCapture.applyChangelog(base, changes, Seq("key"))
    val twice = ChangeDataCapture.applyChangelog(once, changes, Seq("key"))
    assert(asMap(twice) === asMap(once))
    // checkpoint/retry shape: apply the log in two halves by seq
    val lo = changes.filter(col("seq") < 2000L)
    val hi = changes.filter(col("seq") >= 2000L)
    val staged = ChangeDataCapture.applyChangelog(
      ChangeDataCapture.applyChangelog(base, lo, Seq("key")),
      hi, Seq("key"))
    assert(asMap(staged) === asMap(once))
  }

  test("compacted changelog applies to the same snapshot") {
    val net = ChangeDataCapture.compactChangelog(changes, Seq("key"))
    // bounded by |keys|, and the same final state
    assert(net.count() === changes.select("key").distinct().count())
    val viaNet = ChangeDataCapture.applyChangelog(base, net, Seq("key"))
    assert(asMap(viaNet) === expected)
  }

  test("apply is invariant to the changelog's partition layout") {
    val skewed = ChangeDataCapture.applyChangelog(
      base.repartition(7), changes.repartition(3, col("op")), Seq("key"))
    assert(asMap(skewed) === expected)
  }

  test("apply plans ONE shuffle and a rank-limited window") {
    val qe = ChangeDataCapture.applyChangelog(base, changes, Seq("key"))
      .queryExecution
    // count exchanges post-EnsureRequirements (sparkPlan is pre-insert,
    // so collect the executed plan's explain text instead)
    val explained = qe.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("simple"))
    val shuffles = "Exchange ".r.findAllIn(explained).size
    assert(shuffles === 1,
      s"expected the union→window single-shuffle shape, got:\n$explained")
    // row_number=1 must plan as WindowGroupLimit so map tasks forward
    // at most one candidate per key into that shuffle
    assert(qe.sparkPlan.collect {
      case l: org.apache.spark.sql.execution.window.WindowGroupLimitExec => l
    }.nonEmpty, s"rank-1 filter did not push a WindowGroupLimit")
  }

  test("cdcViewStream: streamed view equals batch apply, replay-safe") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-cdc").toString
    // micro-batch 1: the base snapshot as seq-0 inserts; 2: the
    // changelog; 3: the changelog AGAIN (at-least-once delivery)
    base.select(col("key"), col("value"), lit("I").as("op"),
        lit(0L).as("seq"))
      .coalesce(1).write.parquet(s"$dir/b0")
    changes.coalesce(1).write.parquet(s"$dir/b1")
    val stage = java.nio.file.Files.createTempDirectory("graft-cdc-in")
    def link(name: String, src: String): Unit =
      java.nio.file.Files.createSymbolicLink(stage.resolve(name),
        java.nio.file.Paths.get(src))
    val f0 = new java.io.File(s"$dir/b0").listFiles()
      .filter(_.getName.endsWith(".parquet")).head.getAbsolutePath
    val f1 = new java.io.File(s"$dir/b1").listFiles()
      .filter(_.getName.endsWith(".parquet")).head.getAbsolutePath
    link("00_base.parquet", f0)
    link("01_changes.parquet", f1)
    link("02_replay.parquet", f1)

    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try {
      val stream = spark.readStream
        .schema(spark.read.parquet(f0).schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(stage.toString)
        .as[Change]
      val q = ChangeDataCapture.cdcViewStream(stream)
        .writeStream.outputMode("update").format("memory")
        .queryName("cdc_view").start()
      try q.processAllAvailable()
      finally q.stop()
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)

    // final view per key = the emission with max seq (champion is
    // monotone); live keys must equal the batch apply exactly
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("key").orderBy(desc("seq"))
    val streamed = asMap(spark.table("cdc_view")
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .filter(col("alive")).select("key", "value"))
    assert(streamed === expected)
  }
}
