package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.IncrementalAgg
import graft.sources.Tables

/** Materialized-rollup maintenance: refresh == full recompute on a
  * crafted retraction log (group death and birth) and on a
  * fixture-scale base/changes split, chained refreshes, and the
  * bounded-shuffle plan.
  */
class IncrementalAggSpec extends AnyFunSuite {
  import SparkTestBase._

  private def canon(df: DataFrame): Seq[String] =
    df.orderBy(df.columns.map(col): _*).collect().toSeq.map(_.toString)

  test("crafted retractions: group death, group birth, exact sums") {
    import spark.implicits._
    val facts = Seq(("a", 10L), ("a", 20L), ("b", 5L), ("b", 7L),
      ("c", 100L)).toDF("g", "x")
    val changes = Seq(
      ("b", 5L, "D"), ("b", 7L, "D"), // retract ALL of b
      ("d", 42L, "I"),                // brand-new group
      ("a", 10L, "D"), ("a", 1L, "I") // churn inside a
    ).toDF("g", "x", "op")

    val refreshed = IncrementalAgg.refresh(
      IncrementalAgg.init(facts, Seq("g"), Seq("x")),
      changes, Seq("g"), Seq("x"))
    val got = refreshed.collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got === Map("a" -> ((2L, 21L)), "c" -> ((1L, 100L)),
      "d" -> ((1L, 42L))))
    assert(!got.contains("b"), "fully-retracted group must vanish")
  }

  // fixture-scale: split orders into base/changes, maintain a rollup
  // over o_orderstatus with exact integer-cents sums
  private def ordersCents: DataFrame =
    Tables.orders(spark, sf0001).select(col("o_orderkey"),
      col("o_orderstatus").as("g"),
      (col("o_totalprice") * 100).cast("long").as("cents"))

  test("fixture refresh equals full recompute") {
    val all = ordersCents
    val base = all.filter(col("o_orderkey") % 4 =!= 0)
    val inserts = all.filter(col("o_orderkey") % 4 === 0)
      .withColumn("op", lit("I"))
    val deletes = base.filter(col("o_orderkey") % 7 === 0)
      .withColumn("op", lit("D"))
    val changes = inserts.unionByName(deletes)

    val newFacts = all.filter(col("o_orderkey") % 4 === 0 ||
      col("o_orderkey") % 7 =!= 0)
    val expected = IncrementalAgg.init(
      newFacts.drop("o_orderkey"), Seq("g"), Seq("cents"))
    val refreshed = IncrementalAgg.refresh(
      IncrementalAgg.init(base.drop("o_orderkey"), Seq("g"), Seq("cents")),
      changes.drop("o_orderkey"), Seq("g"), Seq("cents"))
    assert(canon(refreshed).nonEmpty)
    assert(canon(refreshed) === canon(expected))
  }

  test("refreshes chain: two incremental days equal one recompute") {
    val all = ordersCents.drop("o_orderkey")
    val base = ordersCents.filter(col("o_orderkey") % 3 === 0).drop("o_orderkey")
    val day1 = ordersCents.filter(col("o_orderkey") % 3 === 1)
      .drop("o_orderkey").withColumn("op", lit("I"))
    val day2 = ordersCents.filter(col("o_orderkey") % 3 === 2)
      .drop("o_orderkey").withColumn("op", lit("I"))
    val chained = IncrementalAgg.refresh(
      IncrementalAgg.refresh(
        IncrementalAgg.init(base, Seq("g"), Seq("cents")),
        day1, Seq("g"), Seq("cents")),
      day2, Seq("g"), Seq("cents"))
    assert(canon(chained) ===
      canon(IncrementalAgg.init(all, Seq("g"), Seq("cents"))))
  }

  test("streamed rollup equals batch refresh, through group death") {
    import spark.implicits._
    // batch 1: initial facts as inserts; batch 2: churn that kills
    // group b entirely and births group d
    val b1 = Seq(("a", 10L, "I"), ("a", 20L, "I"), ("b", 5L, "I"),
      ("c", 100L, "I")).toDF("g", "x", "op")
    val b2 = Seq(("b", 5L, "D"), ("d", 42L, "I"), ("a", 10L, "D"))
      .toDF("g", "x", "op")
    val dir = java.nio.file.Files
      .createTempDirectory("graft-iagg").toString
    b1.coalesce(1).write.parquet(s"$dir/b1")
    b2.coalesce(1).write.parquet(s"$dir/b2")
    val stage = java.nio.file.Files.createTempDirectory("graft-iagg-in")
    def firstFile(d: String) = new java.io.File(d).listFiles()
      .filter(_.getName.endsWith(".parquet")).head.getAbsolutePath
    java.nio.file.Files.createSymbolicLink(stage.resolve("1.parquet"),
      java.nio.file.Paths.get(firstFile(s"$dir/b1")))
    java.nio.file.Files.createSymbolicLink(stage.resolve("2.parquet"),
      java.nio.file.Paths.get(firstFile(s"$dir/b2")))

    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try {
      val stream = spark.readStream
        .schema(b1.schema).option("maxFilesPerTrigger", "1")
        .parquet(stage.toString).as[IncrementalAgg.AggChange]
      val q = IncrementalAgg.incrementalAggStream(stream)
        .writeStream.outputMode("update").format("memory")
        .queryName("iagg_stream").start()
      try q.processAllAvailable()
      finally q.stop()
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)

    // final view: the last emission per group, dead groups dropped —
    // emissions per group are totally ordered by batch; with two
    // batches the later one is the row whose (cnt,sum) differs from
    // batch-1's fold, so reconstruct via the batch reference instead:
    // stream==batch on the concatenated changelog
    val streamed = spark.table("iagg_stream")
    val perGroup = streamed.groupBy("g").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // groups touched in both batches emitted twice
    assert(perGroup === Map("a" -> 2L, "b" -> 2L, "c" -> 1L, "d" -> 1L))
    // fold-from-zero == delta of the concatenated changelog
    val batch = IncrementalAgg
      .delta(b1.unionByName(b2), Seq("g"), Seq("x"))
      .filter(col("cnt") =!= 0L)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    assert(batch === Map("a" -> ((1L, 20L)), "c" -> ((1L, 100L)),
      "d" -> ((1L, 42L))))
    // the stream's live final state must match: take each group's
    // LAST emission (batch-2 emissions overwrite batch-1's for a/b)
    val lastByGroup = streamed.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1)
    val finalView = lastByGroup.collect {
      // a group with two emissions: the final one is the one matching
      // the full fold; with one: itself. Disambiguate via the batch
      // reference for touched groups (b's final is cnt=0, dropped)
      case (g, es) if batch.contains(g) =>
        g -> es.map(e => (e._2, e._3)).find(_ == batch(g)).get
    }
    assert(finalView.toMap === batch)
    assert(lastByGroup("b").map(e => (e._2, e._3)).contains((0L, 0L)),
      "group death must emit the cnt=0 retraction")
  }

  test("refresh plans at most two exchanges (delta + merge)") {
    import spark.implicits._
    val state = IncrementalAgg.init(
      Seq(("a", 1L)).toDF("g", "x"), Seq("g"), Seq("x"))
    val changes = Seq(("a", 2L, "I")).toDF("g", "x", "op")
    val explained = IncrementalAgg
      .refresh(state, changes, Seq("g"), Seq("x"))
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("simple"))
    val shuffles = "Exchange ".r.findAllIn(explained).size
    assert(shuffles <= 2, s"refresh over-shuffles ($shuffles):\n$explained")
  }
}
