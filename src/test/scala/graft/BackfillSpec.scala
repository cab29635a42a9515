package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{Backfill, Tables}

/** Partition backfill: only the touched partition changes, untouched
  * partitions keep byte-identical files, and the static overwrite
  * contrast stays pinned.
  */
class BackfillSpec extends AnyFunSuite {
  import SparkTestBase._

  // a table partitioned by order status (three partitions)
  private def freshTable: String = {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-backfill").toString + "/t"
    Tables.orders(spark, sf0001)
      .select(col("o_orderkey"), col("o_totalprice"),
        col("o_orderstatus").as("st"))
      .write.partitionBy("st").parquet(dir)
    dir
  }

  private def fileInventory(dir: String): Map[String, (Long, Long)] = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk)
      else if (f.getName.endsWith(".parquet")) Seq(f) else Nil
    walk(new java.io.File(dir))
      .map(f => f.getAbsolutePath -> ((f.length, f.lastModified))).toMap
  }

  test("dynamic backfill touches only the named partition") {
    val dir = freshTable
    val parts = Backfill.partitions(Tables.orders(spark, sf0001), dir)
    assert(parts === Seq("st=F", "st=O", "st=P"))
    val before = fileInventory(dir)

    // recompute the P slice with corrected values
    val fix = Tables.orders(spark, sf0001)
      .filter(col("o_orderstatus") === "P")
      .select(col("o_orderkey"),
        (col("o_totalprice") * 2).as("o_totalprice"),
        col("o_orderstatus").as("st"))
    Backfill.overwritePartitions(fix, dir, Seq("st"))

    val after = fileInventory(dir)
    // untouched partitions: exactly the same files, sizes, mtimes
    def untouched(inv: Map[String, (Long, Long)]) =
      inv.filter { case (p, _) => !p.contains("st=P") }
    assert(untouched(after) === untouched(before))
    // touched partition: content replaced exactly
    val p = spark.read.parquet(dir).filter(col("st") === "P")
    val expected = Tables.orders(spark, sf0001)
      .filter(col("o_orderstatus") === "P")
      .select(col("o_orderkey"), (col("o_totalprice") * 2).as("px"))
    assert(p.count() === expected.count() && p.count() > 0)
    assert(p.join(expected, Seq("o_orderkey"))
      .filter(col("o_totalprice") =!= col("px")).count() === 0L)
    // and the full table still reads coherently
    assert(spark.read.parquet(dir).count() === 1500L)
  }

  test("static overwrite drops the other partitions — the contrast") {
    val dir = freshTable
    val fix = Tables.orders(spark, sf0001)
      .filter(col("o_orderstatus") === "P")
      .select(col("o_orderkey"), col("o_totalprice"),
        col("o_orderstatus").as("st"))
    fix.write.mode("overwrite").partitionBy("st").parquet(dir)
    assert(Backfill.partitions(Tables.orders(spark, sf0001), dir) ===
      Seq("st=P"), "static overwrite should have dropped F and O")
  }
}
