package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Tables

/** Partition-layout behavior at scale: a corpus written with
  * `partitionBy(lang)` must prune non-matching partitions at the scan
  * (PartitionFilters, fewer files), and an ORC copy must round-trip —
  * format parity beyond parquet/text/csv/json.
  */
class PartitionPruningSpec extends AnyFunSuite {
  import SparkTestBase._

  test("partitionBy(lang) layout prunes partitions for a lang filter") {
    val dir = java.nio.file.Files.createTempDirectory("graft-part").toString
    Tables.documents(spark, sf0001)
      .write.mode("overwrite").partitionBy("lang").parquet(dir)

    // Static plan for inspection — under AQE the adaptive wrapper may
    // not expose the scan until execution finalizes.
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val filtered =
      try spark.read.parquet(dir).filter(col("lang") === "en")
      finally spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val scan =
      try filtered.queryExecution.executedPlan.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => f
      }.head
      finally spark.conf.set("spark.sql.adaptive.enabled", "true")
    // the lang predicate must land in partitionFilters, not dataFilters
    assert(scan.partitionFilters.map(_.toString).exists(_.contains("lang")),
      s"lang not in partitionFilters: ${scan.partitionFilters}")
    assert(scan.dataFilters.isEmpty || !scan.dataFilters.map(_.toString)
      .exists(_.contains("lang")))
    // and only the en partition's rows are read
    val expected = Tables.documents(spark, sf0001)
      .filter(col("lang") === "en").count()
    assert(filtered.count() === expected)
    assert(scan.relation.location.listFiles(scan.partitionFilters, Nil)
      .flatMap(_.files).nonEmpty)
  }

  test("ORC source round-trips the documents table") {
    val dir = java.nio.file.Files.createTempDirectory("graft-orc").toString
    val src = Tables.documents(spark, sf0001)
      .select("doc_id", "lang", "n_chars")
    src.write.mode("overwrite").orc(dir)
    val back = spark.read.orc(dir)
    assert(back.orderBy("doc_id").collect().toSeq.map(_.toString) ===
      src.orderBy("doc_id").collect().toSeq.map(_.toString))
  }
}
