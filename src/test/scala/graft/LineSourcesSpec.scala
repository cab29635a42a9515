package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{LineSources, Tables}

/** Round-trips the line-file source/sink surface: the same wordcount
  * logic must work over text-line input, and the (key, value) line sink
  * must be re-readable (reference juice-output parity).
  */
class LineSourcesSpec extends AnyFunSuite {
  import SparkTestBase._

  private def tmp(name: String): String =
    java.nio.file.Files.createTempDirectory(name).toString

  test("wordcount over text lines equals wordcount over parquet") {
    val txtDir = tmp("graft-text")
    Tables.documents(spark, sf0001).select("text")
      .write.mode("overwrite").text(txtDir)
    def wc(df: org.apache.spark.sql.DataFrame, c: String) =
      df.select(explode(split(col(c), " ")).as("w"))
        .filter(col("w") =!= "")
        .groupBy("w").count()
        .orderBy(desc("count"), asc("w"))
        .collect().toSeq.map(_.toString)
    val fromText = wc(LineSources.readTextLines(spark, txtDir), "value")
    val fromParquet = wc(Tables.documents(spark, sf0001), "text")
    assert(fromText === fromParquet)
  }

  test("csv source with explicit schema round-trips") {
    val csvDir = tmp("graft-csv")
    val src = Tables.customer(spark, sf0001)
      .select("c_custkey", "c_name", "c_nationkey")
    src.write.mode("overwrite").option("header", "false").csv(csvDir)
    val schema = StructType(Seq(
      StructField("c_custkey", LongType),
      StructField("c_name", StringType),
      StructField("c_nationkey", IntegerType)))
    val back = LineSources.readCsv(spark, csvDir, schema)
    assert(back.orderBy("c_custkey").collect().toSeq.map(_.toString) ===
      src.orderBy("c_custkey").collect().toSeq.map(_.toString))
  }

  test("json-lines source with explicit schema round-trips") {
    val jsonDir = tmp("graft-json")
    val src = Tables.documents(spark, sf0001).select("doc_id", "lang", "n_chars")
    src.write.mode("overwrite").json(jsonDir)
    val schema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("lang", StringType),
      StructField("n_chars", LongType)))
    val back = LineSources.readJsonLines(spark, jsonDir, schema)
    assert(back.orderBy("doc_id").collect().toSeq.map(_.toString) ===
      src.orderBy("doc_id").collect().toSeq.map(_.toString))
  }

  test("key-value line sink is re-readable (juice dest-file parity)") {
    val kvDir = tmp("graft-kv")
    val counts = SparkEntry.queries("q_wordcount")(spark, sf0001)
    LineSources.writeKeyValueLines(counts, "word", "cnt", kvDir)
    val back = LineSources.readTextLines(spark, kvDir)
      .select(
        split(col("value"), "\t").getItem(0).as("word"),
        split(col("value"), "\t").getItem(1).cast(LongType).as("cnt"))
      .orderBy(desc("cnt"), asc("word"))
      .collect().toSeq.map(_.toString)
    assert(back === counts.collect().toSeq.map(_.toString))
  }
}
