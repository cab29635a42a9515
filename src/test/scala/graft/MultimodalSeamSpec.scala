package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.MultimodalQueries
import graft.operators.MultimodalQueries.{AltStubCodec, MediaRecord, StubCodec}

/** The multimodal pipeline must be codec-agnostic: swapping the decode
  * implementation behind the MediaCodec seam changes decoded VALUES and
  * nothing else — schema, row set, and plan shape are fixed by the
  * Spark-side plumbing. This is the guarantee that lets a real
  * image/audio/video library replace the offline stub without touching
  * any query.
  */
class MultimodalSeamSpec extends AnyFunSuite {
  import SparkTestBase._

  private def mediaDs = {
    import spark.implicits._
    spark.read.parquet(s"$sf0001/documents.parquet")
      .filter(col("doc_id") < 100)
      .select(col("doc_id"), lit("image").as("media_type"),
        col("text").cast("binary").as("payload"))
      .as[MediaRecord]
  }

  test("both codecs produce the same schema and row set") {
    val a = MultimodalQueries.decodeMeta(spark, mediaDs, StubCodec).toDF()
    val b = MultimodalQueries.decodeMeta(spark, mediaDs, AltStubCodec).toDF()
    assert(a.schema === b.schema)
    assert(a.count() === b.count())
    assert(a.select("doc_id").orderBy("doc_id").collect().toSeq ===
      b.select("doc_id").orderBy("doc_id").collect().toSeq)
  }

  test("decoded values flow exclusively from the codec") {
    val alt = MultimodalQueries.decodeMeta(spark, mediaDs, AltStubCodec)
      .toDF().orderBy("doc_id").collect()
    // expected geometry from AltStubCodec's formula, derived
    // independently of the pipeline
    val expected = spark.read.parquet(s"$sf0001/documents.parquet")
      .filter(col("doc_id") < 100)
      .select(col("doc_id"),
        octet_length(col("text").cast("binary")).cast("long").as("n"))
      .orderBy("doc_id").collect()
    assert(alt.length === expected.length)
    alt.zip(expected).foreach { case (got, exp) =>
      val n = exp.getLong(1)
      assert(got.getAs[Long]("n_bytes") === n)
      assert(got.getAs[Long]("width") === (n * 3) % 1920)
      assert(got.getAs[Long]("height") === (n * 5) % 1080)
      assert(got.getAs[Long]("frames") === 1 + exp.getLong(0) % 30)
    }
  }

  test("contract queries still run on the default stub") {
    // the seam refactor must not move the contract output
    assert(SparkEntry.queries("q_multimodal_meta")(spark, sf0001)
      .count() === 100L)
  }
}
