package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.MultimodalQueries
import graft.operators.MultimodalQueries.{AltStubCodec, ContainerCodec,
  MediaCodec, MediaMeta, MediaRecord, StubCodec}

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

  // ---- ContainerCodec: the REAL header parser ----------------------

  /** Spec-local little-endian writer, deliberately independent of
    * ContainerCodec's private putLe: these literal headers pin the
    * PUBLIC BMP / RIFF-WAVE layouts, so writer and parser in main
    * cannot collude on a wrong offset or byte order.
    */
  private def le(v: Long, n: Int): Array[Byte] =
    Array.tabulate(n)(i => ((v >> (8 * i)) & 0xff).toByte)

  test("ContainerCodec parses a hand-written literal BMP header") {
    // 2×3 px, 24-bit, BI_RGB — every field written byte-by-byte from
    // the published BITMAPFILEHEADER/BITMAPINFOHEADER layout
    val b = Array.concat(
      Array[Byte]('B', 'M'), le(54, 4), le(0, 4), le(54, 4), // file header
      le(40, 4), le(2, 4), le(3, 4), le(1, 2), le(24, 2),    // dims
      le(0, 4), le(24, 4), le(2835, 4), le(2835, 4), le(0, 4), le(0, 4))
    assert(b.length === 54)
    val m = ContainerCodec.parse(7L, b)
    assert(m.media_type === "image")
    assert(m.width === Some(2L) && m.height === Some(3L))
    assert(m.n_bytes === 54L)
    assert(m.sample_rate.isEmpty && m.channels.isEmpty &&
      m.duration_ms.isEmpty)
  }

  test("ContainerCodec parses a hand-written literal WAV header") {
    // 44.1 kHz stereo 16-bit PCM, 441 samples → dataSize 1764,
    // byteRate 176400, duration exactly 10 ms
    val b = Array.concat(
      Array[Byte]('R', 'I', 'F', 'F'), le(36 + 1764, 4),
      Array[Byte]('W', 'A', 'V', 'E', 'f', 'm', 't', ' '),
      le(16, 4), le(1, 2), le(2, 2), le(44100, 4), le(176400, 4),
      le(4, 2), le(16, 2),
      Array[Byte]('d', 'a', 't', 'a'), le(1764, 4))
    assert(b.length === 44)
    val m = ContainerCodec.parse(8L, b)
    assert(m.media_type === "audio")
    assert(m.sample_rate === Some(44100L) && m.channels === Some(2L))
    assert(m.duration_ms === Some(10L))
    assert(m.width.isEmpty && m.height.isEmpty)
  }

  test("ContainerCodec parses a hand-written literal PNG header (big-endian + CRC)") {
    // 2×3 truecolor PNG: signature, IHDR length/width/height written
    // big-endian BY HAND, CRC computed here over the literal type+data
    // bytes — independent of the writer's putBe/crc32 helpers
    val be = (v: Long, n: Int) =>
      Array.tabulate(n)(i => ((v >> (8 * (n - 1 - i))) & 0xff).toByte)
    val ihdr = Array.concat(
      Array[Byte]('I', 'H', 'D', 'R'), be(2, 4), be(3, 4),
      Array[Byte](8, 2, 0, 0, 0))
    val crc = new java.util.zip.CRC32
    crc.update(ihdr, 0, ihdr.length)
    val b = Array.concat(
      Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a),
      be(13, 4), ihdr, be(crc.getValue, 4))
    assert(b.length === 33)
    val m = ContainerCodec.parse(9L, b)
    assert(m.media_type === "image")
    assert(m.width === Some(2L) && m.height === Some(3L))
    // flipping ONE header byte must fail the CRC, not misparse
    val bad = b.clone(); bad(17) = (bad(17) ^ 0x01).toByte
    assert(ContainerCodec.parse(9L, bad).media_type === "unknown")
  }

  test("ContainerCodec synth→parse roundtrips exactly") {
    for (w <- Seq(1, 17, 639); h <- Seq(1, 480)) {
      val m = ContainerCodec.parse(1L,
        ContainerCodec.synthBmp(w, h, Array[Byte](9, 9)))
      assert(m.media_type === "image")
      assert(m.width === Some(w.toLong) && m.height === Some(h.toLong))
      assert(m.n_bytes === 56L)
    }
    for (c <- Seq(1, 2); r <- Seq(8000, 44100); ns <- Seq(1, 1999)) {
      val m = ContainerCodec.parse(2L,
        ContainerCodec.synthWav(c, r, ns, Array.emptyByteArray))
      assert(m.media_type === "audio")
      assert(m.sample_rate === Some(r.toLong) && m.channels === Some(c.toLong))
      assert(m.duration_ms === Some(ns.toLong * 1000 / r))
    }
    for (w <- Seq(1, 1920); h <- Seq(1, 777)) {
      val m = ContainerCodec.parse(3L,
        ContainerCodec.synthPng(w, h, Array[Byte](1)))
      assert(m.media_type === "image")
      assert(m.width === Some(w.toLong) && m.height === Some(h.toLong))
      assert(m.n_bytes === 34L)
    }
  }

  test("ContainerCodec degrades malformed payloads to unknown, not throw") {
    val junk = Seq(
      Array.emptyByteArray,
      Array[Byte]('B', 'M', 1),                 // truncated BMP
      Array.fill[Byte](54)(0x7f),               // no magic
      ContainerCodec.synthWav(1, 8000, 4, Array.emptyByteArray).take(40))
    junk.foreach { p =>
      val m = ContainerCodec.parse(3L, p)
      assert(m.media_type === "unknown")
      assert(m.width.isEmpty && m.sample_rate.isEmpty)
    }
  }

  test("the real header parser plugs into the MediaCodec seam") {
    import spark.implicits._
    // test-local adapter: ContainerCodec.parse behind the same trait
    // the stubs implement — the pipeline is provably codec-agnostic
    // for a REAL codec, not just for the two fakes
    object RealHeaderCodec extends MediaCodec {
      def decode(r: MediaRecord): MediaMeta = {
        val m = ContainerCodec.parse(r.doc_id, r.payload)
        MediaMeta(m.doc_id, m.media_type, m.n_bytes,
          m.width.getOrElse(0L), m.height.getOrElse(0L), 1L)
      }
    }
    val media = spark.read.parquet(s"$sf0001/documents.parquet")
      .filter(col("doc_id") < 50)
      .select(col("doc_id"), col("text")).as[(Long, String)]
      .map { case (id, _) =>
        MediaRecord(id, "image",
          ContainerCodec.synthBmp((1 + id % 640).toInt,
            (1 + (id * 7) % 480).toInt, Array.emptyByteArray))
      }
    val out = MultimodalQueries.decodeMeta(spark, media, RealHeaderCodec)
      .toDF().orderBy("doc_id").collect()
    assert(out.length === 50)
    out.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      assert(r.getAs[String]("media_type") === "image")
      assert(r.getAs[Long]("width") === 1 + id % 640)
      assert(r.getAs[Long]("height") === 1 + (id * 7) % 480)
    }
  }
}
