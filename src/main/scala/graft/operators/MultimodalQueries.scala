package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Multimodal column handling (SURVEY.md §2.12): media payloads as
  * opaque `binary` columns with typed metadata, decoded batch-wise per
  * partition.
  *
  * The Spark-side plumbing is real — schema, partition-local batch
  * decode via `mapPartitions` over a typed Dataset, filter pushed below
  * the opaque map stage (Catalyst cannot push through mapPartitions, so
  * the scan-level filter is applied explicitly first). Two codecs sit
  * behind the seam: [[StubCodec]] (a clearly-marked deterministic fake
  * standing in for pixel/sample-level libraries, which this container
  * doesn't ship) drives the original metadata queries, and
  * [[ContainerCodec]] performs a REAL byte-level BMP / RIFF-WAVE header
  * parse for `q_multimodal_decode` — the metadata-extraction pass a
  * production pipeline runs needs exactly these fixed-offset reads, no
  * codec library required. Swapping implementations changes only the
  * decode function; the distributed shape is unchanged.
  *
  * The testdata has no binary table, so the payload is synthesized from
  * `documents.text` (UTF-8 bytes) — which also keeps the whole query
  * oracle-checkable in DuckDB via `encode()` / `octet_length()`.
  */
object MultimodalQueries {

  /** A media row: opaque payload plus routing metadata. */
  final case class MediaRecord(doc_id: Long, media_type: String,
      payload: Array[Byte])

  /** Typed decode output. */
  final case class MediaMeta(doc_id: Long, media_type: String, n_bytes: Long,
      width: Long, height: Long, frames: Long)

  /** The codec seam: everything the distributed pipeline needs from a
    * media library. Implementations must be Serializable (they ship to
    * executors) and deterministic per payload (task retries must
    * reproduce results). A real image/audio/video codec plugs in here
    * without touching any plan shape — [[MultimodalSeamSpec]] proves
    * the pipeline is codec-agnostic by swapping implementations.
    */
  trait MediaCodec extends Serializable {
    def decode(r: MediaRecord): MediaMeta
  }

  /** STUB codec — stands in for an image/audio/video decode library
    * (none ships in this offline container). Deterministic function of
    * the payload so the DuckDB oracle can reproduce it; a real
    * implementation would parse the container format here (batch per
    * partition, one codec instance per task).
    */
  object StubCodec extends MediaCodec {
    def decode(r: MediaRecord): MediaMeta = {
      val n = r.payload.length.toLong
      MediaMeta(r.doc_id, r.media_type, n, n % 640, (n * 7) % 480,
        1 + r.doc_id % 24)
    }
  }

  /** Second deterministic stub with a different fake geometry — exists
    * only to prove the seam: any pipeline result that depends on which
    * stub ran must flow exclusively from [[MediaCodec.decode]].
    */
  object AltStubCodec extends MediaCodec {
    def decode(r: MediaRecord): MediaMeta = {
      val n = r.payload.length.toLong
      MediaMeta(r.doc_id, r.media_type, n, (n * 3) % 1920, (n * 5) % 1080,
        1 + r.doc_id % 30)
    }
  }

  /** Parsed container metadata: image fields for BMP payloads, audio
    * fields for WAV payloads, all-null tail for unrecognized bytes.
    * `media_type` comes from the PARSER's magic sniff, never from the
    * routing metadata — a mislabeled asset is classified by its bytes.
    */
  final case class ContainerMeta(doc_id: Long, media_type: String,
      n_bytes: Long, width: Option[Long], height: Option[Long],
      sample_rate: Option[Long], channels: Option[Long],
      duration_ms: Option[Long])

  /** REAL container parsing — no codec library ships in this offline
    * container, but BMP (BITMAPFILEHEADER + BITMAPINFOHEADER) and
    * RIFF/WAVE PCM headers are fixed-offset little-endian layouts
    * parseable in plain JVM code, which is exactly what a production
    * metadata-extraction pass does before any pixel/sample decode (it
    * reads the first KB of each asset, never the payload body). Writers
    * (`synthBmp`/`synthWav`) exist because the fixtures carry no binary
    * media: the contract query synthesizes REAL headers from fixture
    * columns executor-side and the parser recovers the fields strictly
    * from the bytes, so a wrong offset, width, or endianness anywhere
    * breaks the oracle hash. Offsets are additionally pinned against
    * hand-written literal headers (not the writers) in
    * MultimodalSeamSpec, so writer and parser cannot collude on a
    * wrong layout.
    */
  object ContainerCodec {

    private def putLe(b: Array[Byte], off: Int, v: Long, n: Int): Unit = {
      var i = 0
      while (i < n) { b(off + i) = ((v >> (8 * i)) & 0xff).toByte; i += 1 }
    }

    /** Little-endian unsigned read of `n` bytes at `off`. */
    def leUInt(b: Array[Byte], off: Int, n: Int): Long = {
      var v = 0L
      var i = n - 1
      while (i >= 0) { v = (v << 8) | (b(off + i) & 0xffL); i -= 1 }
      v
    }

    /** Big-endian unsigned read of `n` bytes at `off` (PNG is network
      * byte order — opposite of BMP/WAV, which is the point: the
      * parser must get BOTH right).
      */
    def beUInt(b: Array[Byte], off: Int, n: Int): Long = {
      var v = 0L
      var i = 0
      while (i < n) { v = (v << 8) | (b(off + i) & 0xffL); i += 1 }
      v
    }

    private def putBe(b: Array[Byte], off: Int, v: Long, n: Int): Unit = {
      var i = 0
      while (i < n) { b(off + i) = ((v >> (8 * (n - 1 - i))) & 0xff).toByte
        i += 1 }
    }

    /** CRC32 over b[from, until) — PNG chunk CRCs cover chunk type +
      * data (java.util.zip.CRC32 is the same polynomial PNG
      * specifies).
      */
    def crc32(b: Array[Byte], from: Int, until: Int): Long = {
      val c = new java.util.zip.CRC32
      c.update(b, from, until - from)
      c.getValue
    }

    /** Signed 32-bit little-endian read (BMP dims are signed; a
      * negative height means top-down row order).
      */
    def leInt32(b: Array[Byte], off: Int): Long = leUInt(b, off, 4).toInt.toLong

    /** 24-bit uncompressed BMP: 14-byte file header + 40-byte
      * BITMAPINFOHEADER, then `body` standing in for the pixel array
      * (the imageSize FIELD is the real padded-row size — header
      * parsing never reads the array).
      */
    def synthBmp(width: Int, height: Int, body: Array[Byte]): Array[Byte] = {
      val out = new Array[Byte](54 + body.length)
      val rowSize = ((width * 3 + 3) / 4) * 4 // rows pad to 4 bytes
      out(0) = 'B'; out(1) = 'M'
      putLe(out, 2, 54L + body.length, 4) // file size
      putLe(out, 10, 54L, 4)             // pixel-array offset
      putLe(out, 14, 40L, 4)             // info-header size
      putLe(out, 18, width.toLong, 4)
      putLe(out, 22, height.toLong, 4)
      putLe(out, 26, 1L, 2)              // planes
      putLe(out, 28, 24L, 2)             // bits per pixel
      putLe(out, 34, rowSize.toLong * height, 4) // imageSize
      putLe(out, 38, 2835L, 4)           // 72 dpi in px/metre
      putLe(out, 42, 2835L, 4)
      System.arraycopy(body, 0, out, 54, body.length)
      out
    }

    /** 16-bit PCM RIFF/WAVE: canonical 44-byte header. The data-chunk
      * SIZE field is real (`nSamples`·channels·2) while `body` is a
      * truncated stand-in for the sample bytes — duration comes from
      * the declared chunk size over the declared byte rate, as a
      * streaming parser computes it before the samples arrive.
      */
    def synthWav(channels: Int, sampleRate: Int, nSamples: Int,
        body: Array[Byte]): Array[Byte] = {
      val out = new Array[Byte](44 + body.length)
      val blockAlign = channels * 2
      val dataSize = nSamples.toLong * blockAlign
      out(0) = 'R'; out(1) = 'I'; out(2) = 'F'; out(3) = 'F'
      putLe(out, 4, 36L + dataSize, 4)
      out(8) = 'W'; out(9) = 'A'; out(10) = 'V'; out(11) = 'E'
      out(12) = 'f'; out(13) = 'm'; out(14) = 't'; out(15) = ' '
      putLe(out, 16, 16L, 4)             // fmt chunk size
      putLe(out, 20, 1L, 2)              // PCM
      putLe(out, 22, channels.toLong, 2)
      putLe(out, 24, sampleRate.toLong, 4)
      putLe(out, 28, sampleRate.toLong * blockAlign, 4) // byte rate
      putLe(out, 32, blockAlign.toLong, 2)
      putLe(out, 34, 16L, 2)             // bits per sample
      out(36) = 'd'; out(37) = 'a'; out(38) = 't'; out(39) = 'a'
      putLe(out, 40, dataSize, 4)
      System.arraycopy(body, 0, out, 44, body.length)
      out
    }

    /** Truecolor 8-bit PNG: the 8-byte signature plus a REAL IHDR
      * chunk — length/width/height big-endian, and a genuine CRC32
      * over type+data exactly as the PNG spec requires (the parser
      * verifies it). `body` stands in for the IDAT/IEND tail.
      */
    def synthPng(width: Int, height: Int, body: Array[Byte]): Array[Byte] = {
      val out = new Array[Byte](33 + body.length)
      val sig = Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)
      var i = 0
      while (i < 8) { out(i) = sig(i).toByte; i += 1 }
      putBe(out, 8, 13L, 4)              // IHDR data length
      out(12) = 'I'; out(13) = 'H'; out(14) = 'D'; out(15) = 'R'
      putBe(out, 16, width.toLong, 4)
      putBe(out, 20, height.toLong, 4)
      out(24) = 8                        // bit depth
      out(25) = 2                        // color type: truecolor
      // compression 0, filter 0, interlace 0 already zeroed
      putBe(out, 29, crc32(out, 12, 29), 4)
      System.arraycopy(body, 0, out, 33, body.length)
      out
    }

    /** Magic-sniff + fixed-offset field extraction. Every field flows
      * from the payload bytes; malformed input degrades to
      * ("unknown", nulls) rather than throwing — one bad asset must
      * not kill a 100 TB scan task.
      */
    def parse(docId: Long, payload: Array[Byte]): ContainerMeta = {
      val n = payload.length.toLong
      if (n >= 54 && payload(0) == 'B' && payload(1) == 'M' &&
          leUInt(payload, 14, 4) == 40L && leUInt(payload, 26, 2) == 1L)
        ContainerMeta(docId, "image", n,
          Some(leInt32(payload, 18)), Some(leInt32(payload, 22)),
          None, None, None)
      else if (n >= 33 && (payload(0) & 0xff) == 0x89 &&
          payload(1) == 'P' && payload(2) == 'N' && payload(3) == 'G' &&
          payload(12) == 'I' && payload(13) == 'H' &&
          payload(14) == 'D' && payload(15) == 'R' &&
          beUInt(payload, 8, 4) == 13L &&
          // a wrong-endian writer or a flipped byte anywhere in the
          // header fails the REAL chunk CRC — integrity, not just magic
          beUInt(payload, 29, 4) == crc32(payload, 12, 29))
        ContainerMeta(docId, "image", n,
          Some(beUInt(payload, 16, 4)), Some(beUInt(payload, 20, 4)),
          None, None, None)
      else if (n >= 44 && payload(0) == 'R' && payload(1) == 'I' &&
          payload(2) == 'F' && payload(3) == 'F' &&
          payload(8) == 'W' && payload(9) == 'A' &&
          payload(10) == 'V' && payload(11) == 'E' &&
          leUInt(payload, 20, 2) == 1L && payload(36) == 'd' &&
          payload(37) == 'a' && payload(38) == 't' && payload(39) == 'a') {
        val byteRate = leUInt(payload, 28, 4)
        val dataSize = leUInt(payload, 40, 4)
        ContainerMeta(docId, "audio", n,
          None, None,
          Some(leUInt(payload, 24, 4)), Some(leUInt(payload, 22, 2)),
          Some(if (byteRate > 0) dataSize * 1000L / byteRate else 0L))
      } else
        ContainerMeta(docId, "unknown", n, None, None, None, None, None)
    }
  }

  /** The decode stage behind the seam: partition-local batch map over
    * the opaque payloads (Catalyst cannot see through it — filter
    * before calling).
    */
  def decodeMeta(s: SparkSession, media: Dataset[MediaRecord],
      codec: MediaCodec): Dataset[MediaMeta] = {
    import s.implicits._
    media.mapPartitions(_.map(codec.decode))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Frame sampling: every 6th frame of each "video" payload, exploded
    // to one row per sampled frame with its byte offset — the UDTF-ish
    // shape of a real video pipeline (decode → sample → per-frame rows),
    // over the same stubbed codec metadata.
    "q_multimodal_frames" -> ((s, d) => {
      import s.implicits._
      val media: Dataset[MediaRecord] = Tables.documents(s, d)
        .filter(col("doc_id") % 3 === 2 && col("doc_id") < 200)
        .select(col("doc_id"), lit("video").as("media_type"),
          col("text").cast("binary").as("payload"))
        .as[MediaRecord]
      decodeMeta(s, media, StubCodec)
        .toDF()
        .select(col("doc_id"), col("n_bytes"), col("frames"),
          explode(sequence(lit(0L), col("frames") - 1, lit(6L))).as("frame_idx"))
        .select(col("doc_id"), col("frame_idx"),
          expr("(n_bytes * frame_idx) div frames").as("byte_offset"))
        .orderBy("doc_id", "frame_idx")
    }),

    // Resize planning: target geometry fitting maxW=320 with aspect
    // ratio preserved, derived from decoded dims in pure integer math
    // (both engines must agree exactly; real pixel work would happen in
    // the codec behind the same seam). width can be 0 in the stub's
    // fake geometry, so the divisor clamps at 1.
    "q_multimodal_resize" -> ((s, d) => {
      import s.implicits._
      val media: Dataset[MediaRecord] = Tables.documents(s, d)
        .filter(col("doc_id") % 3 === 0 && col("doc_id") < 300)
        .select(col("doc_id"), lit("image").as("media_type"),
          col("text").cast("binary").as("payload"))
        .as[MediaRecord]
      decodeMeta(s, media, StubCodec)
        .toDF()
        .select(col("doc_id"), col("width"), col("height"),
          greatest(col("width"), lit(1L)).as("w"))
        .withColumn("new_width", least(col("w"), lit(320L)))
        .select(col("doc_id"), col("width"), col("height"), col("new_width"),
          expr("greatest(height * new_width div w, 1)").as("new_height"))
        .orderBy("doc_id")
    }),

    // Feature extraction: per-media-type aggregate features over the
    // decoded metadata (the shape of a corpus-level feature table for
    // curriculum/filtering decisions).
    "q_multimodal_features" -> ((s, d) => {
      import s.implicits._
      val media: Dataset[MediaRecord] = Tables.documents(s, d)
        .filter(col("doc_id") < 200)
        .select(
          col("doc_id"),
          when(col("doc_id") % 3 === 0, "image")
            .when(col("doc_id") % 3 === 1, "audio")
            .otherwise("video").as("media_type"),
          col("text").cast("binary").as("payload"))
        .as[MediaRecord]
      decodeMeta(s, media, StubCodec)
        .toDF()
        .groupBy("media_type")
        .agg(
          count(lit(1)).as("n_media"),
          sum(col("n_bytes")).as("sum_bytes"),
          max(col("frames")).as("max_frames"),
          round(avg(col("width")), 2).as("avg_width"))
        .orderBy("media_type")
    }),

    // REAL header decode (no stub): synthesize genuine BMP / WAV / PNG
    // container bytes from fixture columns executor-side (doc_id%3 =
    // 0 → 24-bit BMP, 1 → 16-bit PCM WAV, 2 → truecolor PNG with a
    // REAL IHDR CRC32; body = first 16 UTF-8 bytes of the text), then
    // recover every output field by parsing the BYTES — media_type
    // from the magic sniff, dims / rate / channels / duration from
    // fixed-offset reads in the format's OWN byte order (BMP/WAV
    // little-endian, PNG big-endian), PNG additionally CRC-verified.
    // The oracle computes the same fields from the synthesis formulas,
    // so parse∘synth must invert exactly: any wrong offset, byte
    // order, CRC, or size formula in either direction breaks the
    // hash. Both stages are partition-local maps over (doc_id, text) —
    // at 100 TB this is a pure map-side metadata-extraction pass, no
    // shuffle until the final presentation sort.
    "q_multimodal_decode" -> ((s, d) => {
      import s.implicits._
      Tables.documents(s, d)
        .select(col("doc_id"), col("text")).as[(Long, String)]
        .map { case (id, text) =>
          val body = text
            .getBytes(java.nio.charset.StandardCharsets.UTF_8).take(16)
          val payload = (id % 3) match {
            case 0 =>
              ContainerCodec.synthBmp((1 + id % 640).toInt,
                (1 + (id * 7) % 480).toInt, body)
            case 1 =>
              ContainerCodec.synthWav((1 + (id / 2) % 2).toInt,
                Array(8000, 16000, 22050, 44100)(((id / 2) % 4).toInt),
                (1 + id % 2000).toInt, body)
            case _ =>
              ContainerCodec.synthPng((1 + id % 1920).toInt,
                (1 + (id * 11) % 1080).toInt, body)
          }
          MediaRecord(id, "bin", payload)
        }
        .mapPartitions(_.map(r => ContainerCodec.parse(r.doc_id, r.payload)))
        .toDF()
        .orderBy("doc_id")
    }),

    "q_multimodal_meta" -> ((s, d) => {
      import s.implicits._
      val media: Dataset[MediaRecord] = Tables.documents(s, d)
        // filter BEFORE the opaque decode stage: mapPartitions blocks
        // Catalyst pushdown, so prune at the scan by hand.
        .filter(col("doc_id") < 100)
        .select(
          col("doc_id"),
          when(col("doc_id") % 3 === 0, "image")
            .when(col("doc_id") % 3 === 1, "audio")
            .otherwise("video").as("media_type"),
          col("text").cast("binary").as("payload"))
        .as[MediaRecord]
      decodeMeta(s, media, StubCodec)
        .toDF()
        .orderBy("doc_id")
    }),

    // Asset near-dup by header digest: md5 over the first 64 bytes of
    // each payload — the cheap perceptual-hash-lite pass an asset
    // registry runs before byte-exact compare (same media re-encoded
    // or re-chunked shares its header). Group by (type, digest), keep
    // the LARGEST copy as canonical, report the storage savings. One
    // partial-combined hash aggregate on (type, digest) then a tiny
    // per-type rollup; shuffles carry 16-byte digests + counts, never
    // payloads — the 100 TB asset-dedup shape.
    "q_multimodal_dedup" -> ((s, d) => {
      Tables.documents(s, d)
        .select(
          when(col("doc_id") % 3 === 0, "image")
            .when(col("doc_id") % 3 === 1, "audio")
            .otherwise("video").as("media_type"),
          md5(substring(col("text"), 1, 64).cast("binary")).as("digest"),
          length(col("text").cast("binary")).cast("long").as("n_bytes"))
        .groupBy("media_type", "digest")
        .agg(count(lit(1)).as("cnt"), max("n_bytes").as("bytes1"),
          sum("n_bytes").as("bytes_all"))
        .groupBy("media_type")
        .agg(count(lit(1)).as("n_unique"),
          sum("cnt").as("n_assets"),
          (sum("cnt") - count(lit(1))).as("n_dup_rows"),
          sum("bytes_all").as("bytes_total"),
          sum("bytes1").as("bytes_dedup"),
          round((sum("bytes_all") - sum("bytes1")).cast("double") /
            sum("bytes_all"), 4).as("savings"))
        .orderBy("media_type")
    })
  )

  val oracle: Map[String, String] = Map(
    "q_multimodal_resize" ->
      """WITH meta AS (
        |  SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS n
        |  FROM documents WHERE doc_id % 3 = 0 AND doc_id < 300),
        |dims AS (
        |  SELECT doc_id, CAST(n % 640 AS BIGINT) AS width,
        |    CAST((n*7) % 480 AS BIGINT) AS height,
        |    CAST(GREATEST(n % 640, 1) AS BIGINT) AS w
        |  FROM meta),
        |r AS (
        |  SELECT doc_id, width, height, w,
        |    CAST(LEAST(w, 320) AS BIGINT) AS new_width
        |  FROM dims)
        |SELECT doc_id, width, height, new_width,
        |  CAST(GREATEST(height * new_width // w, 1) AS BIGINT) AS new_height
        |FROM r ORDER BY doc_id""".stripMargin,
    "q_multimodal_features" ->
      """WITH meta AS (
        |  SELECT doc_id,
        |    CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS media_type,
        |    CAST(octet_length(encode(text)) AS BIGINT) AS n
        |  FROM documents WHERE doc_id < 200)
        |SELECT media_type, CAST(COUNT(*) AS BIGINT) AS n_media,
        |  CAST(SUM(n) AS BIGINT) AS sum_bytes,
        |  CAST(MAX(1 + doc_id % 24) AS BIGINT) AS max_frames,
        |  ROUND(AVG(n % 640), 2) AS avg_width
        |FROM meta GROUP BY media_type ORDER BY media_type""".stripMargin,
    "q_multimodal_frames" ->
      """WITH meta AS (
        |  SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |    CAST(1 + doc_id % 24 AS BIGINT) AS frames
        |  FROM documents WHERE doc_id % 3 = 2 AND doc_id < 200)
        |SELECT doc_id, CAST(f AS BIGINT) AS frame_idx,
        |  CAST((n_bytes * f) // frames AS BIGINT) AS byte_offset
        |FROM meta, unnest(range(0, frames, 6)) AS t(f)
        |ORDER BY doc_id, frame_idx""".stripMargin,
    "q_multimodal_meta" ->
      """SELECT doc_id,
        |  CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS media_type,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |  CAST(octet_length(encode(text)) % 640 AS BIGINT) AS width,
        |  CAST((octet_length(encode(text)) * 7) % 480 AS BIGINT) AS height,
        |  CAST(1 + doc_id % 24 AS BIGINT) AS frames
        |FROM documents WHERE doc_id < 100 ORDER BY doc_id""".stripMargin,
    // Mirrors the SYNTHESIS formulas (not the byte layout): the Spark
    // side must invert its own writers through a genuine byte-level
    // parse to reproduce these values.
    "q_multimodal_decode" ->
      """WITH m AS (
        |  SELECT doc_id, LEAST(octet_length(encode(text)), 16) AS blen
        |  FROM documents)
        |SELECT doc_id,
        |  CASE WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'image' END AS media_type,
        |  CAST(CASE doc_id % 3 WHEN 0 THEN 54 WHEN 1 THEN 44 ELSE 33 END
        |    + blen AS BIGINT) AS n_bytes,
        |  CASE doc_id % 3 WHEN 0 THEN CAST(1 + doc_id % 640 AS BIGINT)
        |    WHEN 2 THEN CAST(1 + doc_id % 1920 AS BIGINT) END AS width,
        |  CASE doc_id % 3 WHEN 0 THEN CAST(1 + (doc_id * 7) % 480 AS BIGINT)
        |    WHEN 2 THEN CAST(1 + (doc_id * 11) % 1080 AS BIGINT) END AS height,
        |  CASE WHEN doc_id % 3 = 1
        |    THEN CAST([8000,16000,22050,44100][CAST((doc_id // 2) % 4 AS INT) + 1]
        |      AS BIGINT) END AS sample_rate,
        |  CASE WHEN doc_id % 3 = 1
        |    THEN CAST(1 + (doc_id // 2) % 2 AS BIGINT) END AS channels,
        |  CASE WHEN doc_id % 3 = 1
        |    THEN CAST((1 + doc_id % 2000) * 1000 //
        |      [8000,16000,22050,44100][CAST((doc_id // 2) % 4 AS INT) + 1]
        |      AS BIGINT) END AS duration_ms
        |FROM m ORDER BY doc_id""".stripMargin,
    "q_multimodal_dedup" ->
      """WITH m AS (SELECT
        |    CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
        |      ELSE 'video' END AS media_type,
        |    md5(substr(text, 1, 64)) AS digest,
        |    CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
        |  FROM documents),
        |grp AS (SELECT media_type, digest, CAST(COUNT(*) AS BIGINT)
        |      AS cnt,
        |    MAX(n_bytes) AS bytes1, SUM(n_bytes) AS bytes_all
        |  FROM m GROUP BY 1, 2)
        |SELECT media_type, CAST(COUNT(*) AS BIGINT) AS n_unique,
        |  CAST(SUM(cnt) AS BIGINT) AS n_assets,
        |  CAST(SUM(cnt) - COUNT(*) AS BIGINT) AS n_dup_rows,
        |  CAST(SUM(bytes_all) AS BIGINT) AS bytes_total,
        |  CAST(SUM(bytes1) AS BIGINT) AS bytes_dedup,
        |  ROUND(CAST(SUM(bytes_all) - SUM(bytes1) AS DOUBLE)
        |    / SUM(bytes_all), 4) AS savings
        |FROM grp GROUP BY 1 ORDER BY 1""".stripMargin
  )
}
