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
  * the scan-level filter is applied explicitly first) — while the codec
  * itself is a clearly-marked deterministic STUB: this container ships
  * no image/audio/video libraries, so `MediaCodec.decode` derives fake
  * dimensions from the payload bytes. Swapping in a real codec changes
  * only that one function; the distributed shape is unchanged.
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
