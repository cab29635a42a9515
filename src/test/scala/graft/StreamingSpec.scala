package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Tables
import graft.streaming.StreamingWindows

/** Drives the Structured Streaming twin end-to-end: the same transform
  * applied to readStream input must equal its batch result, and the
  * stateful per-user counter must fold across micro-batches.
  */
class StreamingSpec extends AnyFunSuite {
  import SparkTestBase._

  /** Stage a directory containing the events file (file-stream sources
    * list directories, not single files).
    */
  private def stagedDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-stream")
    java.nio.file.Files.createSymbolicLink(
      dir.resolve("events.parquet"),
      java.nio.file.Paths.get(s"$sf0001/events.parquet"))
    dir.toString
  }

  test("RocksDB state store: stream equals batch on the at-scale provider") {
    // HDFSBackedStateStore (the default here) keeps state on the
    // executor heap — the 100 TB provider is RocksDB, where state
    // lives off-heap/on-disk per partition. The aggregate twin must
    // produce identical results under it; the provider is captured at
    // query start, so scoping the conf around start() is enough.
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val q = try {
      StreamingWindows
        .tumblingCounts(StreamingWindows.eventsStream(
          spark, stagedDir, s"$sf0001/events.parquet"))
        .writeStream
        .outputMode("complete")
        .format("memory")
        .queryName("stream_tumbling_rocks")
        .start()
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
    try q.processAllAvailable()
    finally q.stop()
    val streamed = spark.table("stream_tumbling_rocks")
      .orderBy("hour_start", "event_type").collect().toSeq.map(_.toString)
    val batch = StreamingWindows.tumblingCounts(Tables.events(spark, sf0001))
      .orderBy("hour_start", "event_type").collect().toSeq.map(_.toString)
    assert(streamed.nonEmpty)
    assert(streamed === batch)
  }

  test("stream-stream interval join equals the batch θ-join across micro-batches") {
    // BOTH sides unbounded: views and purchases each buffer in the
    // state store and pair across micro-batch boundaries (a view in
    // slice 1 must still catch a purchase arriving in slice 2) — the
    // join class neither a window nor mapGroupsWithState covers. The
    // replay dir stages TWO event-time slices, one file per batch.
    import graft.streaming.StreamReplay
    val dir = StreamReplay.replayDir(spark, sf0001)
    val q = StreamingWindows
      .viewPurchaseJoin(StreamingWindows.eventsStream(
        spark, dir, s"$dir/000.parquet"), window = "24 hours")
      .writeStream
      .outputMode("append")
      .format("memory")
      .queryName("stream_ss_join")
      .start()
    try q.processAllAvailable()
    finally q.stop()

    val streamed = spark.table("stream_ss_join")
      .orderBy("v_event", "p_event").collect().toSeq.map(_.toString)
    val batch = StreamingWindows
      .viewPurchaseJoin(Tables.events(spark, sf0001), window = "24 hours")
      .orderBy("v_event", "p_event").collect().toSeq.map(_.toString)
    assert(streamed.nonEmpty, "fixture must produce view->purchase pairs")
    assert(streamed === batch)

    // pairs really cross the micro-batch boundary: the slices are cut
    // by event time, so a pair with v_ts before the second slice's
    // start and p_ts after it had its two sides in different batches
    val bound = spark.read.parquet(s"$dir/001.parquet")
      .agg(min(col("ts"))).head.getTimestamp(0)
    val crossing = spark.table("stream_ss_join")
      .filter(col("v_ts") < lit(bound) && col("p_ts") >= lit(bound))
      .count()
    assert(crossing > 0,
      "at least one joined pair must straddle the micro-batch boundary")
  }

  test("stream-stream join on BOTH providers: equality + watermark state eviction") {
    // The interval join buffers BOTH sides in the state store; this is
    // the one streaming family previously proven only on the default
    // HDFSBacked provider. Re-prove it under RocksDB (the 100 TB
    // provider) AND pin the property that makes unbounded streams
    // viable at all: once the watermark passes, join state is actually
    // REMOVED — numRowsTotal shrinks — not merely ignored. The replay
    // dir's two event-time slices span far more than the 1 h watermark
    // + 24 h join window... the watermark after slice 0 therefore
    // evicts most of slice 0's buffered rows during/after slice 1, and
    // the trailing no-data micro-batch flushes the rest.
    import graft.streaming.StreamReplay
    val dir = StreamReplay.replayDir(spark, sf0001)
    val key = "spark.sql.streaming.stateStore.providerClass"
    val batch = StreamingWindows
      .viewPurchaseJoin(Tables.events(spark, sf0001), window = "24 hours")
      .orderBy("v_event", "p_event").collect().toSeq.map(_.toString)
    assert(batch.nonEmpty)

    Seq(
      ("default", None),
      ("rocksdb", Some("org.apache.spark.sql.execution.streaming.state" +
        ".RocksDBStateStoreProvider"))
    ).foreach { case (tag, providerOpt) =>
      val prev = spark.conf.getOption(key)
      providerOpt.foreach(spark.conf.set(key, _))
      val q = try {
        StreamingWindows
          .viewPurchaseJoin(StreamingWindows.eventsStream(
            spark, dir, s"$dir/000.parquet"), window = "24 hours")
          .writeStream
          .outputMode("append")
          .format("memory")
          .queryName(s"stream_ss_join_$tag")
          .start()
      } finally prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
      try q.processAllAvailable()
      finally q.stop()

      val streamed = spark.table(s"stream_ss_join_$tag")
        .orderBy("v_event", "p_event").collect().toSeq.map(_.toString)
      assert(streamed === batch, s"provider $tag diverged from batch")

      // watermark-driven eviction: state grew while both slices
      // buffered, then shrank once the watermark passed slice 0
      val st = q.recentProgress.toSeq
        .flatMap(p => Option(p.stateOperators).toSeq.flatten)
      val totals = st.map(_.numRowsTotal)
      assert(totals.nonEmpty && totals.max > 0, s"$tag: no state recorded")
      assert(st.map(_.numRowsRemoved).sum > 0,
        s"$tag: watermark never removed any join state rows")
      assert(totals.last < totals.max,
        s"$tag: state must shrink after the watermark passes: $totals")
    }
  }

  test("tumblingCounts: streaming result equals batch result") {
    val q = StreamingWindows
      .tumblingCounts(StreamingWindows.eventsStream(
        spark, stagedDir, s"$sf0001/events.parquet"))
      .writeStream
      .outputMode("complete")
      .format("memory")
      .queryName("stream_tumbling")
      .start()
    try q.processAllAvailable()
    finally q.stop()

    val streamed = spark.table("stream_tumbling")
      .orderBy("hour_start", "event_type").collect().toSeq.map(_.toString)
    val batch = StreamingWindows.tumblingCounts(Tables.events(spark, sf0001))
      .orderBy("hour_start", "event_type").collect().toSeq.map(_.toString)
    assert(streamed.nonEmpty)
    assert(streamed === batch)
  }

  test("sliding windowedCounts: streaming equals batch") {
    val q = StreamingWindows
      .windowedCounts(StreamingWindows.eventsStream(
        spark, stagedDir, s"$sf0001/events.parquet"),
        size = "2 hours", slide = Some("1 hour"))
      .writeStream
      .outputMode("complete")
      .format("memory")
      .queryName("stream_sliding")
      .start()
    try q.processAllAvailable()
    finally q.stop()
    val streamed = spark.table("stream_sliding")
      .orderBy("hour_start", "event_type").collect().toSeq.map(_.toString)
    val batch = StreamingWindows
      .windowedCounts(Tables.events(spark, sf0001),
        size = "2 hours", slide = Some("1 hour"))
      .orderBy("hour_start", "event_type").collect().toSeq.map(_.toString)
    assert(streamed.nonEmpty && streamed === batch)
  }

  test("dedupStream: duplicated input stream deduplicates to distinct events") {
    // Stage the same file TWICE (two micro-batches of identical data) —
    // the stream must emit each event_id exactly once.
    val dir = java.nio.file.Files.createTempDirectory("graft-dup")
    java.nio.file.Files.createSymbolicLink(
      dir.resolve("a.parquet"),
      java.nio.file.Paths.get(s"$sf0001/events.parquet"))
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf0001/events.parquet"),
      dir.resolve("b.parquet"))
    val q = StreamingWindows
      .dedupStream(StreamingWindows.eventsStream(
        spark, dir.toString, s"$sf0001/events.parquet"))
      .select("event_id")
      .writeStream
      .outputMode("append")
      .format("memory")
      .queryName("stream_dedup")
      .start()
    try q.processAllAvailable()
    finally q.stop()
    val n = spark.table("stream_dedup").count()
    val distinctIds = spark.table("stream_dedup").select("event_id")
      .distinct().count()
    val expected = Tables.events(spark, sf0001).count()
    assert(n === expected)
    assert(distinctIds === expected)
  }

  test("sessionize: closed streaming sessions match batch sessionization") {
    val stream = StreamingWindows.typedEventsStream(
      spark, stagedDir, s"$sf0001/events.parquet")

    val q = StreamingWindows.sessionize(stream)
      .writeStream
      .outputMode("append")
      .format("memory")
      .queryName("stream_sessions")
      .start()
    try q.processAllAvailable()
    finally q.stop()

    val streamed = spark.table("stream_sessions")
      .orderBy("user_id", "session_id")
      .collect().toSeq.map(_.toString)
    // Batch truth from the contract query; streaming only emits CLOSED
    // sessions, so drop each user's final (still-open) session.
    val batch = SparkEntry.queries("q_window_session")(spark, sf0001)
      .select("user_id", "session_id", "n_events")
    val lastPerUser = batch.groupBy("user_id")
      .agg(max("session_id").as("session_id"))
    val closedBatch = batch.join(lastPerUser,
        Seq("user_id", "session_id"), "left_anti")
      .orderBy("user_id", "session_id")
      .collect().toSeq.map(_.toString)
    assert(streamed.nonEmpty)
    assert(streamed === closedBatch)
  }

  test("scd2Intervals: closed streaming intervals match batch history build") {
    val stream = StreamingWindows.typedEventsStream(
      spark, stagedDir, s"$sf0001/events.parquet")

    val q = StreamingWindows.scd2Intervals(stream)
      .writeStream
      .outputMode("append")
      .format("memory")
      .queryName("stream_scd2")
      .start()
    try q.processAllAvailable()
    finally q.stop()

    val streamed = spark.table("stream_scd2")
      .orderBy("user_id", "rn")
      .collect().toSeq.map(_.toString)
    // Batch truth from the contract query; streaming emits only CLOSED
    // intervals, so keep the batch rows with a non-null to_us.
    val closedBatch = SparkEntry.queries("q_scd2_intervals")(spark, sf0001)
      .filter("to_us IS NOT NULL")
      .select("user_id", "rn", "state", "from_us", "to_us", "n_ev")
      .orderBy("user_id", "rn")
      .collect().toSeq.map(_.toString)
    assert(streamed.nonEmpty)
    assert(streamed === closedBatch)
  }

  test("userRunningCounts: stateful fold equals batch groupBy count") {
    val raw = StreamingWindows.typedEvents(spark, s"$sf0001/events.parquet")
    val stream = StreamingWindows.typedEventsStream(
      spark, stagedDir, s"$sf0001/events.parquet")

    val q = StreamingWindows.userRunningCounts(stream)
      .writeStream
      .outputMode("update")
      .format("memory")
      .queryName("stream_user_counts")
      .start()
    try q.processAllAvailable()
    finally q.stop()

    // Single input file → one micro-batch → final state equals batch agg.
    val streamed = spark.table("stream_user_counts")
      .groupBy("user_id").agg(max("n_events").as("n_events"))
      .orderBy("user_id").collect().toSeq.map(_.toString)
    val batch = raw.groupBy("user_id").agg(count(lit(1)).as("n_events"))
      .orderBy("user_id").collect().toSeq.map(_.toString)
    assert(streamed.nonEmpty)
    assert(streamed === batch)
  }

  test("errorPurchaseJoin: stream-stream interval join equals batch join") {
    // one staged dir, two filtered views of the same file stream — a
    // watermarked stream-stream self-join (inner joins emit matches as
    // they arrive; the watermark only bounds state)
    val src = StreamingWindows.eventsStream(
      spark, stagedDir, s"$sf0001/events.parquet")
    val q = StreamingWindows.errorPurchaseJoin(
        src.filter(col("event_type") === "error"),
        src.filter(col("event_type") === "purchase"))
      .writeStream
      .outputMode("append")
      .format("memory")
      .queryName("stream_interval_join")
      .start()
    try q.processAllAvailable()
    finally q.stop()

    val streamed = spark.table("stream_interval_join")
      .orderBy("err_id", "p_id").collect().toSeq.map(_.toString)
    val ev = Tables.events(spark, sf0001)
    val batch = StreamingWindows.errorPurchaseJoin(
        ev.filter(col("event_type") === "error"),
        ev.filter(col("event_type") === "purchase"))
      .orderBy("err_id", "p_id").collect().toSeq.map(_.toString)
    assert(streamed.nonEmpty)
    assert(streamed === batch)
  }

  test("contentDedupStream: replayed file dedups across micro-batches") {
    // two links to the same parquet = two micro-batches of identical
    // documents; cross-batch digest state must drop the replay
    val dir = java.nio.file.Files.createTempDirectory("graft-docstream")
    java.nio.file.Files.createSymbolicLink(
      dir.resolve("d1.parquet"),
      java.nio.file.Paths.get(s"$sf0001/documents.parquet"))
    java.nio.file.Files.createSymbolicLink(
      dir.resolve("d2.parquet"),
      java.nio.file.Paths.get(s"$sf0001/documents.parquet"))
    val q = StreamingWindows
      .contentDedupStream(StreamingWindows.tableStream(
        spark, dir.toString, s"$sf0001/documents.parquet"))
      .writeStream
      .outputMode("append")
      .format("memory")
      .queryName("stream_content_dedup")
      .start()
    try q.processAllAvailable()
    finally q.stop()
    val streamed = spark.table("stream_content_dedup")
    // every distinct digest exactly once despite double delivery
    assert(streamed.count() === 500L)
    assert(streamed.select("h").distinct().count() === 500L)
    val batch = graft.sources.Tables.documents(spark, sf0001)
      .select(org.apache.spark.sql.functions.md5(
        org.apache.spark.sql.functions.col("text").cast("binary")))
      .distinct().count()
    assert(batch === 500L)
  }

  test("latestRecord: replayed upsert view equals batch q_agg_argmax") {
    import spark.implicits._
    // two links to the same events file = two micro-batches of the
    // same data: the champion fold must be idempotent under replay and
    // its final view must equal the batch latest-record contract query
    val dir = java.nio.file.Files.createTempDirectory("graft-latest")
    java.nio.file.Files.createSymbolicLink(
      dir.resolve("e1.parquet"),
      java.nio.file.Paths.get(s"$sf0001/events.parquet"))
    java.nio.file.Files.createSymbolicLink(
      dir.resolve("e2.parquet"),
      java.nio.file.Paths.get(s"$sf0001/events.parquet"))
    val stream = StreamingWindows.typedEventsStream(
      spark, dir.toString, s"$sf0001/events.parquet",
      maxFilesPerTrigger = Some(1))

    val q = StreamingWindows.latestRecord(stream)
      .writeStream
      .outputMode("update")
      .format("memory")
      .queryName("stream_latest")
      .start()
    try q.processAllAvailable()
    finally q.stop()

    // both micro-batches carry identical data, so every update emitted
    // for a user is the same champion row — distinct = the final view
    val streamed = spark.table("stream_latest").distinct()
      .select(col("user_id"), col("last_type"),
        date_format(expr("timestamp_micros(last_us)"), "yyyy-MM-dd HH:mm:ss")
          .as("last_ts"))
      .orderBy("user_id").collect().toSeq.map(_.toString)
    val batch = SparkEntry.queries("q_agg_argmax")(spark, sf0001)
      .collect().toSeq.map(_.toString)
    assert(streamed.nonEmpty)
    assert(streamed === batch)
  }

  test("watermark drops late data in append mode across micro-batches") {
    import spark.implicits._
    // Batch 0 (two 00:xx events, one each at 01/02/03) advances the
    // watermark to 03:10 − 1 h = 02:10. The LATE 00:20 event arrives
    // in batch 2 — two batches later, deliberately: Spark's
    // late-events filter uses a LAGGED watermark (batch N filters with
    // the watermark as of batch N−2's end; eviction uses N−1's), so a
    // late row arriving in the very next batch is still aggregated —
    // the documented guarantee is one-sided ("never drop data newer
    // than the watermark"), not "always drop older". Probed
    // empirically on this Spark: the same row one batch earlier lands
    // in the emitted window. By batch 2 the filter watermark is 02:10
    // > the row's window end 01:00, so it must be dropped — and since
    // the 00-window was already emitted at batch 1's end (eviction
    // watermark 02:10), a leak would show up as a DUPLICATE 00-window
    // row with count 1 in the append output. Final sink: 00→2, 01→1,
    // 02→1, 03→1, exactly once each; the 04/05 windows never close on
    // a bounded stream.
    val dir = java.nio.file.Files.createTempDirectory("graft-late")
    // stage each batch as a PLAIN FILE (the stream source does not
    // recurse into write.parquet's output directories)
    def write(name: String, mtime: Long, rows: Seq[(Long, String)]): Unit = {
      val tmp = dir.resolve(s"_$name")
      rows.toDF("event_id", "t")
        .select(col("event_id"), to_timestamp(col("t")).as("ts"),
          lit(7L).as("user_id"), lit("click").as("event_type"),
          lit(1.0).as("value"), lit("{}").as("props"))
        .coalesce(1).write.parquet(tmp.toString)
      import scala.jdk.CollectionConverters._
      val listing = java.nio.file.Files.list(tmp)
      val part = try {
        listing.iterator().asScala
          .filter(_.getFileName.toString.endsWith(".parquet")).toSeq.head
      } finally listing.close()
      val f = dir.resolve(name)
      java.nio.file.Files.move(part, f)
      java.nio.file.Files.setLastModifiedTime(f,
        java.nio.file.attribute.FileTime.fromMillis(mtime))
    }
    write("b1.parquet", 1000000000000L, Seq(
      (1L, "2024-01-01 00:10:00"), (2L, "2024-01-01 00:40:00"),
      (3L, "2024-01-01 01:10:00"), (4L, "2024-01-01 02:10:00"),
      (5L, "2024-01-01 03:10:00")))
    write("b2.parquet", 1000000060000L, Seq(
      (6L, "2024-01-01 04:10:00")))  // advances the watermark only
    write("b3.parquet", 1000000120000L, Seq(
      (7L, "2024-01-01 00:20:00"),   // LATE: two batches behind — drop
      (8L, "2024-01-01 05:10:00")))  // on-time, window stays open
    val q = StreamingWindows
      .tumblingCounts(StreamingWindows.eventsStream(
        spark, dir.toString, s"${dir.resolve("b1.parquet")}"))
      .writeStream.outputMode("append").format("memory")
      .queryName("stream_late").start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table("stream_late")
      .select(date_format(col("hour_start"), "HH").as("h"), col("n"))
      .orderBy("h").collect().toSeq.map(r => (r.getString(0), r.getLong(1)))
    assert(got === Seq(("00", 2L), ("01", 1L), ("02", 1L), ("03", 1L)),
      s"late row leaked or append discipline broke: $got")
  }

  test("StreamReplay staging: slices cover events exactly, in time order") {
    import graft.streaming.StreamReplay
    val dir = StreamReplay.replayDir(spark, sf0001)
    val files = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet")).sortBy(_.getName)
    assert(files.length === 2)
    assert(files.map(_.getName).toSeq === Seq("000.parquet", "001.parquet"))
    // mtimes strictly ascending — the file stream's replay order key
    assert(files(0).lastModified < files(1).lastModified)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val slices = files.map(f => spark.read.parquet(f.getPath))
    // disjoint exact cover of the fixture
    val total = Tables.events(spark, sf0001).count()
    assert(slices.map(_.count()).sum === total)
    assert(slices.map(_.select("event_id")).reduce(_ union _)
      .distinct().count() === total)
    // contiguous event-time ranges: slice 0 ends before slice 1 begins
    val hi0 = slices(0).agg(max(unix_micros(col("ts")))).head().getLong(0)
    val lo1 = slices(1).agg(min(unix_micros(col("ts")))).head().getLong(0)
    assert(hi0 < lo1, s"slice boundary overlap: $hi0 >= $lo1")
  }

  // r18/r19 micro-batch accounting pin (VERDICT r18 #4): with
  // noDataMicroBatches=false a bounded 2-slice replay runs exactly TWO
  // micro-batches when throttled to one file per trigger (no trailing
  // no-data batch — the r18 optimization), and exactly ONE when the
  // source is unthrottled (the r19 q_stream_sink catch-up shape). Each
  // extra batch is a full planning + per-partition state-commit + sink
  // round, so a regression here is a silent ~25-50% streaming-cost
  // increase the row-level oracle can never see.
  test("bounded replay pays exactly one micro-batch per arriving file, none extra") {
    import graft.streaming.StreamReplay
    val dir = StreamReplay.replayDir(spark, sf0001)
    val key = "spark.sql.streaming.noDataMicroBatches.enabled"
    val prev = spark.conf.get(key, "true")
    def lastBatchId(throttle: Option[Int]): Long = {
      spark.conf.set(key, "false")
      val q = try {
        StreamingWindows
          .tumblingCounts(StreamingWindows.eventsStream(
            spark, dir, s"$dir/000.parquet", maxFilesPerTrigger = throttle))
          .writeStream.outputMode("complete").format("memory")
          .queryName(s"stream_batch_count_${throttle.isDefined}").start()
      } finally spark.conf.set(key, prev)
      try { q.processAllAvailable(); q.lastProgress.batchId }
      finally q.stop()
    }
    assert(lastBatchId(Some(1)) === 1L,
      "throttled 2-slice replay must run exactly batches 0 and 1")
    assert(lastBatchId(None) === 0L,
      "unthrottled bounded replay must drain in the single batch 0")
  }

  test("heavyHittersStream: bounded MG state covers every frequent token") {
    import spark.implicits._
    // two links to the same documents file = the token stream delivered
    // across two micro-batches; MG state must fold across them
    val dir = java.nio.file.Files.createTempDirectory("graft-hhstream")
    java.nio.file.Files.createSymbolicLink(
      dir.resolve("d1.parquet"),
      java.nio.file.Paths.get(s"$sf0001/documents.parquet"))
    java.nio.file.Files.createSymbolicLink(
      dir.resolve("d2.parquet"),
      java.nio.file.Paths.get(s"$sf0001/documents.parquet"))
    val buckets = 8
    val capacity = 16
    val toks = StreamingWindows
      .tableStream(spark, dir.toString, s"$sf0001/documents.parquet")
      .select(explode(expr("filter(split(text, ' '), t -> t <> '')"))
        .as("token"))
      .as[StreamingWindows.TokenRow]
    val q = StreamingWindows.heavyHittersStream(toks, buckets, capacity)
      .writeStream
      .outputMode("update")
      .format("memory")
      .queryName("stream_hh")
      .start()
    try q.processAllAvailable()
    finally q.stop()

    // final snapshot per bucket = the row with the max processed count
    val finals = spark.table("stream_hh")
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("bucket")
          .orderBy(col("processed").desc)))
      .filter(col("rn") === 1)
      .select(col("bucket"), col("words"))
      .as[(Int, List[String])].collect().toMap

    // state stayed bounded: ≤ capacity counters per bucket
    assert(finals.values.forall(_.size <= capacity))

    // exact per-bucket counts of the DOUBLED stream, computed directly
    val tokenCounts = Tables.documents(spark, sf0001)
      .select(explode(expr("filter(split(text, ' '), t -> t <> '')"))
        .as("w"))
      .groupBy("w").count()
      .as[(String, Long)].collect()
      .map { case (w, c) => (w, 2L * c) } // two identical micro-batches
    val byBucket = tokenCounts
      .groupBy { case (w, _) => math.floorMod(w.hashCode, buckets) }
    // the MG guarantee, per bucket: every token with in-bucket count
    // > n_b/(capacity+1) must survive in that bucket's candidates
    var checked = 0
    byBucket.foreach { case (b, ws) =>
      val nb = ws.map(_._2).sum
      val frequent = ws.filter { case (_, c) =>
        c * (capacity + 1) > nb }.map(_._1).toSet
      checked += frequent.size
      assert(frequent.subsetOf(finals.getOrElse(b, Nil).toSet),
        s"bucket $b lost frequent tokens ${
          frequent -- finals.getOrElse(b, Nil).toSet}")
    }
    assert(checked > 0, "no bucket had a frequent token — vacuous test")
  }

  test("thetaSketchStream: bounded KMV state equals the batch sketch on a doubled replay") {
    import spark.implicits._
    // two links to the same events file = two micro-batches delivering
    // the SAME data twice: KMV insertion is duplication-insensitive, so
    // the final state must still equal the single-copy batch sketch
    val dir = java.nio.file.Files.createTempDirectory("graft-kmvstream")
    java.nio.file.Files.createSymbolicLink(
      dir.resolve("e1.parquet"),
      java.nio.file.Paths.get(s"$sf0001/events.parquet"))
    java.nio.file.Files.createSymbolicLink(
      dir.resolve("e2.parquet"),
      java.nio.file.Paths.get(s"$sf0001/events.parquet"))
    val k = 64
    val rows = StreamingWindows
      .tableStream(spark, dir.toString, s"$sf0001/events.parquet")
      .select(col("event_type").as("key"), col("user_id").as("value"))
      .as[StreamingWindows.KeyedLong]
    val q = StreamingWindows.thetaSketchStream(rows, k)
      .writeStream
      .outputMode("update")
      .format("memory")
      .queryName("stream_kmv")
      .start()
    try q.processAllAvailable()
    finally q.stop()

    val finals = spark.table("stream_kmv")
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("key")
          .orderBy(col("processed").desc)))
      .filter(col("rn") === 1)
      .select(col("key"), col("kmv"))
      .as[(String, List[Long])].collect().toMap
    assert(finals.nonEmpty && finals.values.forall(_.size <= k))

    val batch = graft.operators.ThetaSketch
      .sketch(spark.read.parquet(s"$sf0001/events.parquet")
        .select("event_type", "user_id"),
        Seq("event_type"), "user_id", k)
      .collect()
      .map(r => r.getString(0) -> r.getSeq[Long](1).toList).toMap
    assert(finals === batch)
  }
}
