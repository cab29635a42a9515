package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.ChangeDataCapture
import graft.streaming.UpsertFileSink

/** Exactly-once guarantees of the parquet upsert landing zone: batch
  * apply semantics, double-delivery no-ops, torn-write recovery, a
  * real foreachBatch stream equaling the one-shot batch apply, and
  * vacuum safety.
  */
class UpsertFileSinkSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private def tmpRoot(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-sink-$tag").toString

  private def snapshot(root: String): Seq[(Long, String)] = {
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("key",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("value",
        org.apache.spark.sql.types.StringType)))
    UpsertFileSink.readSnapshot(spark, root, schema)
      .orderBy("key").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
  }

  test("upsert/delete semantics and double-delivery no-op") {
    import spark.implicits._
    val root = tmpRoot("b")
    val b0 = Seq(
      (1L, "a", "I", 10L), (2L, "b", "I", 11L),
      (3L, "c", "I", 12L), (4L, "d", "I", 13L))
      .toDF("key", "value", "op", "seq")
    UpsertFileSink.upsertBatch(b0, 0L, root, Seq("key"))
    assert(UpsertFileSink.lastCommitted(spark, root) === Some(0L))
    assert(snapshot(root) === Seq(1L -> "a", 2L -> "b", 3L -> "c", 4L -> "d"))

    // replayed delivery of a committed batch: bit-for-bit no-op
    UpsertFileSink.upsertBatch(b0, 0L, root, Seq("key"))
    assert(UpsertFileSink.lastCommitted(spark, root) === Some(0L))
    assert(snapshot(root) === Seq(1L -> "a", 2L -> "b", 3L -> "c", 4L -> "d"))

    val b1 = Seq(
      (2L, "B2", "U", 20L), (3L, null.asInstanceOf[String], "D", 21L),
      (5L, "e", "I", 22L))
      .toDF("key", "value", "op", "seq")
    UpsertFileSink.upsertBatch(b1, 1L, root, Seq("key"))
    assert(UpsertFileSink.lastCommitted(spark, root) === Some(1L))
    assert(snapshot(root) === Seq(1L -> "a", 2L -> "B2", 4L -> "d", 5L -> "e"))

    // replay batch 1 too: still unchanged
    UpsertFileSink.upsertBatch(b1, 1L, root, Seq("key"))
    assert(snapshot(root) === Seq(1L -> "a", 2L -> "B2", 4L -> "d", 5L -> "e"))
  }

  test("torn write: an uncommitted version is invisible and overwritten") {
    import spark.implicits._
    val root = tmpRoot("torn")
    UpsertFileSink.upsertBatch(
      Seq((1L, "a", "I", 1L)).toDF("key", "value", "op", "seq"),
      0L, root, Seq("key"))

    // simulate a dead attempt: v=1 parquet exists with GARBAGE rows,
    // but no marker — a reader must still see v=0, and the retried
    // batch must overwrite the orphan
    Seq((999L, "GARBAGE")).toDF("key", "value")
      .write.mode("overwrite").parquet(s"$root/v=1")
    assert(UpsertFileSink.lastCommitted(spark, root) === Some(0L))
    assert(snapshot(root) === Seq(1L -> "a"))

    val b1 = Seq((2L, "b", "I", 2L)).toDF("key", "value", "op", "seq")
    UpsertFileSink.upsertBatch(b1, 1L, root, Seq("key"))
    assert(snapshot(root) === Seq(1L -> "a", 2L -> "b"),
      "retry must merge against v=0, not the torn v=1")
  }

  test("foreachBatch stream equals the one-shot batch apply; replay is a no-op") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val root = tmpRoot("e2e")
    val mem = MemoryStream[(Long, String, String, Long)]

    val q = mem.toDF().toDF("key", "value", "op", "seq")
      .writeStream
      .option("checkpointLocation", tmpRoot("ckpt"))
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, id: Long) =>
        UpsertFileSink.upsertBatch(df, id, root, Seq("key"))
      }
      .start()
    val batches = Seq(
      Seq((1L, "a", "I", 1L), (2L, "b", "I", 2L)),
      Seq((1L, "A", "U", 3L), (3L, "c", "I", 4L)),
      Seq((2L, null.asInstanceOf[String], "D", 5L), (4L, "d", "I", 6L)))
    try {
      batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
    } finally q.stop()

    // final table == applying ALL changes at once to an empty base
    val all = batches.flatten.toDF("key", "value", "op", "seq")
    val expect = ChangeDataCapture.applyChangelog(
      all.select("key", "value").limit(0), all, Seq("key"))
      .orderBy("key").collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(snapshot(root) === expect)
    assert(snapshot(root) === Seq(1L -> "A", 3L -> "c", 4L -> "d"))

    // engine-style replay of the LAST micro-batch (same id, same data):
    // exactly-once means the table cannot move
    val last = batches.last.toDF("key", "value", "op", "seq")
    UpsertFileSink.upsertBatch(last,
      UpsertFileSink.lastCommitted(spark, root).get, root, Seq("key"))
    assert(snapshot(root) === expect)
  }

  test("upsertsOnly stamps op/seq for update-mode aggregates") {
    import spark.implicits._
    val root = tmpRoot("uo")
    UpsertFileSink.upsertsOnly(
      Seq((1L, "x"), (2L, "y")).toDF("key", "value"), 0L, root, Seq("key"))
    UpsertFileSink.upsertsOnly(
      Seq((2L, "Y2"), (3L, "z")).toDF("key", "value"), 1L, root, Seq("key"))
    assert(snapshot(root) === Seq(1L -> "x", 2L -> "Y2", 3L -> "z"))
  }

  test("landing zone e2e: update-mode windowed aggregate -> exactly-once files") {
    // the piece a production ingest runs end-to-end: the events fixture
    // replayed as two event-time micro-batches through the watermarked
    // windowed aggregate (update mode re-emits a window's row whenever
    // a batch changes it) into the upsert sink keyed by the window —
    // the final parquet table must equal the plain batch aggregate,
    // with the re-emissions absorbed by seq=batchId newest-wins.
    import graft.streaming.{StreamingWindows, StreamReplay}
    val root = tmpRoot("land")
    val sf = SparkTestBase.sf0001
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    val q = try {
      StreamingWindows.windowedCounts(
        StreamingWindows.eventsStream(spark,
          StreamReplay.replayDir(spark, sf), s"$sf/events.parquet"))
        .writeStream
        .outputMode("update")
        .option("checkpointLocation", tmpRoot("land-ckpt"))
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, id: Long) =>
          UpsertFileSink.upsertsOnly(df, id, root,
            Seq("hour_start", "event_type"))
        }
        .start()
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    try q.processAllAvailable() finally q.stop()

    val got = spark.read
      .parquet(s"$root/v=${UpsertFileSink.lastCommitted(spark, root).get}")
      .orderBy("hour_start", "event_type")
      .collect().map(_.toString).toSeq
    val expect = StreamingWindows.windowedCounts(
      graft.sources.Tables.events(spark, sf))
      .orderBy("hour_start", "event_type")
      .collect().map(_.toString).toSeq
    assert(got === expect,
      "exactly-once landing table must equal the batch aggregate")
    assert(got.nonEmpty)
  }

  test("time travel reads any retained committed version; rejects others") {
    import spark.implicits._
    val root = tmpRoot("tt")
    val schema = Seq((1L, "a")).toDF("key", "value").schema
    UpsertFileSink.upsertBatch(
      Seq((1L, "a", "I", 1L)).toDF("key", "value", "op", "seq"),
      0L, root, Seq("key"))
    UpsertFileSink.upsertBatch(
      Seq((1L, "A2", "U", 2L), (2L, "b", "I", 3L))
        .toDF("key", "value", "op", "seq"),
      1L, root, Seq("key"))
    val v0 = UpsertFileSink.readVersion(spark, root, 0L, schema)
      .orderBy("key").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(v0.toSeq === Seq(1L -> "a"))
    val v1 = UpsertFileSink.readVersion(spark, root, 1L, schema)
      .orderBy("key").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(v1.toSeq === Seq(1L -> "A2", 2L -> "b"))
    intercept[IllegalArgumentException] {
      UpsertFileSink.readVersion(spark, root, 7L, schema)
    }
  }

  test("schema evolution: a later batch may ADD payload columns") {
    import spark.implicits._
    val root = tmpRoot("evo")
    UpsertFileSink.upsertBatch(
      Seq((1L, "a", "I", 1L), (2L, "b", "I", 2L))
        .toDF("key", "value", "op", "seq"),
      0L, root, Seq("key"))
    // batch 1 carries an extra column; the old snapshot's missing
    // column reads back as NULL for untouched keys (parquet schema
    // superset), the new rows carry it
    UpsertFileSink.upsertBatch(
      Seq((2L, "B2", "en", "U", 3L), (3L, "c", "fr", "I", 4L))
        .toDF("key", "value", "lang", "op", "seq"),
      1L, root, Seq("key"))
    val schema = Seq((1L, "a", "x")).toDF("key", "value", "lang").schema
    val rows = UpsertFileSink.readSnapshot(spark, root, schema)
      .orderBy("key").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    assert(rows.toSeq === Seq(
      (1L, "a", null), (2L, "B2", "en"), (3L, "c", "fr")))
  }

  // ---- bucketed (partition-level) variant ---------------------------

  private def bucketedSnapshot(root: String): Seq[(Long, String)] = {
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("key",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("value",
        org.apache.spark.sql.types.StringType)))
    UpsertFileSink.readSnapshotBucketed(spark, root, schema)
      .orderBy("key").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
  }

  private def bucketVersions(root: String): Map[Int, Set[Long]] = {
    val f = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val bdir = new org.apache.hadoop.fs.Path(root, "buckets")
    if (!f.exists(bdir)) Map.empty
    else f.listStatus(bdir).toSeq.map { st =>
      st.getPath.getName.toInt ->
        f.listStatus(st.getPath).toSeq.map(_.getPath.getName)
          .filter(_.startsWith("v=")).map(_.stripPrefix("v=").toLong).toSet
    }.toMap
  }

  test("bucketed upsert rewrites ONLY touched buckets; idle ones keep old versions") {
    import spark.implicits._
    val root = tmpRoot("bk")
    val nB = 8
    // batch 0: keys spread over many buckets
    val keys0 = (0L until 64L)
    UpsertFileSink.upsertBatchBucketed(
      keys0.map(k => (k, s"v$k", "I", 1L)).toDF("key", "value", "op", "seq"),
      0L, root, Seq("key"), nB)
    val v0 = bucketVersions(root)
    assert(v0.nonEmpty && v0.values.forall(_ === Set(0L)))

    // batch 1: ONE key → exactly one bucket gains v=1
    UpsertFileSink.upsertBatchBucketed(
      Seq((5L, "V5b", "U", 2L)).toDF("key", "value", "op", "seq"),
      1L, root, Seq("key"), nB)
    val v1 = bucketVersions(root)
    val gained = v1.filter(_._2.contains(1L)).keys.toSeq
    assert(gained.size === 1, s"exactly one bucket rewritten, got $v1")
    assert(v1.filterNot(_._2.contains(1L)).values.forall(_ === Set(0L)),
      "idle buckets must keep only their old version")

    // read-back equals the flat-apply reference
    val expect = keys0.map(k => (k, if (k == 5L) "V5b" else s"v$k")).sorted
    assert(bucketedSnapshot(root) === expect)

    // replay of batch 1 (marker present): bit-for-bit no-op
    UpsertFileSink.upsertBatchBucketed(
      Seq((5L, "GARBAGE", "U", 99L)).toDF("key", "value", "op", "seq"),
      1L, root, Seq("key"), nB)
    assert(bucketedSnapshot(root) === expect)
    assert(bucketVersions(root) === v1)
  }

  test("bucketed torn write: a multi-bucket batch is all-or-nothing") {
    import spark.implicits._
    val root = tmpRoot("bk-torn")
    val nB = 4
    UpsertFileSink.upsertBatchBucketed(
      (0L until 16L).map(k => (k, s"v$k", "I", 1L))
        .toDF("key", "value", "op", "seq"),
      0L, root, Seq("key"), nB)
    // simulate a dead attempt that wrote SOME bucket versions for
    // batch 1 but died before the marker
    Seq((0L, "TORN")).toDF("key", "value")
      .write.mode("overwrite").parquet(s"$root/buckets/0/v=1")
    Seq((1L, "TORN")).toDF("key", "value")
      .write.mode("overwrite").parquet(s"$root/buckets/1/v=1")
    val before = bucketedSnapshot(root)
    assert(!before.exists(_._2 == "TORN"),
      "uncommitted bucket versions must be invisible")
    // the retried batch overwrites the orphans and commits atomically
    UpsertFileSink.upsertBatchBucketed(
      Seq((0L, "A", "U", 2L), (1L, "B", "U", 2L), (2L, "C", "U", 2L))
        .toDF("key", "value", "op", "seq"),
      1L, root, Seq("key"), nB)
    val after = bucketedSnapshot(root).toMap
    assert(after(0L) === "A" && after(1L) === "B" && after(2L) === "C")
    assert(!after.values.exists(_ == "TORN"))
  }

  test("bucketed deletes remove keys; vacuumBucketed keeps idle buckets visible") {
    import spark.implicits._
    val root = tmpRoot("bk-vac")
    val nB = 4
    UpsertFileSink.upsertBatchBucketed(
      (0L until 16L).map(k => (k, s"v$k", "I", 1L))
        .toDF("key", "value", "op", "seq"),
      0L, root, Seq("key"), nB)
    // several batches touching overlapping buckets, incl. a delete
    UpsertFileSink.upsertBatchBucketed(
      Seq((3L, null.asInstanceOf[String], "D", 2L), (4L, "V4", "U", 3L))
        .toDF("key", "value", "op", "seq"),
      1L, root, Seq("key"), nB)
    UpsertFileSink.upsertBatchBucketed(
      Seq((4L, "V4c", "U", 4L)).toDF("key", "value", "op", "seq"),
      2L, root, Seq("key"), nB)
    val expect = (0L until 16L).filter(_ != 3L)
      .map(k => (k, if (k == 4L) "V4c" else s"v$k")).sorted
    assert(bucketedSnapshot(root) === expect)

    UpsertFileSink.vacuumBucketed(spark, root)
    // still readable, identical content — idle buckets' old versions
    // and their markers survived
    assert(bucketedSnapshot(root) === expect)
    // per bucket only ONE version remains
    assert(bucketVersions(root).values.forall(_.size === 1))
  }

  private def commitFiles(root: String): Seq[String] = {
    val f = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dir = new org.apache.hadoop.fs.Path(root, "_commits")
    if (!f.exists(dir)) Seq.empty
    else f.listStatus(dir).toSeq.map(_.getPath.getName).sorted
  }

  test("compacted manifest: checkpoint + fresh markers resolve the table") {
    import spark.implicits._
    val root = tmpRoot("bk-ckpt")
    val nB = 4
    // 6 batches, checkpoint every 3 → checkpoints at batch ids 2 and 5
    (0L to 5L).foreach { i =>
      UpsertFileSink.upsertBatchBucketed(
        Seq((i % 8, s"v$i", "U", i)).toDF("key", "value", "op", "seq"),
        i, root, Seq("key"), nB, checkpointEvery = 3)
    }
    val expect = (0L to 5L).map(i => (i % 8, s"v$i")).groupBy(_._1)
      .map { case (k, vs) => (k, vs.last._2) }.toSeq.sorted
    assert(bucketedSnapshot(root) === expect)
    assert(commitFiles(root).contains("checkpoint.5"))
    assert(!commitFiles(root).contains("checkpoint.2"),
      "a newer checkpoint must retire the older one")

    // read-after-checkpoint equality: delete every covered marker —
    // the checkpoint alone must still resolve the table
    val f = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    (0L to 5L).foreach(i => f.delete(
      new org.apache.hadoop.fs.Path(s"$root/_commits/$i"), false))
    assert(bucketedSnapshot(root) === expect,
      "checkpoint must stand in for all compacted markers")

    // replay of a compacted batch (marker gone, id ≤ checkpoint head):
    // must be a no-op, not a re-merge
    UpsertFileSink.upsertBatchBucketed(
      Seq((3L, "GARBAGE", "U", 99L)).toDF("key", "value", "op", "seq"),
      3L, root, Seq("key"), nB)
    assert(bucketedSnapshot(root) === expect)

    // post-checkpoint batches land on top of the checkpointed base
    UpsertFileSink.upsertBatchBucketed(
      Seq((2L, "NEW", "U", 60L)).toDF("key", "value", "op", "seq"),
      6L, root, Seq("key"), nB)
    val expect2 = expect.map { case (k, v) => (k, if (k == 2L) "NEW" else v) }
    assert(bucketedSnapshot(root) === expect2)
  }

  test("compacted manifest: crash between marker and checkpoint is safe") {
    import spark.implicits._
    val root = tmpRoot("bk-crash")
    val nB = 4
    (0L to 2L).foreach { i =>
      UpsertFileSink.upsertBatchBucketed(
        Seq((i, s"v$i", "I", i)).toDF("key", "value", "op", "seq"),
        i, root, Seq("key"), nB)
    }
    UpsertFileSink.writeBucketedCheckpoint(spark, root)
    // batch 3 commits its marker, then the process dies BEFORE its
    // writer would have checkpointed — readers must see the marker
    UpsertFileSink.upsertBatchBucketed(
      Seq((3L, "v3", "I", 3L)).toDF("key", "value", "op", "seq"),
      3L, root, Seq("key"), nB)
    assert(bucketedSnapshot(root) ===
      (0L to 3L).map(i => (i, s"v$i")).sorted)
    // a later checkpoint absorbs it; rewriting is idempotent
    UpsertFileSink.writeBucketedCheckpoint(spark, root)
    UpsertFileSink.writeBucketedCheckpoint(spark, root)
    assert(commitFiles(root).contains("checkpoint.3"))
    assert(bucketedSnapshot(root) ===
      (0L to 3L).map(i => (i, s"v$i")).sorted)
  }

  test("compacted manifest: vacuum deletes covered markers, listing stays O(K)") {
    import spark.implicits._
    val root = tmpRoot("bk-okn")
    val nB = 4
    val K = 4
    // a long stream: 20 batches, checkpoint every K, vacuum after each
    // checkpoint — the _commits listing must stay bounded by ~K, never
    // grow with total batch count
    (0L until 20L).foreach { i =>
      UpsertFileSink.upsertBatchBucketed(
        Seq((i % 8, s"v$i", "U", i)).toDF("key", "value", "op", "seq"),
        i, root, Seq("key"), nB, checkpointEvery = K)
      if ((i + 1) % K == 0) UpsertFileSink.vacuumBucketed(spark, root)
    }
    val expect = (0L until 20L).map(i => (i % 8, s"v$i")).groupBy(_._1)
      .map { case (k, vs) => (k, vs.last._2) }.toSeq.sorted
    assert(bucketedSnapshot(root) === expect)
    val files = commitFiles(root)
    assert(files.count(_.forall(_.isDigit)) <= K + 1,
      s"markers must not accumulate past one checkpoint window: $files")
    assert(files.count(_.startsWith("checkpoint.")) === 1,
      s"exactly one live checkpoint: $files")
    // per bucket, exactly one surviving version after the final vacuum
    assert(bucketVersions(root).values.forall(_.size === 1))
    // and the whole table still time-consistent after one more batch
    UpsertFileSink.upsertBatchBucketed(
      Seq((0L, "FINAL", "U", 100L)).toDF("key", "value", "op", "seq"),
      20L, root, Seq("key"), nB)
    assert(bucketedSnapshot(root).toMap.apply(0L) === "FINAL")
  }

  test("bucketed time travel: as-of reads resolve per-bucket history") {
    import spark.implicits._
    val root = tmpRoot("bk-asof")
    val nB = 4
    UpsertFileSink.upsertBatchBucketed(
      (0L until 8L).map(k => (k, s"v$k", "I", 0L))
        .toDF("key", "value", "op", "seq"),
      0L, root, Seq("key"), nB)
    UpsertFileSink.upsertBatchBucketed(
      Seq((3L, "V3b", "U", 1L)).toDF("key", "value", "op", "seq"),
      1L, root, Seq("key"), nB)
    UpsertFileSink.upsertBatchBucketed(
      Seq((3L, null.asInstanceOf[String], "D", 2L), (8L, "v8", "I", 2L))
        .toDF("key", "value", "op", "seq"),
      2L, root, Seq("key"), nB)

    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("key",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("value",
        org.apache.spark.sql.types.StringType)))
    def asOf(v: Long) = UpsertFileSink
      .readSnapshotBucketedAsOf(spark, root, schema, v)
      .orderBy("key").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq

    assert(asOf(-1L) === Seq.empty)
    assert(asOf(0L) === (0L until 8L).map(k => (k, s"v$k")))
    assert(asOf(1L) === (0L until 8L)
      .map(k => (k, if (k == 3L) "V3b" else s"v$k")))
    assert(asOf(2L) === ((0L until 8L).filter(_ != 3L)
      .map(k => (k, s"v$k")) :+ (8L -> "v8")).sorted)
    assert(asOf(2L) === bucketedSnapshot(root), "as-of head == live read")
    // a checkpoint doesn't break history (as-of uses the listing path)
    UpsertFileSink.writeBucketedCheckpoint(spark, root)
    assert(asOf(1L) === (0L until 8L)
      .map(k => (k, if (k == 3L) "V3b" else s"v$k")))
    // vacuum bounds retention: the head stays exact
    UpsertFileSink.vacuumBucketed(spark, root)
    assert(asOf(2L) === bucketedSnapshot(root))
  }

  test("bulk load: one partitioned write equals the per-batch path") {
    import spark.implicits._
    val root = tmpRoot("bk-bulk")
    val nB = 8
    val rows = (0L until 64L).map(k => (k, s"v$k"))
    UpsertFileSink.bulkLoadBucketed(rows.toDF("key", "value"),
      root, nB, bucketCols = Seq("key"))
    assert(bucketedSnapshot(root) === rows.sorted)
    // staging tree is gone; every bucket landed at v=0
    assert(!new java.io.File(s"$root/_bulk").exists)
    assert(bucketVersions(root).values.forall(_ === Set(0L)))

    // incremental batches land on top exactly as after a per-batch init
    UpsertFileSink.upsertBatchBucketed(
      Seq((5L, "V5b", "U", 2L), (99L, "new", "I", 2L))
        .toDF("key", "value", "op", "seq"),
      1L, root, Seq("key"), nB)
    val expect = (rows.map { case (k, v) =>
      (k, if (k == 5L) "V5b" else v) } :+ (99L -> "new")).sorted
    assert(bucketedSnapshot(root) === expect)

    // the bulk marker is v2: checkpoint + pruned reads work on it
    UpsertFileSink.writeBucketedCheckpoint(spark, root)
    UpsertFileSink.vacuumBucketed(spark, root)
    assert(bucketedSnapshot(root) === expect)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("key",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("value",
        org.apache.spark.sql.types.StringType)))
    val some = UpsertFileSink.readBucketsBucketed(spark, root, schema,
      Seq(0, 1, 2)).collect()
    assert(some.nonEmpty && some.length < expect.size)

    // refuses a non-empty table
    intercept[IllegalArgumentException] {
      UpsertFileSink.bulkLoadBucketed(rows.toDF("key", "value"),
        root, nB, bucketCols = Seq("key"))
    }
  }

  test("staged bucketed merge equals the flat-layout reference on mixed batches") {
    import spark.implicits._
    // the same CDC batch sequence through the FLAT sink (the reference
    // semantics: one applyChangelog over the full snapshot) and the
    // BUCKETED staged-merge path — final tables must be identical
    val flat = tmpRoot("ref-flat")
    val bucketed = tmpRoot("ref-bk")
    val batches = Seq(
      (0L until 40L).map(k => (k, s"v$k", "I", 1L)),
      Seq((3L, "V3b", "U", 2L), (41L, "new", "I", 2L),
        (7L, null.asInstanceOf[String], "D", 2L)),
      (10L until 30L).map(k => (k, s"w$k", "U", 3L)) :+
        (12L, null.asInstanceOf[String], "D", 4L))
    batches.zipWithIndex.foreach { case (b, i) =>
      val df = b.toDF("key", "value", "op", "seq")
      UpsertFileSink.upsertBatch(df, i.toLong, flat, Seq("key"))
      UpsertFileSink.upsertBatchBucketed(df, i.toLong, bucketed,
        Seq("key"), 8)
    }
    assert(bucketedSnapshot(bucketed) === snapshot(flat))
    assert(snapshot(flat).nonEmpty)
  }

  test("staged bucketed merge: delete-only batch lands an EMPTY bucket version") {
    import spark.implicits._
    val root = tmpRoot("bk-del")
    val nB = 4
    val keys = (0L until 16L)
    UpsertFileSink.upsertBatchBucketed(
      keys.map(k => (k, s"v$k", "I", 1L)).toDF("key", "value", "op", "seq"),
      0L, root, Seq("key"), nB)
    // delete EVERY key of bucket 0 — the merge for that bucket is
    // empty, but an explicit empty v=1 must still supersede v=0 or the
    // deleted keys resurrect on the next read
    val b0keys = keys.filter(k =>
      Seq((k, "x")).toDF("key", "value")
        .select(UpsertFileSink.bucketCol(Seq("key"), nB))
        .head.getInt(0) == 0)
    assert(b0keys.nonEmpty, "fixture must hash some keys into bucket 0")
    UpsertFileSink.upsertBatchBucketed(
      b0keys.map(k => (k, null.asInstanceOf[String], "D", 2L))
        .toDF("key", "value", "op", "seq"),
      1L, root, Seq("key"), nB)
    assert(bucketVersions(root)(0).contains(1L),
      "the emptied bucket must gain an explicit v=1")
    val expect = keys.filterNot(b0keys.contains).map(k => (k, s"v$k")).sorted
    assert(bucketedSnapshot(root) === expect)
    // still true after vacuum drops the superseded v=0
    UpsertFileSink.vacuumBucketed(spark, root)
    assert(bucketedSnapshot(root) === expect)
    // a later batch merging ON TOP of the empty version reads it as an
    // empty base — the key returns without resurrecting its dead peers
    UpsertFileSink.upsertBatchBucketed(
      Seq((b0keys.head, "back", "I", 3L)).toDF("key", "value", "op", "seq"),
      2L, root, Seq("key"), nB)
    assert(bucketedSnapshot(root) ===
      ((b0keys.head -> "back") +: expect).sorted)
  }

  test("staged bucketed merge: constant job count regardless of touched buckets") {
    import spark.implicits._
    val root = tmpRoot("bk-jobs")
    val nB = 16
    UpsertFileSink.upsertBatchBucketed(
      (0L until 256L).map(k => (k, s"v$k", "I", 1L))
        .toDF("key", "value", "op", "seq"),
      0L, root, Seq("key"), nB)
    val jobs = new java.util.concurrent.atomic.AtomicInteger
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); ()
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      // a batch touching EVERY bucket: the staged path pays one count,
      // one touched-manifest collect, and one partitioned write — the
      // retired driver-sequenced loop paid one merge JOB PER BUCKET
      // (≥ 16 here), which is the scale wart this recipe removes
      UpsertFileSink.upsertBatchBucketed(
        (0L until 256L).map(k => (k, s"V$k", "U", 2L))
          .toDF("key", "value", "op", "seq"),
        1L, root, Seq("key"), nB)
      Thread.sleep(500) // drain the async listener bus (Profile's idiom)
      val n = jobs.get()
      assert(n > 0 && n <= 10,
        s"touched-bucket-independent job count expected, got $n jobs " +
          s"for a ${nB}-bucket batch")
    } finally spark.sparkContext.removeSparkListener(listener)
    assert(bucketedSnapshot(root) ===
      (0L until 256L).map(k => (k, s"V$k")).sorted)
  }

  test("checkpoint cadence counts commits, not batch-id arithmetic") {
    import spark.implicits._
    val root = tmpRoot("bk-sparse")
    val nB = 4
    // SPARSE batch ids (legal: the contract is only strictly-greater).
    // An id-modulo cadence with checkpointEvery=2 would never fire on
    // the even-parity ids 100 and 1000; counting post-checkpoint
    // markers must land a checkpoint every 2 commits regardless
    UpsertFileSink.upsertBatchBucketed(
      Seq((1L, "a", "I", 1L)).toDF("key", "value", "op", "seq"),
      1L, root, Seq("key"), nB, checkpointEvery = 2)
    assert(!commitFiles(root).exists(_.startsWith("checkpoint.")))
    UpsertFileSink.upsertBatchBucketed(
      Seq((2L, "b", "I", 2L)).toDF("key", "value", "op", "seq"),
      7L, root, Seq("key"), nB, checkpointEvery = 2)
    assert(commitFiles(root).contains("checkpoint.7"),
      s"2nd commit must checkpoint: ${commitFiles(root)}")
    UpsertFileSink.upsertBatchBucketed(
      Seq((3L, "c", "I", 3L)).toDF("key", "value", "op", "seq"),
      100L, root, Seq("key"), nB, checkpointEvery = 2)
    assert(!commitFiles(root).exists(_ == "checkpoint.100"))
    UpsertFileSink.upsertBatchBucketed(
      Seq((4L, "d", "I", 4L)).toDF("key", "value", "op", "seq"),
      1000L, root, Seq("key"), nB, checkpointEvery = 2)
    assert(commitFiles(root).contains("checkpoint.1000"),
      s"4th commit must checkpoint: ${commitFiles(root)}")
    assert(bucketedSnapshot(root) ===
      Seq(1L -> "a", 2L -> "b", 3L -> "c", 4L -> "d"))
  }

  test("vacuum retention guard: replayed as-of reads survive a racing vacuum") {
    import spark.implicits._
    val root = tmpRoot("bk-retain")
    val nB = 4
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("key",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("value",
        org.apache.spark.sql.types.StringType)))
    (0L to 2L).foreach { i =>
      UpsertFileSink.upsertBatchBucketed(
        Seq((1L, s"v$i", "U", i)).toDF("key", "value", "op", "seq"),
        i, root, Seq("key"), nB)
    }
    def asOf1 = UpsertFileSink
      .readBucketsBucketedAsOf(spark, root, schema, (0 until nB).toSeq, 1L)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(asOf1 === Seq(1L -> "v1"))
    // a vacuum racing batch 2's replayed consumer (which reads as of
    // batch 1) must NOT delete batch 1's superseded version
    UpsertFileSink.vacuumBucketed(spark, root, minRetainBatches = 2)
    assert(asOf1 === Seq(1L -> "v1"),
      "retention must keep the predecessor version readable")
    assert(bucketedSnapshot(root) === Seq(1L -> "v2"))
    // an unguarded vacuum then reclaims it (head stays exact)
    UpsertFileSink.vacuumBucketed(spark, root)
    assert(bucketedSnapshot(root) === Seq(1L -> "v2"))
    assert(bucketVersions(root).values.forall(_.size === 1))

    // the ANCHOR rule: a bucket idle since long before head keeps its
    // newest committed version BELOW the retention floor — an id
    // window alone would delete exactly the predecessor an as-of read
    // at the floor needs
    UpsertFileSink.upsertBatchBucketed(
      Seq((1L, "v5", "U", 5L)).toDF("key", "value", "op", "seq"),
      5L, root, Seq("key"), nB)
    UpsertFileSink.vacuumBucketed(spark, root, minRetainBatches = 1)
    val asOf4 = UpsertFileSink
      .readBucketsBucketedAsOf(spark, root, schema, (0 until nB).toSeq, 4L)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(asOf4 === Seq(1L -> "v2"),
      "the anchor version below the floor must survive a guarded vacuum")
    assert(bucketedSnapshot(root) === Seq(1L -> "v5"))
  }

  test("vacuum drops old versions and orphans, keeps the newest readable") {
    import spark.implicits._
    val root = tmpRoot("vac")
    (0L to 4L).foreach { i =>
      UpsertFileSink.upsertBatch(
        Seq((i, s"v$i", "I", i)).toDF("key", "value", "op", "seq"),
        i, root, Seq("key"))
    }
    val f = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // turn v=3 into an uncommitted orphan (a dead attempt's leftovers):
    // delete its marker — its data dir remains
    f.delete(new org.apache.hadoop.fs.Path(s"$root/_commits/3"), false)

    UpsertFileSink.vacuum(spark, root, keep = 2)
    val left = f.listStatus(new org.apache.hadoop.fs.Path(root)).toSeq
      .map(_.getPath.getName).filter(_.startsWith("v=")).sorted
    assert(left === Seq("v=2", "v=4"),
      s"keep=2 of committed {0,1,2,4} plus orphan 3 dropped, got $left")
    assert(snapshot(root) ===
      (0L to 4L).map(i => (i, s"v$i")))
  }

  test("fetchByKeys reads ONLY the wanted keys' bucket files") {
    import spark.implicits._
    import org.apache.spark.sql.types._
    val root = java.nio.file.Files
      .createTempDirectory("graft-fetchkeys").toString + "/t"
    val nB = 8
    val rows = (1L to 200L).map(i => (i, s"payload$i"))
    UpsertFileSink.upsertBatchBucketed(
      rows.toDF("doc_id", "text")
        .withColumn("op", lit("U")).withColumn("seq", lit(0L)),
      0L, root, Seq("doc_id"), nB)
    // a second batch updates a few keys so as-of has history
    UpsertFileSink.upsertBatchBucketed(
      Seq((7L, "payload7b"), (9L, "payload9b")).toDF("doc_id", "text")
        .withColumn("op", lit("U")).withColumn("seq", lit(0L)),
      1L, root, Seq("doc_id"), nB)

    val schema = StructType(Seq(StructField("doc_id", LongType),
      StructField("text", StringType)))
    val store = UpsertFileSink.BucketedStore(root, schema)
    val keys = Seq(7L, 42L).toDF("doc_id")
    val got = UpsertFileSink.fetchByKeys(spark, store, keys)
      .collect().map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
    assert(got === Seq((7L, "payload7b"), (42L, "payload42")))

    // THE I/O PIN: the fetch plan's input files all live under the
    // wanted keys' bucket dirs — never a store-wide listing (the
    // round-16 "row-pruned but not I/O-pruned" finding, closed)
    val wantedBuckets = keys
      .select(UpsertFileSink.bucketCol(Seq("doc_id"), nB).as("b"))
      .distinct().collect().map(_.getInt(0)).toSet
    assert(wantedBuckets.size < nB, "fixture must not touch all buckets")
    val files = UpsertFileSink.fetchByKeys(spark, store, keys).inputFiles
    assert(files.nonEmpty)
    files.foreach(f => assert(wantedBuckets.exists(b =>
      f.contains(s"/buckets/$b/")),
      s"fetch read a file outside the wanted buckets: $f"))

    // as-of fetch resolves the historical version, same pruning
    val old = UpsertFileSink.fetchByKeys(spark, store, keys,
      asOf = Some(0L))
      .collect().map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
    assert(old === Seq((7L, "payload7"), (42L, "payload42")))

    // a virgin store answers the typed empty frame
    val virgin = UpsertFileSink.BucketedStore(s"$root-none", schema)
    assert(UpsertFileSink.fetchByKeys(spark, virgin, keys).isEmpty)

    // a PRE-PIN store that holds data is NOT a virgin store: answering
    // the empty frame would be a silent false negative (the keys can't
    // be hashed with the write side's count) — it must fail loudly
    val fsys = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fsys.delete(new org.apache.hadoop.fs.Path(s"$root/_nbuckets"), false)
    val e = intercept[IllegalArgumentException] {
      UpsertFileSink.fetchByKeys(spark, store, keys)
    }
    assert(e.getMessage.contains("_nbuckets"),
      s"expected the pre-pin refusal, got: ${e.getMessage}")
  }
}
