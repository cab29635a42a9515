package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import graft.operators.ChangeDataCapture

/** Exactly-once parquet landing zone for Structured Streaming — the
  * piece a production ingest actually runs behind the state-store
  * machinery `q_stream_replay` proves: a `foreachBatch` body that
  * upserts each micro-batch into a keyed parquet table such that
  * AT-LEAST-ONCE delivery from the engine becomes EXACTLY-ONCE table
  * state.
  *
  * Spark's own guarantee is only that foreachBatch is invoked with a
  * monotone `batchId` and replays a batch with the SAME id and SAME
  * data after a failure. Idempotence is therefore the sink's job, and
  * this one follows the classic snapshot-versioning recipe (what Delta
  * calls the transaction log, reduced to its parquet-only core):
  *
  *  - the table at `root` is a sequence of FULL snapshots
  *    `root/v=<batchId>/` — each the previous committed snapshot
  *    merged with one micro-batch via
  *    [[graft.operators.ChangeDataCapture.applyChangelog]] (newest
  *    seq wins per key, op `D` deletes, I/U upsert);
  *  - a snapshot becomes visible only when its marker
  *    `root/_commits/<batchId>` exists; the marker is created AFTER
  *    the parquet write completes (write-then-commit), so readers and
  *    re-deliveries never observe a torn snapshot;
  *  - a REPLAYED batch (its marker already present) is a no-op; a
  *    replayed batch whose previous attempt died mid-write simply
  *    overwrites the orphaned uncommitted `v=` directory and then
  *    commits — base always reads from the newest COMMITTED version,
  *    never the torn one.
  *
  * Scale notes: the merge itself is applyChangelog's single
  * WindowGroupLimit shuffle (O(|base| + |batch|)); rewriting the full
  * snapshot per batch is the parquet-only cost of exactly-once — at
  * real scale the same commit protocol applies per PARTITION
  * (rewrite only the key-range files the batch touches), which this
  * module's layout supports by keying `v=` directories the same way.
  * Old versions are dropped with [[vacuum]] (keep ≥ 1 committed).
  */
object UpsertFileSink {

  private def fs(spark: SparkSession, root: String) =
    new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def commitsDir(root: String) = new Path(root, "_commits")

  /** Newest committed batch id under `root`, if any. */
  def lastCommitted(spark: SparkSession, root: String): Option[Long] = {
    val f = fs(spark, root)
    val dir = commitsDir(root)
    if (!f.exists(dir)) None
    else {
      val ids = f.listStatus(dir).toSeq
        .map(_.getPath.getName)
        .filter(_.forall(_.isDigit))
        .map(_.toLong)
      if (ids.isEmpty) None else Some(ids.max)
    }
  }

  /** The newest committed snapshot; an empty frame of `schema` when no
    * batch has committed yet.
    */
  def readSnapshot(spark: SparkSession, root: String,
      schema: StructType): DataFrame =
    lastCommitted(spark, root) match {
      case Some(v) => spark.read.schema(schema).parquet(s"$root/v=$v")
      case None =>
        spark.createDataFrame(spark.sparkContext
          .emptyRDD[org.apache.spark.sql.Row], schema)
    }

  /** TIME TRAVEL: the table as of committed version `v` (the flat
    * layout keeps full snapshots, so any retained version reads
    * directly). Fails fast on an uncommitted or vacuumed version
    * rather than returning a torn or missing snapshot.
    */
  def readVersion(spark: SparkSession, root: String, v: Long,
      schema: StructType): DataFrame = {
    val f = fs(spark, root)
    require(f.exists(new Path(commitsDir(root), v.toString)),
      s"version $v of $root is not committed (or was vacuumed)")
    require(f.exists(new Path(root, s"v=$v")),
      s"version $v of $root was vacuumed")
    spark.read.schema(schema).parquet(s"$root/v=$v")
  }

  /** Idempotent micro-batch upsert — the `foreachBatch` body.
    *
    * `batch` must carry the table's payload columns plus `opCol`
    * (I/U/D) and `seqCol` (newest wins). An update-mode aggregate
    * stream without natural op/seq columns can pass constants:
    * `lit("U")` and the batch id (see [[upsertsOnly]]).
    *
    * PRECONDITION (aggregate streams stamped seq=batchId): every
    * update for a key must arrive while its state is still live —
    * i.e. append-within-watermark. If the engine EVICTS a window's
    * state and a straggler row later re-creates it, the new partial
    * aggregate carries a NEWER seq and newest-wins would overwrite
    * the previously committed full row with the partial one. Spark's
    * watermark makes this impossible for rows later than the
    * watermark by ≥ 2 micro-batches (they are dropped, never
    * re-aggregated), so ordered replays and watermarked production
    * streams are safe; a source that can resurrect evicted windows
    * must instead merge additively (read-modify-write the snapshot
    * row) rather than stamp seq=batchId.
    */
  def upsertBatch(batch: DataFrame, batchId: Long, root: String,
      keyCols: Seq[String], seqCol: String = "seq",
      opCol: String = "op", outFiles: Int = 0): Unit = {
    val spark = batch.sparkSession
    val f = fs(spark, root)
    val marker = new Path(commitsDir(root), batchId.toString)
    // Stage the micro-batch EAGERLY before anything else: Spark 4.x
    // validates that a foreachBatch function processes EVERY partition
    // of the batch (each state-store partition must commit during the
    // batch — STATE_STORE_COMMIT_VALIDATION_FAILED otherwise), which
    // both the no-op replay path and an AQE-replanned merge can
    // violate. The count consumes all partitions exactly once — state
    // commits happen here — and the merge then reads the cached batch.
    val staged = batch.persist()
    try {
      staged.count()
      if (f.exists(marker)) return // replay of a committed batch: no-op

      val payload = StructType(
        batch.schema.filterNot(c => c.name == seqCol || c.name == opCol))
      val base = readSnapshot(spark, root, payload)
      val merged = ChangeDataCapture.applyChangelog(
        base, staged, keyCols, seqCol, opCol)
      // outFiles > 0: caller knows the snapshot is small (e.g. an
      // aggregate table) — land it in that many files instead of one
      // per merge shuffle partition, so the next batch's base read and
      // the final read-back list/open fewer files. 0 = natural layout
      // (the at-scale default: a big snapshot keeps the merge's
      // parallelism).
      val laid = if (outFiles > 0) merged.coalesce(outFiles) else merged
      laid.write.mode("overwrite").parquet(s"$root/v=$batchId")
      // commit point: marker creation is the atomic publish
      f.mkdirs(commitsDir(root))
      f.create(marker, true).close()
    } finally staged.unpersist(blocking = false)
  }

  /** [[upsertBatch]] for pure upsert streams (no op/seq columns in the
    * data — e.g. an update-mode aggregate where every output row is
    * the new truth for its key): stamps op=U and seq=batchId.
    */
  def upsertsOnly(batch: DataFrame, batchId: Long, root: String,
      keyCols: Seq[String], outFiles: Int = 0): Unit =
    upsertBatch(
      batch.withColumn("op", lit("U")).withColumn("seq", lit(batchId)),
      batchId, root, keyCols, outFiles = outFiles)

  // ---- bucketed (partition-level) variant ---------------------------
  //
  // The scale path the full-snapshot recipe's scaladoc promises: keys
  // hash into `nBuckets` fixed buckets and a micro-batch rewrites ONLY
  // the buckets it touches — an idle bucket's newest version simply
  // stays older. Layout:
  //
  //   root/buckets/<b>/v=<batchId>/   bucket b's snapshot as of batch
  //   root/_commits/<batchId>         global marker, written LAST
  //   root/_commits/checkpoint.<id>   compacted manifest (see below)
  //
  // A bucket version is visible iff its batch's marker exists, so the
  // commit point stays a single atomic marker creation no matter how
  // many buckets the batch rewrote: readers see either none or all of
  // a batch's bucket versions, torn multi-bucket writes stay invisible,
  // and a replay (marker present) is a no-op. Reads take, per bucket,
  // the newest COMMITTED version — one multi-path parquet scan.
  //
  // MANIFEST COMPACTION (the piece Delta's log checkpoint solves): the
  // naive read lists `_commits` plus every bucket directory — after N
  // batches over B buckets that is O(N + B·versions) filesystem calls
  // per read, linear in stream lifetime. Two fixes compose:
  //
  //  - each bucketed marker RECORDS the bucket versions its batch
  //    wrote (`v2` header + one bucket id per line, staged to a temp
  //    name and renamed so readers never see a torn marker) — a marker
  //    is now an add-file action, not just a flag;
  //  - [[writeBucketedCheckpoint]] rolls the whole manifest up into
  //    `_commits/checkpoint.<headId>`: every batch id ≤ headId is
  //    committed BY DEFINITION (so their markers become deletable) and
  //    the file carries the per-bucket newest committed version map.
  //
  // A reader then resolves the table from the newest checkpoint plus
  // only the markers NEWER than it — O(K) filesystem reads when a
  // checkpoint is written every K batches — and never lists a bucket
  // directory. Crash safety: the checkpoint is written AFTER its
  // covered markers, staged + renamed, and a crash between a marker
  // and its checkpoint merely leaves the marker to be read directly.

  private def bucketsDir(root: String) = new Path(root, "buckets")

  private val CkptPrefix = "checkpoint."
  private val MarkerHeader = "v2"

  /** Stable bucket id for the key columns (murmur3 `hash` — identical
    * across runs and partitionings, and between the write and read
    * sides).
    */
  def bucketCol(keyCols: Seq[String], nBuckets: Int) =
    pmod(hash(keyCols.map(col): _*), lit(nBuckets))

  private val NBucketsFile = "_nbuckets"

  /** The bucket count this table's layout was written with, if pinned
    * (tables predating the pin return None and pin on their next
    * write). A PRUNED reader ([[readBucketsBucketed]] callers) must
    * hash its lookup keys with exactly this value or the manifest
    * misses buckets silently — consult it instead of re-supplying the
    * constant.
    */
  def bucketCount(spark: SparkSession, root: String): Option[Int] = {
    val f = fs(spark, root)
    val p = new Path(root, NBucketsFile)
    if (!f.exists(p)) None else Some(readSmallFile(f, p).trim.toInt)
  }

  /** Freeze nBuckets at table creation; fail loudly on a mismatch —
    * rows hashed with a different constant would land in buckets no
    * pruned lookup ever reads (silent false negatives, the worst
    * failure class).
    */
  private def pinBuckets(f: org.apache.hadoop.fs.FileSystem,
      root: String, nBuckets: Int): Unit = {
    val p = new Path(root, NBucketsFile)
    if (!f.exists(p)) {
      f.mkdirs(new Path(root))
      atomicWrite(f, p, nBuckets.toString)
    } else {
      val stored = readSmallFile(f, p).trim.toInt
      require(stored == nBuckets,
        s"$root was created with nBuckets=$stored, got $nBuckets — " +
          "the bucket layout is frozen at creation")
    }
  }

  /** Write `content` to a dot-prefixed temp name and rename into
    * place — readers listing `_commits` never observe a torn file
    * (dot-names are excluded by every listing filter here).
    */
  private def atomicWrite(f: org.apache.hadoop.fs.FileSystem, dst: Path,
      content: String): Unit = graft.ControlFiles.atomicWrite(f, dst, content)

  private def readSmallFile(f: org.apache.hadoop.fs.FileSystem,
      p: Path): String = graft.ControlFiles.readFully(f, p)

  /** Newest checkpoint under `_commits`, as (coveredHeadId,
    * bucket → newest committed version as of that head).
    */
  private def newestCheckpoint(f: org.apache.hadoop.fs.FileSystem,
      root: String): Option[(Long, Map[Int, Long])] = {
    val dir = commitsDir(root)
    if (!f.exists(dir)) return None
    val ids = f.listStatus(dir).toSeq.map(_.getPath.getName)
      .filter(n => n.startsWith(CkptPrefix) &&
        n.stripPrefix(CkptPrefix).forall(_.isDigit))
      .map(_.stripPrefix(CkptPrefix).toLong)
    if (ids.isEmpty) None
    else {
      val id = ids.max
      val body = readSmallFile(f, new Path(dir, CkptPrefix + id))
      val map = body.linesIterator.filter(_.nonEmpty).map { line =>
        val Array(b, v) = line.split(' ')
        b.toInt -> v.toLong
      }.toMap
      Some((id, map))
    }
  }

  /** Marker ids present as files (excludes ids only covered by a
    * checkpoint).
    */
  private def markerIds(f: org.apache.hadoop.fs.FileSystem,
      root: String): Set[Long] = {
    val dir = commitsDir(root)
    if (!f.exists(dir)) Set.empty
    else f.listStatus(dir).toSeq.map(_.getPath.getName)
      .filter(_.forall(_.isDigit)).map(_.toLong).toSet
  }

  /** Per existing bucket, the newest committed version's path.
    *
    * Fast path (checkpoint + v2 markers): merge the checkpoint's
    * bucket map with the touched-bucket lists of the markers newer
    * than it — no bucket-directory listing at all. Fallback (no
    * checkpoint, or a legacy content-less marker newer than it): list
    * bucket directories and keep versions committed by marker or by
    * checkpoint coverage (id ≤ checkpoint head).
    */
  private def latestBucketVersions(spark: SparkSession,
      root: String): Seq[(Int, Long, String)] = {
    val f = fs(spark, root)
    val ckpt = newestCheckpoint(f, root)
    val ckptId = ckpt.map(_._1).getOrElse(-1L)
    val markers = markerIds(f, root)
    val fresh = markers.filter(_ > ckptId).toSeq.sorted

    // try the manifest-only path: every post-checkpoint marker must
    // carry the v2 touched-bucket payload
    val freshTouched: Option[Seq[(Long, Seq[Int])]] = {
      val parsed = fresh.map { id =>
        val body = readSmallFile(f, new Path(commitsDir(root), id.toString))
        val lines = body.linesIterator.toSeq
        if (lines.headOption.contains(MarkerHeader))
          Some(id -> lines.tail.filter(_.nonEmpty).map(_.toInt))
        else None
      }
      if (parsed.forall(_.isDefined)) Some(parsed.flatten) else None
    }

    (ckpt, freshTouched) match {
      case (Some((_, map)), Some(touched)) =>
        val merged = scala.collection.mutable.Map[Int, Long](map.toSeq: _*)
        touched.foreach { case (id, bs) =>
          bs.foreach { b =>
            if (merged.getOrElse(b, -1L) < id) merged(b) = id
          }
        }
        merged.toSeq.sortBy(_._1)
          .map { case (b, v) => (b, v, s"$root/buckets/$b/v=$v") }
      case (None, Some(touched)) if touched.nonEmpty &&
          touched.size == markers.size =>
        // no checkpoint yet but every marker is v2: same merge, empty base
        val merged = scala.collection.mutable.Map.empty[Int, Long]
        touched.foreach { case (id, bs) =>
          bs.foreach { b =>
            if (merged.getOrElse(b, -1L) < id) merged(b) = id
          }
        }
        merged.toSeq.sortBy(_._1)
          .map { case (b, v) => (b, v, s"$root/buckets/$b/v=$v") }
      case _ =>
        // legacy fallback: list bucket dirs; committed = marker file
        // present OR covered by the checkpoint head
        def isCommitted(v: Long) = v <= ckptId || markers.contains(v)
        val bdir = bucketsDir(root)
        if (!f.exists(bdir) || (markers.isEmpty && ckpt.isEmpty)) Seq.empty
        else f.listStatus(bdir).toSeq.flatMap { st =>
          val name = st.getPath.getName
          if (!name.forall(_.isDigit)) None
          else {
            val vs = f.listStatus(st.getPath).toSeq
              .map(_.getPath.getName)
              .filter(_.startsWith("v="))
              .map(_.stripPrefix("v=").toLong)
              .filter(isCommitted)
            if (vs.isEmpty) None
            else Some((name.toInt, vs.max,
              s"$root/buckets/$name/v=${vs.max}"))
          }
        }
    }
  }

  /** TIME TRAVEL for the bucketed layout: the table as of committed
    * batch `asOf` — per bucket, the newest committed version ≤ asOf.
    * Resolution LISTS bucket directories (an audit op, not the hot
    * read path: the compacted manifest only records each bucket's
    * newest version, exactly like Delta's checkpoint), and is bounded
    * by vacuum retention — a superseded version [[vacuumBucketed]]
    * already deleted cannot be travelled to (the Delta-identical
    * caveat); buckets whose retained versions are all newer than
    * `asOf` simply don't contribute.
    */
  def readSnapshotBucketedAsOf(spark: SparkSession, root: String,
      schema: StructType, asOf: Long): DataFrame = {
    val f = fs(spark, root)
    val ckptId = newestCheckpoint(f, root).map(_._1).getOrElse(-1L)
    val markers = markerIds(f, root)
    def isCommitted(v: Long) = v <= ckptId || markers.contains(v)
    val bdir = bucketsDir(root)
    val paths =
      if (!f.exists(bdir)) Seq.empty
      else f.listStatus(bdir).toSeq.flatMap { st =>
        val name = st.getPath.getName
        if (!name.forall(_.isDigit)) None
        else {
          val vs = f.listStatus(st.getPath).toSeq
            .map(_.getPath.getName)
            .filter(_.startsWith("v="))
            .map(_.stripPrefix("v=").toLong)
            .filter(v => v <= asOf && isCommitted(v))
          if (vs.isEmpty) None
          else Some(s"$root/buckets/$name/v=${vs.max}")
        }
      }
    if (paths.isEmpty)
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    else spark.read.schema(schema).parquet(paths: _*)
  }

  /** BULK LOAD into an empty bucketed table: ONE partitioned write of
    * the whole frame (every executor writes its buckets in parallel —
    * no driver-sequenced per-bucket merge loop, the shape a 100 TB
    * initial load needs), then B cheap directory renames into the
    * `buckets/<b>/v=<batchId>` layout and a single v2 marker publish.
    * The marker stays the commit point: a crash mid-rename leaves an
    * unpublished staging tree, and re-running converges (staging is
    * overwritten, renames skip already-moved buckets).
    *
    * `df` carries the PAYLOAD columns only (no op/seq — a bulk load
    * is by definition the newest version of every row).
    */
  def bulkLoadBucketed(df: DataFrame, root: String, nBuckets: Int,
      batchId: Long = 0L, bucketCols: Seq[String]): Unit = {
    require(nBuckets > 0, s"nBuckets=$nBuckets")
    val spark = df.sparkSession
    val f = fs(spark, root)
    require(!f.exists(commitsDir(root)),
      s"bulk load requires an empty table, but $root has commits")
    pinBuckets(f, root, nBuckets)
    val staging = new Path(root, "_bulk")
    df.withColumn("__b", bucketCol(bucketCols, nBuckets))
      .write.mode("overwrite").partitionBy("__b")
      .parquet(staging.toString)
    val touched = f.listStatus(staging).toSeq
      .map(_.getPath.getName)
      .filter(_.startsWith("__b="))
      .map(_.stripPrefix("__b=").toInt).sorted
    f.mkdirs(bucketsDir(root))
    touched.foreach { b =>
      val dst = new Path(root, s"buckets/$b")
      f.mkdirs(dst)
      val src = new Path(staging, s"__b=$b")
      val vdst = new Path(dst, s"v=$batchId")
      if (f.exists(vdst)) f.delete(vdst, true) // crashed prior attempt
      require(f.rename(src, vdst), s"rename $src -> $vdst failed")
    }
    f.delete(staging, true)
    f.mkdirs(commitsDir(root))
    atomicWrite(f, new Path(commitsDir(root), batchId.toString),
      (MarkerHeader +: touched.map(_.toString)).mkString("\n"))
  }

  /** Roll the bucketed manifest up into `_commits/checkpoint.<head>`:
    * the per-bucket newest committed version map as of the newest
    * committed batch. After this, readers consult only markers newer
    * than the checkpoint, and [[vacuumBucketed]] may delete every
    * covered marker. Idempotent; staged + renamed (never torn); a
    * no-op before any commit.
    */
  def writeBucketedCheckpoint(spark: SparkSession, root: String): Unit = {
    val f = fs(spark, root)
    val latest = latestBucketVersions(spark, root)
    val ckptId = newestCheckpoint(f, root).map(_._1).getOrElse(-1L)
    val head = (markerIds(f, root) + ckptId).max
    if (head < 0) return
    val body = latest.map { case (b, v, _) => s"$b $v" }.mkString("\n")
    atomicWrite(f, new Path(commitsDir(root), CkptPrefix + head), body)
    // retire superseded checkpoint files (the newest alone suffices)
    f.listStatus(commitsDir(root)).toSeq.map(_.getPath.getName)
      .filter(n => n.startsWith(CkptPrefix) &&
        n.stripPrefix(CkptPrefix).forall(_.isDigit) &&
        n.stripPrefix(CkptPrefix).toLong < head)
      .foreach(n => f.delete(new Path(commitsDir(root), n), false))
  }

  /** The newest committed state of the bucketed table (all buckets,
    * each at its own newest committed version); empty frame of
    * `schema` before any commit.
    */
  def readSnapshotBucketed(spark: SparkSession, root: String,
      schema: StructType): DataFrame = {
    val paths = latestBucketVersions(spark, root).map(_._3)
    if (paths.isEmpty)
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    else spark.read.schema(schema).parquet(paths: _*)
  }

  /** PRUNED read of the bucketed table: only the named buckets, each
    * at its newest committed version — the lookup shape an incremental
    * consumer (e.g. [[graft.operators.CorpusRefresh]]) uses to touch
    * O(|delta|) state instead of the whole table. With the compacted
    * manifest this costs one checkpoint read + the fresh markers,
    * independent of table size.
    */
  def readBucketsBucketed(spark: SparkSession, root: String,
      schema: StructType, buckets: Seq[Int]): DataFrame = {
    val want = buckets.toSet
    val paths = latestBucketVersions(spark, root)
      .filter { case (b, _, _) => want.contains(b) }.map(_._3)
    if (paths.isEmpty)
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    else spark.read.schema(schema).parquet(paths: _*)
  }

  /** Committed batch markers NEWER than the manifest checkpoint head —
    * the COUNTED cadence input an out-of-band maintenance job uses to
    * decide whether rolling a new checkpoint would buy readers
    * anything (the same count the inline `checkpointEvery` knob
    * consults; batch-id arithmetic would misfire on sparse CDC ids).
    */
  def uncheckpointedBatches(spark: SparkSession, root: String): Int = {
    val f = fs(spark, root)
    val ckptId = newestCheckpoint(f, root).map(_._1).getOrElse(-1L)
    markerIds(f, root).count(_ > ckptId)
  }

  /** A HANDLE to a bucketed upsert table for ID-PRUNED payload
    * fetches — (root, row schema, merge-key columns). The verify
    * stages of the ingest loop ([[graft.operators.CorpusRefresh]]'s
    * banded/embed verifies, `IncrementalEmbedLsh.candidatesVerified`)
    * need a few candidate rows out of a 100 TB store: a bare-DataFrame
    * semi-join still SCANS every file of the store map-side, while a
    * handle lets [[fetchByKeys]] hash the wanted keys into a
    * ≤ nBuckets manifest and read ONLY those bucket dirs — fetch I/O
    * proportional to the candidate set, never the store.
    */
  final case class BucketedStore(root: String, schema: StructType,
      keyCols: Seq[String] = Seq("doc_id"))

  /** Fetch ONLY the rows matching `keys` (a frame carrying the
    * store's key columns) from a bucketed table: ≤ nBuckets
    * touched-bucket manifest (the store's own pinned count — never a
    * caller-supplied guess), a read of just those bucket dirs (at
    * `asOf` when given — the replay-deterministic view, bounded by
    * vacuum retention), then the row-level semi-join. A virgin store
    * answers the typed empty frame.
    */
  def fetchByKeys(spark: SparkSession, store: BucketedStore,
      keys: DataFrame, asOf: Option[Long] = None): DataFrame = {
    val nb = bucketCount(spark, store.root)
    if (nb.isEmpty) {
      // a missing pin is only a clean "no rows" answer on a VIRGIN
      // root; a pre-pin root that already holds bucket data cannot be
      // prune-fetched (the keys can't be hashed with the write side's
      // count) — answering empty there would be a silent false
      // negative, the failure class the pin exists to prevent
      val f = fs(spark, store.root)
      val bdir = bucketsDir(store.root)
      require(!f.exists(bdir) || f.listStatus(bdir).isEmpty,
        s"${store.root} holds bucket data but no $NBucketsFile pin " +
          "(layout predates the pin): a pruned fetch cannot hash keys " +
          "into the write side's buckets — one upsertBatchBucketed " +
          "pins the count, or read unpruned via readSnapshotBucketed")
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        store.schema)
    }
    val wanted = keys.select(store.keyCols.map(col): _*).distinct()
    val buckets = wanted
      .select(bucketCol(store.keyCols, nb.get).as("__b"))
      .distinct().collect().map(_.getInt(0)).toSeq
    val snap = asOf match {
      case Some(a) =>
        readBucketsBucketedAsOf(spark, store.root, store.schema, buckets, a)
      case None =>
        readBucketsBucketed(spark, store.root, store.schema, buckets)
    }
    snap.join(wanted, store.keyCols, "left_semi")
  }

  /** Newest committed batch id of a bucketed table (markers ∪
    * checkpoint head), None for a virgin root. One `_commits` listing.
    */
  def lastCommittedBucketed(spark: SparkSession,
      root: String): Option[Long] = {
    val f = fs(spark, root)
    val ids = markerIds(f, root) ++ newestCheckpoint(f, root).map(_._1)
    if (ids.isEmpty) None else Some(ids.max)
  }

  /** [[readBucketsBucketed]] with TIME TRAVEL: the named buckets, each
    * at its newest committed version ≤ `asOf`. This is the read a
    * REPLAYED incremental consumer needs — state strictly as of the
    * previous batch, so a half-committed replay sees none of its own
    * first attempt's writes (a latest-version read would mix pre- and
    * post-batch verdicts across projections). Lists only the wanted
    * bucket dirs; bounded by vacuum retention like
    * [[readSnapshotBucketedAsOf]].
    */
  def readBucketsBucketedAsOf(spark: SparkSession, root: String,
      schema: StructType, buckets: Seq[Int], asOf: Long): DataFrame = {
    val f = fs(spark, root)
    val ckptId = newestCheckpoint(f, root).map(_._1).getOrElse(-1L)
    val markers = markerIds(f, root)
    // happy path: nothing newer than asOf is committed, so "as of" IS
    // the latest state — take the manifest-resolved read and skip the
    // bucket-directory listings entirely (the O(K) discipline the
    // compacted manifest exists for); the listing below is only paid
    // by genuine replays
    if (markers.forall(_ <= asOf) && ckptId <= asOf)
      return readBucketsBucketed(spark, root, schema, buckets)
    def isCommitted(v: Long) = v <= ckptId || markers.contains(v)
    val paths = buckets.distinct.flatMap { b =>
      val bd = new Path(bucketsDir(root), b.toString)
      if (!f.exists(bd)) None
      else {
        val vs = f.listStatus(bd).toSeq.map(_.getPath.getName)
          .filter(_.startsWith("v="))
          .map(_.stripPrefix("v=").toLong)
          .filter(v => v <= asOf && isCommitted(v))
        if (vs.isEmpty) None
        else Some(s"$root/buckets/$b/v=${vs.max}")
      }
    }
    if (paths.isEmpty)
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    else spark.read.schema(schema).parquet(paths: _*)
  }

  /** [[upsertBatch]] at bucket granularity: the batch rewrites ONLY
    * the buckets its keys hash into; all other buckets keep their
    * older versions untouched — the shape that survives a 100 TB table
    * taking small streaming batches. Same exactly-once protocol: the
    * single marker publishes every bucket version this batch wrote.
    * The same append-within-watermark precondition as [[upsertBatch]]
    * applies to seq=batchId aggregate streams.
    *
    * The merge is EXECUTOR-PARALLEL ([[bulkLoadBucketed]]'s staged
    * recipe, applied to merges): ONE applyChangelog over the touched
    * buckets' base rows ∪ the batch — sound because a key's rows never
    * cross buckets (see `bucketCols` below), so the global merge
    * equals the per-bucket merges — then ONE `partitionBy("__b")`
    * write to a batch-scoped staging tree and B cheap directory
    * renames into `buckets/<b>/v=<batchId>`. Wall-time is therefore
    * independent of how many buckets the batch touches (a
    * driver-sequenced bucket loop pays one Spark job per touched
    * bucket — at a production bucket count, a scheduler-bound serial
    * scan). A touched bucket whose merge emptied (delete-only batch)
    * still lands an explicit empty version — otherwise its old version
    * would stay newest and the deleted keys resurrect.
    *
    * `bucketCols` (optional) buckets rows by a key OTHER than the
    * merge key — e.g. a doc-flags table keyed by doc_id but bucketed
    * by content digest so digest lookups prune. A key's bucketing
    * values must either be IMMUTABLE per merge key (the default — the
    * merge key itself — trivially is), or a batch that MOVES a key
    * across buckets must carry a tombstone row at the old bucketing
    * values with a lower seq than the replacement (a bare upsert at
    * the new values would leave the old row stranded in the old
    * bucket; the D row rewrites that bucket without it —
    * [[graft.operators.CorpusRefresh]]'s changelog recipe).
    */
  def upsertBatchBucketed(batch: DataFrame, batchId: Long, root: String,
      keyCols: Seq[String], nBuckets: Int, seqCol: String = "seq",
      opCol: String = "op", checkpointEvery: Int = 0,
      bucketCols: Seq[String] = Nil): Unit = {
    require(nBuckets > 0, s"nBuckets=$nBuckets")
    val spark = batch.sparkSession
    val f = fs(spark, root)
    pinBuckets(f, root, nBuckets)
    val marker = new Path(commitsDir(root), batchId.toString)
    val staged = batch.persist()
    try {
      staged.count() // full consumption (state-store commit validation)
      // replay of a committed batch: marker present, OR the marker was
      // compacted away — every id ≤ the checkpoint head is committed
      if (f.exists(marker) ||
          newestCheckpoint(f, root).exists(_._1 >= batchId)) return

      val payload = StructType(
        batch.schema.filterNot(c => c.name == seqCol || c.name == opCol))
      val bucket = bucketCol(
        if (bucketCols.nonEmpty) bucketCols else keyCols, nBuckets)
      // touched-bucket manifest: ≤ nBuckets rows, driver-side by design
      val touched = staged.select(bucket.as("__b")).distinct()
        .collect().map(_.getInt(0)).sorted
      val touchedSet = touched.toSet
      val basePaths = latestBucketVersions(spark, root)
        .collect { case (b, _, p) if touchedSet(b) => p }
      val base =
        if (basePaths.isEmpty) spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], payload)
        else spark.read.schema(payload).parquet(basePaths: _*)
      val merged = ChangeDataCapture.applyChangelog(
        base, staged, keyCols, seqCol, opCol)
      // one executor-parallel staging write, then per-bucket renames;
      // a crashed prior attempt's staging tree and orphaned v= dirs
      // are simply overwritten — the marker below stays the sole
      // commit point
      val staging = new Path(root, s"_staging/$batchId")
      merged.withColumn("__b", bucket)
        .write.mode("overwrite").partitionBy("__b")
        .parquet(staging.toString)
      val written = f.listStatus(staging).toSeq
        .map(_.getPath.getName).filter(_.startsWith("__b="))
        .map(_.stripPrefix("__b=").toInt).toSet
      touched.foreach { b =>
        val vdst = new Path(root, s"buckets/$b/v=$batchId")
        f.mkdirs(vdst.getParent)
        if (f.exists(vdst)) f.delete(vdst, true) // crashed prior attempt
        if (written(b))
          require(f.rename(new Path(staging, s"__b=$b"), vdst),
            s"rename staging __b=$b -> $vdst failed")
        else
          // delete-only bucket: the merge emptied it, so an explicit
          // empty (schema-carrying, non-partitioned — the zero-row
          // partitionBy husk lesson) version supersedes the old one
          merged.limit(0).coalesce(1).write.mode("overwrite")
            .parquet(vdst.toString)
      }
      f.delete(staging, true)
      // ONE atomic publish for every bucket version renamed above; the
      // marker body (v2 + touched buckets) is the add-file record that
      // lets readers skip bucket-directory listings entirely
      f.mkdirs(commitsDir(root))
      atomicWrite(f, marker,
        (MarkerHeader +: touched.map(_.toString)).mkString("\n"))
      // roll the manifest up every K COMMITS — counted fresh markers,
      // never batch-id arithmetic: CDC ids need not be dense, and a
      // modulo on sparse ids can fire rarely or never, silently
      // degrading reader cost back to O(N markers)
      if (checkpointEvery > 0 &&
        uncheckpointedBatches(spark, root) >= checkpointEvery)
        writeBucketedCheckpoint(spark, root)
    } finally staged.unpersist(blocking = false)
  }

  /** Vacuum for the BUCKETED layout: per bucket, drop every version
    * except its newest committed one (superseded versions and dead
    * uncommitted orphans below the global committed head alike), then
    * drop the markers no surviving bucket version references — except
    * the global newest marker, which must survive for replay
    * idempotence of the most recent batch. An idle bucket's old
    * version and ITS marker are both retained: visibility never
    * regresses. Stale staging trees of committed/superseded batches
    * are reaped too.
    *
    * `minRetainBatches` is the REPLAY-RETENTION guard: an incremental
    * consumer replaying any batch `b` in the `minRetainBatches` newest
    * ids can still read state as of `b − 1`
    * ([[readBucketsBucketedAsOf]]) — a vacuum racing a replayed
    * refresh cannot make fully-committed predecessor state vanish
    * mid-recompute. Two rules compose: every version id
    * > head − minRetainBatches is kept, AND per bucket the ANCHOR —
    * its newest committed version AT/BELOW that floor — is kept, so an
    * as-of read at the floor resolves even for a bucket that idled
    * long before its latest rewrite (an id-window alone would delete
    * exactly the old predecessor such a bucket needs).
    * minRetainBatches = 1 therefore suffices for a head-batch replay.
    * 0 (the default) keeps only each bucket's newest committed
    * version, the minimum for plain reads.
    */
  def vacuumBucketed(spark: SparkSession, root: String,
      minRetainBatches: Int = 0): Unit = {
    val f = fs(spark, root)
    val ckptId = newestCheckpoint(f, root).map(_._1).getOrElse(-1L)
    val markers = markerIds(f, root)
    if (markers.isEmpty && ckptId < 0) return
    val head = (markers + ckptId).max
    val retainAbove = head - minRetainBatches // keep every v > this
    def isCommitted(v: Long) = v <= ckptId || markers.contains(v)
    val latest = latestBucketVersions(spark, root)
    val anchors = scala.collection.mutable.Set.empty[Long]
    latest.foreach { case (b, newest, _) =>
      val bdir = new Path(bucketsDir(root), b.toString)
      val versions = f.listStatus(bdir).toSeq
        .map(_.getPath.getName)
        .filter(_.startsWith("v="))
        .map(_.stripPrefix("v=").toLong)
      val anchor: Option[Long] =
        if (minRetainBatches <= 0) None
        else versions.filter(v => v <= retainAbove && isCommitted(v))
          .maxOption
      anchor.foreach(anchors += _)
      versions
        .filter(v => v != newest && v < head && v <= retainAbove &&
          !anchor.contains(v))
        .foreach(v => f.delete(new Path(bdir, s"v=$v"), true))
    }
    // a marker is deletable once superseded: not the global head, not
    // the newest version of any bucket, not retention-protected (the
    // id window or a bucket's anchor), OR compacted into a checkpoint
    // (every id ≤ the checkpoint head is committed by definition —
    // deleting such a marker never loses committedness evidence, so
    // even an idle bucket's marker may go once a checkpoint covers it)
    val keepVersions = latest.map(_._2).toSet + head
    markers.filter(v => v <= ckptId && v != head)
      .foreach(v => f.delete(new Path(commitsDir(root), v.toString), false))
    markers.filter(v => v > ckptId && !keepVersions.contains(v) &&
        v <= retainAbove && !anchors.contains(v))
      .foreach(v => f.delete(new Path(commitsDir(root), v.toString), false))
    // staging trees at or below the head are garbage from committed or
    // superseded attempts (a live attempt always stages an id > head)
    val sdir = new Path(root, "_staging")
    if (f.exists(sdir)) f.listStatus(sdir).toSeq
      .map(_.getPath.getName)
      .filter(n => n.forall(_.isDigit) && n.toLong <= head)
      .foreach(n => f.delete(new Path(sdir, n), true))
  }

  /** Drop committed versions older than the newest `keep` (markers and
    * data both) plus any uncommitted orphan older than the newest
    * committed id. Never touches the newest committed snapshot.
    * For the FLAT layout only — bucketed tables use [[vacuumBucketed]]
    * (old markers here may still be referenced by idle buckets there).
    */
  def vacuum(spark: SparkSession, root: String, keep: Int = 2): Unit = {
    require(keep >= 1, s"keep=$keep")
    val f = fs(spark, root)
    val dir = commitsDir(root)
    if (!f.exists(dir)) return
    val committed = f.listStatus(dir).toSeq
      .map(_.getPath.getName).filter(_.forall(_.isDigit)).map(_.toLong)
      .sorted
    if (committed.isEmpty) return
    val newest = committed.max
    committed.dropRight(keep).foreach { v =>
      f.delete(new Path(root, s"v=$v"), true)
      f.delete(new Path(dir, v.toString), false)
    }
    // uncommitted orphans from dead attempts (their id < a committed
    // one can only mean the attempt was superseded — a LIVE attempt is
    // always for an id newer than every committed marker)
    f.listStatus(new Path(root)).toSeq
      .map(_.getPath.getName)
      .filter(_.startsWith("v="))
      .map(_.stripPrefix("v=").toLong)
      .filter(v => v < newest && !committed.contains(v))
      .foreach(v => f.delete(new Path(root, s"v=$v"), true))
  }
}
