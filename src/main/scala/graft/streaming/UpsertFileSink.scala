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
  //
  // A bucket version is visible iff its batch's marker exists, so the
  // commit point stays a single atomic marker creation no matter how
  // many buckets the batch rewrote: readers see either none or all of
  // a batch's bucket versions, torn multi-bucket writes stay invisible,
  // and a replay (marker present) is a no-op. Reads take, per bucket,
  // the newest COMMITTED version — one multi-path parquet scan.

  private def bucketsDir(root: String) = new Path(root, "buckets")

  /** Stable bucket id for the key columns (murmur3 `hash` — identical
    * across runs and partitionings, and between the write and read
    * sides).
    */
  def bucketCol(keyCols: Seq[String], nBuckets: Int) =
    pmod(hash(keyCols.map(col): _*), lit(nBuckets))

  private def committedSet(spark: SparkSession, root: String): Set[Long] = {
    val f = fs(spark, root)
    val dir = commitsDir(root)
    if (!f.exists(dir)) Set.empty
    else f.listStatus(dir).toSeq.map(_.getPath.getName)
      .filter(_.forall(_.isDigit)).map(_.toLong).toSet
  }

  /** Per existing bucket, the newest committed version's path. */
  private def latestBucketVersions(spark: SparkSession,
      root: String): Seq[(Int, Long, String)] = {
    val f = fs(spark, root)
    val committed = committedSet(spark, root)
    val bdir = bucketsDir(root)
    if (!f.exists(bdir) || committed.isEmpty) Seq.empty
    else f.listStatus(bdir).toSeq.flatMap { st =>
      val name = st.getPath.getName
      if (!name.forall(_.isDigit)) None
      else {
        val vs = f.listStatus(st.getPath).toSeq
          .map(_.getPath.getName)
          .filter(_.startsWith("v="))
          .map(_.stripPrefix("v=").toLong)
          .filter(committed.contains)
        if (vs.isEmpty) None
        else Some((name.toInt, vs.max,
          s"$root/buckets/$name/v=${vs.max}"))
      }
    }
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

  /** [[upsertBatch]] at bucket granularity: the batch rewrites ONLY
    * the buckets its keys hash into; all other buckets keep their
    * older versions untouched — the shape that survives a 100 TB table
    * taking small streaming batches. Same exactly-once protocol: the
    * single marker publishes every bucket version this batch wrote.
    * The same append-within-watermark precondition as [[upsertBatch]]
    * applies to seq=batchId aggregate streams.
    */
  def upsertBatchBucketed(batch: DataFrame, batchId: Long, root: String,
      keyCols: Seq[String], nBuckets: Int, seqCol: String = "seq",
      opCol: String = "op"): Unit = {
    require(nBuckets > 0, s"nBuckets=$nBuckets")
    val spark = batch.sparkSession
    val f = fs(spark, root)
    val marker = new Path(commitsDir(root), batchId.toString)
    val staged = batch.persist()
    try {
      staged.count() // full consumption (state-store commit validation)
      if (f.exists(marker)) return

      val payload = StructType(
        batch.schema.filterNot(c => c.name == seqCol || c.name == opCol))
      val bucket = bucketCol(keyCols, nBuckets)
      // touched-bucket manifest: ≤ nBuckets rows, driver-side by design
      val touched = staged.select(bucket.as("__b")).distinct()
        .collect().map(_.getInt(0)).sorted
      val latest = latestBucketVersions(spark, root)
        .map { case (b, _, p) => b -> p }.toMap
      touched.foreach { b =>
        val base = latest.get(b) match {
          case Some(p) => spark.read.schema(payload).parquet(p)
          case None => spark.createDataFrame(
            spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], payload)
        }
        ChangeDataCapture.applyChangelog(
            base, staged.filter(bucket === b), keyCols, seqCol, opCol)
          .write.mode("overwrite")
          .parquet(s"$root/buckets/$b/v=$batchId")
      }
      // ONE atomic publish for every bucket version written above
      f.mkdirs(commitsDir(root))
      f.create(marker, true).close()
    } finally staged.unpersist(blocking = false)
  }

  /** Vacuum for the BUCKETED layout: per bucket, drop every version
    * except its newest committed one (superseded versions and dead
    * uncommitted orphans below the global committed head alike), then
    * drop the markers no surviving bucket version references — except
    * the global newest marker, which must survive for replay
    * idempotence of the most recent batch. An idle bucket's old
    * version and ITS marker are both retained: visibility never
    * regresses.
    */
  def vacuumBucketed(spark: SparkSession, root: String): Unit = {
    val f = fs(spark, root)
    val committed = committedSet(spark, root)
    if (committed.isEmpty) return
    val head = committed.max
    val latest = latestBucketVersions(spark, root)
    val keepVersions = latest.map(_._2).toSet + head
    latest.foreach { case (b, newest, _) =>
      val bdir = new Path(bucketsDir(root), b.toString)
      f.listStatus(bdir).toSeq
        .map(_.getPath.getName)
        .filter(_.startsWith("v="))
        .map(_.stripPrefix("v=").toLong)
        .filter(v => v != newest && v < head)
        .foreach(v => f.delete(new Path(bdir, s"v=$v"), true))
    }
    committed.filterNot(keepVersions.contains)
      .foreach(v => f.delete(new Path(commitsDir(root), v.toString), false))
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
