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

  /** Idempotent micro-batch upsert — the `foreachBatch` body.
    *
    * `batch` must carry the table's payload columns plus `opCol`
    * (I/U/D) and `seqCol` (newest wins). An update-mode aggregate
    * stream without natural op/seq columns can pass constants:
    * `lit("U")` and the batch id (see [[upsertsOnly]]).
    */
  def upsertBatch(batch: DataFrame, batchId: Long, root: String,
      keyCols: Seq[String], seqCol: String = "seq",
      opCol: String = "op"): Unit = {
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
      merged.write.mode("overwrite").parquet(s"$root/v=$batchId")
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
      keyCols: Seq[String]): Unit =
    upsertBatch(
      batch.withColumn("op", lit("U")).withColumn("seq", lit(batchId)),
      batchId, root, keyCols)

  /** Drop committed versions older than the newest `keep` (markers and
    * data both) plus any uncommitted orphan older than the newest
    * committed id. Never touches the newest committed snapshot.
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
