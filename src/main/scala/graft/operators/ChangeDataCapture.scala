package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** Keyed changelog application — the MERGE INTO / CDC-apply surface a
  * lakehouse refresh runs: fold a stream of (key, seq, op, payload)
  * change records into a keyed snapshot, latest change per key wins,
  * `D` removes the key, `I`/`U` both upsert the payload (the standard
  * idempotent-apply convention, so a replayed insert or an update that
  * races its own insert cannot fault).
  *
  * Scale shape ([[applyChangelog]]): base and changelog are unioned
  * (a scan concatenation, no shuffle), then ONE hash shuffle on the
  * key columns feeds a rank-1 window ordered newest-change-first with
  * the base row last (`seq` NULL). The `row_number = 1` filter plans
  * as `WindowGroupLimitExec`, so every map task forwards at most one
  * candidate row per key into the shuffle — traffic is
  * O(|base| + |net changelog|), deletes are a post-window FILTER
  * (never an anti-join), and nothing ever enumerates pairs or touches
  * the driver. CdcSpec pins the single-exchange plan, so a regression
  * to the two-join spelling (anti-join survivors ∪ latest upserts —
  * two shuffles of the same rows) fails the suite.
  *
  * Preconditions (documented, spec-exercised): the base snapshot is
  * unique per key, and (key, seq) is unique within a changelog —
  * exactly what a CDC source's (primary key, log sequence number)
  * gives. Under those, apply is idempotent (re-applying a changelog is
  * a no-op) and composable (applying `c1` then `c2` with later seqs
  * equals applying `c1 ∪ c2` once), which is what lets a 100 TB
  * pipeline checkpoint/retry refreshes without a transaction log.
  */
object ChangeDataCapture {

  /** Op-column value that removes the key from the snapshot. */
  val Delete = "D"

  /** Apply `changes` to the keyed snapshot `base`.
    *
    * `changes` must carry every `base` column plus `opCol` (I/U/D) and
    * `seqCol` (any orderable type; highest = newest). Returns a frame
    * with exactly `base`'s columns: base rows whose key saw no change,
    * plus the newest non-delete payload for every changed key.
    */
  def applyChangelog(base: DataFrame, changes: DataFrame,
      keyCols: Seq[String], seqCol: String = "seq",
      opCol: String = "op"): DataFrame = {
    val payload = base.columns.toSeq
    require(keyCols.nonEmpty && keyCols.forall(payload.contains),
      s"key columns $keyCols must be base columns")
    val missing = (payload :+ seqCol :+ opCol)
      .filterNot(changes.columns.contains)
    require(missing.isEmpty, s"changelog lacks columns $missing")

    val seqType = changes.schema(seqCol).dataType
    val opType = changes.schema(opCol).dataType
    val tagged = base
      .withColumn(opCol, lit(null).cast(opType))
      .withColumn(seqCol, lit(null).cast(seqType))
      .unionByName(changes.select((payload :+ opCol :+ seqCol)
        .map(col): _*))
    // newest change first, the base row (NULL seq) strictly last
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(desc_nulls_last(seqCol))
    tagged
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .filter(col(opCol).isNull || col(opCol) =!= Delete)
      .select(payload.map(col): _*)
  }

  /** Net effect of a changelog: the newest record per key, op
    * included. `applyChangelog(base, compactChangelog(c))` equals
    * `applyChangelog(base, c)` for any base — this is the frame a
    * pipeline ships downstream instead of the raw log (bounded by
    * |keys| instead of |events|). Same rank-1/`WindowGroupLimitExec`
    * shape: one bounded shuffle.
    */
  def compactChangelog(changes: DataFrame, keyCols: Seq[String],
      seqCol: String = "seq"): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(desc(seqCol))
    changes.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
  }

  /** Typed change record for the streaming twin. */
  final case class Change(key: Long, seq: Long, op: String, value: String)

  /** Per-key champion: the newest change seen so far. */
  final case class CdcState(seq: Long, op: String, value: String)

  /** Continuously-maintained view row; `alive = false` marks a key
    * whose newest change is a delete (emitted so a downstream sink can
    * retract — filter on `alive` for the snapshot).
    */
  final case class CdcView(key: Long, value: String, seq: Long,
      alive: Boolean)

  /** Streaming twin of [[applyChangelog]]: the continuously
    * maintained current-state view over an unbounded changelog. State
    * per key is ONE champion record, updated by the same
    * highest-seq-wins order the batch window encodes, so the fold is
    * monotone and therefore idempotent under at-least-once replay — a
    * re-delivered change compares `> state.seq`, loses, and leaves the
    * view untouched. CdcSpec proves the final streamed view equals the
    * batch apply on the same records (base staged as seq-0 inserts),
    * and that a doubled delivery changes nothing.
    */
  def cdcViewStream(changes: Dataset[Change]): Dataset[CdcView] = {
    import changes.sparkSession.implicits._
    changes
      .groupByKey(_.key)
      .mapGroupsWithState[CdcState, CdcView](GroupStateTimeout.NoTimeout) {
        (key: Long, rows: Iterator[Change], state: GroupState[CdcState]) =>
          var best = state.getOption.orNull
          rows.foreach { c =>
            if (best == null || c.seq > best.seq)
              best = CdcState(c.seq, c.op, c.value)
          }
          state.update(best)
          CdcView(key, best.value, best.seq, best.op != Delete)
      }
  }
}
