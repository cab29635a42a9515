package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Row-level snapshot diff — the validation pass after a refresh:
  * which keys were added, removed, or changed between two versions of
  * a keyed table, and which columns drove the changes.
  * [[Drift]] answers the distributional question (did the data's
  * SHAPE move); this answers the reconciliation one (did exactly the
  * intended rows move) — the pair a production refresh signs off on.
  *
  * Scale discipline: the status pass ([[diff]]) joins DIGESTS, not
  * payloads — each side reduces map-side to (key, xxhash64(payload
  * struct)), so the full-outer join shuffles two longs per row no
  * matter how wide the table is (xxhash64 over a struct is null-safe
  * and type-aware, so NULL vs 'null' vs 0 digest differently).
  * Column attribution ([[attributeChanges]]) then re-reads ONLY the
  * changed keys (a semi-join against the diff), paying payload
  * shuffle width on the changed slice alone — refreshes change a
  * sliver of a 100 TB table, so the wide join is proportional to the
  * change, not the table. SnapshotDiffSpec pins crafted
  * add/remove/change/null-transition cases, self-diff emptiness,
  * per-column attribution, and the CDC round-trip: diffing a snapshot
  * against applyChangelog(snapshot, log) recovers exactly the log's
  * net effect.
  */
object SnapshotDiff {

  private def digested(df: DataFrame, keyCols: Seq[String]): DataFrame = {
    val payload = df.columns.filterNot(keyCols.contains).toSeq
    require(payload.nonEmpty, "no non-key columns to compare")
    df.select(keyCols.map(col) :+
      xxhash64(struct(payload.map(col): _*)).as("__digest"): _*)
  }

  /** (key..., status) for every key whose presence or payload differs:
    * `added` (new only), `removed` (old only), `changed` (both, digest
    * differs). Unchanged keys are not emitted — the diff is
    * change-proportional.
    */
  def diff(oldDf: DataFrame, newDf: DataFrame,
      keyCols: Seq[String]): DataFrame = {
    val o = digested(oldDf, keyCols)
      .withColumnsRenamed(Map("__digest" -> "__old"))
    val n = digested(newDf, keyCols)
      .withColumnsRenamed(Map("__digest" -> "__new"))
    o.join(n, keyCols, "full_outer")
      .withColumn("status",
        when(col("__old").isNull, "added")
          .when(col("__new").isNull, "removed")
          .when(col("__old") =!= col("__new"), "changed"))
      .filter(col("status").isNotNull)
      .select(keyCols.map(col) :+ col("status"): _*)
  }

  /** For `changed` keys only: the sorted list of column names whose
    * values differ. Payload columns travel only for the changed slice.
    */
  def attributeChanges(oldDf: DataFrame, newDf: DataFrame,
      keyCols: Seq[String]): DataFrame = {
    val payload = oldDf.columns.filterNot(keyCols.contains).toSeq
    val changedKeys = diff(oldDf, newDf, keyCols)
      .filter(col("status") === "changed")
      .select(keyCols.map(col): _*)
    val o = oldDf.join(changedKeys, keyCols, "left_semi")
      .select(keyCols.map(col) ++
        payload.map(c => col(c).as(s"__o_$c")): _*)
    val n = newDf.join(changedKeys, keyCols, "left_semi")
      .select(keyCols.map(col) ++
        payload.map(c => col(c).as(s"__n_$c")): _*)
    o.join(n, keyCols)
      .select(keyCols.map(col) :+
        array_sort(filter(array(payload.map(c =>
          // null-safe inequality per column
          when(!(col(s"__o_$c") <=> col(s"__n_$c")), lit(c))): _*),
          x => x.isNotNull)).as("changed_cols"): _*)
  }

  /** One-row-per-status counts plus per-column change counts — the
    * refresh sign-off summary, aggregated from the frames above.
    */
  def summary(oldDf: DataFrame, newDf: DataFrame,
      keyCols: Seq[String]): DataFrame = {
    val statuses = diff(oldDf, newDf, keyCols)
      .groupBy("status").agg(count(lit(1)).as("n"))
      .select(col("status").as("what"), col("n"))
    val byCol = attributeChanges(oldDf, newDf, keyCols)
      .select(explode(col("changed_cols")).as("what"))
      .groupBy("what").agg(count(lit(1)).as("n"))
      .select(concat(lit("changed:"), col("what")).as("what"), col("n"))
    statuses.unionByName(byCol).orderBy("what")
  }
}
