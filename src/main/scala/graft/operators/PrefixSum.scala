package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed exact global running totals (cumulative sums) under a
  * total order — the primitive behind ECDF comparisons (KS test),
  * Lorenz-style curves, and any "cumulative share by rank" statistic.
  *
  * `sum(c) over (order by v)` is a single-task global window no matter
  * the cluster size — the same scale-killer the rank-selection family
  * avoids (RankSelect), solved with the same two-phase shape:
  *
  *  1. range-bucket each row by value (bounds from a broadcast 1-row
  *     min/max aggregate; floor((v−lo)/width) is monotone, ties share a
  *     bucket);
  *  2. per-bucket column totals — one partial-combining aggregate into
  *     ≤ `buckets` rows — and a prefix sum over THAT bounded relation
  *     (the single-partition window is ≤ `buckets` rows by
  *     construction) giving each bucket its starting offsets;
  *  3. in-bucket running sums (windows partitioned by bucket — each a
  *     bounded slice ranked in parallel) shifted by the offsets.
  *
  * Exactness: counts are integer longs, so the bucket-offset +
  * in-bucket decomposition reproduces the sequential cumsum
  * bit-for-bit — no IEEE accumulation-order hazard. Callers pass one
  * row per DISTINCT value (collapse first), which both bounds bucket
  * slices and makes the ROWS-frame running sum equal the oracle's
  * RANGE-frame semantics.
  */
object PrefixSum {

  /** Appends `__cw_<c>` — the inclusive global running total of column
    * `c` under ascending `v` order — for each `c` in `cols`. Input must
    * have one row per distinct `v` with non-null long columns.
    */
  def globalCumsum(df: DataFrame, v: String, cols: Seq[String],
      buckets: Int = 1024): DataFrame =
    globalCumsumOrdered(df, v, None, cols, buckets)

  /** [[globalCumsum]] under the total order (`v`, `tie`): ties on the
    * bucketing value `v` are broken by `tie` inside each bucket window.
    * Input must have one row per distinct (`v`, `tie`) pair — the
    * relaxation that lets a HASH key (collisions possible) order the
    * stream, e.g. epoch-shuffled packing's xxhash64(id, epoch) keys.
    * Bucketing by `v` alone stays sound because tie rows share a
    * bucket by construction (equal v ⇒ equal bucket).
    */
  def globalCumsum(df: DataFrame, v: String, tie: String,
      cols: Seq[String]): DataFrame =
    globalCumsumOrdered(df, v, Some(tie), cols, 1024)

  private def globalCumsumOrdered(df: DataFrame, v: String,
      tie: Option[String], cols: Seq[String], buckets: Int): DataFrame = {
    val stats = df.agg(min(col(v).cast("double")).as("__lo"),
      max(col(v).cast("double")).as("__hi"))
    val bucketed = df.crossJoin(broadcast(stats))
      .withColumn("__b",
        when(col("__hi") === col("__lo"), lit(0L))
          .otherwise(least(
            floor((col(v).cast("double") - col("__lo")) /
              ((col("__hi") - col("__lo")) / buckets)),
            lit(buckets - 1L)))
          .cast("int"))
      .drop("__lo", "__hi")
    val totals = cols.map(c => sum(col(c)).as("__t_" + c))
    val perBucket = bucketed.groupBy(col("__b"))
      .agg(totals.head, totals.tail: _*)
    // exclusive prefix over ≤ buckets rows — bounded by construction,
    // so the single-partition window is legal here (never over facts)
    val wB = Window.orderBy("__b").rowsBetween(Window.unboundedPreceding, -1)
    val offsets = perBucket.select(
      col("__b") +: cols.map(c =>
        coalesce(sum(col("__t_" + c)).over(wB), lit(0L)).as("__off_" + c)): _*)
    val wIn = Window.partitionBy("__b")
      .orderBy(col(v) +: tie.map(col).toSeq: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cols.foldLeft(bucketed.join(broadcast(offsets), "__b")) { (acc, c) =>
      acc.withColumn("__cw_" + c, col("__off_" + c) + sum(col(c)).over(wIn))
    }.drop("__b" +: cols.map("__off_" + _): _*)
  }
}
