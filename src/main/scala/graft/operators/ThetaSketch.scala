package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** KMV ("k minimum values" / theta) distinct-count sketches — the
  * mergeable sketch family that supports set EXPRESSIONS, not just
  * cardinality: union exactly, intersection by estimate. Spark's
  * built-in HLL (`approx_count_distinct`) unions losslessly but cannot
  * intersect except through inclusion–exclusion, whose error explodes
  * when the intersection is small relative to the union — audience
  * overlap at 100 TB is exactly that regime. (Public prior art: the
  * Apache DataSketches theta family; re-derived here from the KMV
  * estimator, Bar-Yossef et al. 2002.)
  *
  * A group's sketch is the k smallest DISTINCT `xxhash64` values of the
  * keyed column, kept as a sorted `array<bigint>`:
  *  - build = hash-distinct pre-aggregation (map-side combine dedups
  *    locally, the same shuffle shape as any count-distinct) followed
  *    by a rank-k window that compiles to `WindowGroupLimitExec` — map
  *    tasks forward at most k rows per group, so post-distinct traffic
  *    is bounded by k·|parts| per group;
  *  - merge is EXACT: the k smallest of a union's distinct hashes are
  *    recoverable from the per-side k-smallest sets alone (everything
  *    a side dropped is larger than its whole sketch), so
  *    sketch(A) ∪ sketch(B) == sketch(A ∪ B) array-for-array — the
  *    pre-aggregation property a 100 TB rollup ships (ThetaSketchSpec
  *    pins the equality, not just estimate closeness);
  *  - estimates are plain column arithmetic over the array: fewer than
  *    k survivors means the group's distinct set was seen in full and
  *    the "estimate" is exact.
  */
object ThetaSketch {

  private val TwoPow64 = math.pow(2.0, 64)

  /** Per-group KMV sketch of `valueCol`: sorted array of the k smallest
    * distinct hash values, as (groupCols..., kmv).
    */
  def sketch(df: DataFrame, groupCols: Seq[String], valueCol: String,
      k: Int): DataFrame = {
    require(groupCols.nonEmpty && k > 0, "need group columns and k > 0")
    val w = Window.partitionBy(groupCols.map(col): _*).orderBy("__h")
    df.select(groupCols.map(col) :+ xxhash64(col(valueCol)).as("__h"): _*)
      .distinct()
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .groupBy(groupCols.map(col): _*)
      .agg(sort_array(collect_list("__h")).as("kmv"))
  }

  /** [[sketch]] with a strictly BOUNDED shuffle: each input partition
    * folds its rows through per-group capped hash sets (the streaming
    * twin's kernel — at most k longs per group per task, regardless of
    * how many distinct values the partition holds), and the partials
    * merge as arrays (KMV merge is exact, so flatten → distinct → k
    * smallest of ≤ k·|tasks| candidate hashes per group). Identical
    * output to [[sketch]] — ThetaSketchSpec pins the array equality —
    * but the shuffle carries k·|tasks| rows per group instead of the
    * full distinct set: the shape to prefer when |distinct| per group
    * is huge (the regime sketches exist for). The declarative [[sketch]]
    * remains the cleaner plan when distinct sets are modest. Group
    * columns come back as strings here (the typed-Dataset fold needs a
    * uniform key encoding); re-cast on the way out if the caller needs
    * the original types.
    */
  def sketchBounded(df: DataFrame, groupCols: Seq[String], valueCol: String,
      k: Int): DataFrame = {
    require(groupCols.nonEmpty && k > 0, "need group columns and k > 0")
    val spark = df.sparkSession
    import spark.implicits._
    val hashed = df
      .select(groupCols.map(c => col(c).cast("string")) :+
        xxhash64(col(valueCol)).as("__h"): _*)
    val width = groupCols.size
    val partials = hashed.map { row =>
      (Seq.tabulate(width)(row.getString), row.getLong(width))
    }.mapPartitions { it =>
      val sets = scala.collection.mutable.LinkedHashMap
        .empty[Seq[String], scala.collection.mutable.TreeSet[Long]]
      it.foreach { case (g, h) =>
        val set = sets.getOrElseUpdate(g, scala.collection.mutable.TreeSet.empty[Long])
        if (set.size < k) set += h
        else if (h < set.last) {
          set += h
          if (set.size > k) set -= set.last
        }
      }
      sets.iterator.map { case (g, s) => (g, s.toArray) }
    }.toDF("__g", "__partial")
    partials
      .groupBy(col("__g"))
      .agg(slice(array_sort(array_distinct(flatten(collect_list(col("__partial"))))),
        1, k).as("kmv"))
      .select(groupCols.zipWithIndex.map { case (c, i) =>
        element_at(col("__g"), i + 1).as(c)
      } :+ col("kmv"): _*)
  }

  /** Distinct-count estimate from a sketch column: exact below
    * capacity, (k-1)/u_k at capacity, where u_k is the kth smallest
    * hash mapped onto [0, 1).
    */
  def estimate(kmv: Column, k: Int): Column = {
    val uk = element_at(kmv, k).cast("double") / TwoPow64 + 0.5
    when(size(kmv) < k, size(kmv).cast("double"))
      .otherwise(lit((k - 1).toDouble) / uk)
  }

  /** Exact sketch union: k smallest of the combined distinct hash sets.
    * Pure array arithmetic — merging partial sketches never revisits
    * the data.
    */
  def union(a: Column, b: Column, k: Int): Column =
    slice(array_sort(array_union(a, b)), 1, k)

  /** Intersection-cardinality estimate for two sketches: of the union
    * sketch's hashes, the fraction present in BOTH sides scales the
    * union estimate (n_AB/|W| · est(A∪B)). Error ~ 1/sqrt(n_AB) — far
    * tighter than HLL inclusion–exclusion when the intersection is a
    * small share of a large union. Dividing by the union sketch's
    * actual size (not k) makes the estimate EXACT whenever both sides
    * stayed below capacity.
    */
  def intersectionEstimate(a: Column, b: Column, k: Int): Column = {
    val w = union(a, b, k)
    val matches = size(filter(w,
      h => array_contains(a, h) && array_contains(b, h)))
    when(size(w) === 0, 0.0).otherwise(
      matches.cast("double") / size(w).cast("double") * estimate(w, k))
  }
}
