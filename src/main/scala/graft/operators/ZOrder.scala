package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.plans.{HilbertIndex, InterleaveBits}

/** Multi-dimensional data layout: Z-order (Morton-curve) clustering.
  *
  * A single-column sort gives parquet min/max footer pruning for its
  * leading column only — a predicate on any other column still reads
  * every file. Z-ordering sorts by the bit-interleaved value of N
  * bucketized columns (`plans/InterleaveBits`), so each output file
  * covers a small hyper-rectangle of the key space and footer stats
  * prune scans for predicates on ANY subset of the clustered columns.
  * This is the public OPTIMIZE ZORDER BY idea (Delta Lake / classic
  * Morton-order indexing) re-expressed as a plain Spark layout pass.
  *
  * Scale shape (the part that must survive 100 TB):
  *  - Bucket bounds come from ONE scalar aggregate over the input
  *    (min/max per column, or an approx-percentile boundary array for
  *    the rank-based variant) whose 1-row result broadcasts back over
  *    the scan — no extra shuffle of the data itself.
  *  - Bucketize + interleave are pure map-side, codegen'd expressions.
  *  - The only data movement is the final `repartitionByRange` on the
  *    Z-value — the shuffle any clustering rewrite fundamentally needs,
  *    and the same cost as a plain global sort.
  *  - Nulls coalesce into bucket 0 (never dropped), matching the
  *    null-first convention so a null-seeking scan prunes to the low
  *    files.
  *
  * Equi-width bucketing is exact and deterministic but skew-sensitive
  * (a hot range crowds buckets); the rank-based variant spends one
  * `approx_percentile` pass to get equal-population buckets — the right
  * default for power-law keys. Both keep the boundary state O(2^bits)
  * per column, broadcastable at any corpus size.
  */
object ZOrder {

  private def bcol(i: Int) = s"__zb$i"

  /** Equi-width bucket ids in [0, 2^bits): one min/max scalar agg,
    * broadcast back, then a map-side scale-and-clamp per column.
    * Constant columns (min == max) and nulls land in bucket 0.
    */
  def equiWidthBucketized(df: DataFrame, cols: Seq[String], bits: Int): DataFrame = {
    require(cols.nonEmpty && bits >= 1 && cols.size * bits <= 63,
      s"need 1 <= dims*bits <= 63, got ${cols.size}*$bits")
    val buckets = 1 << bits
    val aggs = cols.flatMap(c => Seq(
      min(col(c).cast("double")).as(s"__min_$c"),
      max(col(c).cast("double")).as(s"__max_$c")))
    val stats = df.agg(aggs.head, aggs.tail: _*)
    val joined = df.crossJoin(broadcast(stats))
    cols.zipWithIndex.foldLeft(joined) { case (acc, (c, i)) =>
      val v = col(c).cast("double")
      val lo = col(s"__min_$c")
      val span = col(s"__max_$c") - lo
      // span == 0 -> null -> bucket 0; same for null values. coalesce
      // BEFORE least: Spark's least() skips nulls, so least(null, k) = k
      // would throw nulls into the TOP bucket.
      val scaled = floor((v - lo) / when(span > 0.0, span) * buckets)
      acc.withColumn(bcol(i),
        least(coalesce(scaled, lit(0)), lit(buckets - 1)).cast("int"))
    }.drop(cols.flatMap(c => Seq(s"__min_$c", s"__max_$c")): _*)
  }

  /** Equal-population bucket ids in [0, 2^bits): one approx-percentile
    * boundary pass (2^bits - 1 boundaries per column, broadcast), then
    * a map-side rank scan per row over the tiny boundary array. Use for
    * skewed columns where equi-width would crowd one bucket.
    */
  def rankBucketized(df: DataFrame, cols: Seq[String], bits: Int): DataFrame = {
    require(cols.nonEmpty && bits >= 1 && cols.size * bits <= 63,
      s"need 1 <= dims*bits <= 63, got ${cols.size}*$bits")
    val buckets = 1 << bits
    val fracs = (1 until buckets).map(i => i.toDouble / buckets)
    val aggs = cols.map(c =>
      expr(s"approx_percentile(cast(`$c` as double), array(${fracs.mkString(",")}), 10000)")
        .as(s"__bnd_$c"))
    val stats = df.agg(aggs.head, aggs.tail: _*)
    val joined = df.crossJoin(broadcast(stats))
    cols.zipWithIndex.foldLeft(joined) { case (acc, (c, i)) =>
      // bucket = #boundaries <= v; null comparisons fall to the 0 branch
      // so nulls land in bucket 0.
      val cnt = expr(
        s"aggregate(`__bnd_$c`, 0, (acc, b) -> acc + IF(cast(`$c` as double) >= b, 1, 0))")
      acc.withColumn(bcol(i), coalesce(cnt, lit(0)).cast("int"))
    }.drop(cols.map(c => s"__bnd_$c"): _*)
  }

  /** Input plus a `__z` long column: the space-filling-curve index of
    * the bucketized clustering columns. `rankBased` picks the
    * bucketizer; `curve` picks `"morton"` (Z-order, the default) or
    * `"hilbert"` (tighter per-file bounding boxes — consecutive curve
    * positions are always spatially adjacent — at a slightly costlier
    * per-row encode).
    */
  def zvalued(df: DataFrame, cols: Seq[String], bits: Int,
      rankBased: Boolean = false, curve: String = "morton"): DataFrame = {
    val fn = curve match {
      case "morton" =>
        InterleaveBits.register(df.sparkSession); "interleave_bits"
      case "hilbert" =>
        HilbertIndex.register(df.sparkSession); "hilbert_index"
      case other =>
        throw new IllegalArgumentException(s"unknown curve: $other")
    }
    val bucketized =
      if (rankBased) rankBucketized(df, cols, bits)
      else equiWidthBucketized(df, cols, bits)
    val names = cols.indices.map(bcol)
    bucketized
      .withColumn("__z", expr(s"$fn($bits, ${names.mkString(", ")})"))
      .drop(names: _*)
  }

  /** Write `df` as `numFiles` Z-ordered parquet files: range-partition
    * on the Z-value (each file owns a contiguous Z-range, i.e. a small
    * cluster of key-space cells), sort within partitions so row groups
    * inherit the clustering too, then drop the helper column.
    */
  def write(df: DataFrame, cols: Seq[String], bits: Int, path: String,
      numFiles: Int, rankBased: Boolean = false,
      curve: String = "morton"): Unit =
    zvalued(df, cols, bits, rankBased, curve)
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)

  /** Per-file min/max of `cols` for a parquet directory — the same
    * statistics the parquet reader's footer-based row-group skipping
    * consults. Diagnostic/audit helper: production pruning happens
    * inside the scan (PushedFilters), this makes the layout quality
    * measurable.
    */
  def fileStats(spark: SparkSession, path: String, cols: Seq[String]): DataFrame = {
    val aggs = count(lit(1)).as("rows") +:
      cols.flatMap(c => Seq(
        min(col(c).cast("double")).as(s"min_$c"),
        max(col(c).cast("double")).as(s"max_$c")))
    spark.read.parquet(path)
      .groupBy(input_file_name().as("file"))
      .agg(aggs.head, aggs.tail: _*)
  }

  /** Fraction of files whose [min, max] box intersects the query box —
    * exactly the fraction of files a footer-stat-aware scan must read
    * for that conjunctive range predicate. Driver-side on the tiny
    * per-file stats frame (|files| rows), audit only.
    */
  def overlapFraction(stats: DataFrame, box: Seq[(String, Double, Double)]): Double = {
    val pred: Column = box
      .map { case (c, lo, hi) => col(s"min_$c") <= hi && col(s"max_$c") >= lo }
      .reduce(_ && _)
    stats.filter(pred).count().toDouble / stats.count().toDouble
  }
}
