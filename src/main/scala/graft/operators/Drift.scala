package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Snapshot-to-snapshot drift detection — the validation gate a
  * recurring training-data refresh runs before shipping a new corpus
  * cut: for each watched column, how far has today's distribution
  * moved from the reference snapshot's? Reported as PSI (population
  * stability index, the standard banking/ML-monitoring statistic:
  * Σ (p_cur − p_ref)·ln(p_cur/p_ref) over bins; < 0.1 stable, > 0.25
  * act), alongside row counts and null rates.
  *
  * Scale shape: ALL numeric columns are unpivoted into (column, value)
  * rows and processed in ONE aggregation pass per table — no per-column
  * jobs. Bin edges come from the REFERENCE side's deciles (one
  * `approx_percentile` row, broadcast), so both snapshots bucket
  * against identical edges and the report never shuffles more than
  * |cols|·|bins| rows. Null rates ride the same pass; ε-smoothing keeps
  * PSI finite when a bin empties out entirely.
  */
object Drift {

  private val Eps = 1e-6

  /** (column, bucket) -> share, for the given numeric columns against
    * the supplied per-column edge arrays (broadcast). Null values are
    * excluded from shares (reported separately as null rates).
    */
  private def shares(df: DataFrame, cols: Seq[String],
      edges: DataFrame): DataFrame = {
    val melted = df.select(
      explode(map_from_arrays(
        array(cols.map(lit): _*),
        array(cols.map(c => col(c).cast("double")): _*))).as(Seq("c", "v")))
      .filter(col("v").isNotNull)
    melted.join(broadcast(edges), "c")
      .select(col("c"), expr(
        "aggregate(edges, 0, (acc, b) -> acc + IF(v >= b, 1, 0))").as("bucket"))
      .groupBy("c", "bucket").agg(count(lit(1)).as("n"))
      .withColumn("share", col("n") /
        sum("n").over(org.apache.spark.sql.expressions.Window.partitionBy("c")))
  }

  /** Per-column numeric drift report:
    * (column, psi, n_ref, n_cur, null_rate_ref, null_rate_cur),
    * ordered by column. `bins` reference-quantile buckets (deciles by
    * default).
    */
  def numericReport(ref: DataFrame, cur: DataFrame, cols: Seq[String],
      bins: Int = 10): DataFrame = {
    require(cols.nonEmpty && bins >= 2, "need columns and >= 2 bins")
    val fracs = (1 until bins).map(i => i.toDouble / bins)
    // one approx_percentile row over the reference, melted to
    // (c, edges) — the broadcastable binning contract both sides share
    val edgeAggs = cols.map(c =>
      expr(s"approx_percentile(cast(`$c` as double), array(${fracs.mkString(",")}), 10000)")
        .as(c))
    val edgeRow = ref.agg(edgeAggs.head, edgeAggs.tail: _*)
    val edges = edgeRow.select(explode(map_from_arrays(
      array(cols.map(lit): _*),
      array(cols.map(col): _*))).as(Seq("c", "edges")))

    val refS = shares(ref, cols, edges).withColumnRenamed("share", "p_ref")
      .withColumnRenamed("n", "n_ref_b")
    val curS = shares(cur, cols, edges).withColumnRenamed("share", "p_cur")
      .withColumnRenamed("n", "n_cur_b")
    val psi = refS.join(curS, Seq("c", "bucket"), "full")
      .select(col("c"),
        ((coalesce(col("p_cur"), lit(0.0)) + Eps) -
          (coalesce(col("p_ref"), lit(0.0)) + Eps)).as("d"),
        log((coalesce(col("p_cur"), lit(0.0)) + Eps) /
          (coalesce(col("p_ref"), lit(0.0)) + Eps)).as("lr"))
      .groupBy("c").agg(round(sum(col("d") * col("lr")), 6).as("psi"))

    def rates(df: DataFrame, tag: String): DataFrame =
      df.select(explode(map_from_arrays(
        array(cols.map(lit): _*),
        array(cols.map(c => col(c).cast("double").isNull
          .cast("double")): _*))).as(Seq("c", "isnull")))
        .groupBy("c").agg(count(lit(1)).as(s"n_$tag"),
          round(avg("isnull"), 6).as(s"null_rate_$tag"))

    psi.join(rates(ref, "ref"), "c").join(rates(cur, "cur"), "c")
      .select(col("c").as("column"), col("psi"), col("n_ref"), col("n_cur"),
        col("null_rate_ref"), col("null_rate_cur"))
      .orderBy("column")
  }

  /** Categorical drift: PSI over the reference's top-`topK` categories
    * plus an OTHER bucket, for one string column.
    */
  def categoricalReport(ref: DataFrame, cur: DataFrame, c: String,
      topK: Int = 20): DataFrame = {
    val top = ref.groupBy(col(c).as("cat")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("cat"))
      .limit(topK).select("cat")
    def catShares(df: DataFrame, tag: String): DataFrame =
      df.select(col(c).as("cat"))
        .join(broadcast(top.withColumn("keep", lit(true))), Seq("cat"), "left")
        .select(when(col("keep"), col("cat")).otherwise(lit("__other__")).as("cat"))
        .groupBy("cat").agg(count(lit(1)).as(s"n_$tag"))
        .withColumn(s"p_$tag", col(s"n_$tag") /
          sum(s"n_$tag").over(org.apache.spark.sql.expressions.Window
            .partitionBy(lit(1))))
    catShares(ref, "ref").join(catShares(cur, "cur"), Seq("cat"), "full")
      .select(lit(c).as("column"),
        (((coalesce(col("p_cur"), lit(0.0)) + Eps) -
          (coalesce(col("p_ref"), lit(0.0)) + Eps)) *
          log((coalesce(col("p_cur"), lit(0.0)) + Eps) /
            (coalesce(col("p_ref"), lit(0.0)) + Eps))).as("term"))
      .groupBy("column").agg(round(sum("term"), 6).as("psi"))
  }
}
