package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-Min sketch as a DataFrame-native sparse counter table — the
  * mergeable point-frequency estimator that rounds out the sketch
  * family (Misra–Gries gives the top items, KMV the distinct counts;
  * CMS answers "how often did THIS key occur" for any key, without a
  * per-key row surviving anywhere). Public construction: Cormode &
  * Muthukrishnan 2005.
  *
  * A group's sketch is `depth` hash rows of `width` counters, stored
  * SPARSELY as (group, depth, bucket, cnt) rows — at most
  * depth·min(width, |distinct|) rows per group, bounded by depth·width
  * forever. Build is one explode (each item → depth (depth, bucket)
  * pairs via seeded xxhash64) plus ONE aggregation, so the map-side
  * combine collapses each partition to the bounded counter table
  * before anything shuffles. Merging partial sketches is counter
  * addition — a plain re-aggregation, and EXACTLY equal to sketching
  * the concatenated input (CountMinSketchSpec pins the equality).
  * Estimates broadcast the bounded counter table under a probe join +
  * min over the depth rows: never an underestimate, and over by at
  * most ~e/width · n with high probability — the guarantee the spec
  * measures on a real token stream.
  */
object CountMinSketch {

  private def pair(valueCol: Column, depth: Int, width: Int): Column =
    explode(array((0 until depth).map(i =>
      struct(lit(i).as("depth"),
        pmod(xxhash64(valueCol, lit(i)), lit(width.toLong)).as("bucket"))): _*))

  /** Per-group sparse CMS: (groupCols..., depth, bucket, cnt). */
  def sketch(df: DataFrame, groupCols: Seq[String], valueCol: String,
      depth: Int = 4, width: Int = 1024): DataFrame = {
    require(depth > 0 && width > 0, "need positive depth and width")
    df.select(groupCols.map(col) :+
        pair(col(valueCol), depth, width).as("__db"): _*)
      .groupBy((groupCols.map(col) :+ col("__db.depth").as("depth") :+
        col("__db.bucket").as("bucket")): _*)
      .agg(count(lit(1)).as("cnt"))
  }

  /** Merge partial sketches (same depth/width/group schema): counter
    * addition on (group, depth, bucket). Equal to sketching the
    * concatenated inputs.
    */
  def merge(sketches: DataFrame*): DataFrame = {
    val all = sketches.reduce(_ unionByName _)
    val keys = all.columns.filterNot(_ == "cnt").map(col).toSeq
    all.groupBy(keys: _*).agg(sum("cnt").as("cnt"))
  }

  /** Point-frequency estimates for `probes` (a frame holding
    * `valueCol`, plus the group columns if the sketch is grouped):
    * probes explode through the same seeded hashes, left-join the
    * counter table (absent counter = 0), and the per-probe estimate is
    * the MIN across depth rows. The SKETCH broadcasts — it is bounded
    * at depth·width rows per group by construction, so an arbitrarily
    * large probe stream scores map-side without shuffling either side.
    */
  def estimate(sk: DataFrame, probes: DataFrame, groupCols: Seq[String],
      valueCol: String, depth: Int = 4, width: Int = 1024): DataFrame = {
    val exploded = probes
      .select((groupCols.map(col) :+ col(valueCol) :+
        pair(col(valueCol), depth, width).as("__db")): _*)
      .select((groupCols.map(col) :+ col(valueCol) :+
        col("__db.depth").as("depth") :+ col("__db.bucket").as("bucket")): _*)
    exploded.join(broadcast(sk),
        (groupCols ++ Seq("depth", "bucket")).toSeq, "left")
      .groupBy((groupCols.map(col) :+ col(valueCol)): _*)
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est"))
  }
}
