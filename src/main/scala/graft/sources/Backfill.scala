package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Partition backfill — recompute a slice of a partitioned table and
  * swap ONLY that slice in, the correction pattern every dated
  * pipeline runs ("re-run 2026-08-12 with the fixed logic").
  *
  * The guarantee that matters at 100 TB is physical: a backfill of one
  * day must cost one day, so [[overwritePartitions]] uses dynamic
  * partition-overwrite semantics — partitions PRESENT in the frame are
  * replaced atomically-per-partition, partitions absent from it are
  * not listed, not rewritten, not touched. BackfillSpec proves it at
  * the filesystem level: untouched partitions keep byte-identical
  * files (same names, sizes, mtimes), while the touched partition's
  * content is replaced exactly; a plain `mode("overwrite")` without
  * the dynamic flag would have dropped them (also pinned, so the
  * difference stays visible).
  *
  * [[partitions]] lists a table's partition directories from metadata
  * (for pre-flight "what would this touch" checks against the frame's
  * own distinct partition values).
  */
object Backfill {

  /** Overwrite exactly the partitions present in `df` under `path`,
    * laid out by `partCols`. Session conf is restored afterwards.
    */
  def overwritePartitions(df: DataFrame, path: String,
      partCols: Seq[String]): Unit = {
    require(partCols.nonEmpty, "backfill needs partition columns")
    val spark = df.sparkSession
    val key = "spark.sql.sources.partitionOverwriteMode"
    val prev = spark.conf.get(key)
    spark.conf.set(key, "dynamic")
    try df.write.mode("overwrite").partitionBy(partCols: _*).parquet(path)
    finally spark.conf.set(key, prev)
  }

  /** The table's partition directory names (metadata listing only),
    * e.g. `Seq("day=2026-08-12", "day=2026-08-13")` for one level.
    */
  def partitions(df: DataFrame, path: String): Seq[String] = {
    val hPath = new org.apache.hadoop.fs.Path(path)
    val fs = hPath.getFileSystem(
      df.sparkSession.sparkContext.hadoopConfiguration)
    fs.listStatus(hPath).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.contains("="))
      .map(_.getPath.getName).sorted
  }
}
