package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Small-file compaction — the OPTIMIZE / bin-packing maintenance pass
  * of the open table formats, over plain parquet directories.
  *
  * Small files are the silent scan killer at 100 TB: a table ingested
  * in 10k micro-batches carries millions of kilobyte files, so a scan
  * pays per-file open/footer costs that dwarf the data read and the
  * driver pays an O(|files|) planning tax on every query. [[plan]]
  * fixes the layout from METADATA alone: list the directory (no data
  * bytes), first-fit-decreasing the file sizes into bins of
  * `targetBytes` — FFD never overfills a bin (a file is placed only
  * where it fits) and uses at most ~1.7× the optimal bin count, with
  * oversized files isolated one-per-bin.
  *
  * [[rewrite]] then executes the plan as ONE distributed job, not a
  * driver loop over bins: every row is tagged with its bin (tiny
  * broadcast file→bin dictionary joined on basename),
  * `repartition(col("__bin"))` co-locates each bin in exactly one
  * task, and `partitionBy("__bin")` lands exactly one output file per
  * bin. An optional `sortCols` re-sorts within each bin so a
  * Z-ordered/clustered layout keeps its footer-stats locality through
  * compaction. The output is a normal parquet directory —
  * [[Manifest.build]] over it yields a |bins|-row manifest, and row
  * content is byte-identical to the input (CompactSpec pins equality,
  * the one-file-per-bin invariant, bin capacity, and sortedness).
  *
  * A production compactor adds candidate selection (skip files already
  * near target size) and a transactional file swap; both are
  * table-format bookkeeping, orthogonal to the planning + single-job
  * rewrite shape this implements.
  */
object Compact {

  /** One planned output file: the input files it merges + their
    * total on-disk bytes.
    */
  final case class Bin(files: Seq[String], bytes: Long)

  /** First-fit-decreasing bin-packing of `path`'s parquet files into
    * bins of at most `targetBytes` (files larger than the target get a
    * bin of their own). Metadata-only: one directory listing, no data
    * read.
    */
  def plan(spark: SparkSession, path: String,
      targetBytes: Long): Seq[Bin] = {
    require(targetBytes > 0, "targetBytes must be positive")
    val hPath = new org.apache.hadoop.fs.Path(path)
    val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files = fs.listStatus(hPath).toSeq
      .filter(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
      .map(st => (st.getPath.toString, st.getLen))
      .sortBy { case (f, len) => (-len, f) } // decreasing, ties stable
    val bins = scala.collection.mutable.ArrayBuffer.empty[(scala.collection.mutable.ArrayBuffer[String], Long)]
    files.foreach { case (f, len) =>
      bins.indexWhere { case (_, used) => used + len <= targetBytes } match {
        case -1 => bins += ((scala.collection.mutable.ArrayBuffer(f), len))
        case i  => bins(i) = (bins(i)._1 += f, bins(i)._2 + len)
      }
    }
    bins.toSeq.map { case (fs0, bytes) => Bin(fs0.toSeq, bytes) }
  }

  /** Execute a compaction plan: read `path` once, write `outPath` with
    * exactly one parquet file per bin (under `__bin=<i>/` partition
    * directories), each bin optionally re-sorted on `sortCols`.
    * Returns the executed plan.
    */
  def rewrite(spark: SparkSession, path: String, outPath: String,
      targetBytes: Long, sortCols: Seq[String] = Nil): Seq[Bin] = {
    val bins = plan(spark, path, targetBytes)
    // file → bin dictionary, |files| rows, joined broadcast on the
    // basename (input_file_name() and the listing render the URI
    // scheme differently; basenames are unique within one directory)
    def basename(s: String) = s.substring(s.lastIndexOf('/') + 1)
    import spark.implicits._
    val dict = bins.zipWithIndex
      .flatMap { case (b, i) => b.files.map(f => (basename(f), i)) }
      .toDF("__base", "__bin")
    // lead the in-partition sort with __bin: FileFormatWriter requires
    // ordering by the partitionBy column and would otherwise insert its
    // own sort, discarding sortCols' order
    val sorted: DataFrame => DataFrame =
      if (sortCols.isEmpty) identity
      else _.sortWithinPartitions((("__bin") +: sortCols).map(col): _*)
    sorted(
      spark.read.parquet(path)
        .withColumn("__base",
          element_at(split(input_file_name(), "/"), -1))
        .join(broadcast(dict), "__base")
        .drop("__base")
        .repartition(bins.size, col("__bin")))
      .write.partitionBy("__bin").parquet(outPath)
    bins
  }
}
