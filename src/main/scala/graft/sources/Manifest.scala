package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter

import graft.plans.BloomFilterFns

/** File-level statistics manifest + scan planner — the data-skipping
  * pattern of the open table formats (Delta/Iceberg/Hudi), re-expressed
  * over plain parquet directories.
  *
  * [[build]] makes ONE distributed pass over the table and reduces it to
  * a |files|-row frame: row count, min/max per range column, and a
  * per-file Bloom sketch per equality column (Spark's own
  * `bloom_filter_agg`, OR-merged map-side — no key list centralizes).
  * [[filesFor]] then plans a scan from the manifest alone: range
  * predicates consult min/max (the same stats parquet footers hold, but
  * available WITHOUT touching the data files), equality probes consult
  * the Bloom sketches — which prune hash-partitioned layouts whose
  * min/max spans everything. Pruning is conservative (Bloom false
  * positives and min/max boxes only ever ADD files), so
  * pruned-read + residual filter is always exactly the direct scan —
  * the no-false-negative guarantee ManifestSpec pins per probe.
  *
  * Scale shape: the manifest is |files| rows (a 100 TB table at 1 GB
  * files is ~100k rows — kilobytes of min/max plus the sketches), so
  * planning happens driver-side off a collected frame, exactly like a
  * table-format metadata read. Combined with `operators/ZOrder`, write
  * Z-clustered files once, [[build]] the manifest once, and every
  * subsequent query plans its file list before the first data byte is
  * read.
  */
object Manifest {

  /** One pass over `path`: per-file rows, min/max for `rangeCols`
    * (cast to double), and a Bloom sketch of `xxhash64(col)` for each
    * of `equalityCols` sized for `expectedItemsPerFile` distinct keys.
    */
  def build(spark: SparkSession, path: String, rangeCols: Seq[String],
      equalityCols: Seq[String] = Nil,
      expectedItemsPerFile: Long = 100000L): DataFrame =
    statsOf(spark.read.parquet(path), rangeCols, equalityCols,
      expectedItemsPerFile)

  private def statsOf(df: DataFrame, rangeCols: Seq[String],
      equalityCols: Seq[String], expectedItemsPerFile: Long): DataFrame = {
    BloomFilterFns.register(df.sparkSession)
    val aggs = count(lit(1)).as("rows") +:
      (rangeCols.flatMap(c => Seq(
        min(col(c).cast("double")).as(s"min_$c"),
        max(col(c).cast("double")).as(s"max_$c"))) ++
        equalityCols.map(c =>
          expr(s"bloom_agg(xxhash64(`$c`), ${expectedItemsPerFile}L)")
            .as(s"bloom_$c")))
    df.groupBy(input_file_name().as("file"))
      .agg(aggs.head, aggs.tail: _*)
  }

  /** Incrementally extend a manifest for an append-only table: list the
    * directory (a metadata operation), stat ONLY files the manifest
    * doesn't cover yet, and union. Maintenance costs O(new data), never
    * O(table) — the property that makes a manifest sustainable at
    * 100 TB ingest rates. ManifestSpec proves the old files are never
    * reopened by deleting one before extending.
    */
  def extend(existing: DataFrame, path: String, rangeCols: Seq[String],
      equalityCols: Seq[String] = Nil,
      expectedItemsPerFile: Long = 100000L): DataFrame = {
    val spark = existing.sparkSession
    // compare by URI path: input_file_name() and Hadoop listings render
    // the scheme differently (file:/// vs file:/)
    def norm(s: String) = new java.net.URI(s).getPath
    val known = existing.select("file").collect().map(r => norm(r.getString(0))).toSet
    val hPath = new org.apache.hadoop.fs.Path(path)
    val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val newFiles = fs.listStatus(hPath).toSeq
      .filter(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
      .map(_.getPath.toString)
      .filterNot(f => known.contains(norm(f)))
    if (newFiles.isEmpty) existing
    else existing.unionByName(statsOf(spark.read.parquet(newFiles: _*),
      rangeCols, equalityCols, expectedItemsPerFile))
  }

  /** Plan a scan: the file paths that can possibly satisfy the
    * conjunction of `ranges` ([lo, hi] per column) and `equalities`
    * (column = value; the value must carry the column's exact type —
    * e.g. a Long for a bigint column — because `xxhash64` is
    * type-sensitive). Driver-side over the tiny manifest; Bloom
    * sketches deserialize through the same spark-sketch format
    * `bloom_filter_agg` wrote, and probe hashes are computed by Spark's
    * own `xxhash64` so build and probe can never disagree.
    */
  def filesFor(manifest: DataFrame, ranges: Seq[(String, Double, Double)],
      equalities: Seq[(String, Any)] = Nil): Seq[String] = {
    val spark = manifest.sparkSession
    val hashes: Map[String, Long] =
      if (equalities.isEmpty) Map.empty
      else {
        val hashCols = equalities.zipWithIndex.map { case ((_, v), i) =>
          xxhash64(lit(v)).as(s"h$i")
        }
        val row = spark.range(1).select(hashCols: _*).head()
        equalities.zipWithIndex.map { case ((c, _), i) => c -> row.getLong(i) }.toMap
      }
    val rows = manifest.collect().toSeq
    rows.filter { r =>
      val rangeOk = ranges.forall { case (c, lo, hi) =>
        val mi = r.getAs[Double](s"min_$c")
        val ma = r.getAs[Double](s"max_$c")
        mi <= hi && ma >= lo
      }
      rangeOk && equalities.forall { case (c, _) =>
        val bytes = r.getAs[Array[Byte]](s"bloom_$c")
        BloomFilter.readFrom(bytes).mightContainLong(hashes(c))
      }
    }.map(_.getAs[String]("file"))
  }

  /** The pruned reader: only the files [[filesFor]] admits (schema from
    * `path` when nothing survives, so the degenerate plan stays typed).
    * Callers still apply the residual row-level predicate — file pruning
    * is coarse by design, correctness comes from the filter that follows
    * (same contract as parquet row-group skipping).
    */
  def readPruned(manifest: DataFrame, path: String,
      ranges: Seq[(String, Double, Double)],
      equalities: Seq[(String, Any)] = Nil): DataFrame = {
    val files = filesFor(manifest, ranges, equalities)
    val spark = manifest.sparkSession
    if (files.isEmpty) spark.read.parquet(path).limit(0)
    else spark.read.parquet(files: _*)
  }
}
