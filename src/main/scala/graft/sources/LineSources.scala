package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Line-file sources and sinks (SURVEY.md §2.1 parity).
  *
  * The reference's native data model is flat files of text lines in a
  * distributed FS, with the (key, value) line as the only structured
  * unit; these loaders keep that surface available next to the parquet
  * path: a user of the reference can point the same query code at text,
  * CSV, or JSON-lines input. Parquet remains the performance path —
  * these formats have no column pruning or predicate pushdown, which is
  * exactly why the engine defaults to parquet at scale.
  */
object LineSources {

  /** Raw text lines → single `value` column (the maple input shape). */
  def readTextLines(spark: SparkSession, path: String): DataFrame =
    spark.read.text(path)

  /** Header-less CSV with an explicit schema (never inferred — schema
    * inference would read the data twice and can drift per-file).
    */
  def readCsv(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).option("header", "false").csv(path)

  /** JSON-lines with an explicit schema. */
  def readJsonLines(spark: SparkSession, path: String,
      schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  /** The juice output shape: `key<TAB>value` lines appended to a
    * destination directory of text files. The input's partitioning is
    * preserved (the projection is narrow), so a caller-side
    * `repartition`/`repartitionByRange` controls the sink layout —
    * the reference's hash|range output-partition knob.
    */
  def writeKeyValueLines(df: DataFrame, keyCol: String, valueCol: String,
      path: String): Unit =
    df.select(concat_ws("\t", col(keyCol), col(valueCol)).as("value"))
      .write.mode("overwrite").text(path)

  /** Typed re-entry of [[writeKeyValueLines]]: `key<TAB>value` lines
    * back to (key, value) string columns. The value may itself contain
    * TABs (only the first one splits); a key-only line gets an empty
    * value — get() (0-based) returns NULL past the end even under ANSI
    * mode, where element_at would throw.
    */
  def readKeyValueLines(spark: SparkSession, path: String): DataFrame =
    readTextLines(spark, path)
      .select(split(col("value"), "\t", 2).as("kv"))
      .select(coalesce(get(col("kv"), lit(0)), lit("")).as("key"),
        coalesce(get(col("kv"), lit(1)), lit("")).as("value"))
}
