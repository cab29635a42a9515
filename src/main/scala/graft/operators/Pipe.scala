package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Partition-wise external-executable stage — the reference's whole
  * extensibility story (SURVEY.md §2.11, §3.1 [SPEC]): user logic is an
  * arbitrary executable that reads text lines on stdin and writes text
  * lines on stdout (the maple/juice contract). This operator gives that
  * surface to the engine without giving up its execution model:
  *
  *  - ONE process per PARTITION, not per row or per job — 1000
  *    executors fork 1000 pipelines, each streaming its partition
  *    through the child with constant memory on both sides.
  *  - Lifecycle discipline comes from Spark's own `RDD.pipe`: a writer
  *    thread feeds stdin (so a child that buffers output cannot
  *    deadlock the task), a stderr-drain thread prevents the child
  *    blocking on a full stderr pipe, a non-zero exit code fails the
  *    task (and so the job) instead of silently truncating output, and
  *    task teardown reaps the child.
  *  - The stage is a black box to Catalyst, so project/filter BEFORE
  *    piping — only the serialized columns cross the process boundary.
  *
  * There is deliberately NO oracle entry for this operator: its
  * semantics are "whatever the executable computes", which is not
  * SQL-expressible. PipeSpec proves equivalence against native plans
  * for executables whose semantics ARE known (awk/tr wordcount), plus
  * the failure contract.
  */
object Pipe {

  /** Rows → TAB-joined lines → `cmd` (argv vector) → one output row per
    * stdout line, as a single `line` column. NULLs serialize as empty
    * strings (the reference's line files have no NULL notion).
    */
  def pipe(df: DataFrame, cmd: Seq[String]): DataFrame = {
    val s = df.sparkSession
    import s.implicits._
    val lines = df.select(concat_ws("\t",
      df.columns.toIndexedSeq
        .map(c => coalesce(col(c).cast("string"), lit(""))): _*))
      .as[String]
    s.createDataset(lines.rdd.pipe(cmd)).toDF("line")
  }

  /** [[pipe]] through `/bin/sh -c`, so the command may use shell
    * pipelines/quoting — the form the ad-hoc Shell exposes.
    */
  def pipeShell(df: DataFrame, shellCmd: String): DataFrame =
    pipe(df, Seq("/bin/sh", "-c", shellCmd))

  /** [[pipe]] plus parsing stdout back into typed columns: each output
    * line splits on TAB into exactly `outCols` string columns (missing
    * trailing fields become empty strings). The juice-output shape —
    * `key<TAB>value` lines — re-enters the declarative world here.
    */
  def pipeTsv(df: DataFrame, cmd: Seq[String], outCols: Seq[String]): DataFrame = {
    val parts = split(col("line"), "\t", outCols.length)
    // get() (0-based) returns NULL past the end even under ANSI mode —
    // element_at would throw INVALID_ARRAY_INDEX on a stdout line with
    // fewer than outCols TAB fields (e.g. a juice mapper emitting a
    // bare key), breaking the missing-fields-become-empty contract.
    val cols = outCols.zipWithIndex.map { case (name, i) =>
      coalesce(get(parts, lit(i)), lit("")).as(name)
    }
    pipe(df, cmd).select(cols: _*)
  }
}
