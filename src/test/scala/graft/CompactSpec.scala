package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{Compact, Manifest}

/** The bin-packing compactor: plan capacity/coverage invariants, the
  * one-file-per-bin rewrite, row-content equality through compaction,
  * in-bin sort preservation, and manifest composition.
  */
class CompactSpec extends AnyFunSuite {
  import SparkTestBase._

  // a deliberately fragmented copy of documents: 16 small files
  private lazy val fragmented: String = {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-compact-in").toString
    spark.read.parquet(s"$sf0001/documents.parquet")
      .repartition(16).write.mode("overwrite").parquet(dir)
    dir
  }

  private def parquetFilesUnder(dir: String): Seq[java.io.File] = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk)
      else if (f.getName.endsWith(".parquet")) Seq(f)
      else Nil
    walk(new java.io.File(dir))
  }

  private def totalBytes(dir: String): Long =
    parquetFilesUnder(dir).map(_.length).sum

  test("plan: bins respect capacity, cover every file exactly once") {
    val target = totalBytes(fragmented) / 4 + 1
    val bins = Compact.plan(spark, fragmented, target)
    // capacity: no multi-file bin exceeds the target
    bins.foreach { b =>
      assert(b.files.size === b.files.distinct.size)
      assert(b.files.size == 1 || b.bytes <= target,
        s"overfilled bin: ${b.bytes} > $target")
    }
    // coverage: the bins partition the input file set
    val planned = bins.flatMap(_.files)
    assert(planned.size === planned.distinct.size)
    assert(planned.size === 16)
    // FFD actually packs: strictly fewer bins than files, and at least
    // the information-theoretic minimum
    val total = bins.map(_.bytes).sum
    assert(bins.size < 16 && bins.size >= (total + target - 1) / target)
  }

  test("rewrite: one file per bin, identical rows, sorted within bins") {
    val target = totalBytes(fragmented) / 4 + 1
    val out = java.nio.file.Files
      .createTempDirectory("graft-compact-out").toString + "/t"
    val bins = Compact.rewrite(spark, fragmented, out, target,
      sortCols = Seq("doc_id"))

    // exactly one parquet file per planned bin
    val outFiles = parquetFilesUnder(out)
    assert(outFiles.size === bins.size)

    // row content survives compaction exactly
    def canon(path: String): Seq[String] =
      spark.read.parquet(path)
        .select(col("doc_id"), md5(col("text").cast("binary")))
        .orderBy("doc_id").collect().toSeq.map(_.toString)
    assert(canon(out).size === 500)
    assert(canon(out) === canon(fragmented))

    // each bin's file is internally sorted on the sort column
    outFiles.foreach { f =>
      val ids = spark.read.parquet(f.getAbsolutePath)
        .select("doc_id").collect().map(_.getLong(0)).toSeq
      assert(ids === ids.sorted, s"unsorted bin file $f")
    }

    // the compacted layout manifests to |bins| rows and still plans
    // correct scans (conservative pruning contract)
    val m = Manifest.build(spark, s"$out/__bin=0", Seq("doc_id"))
    assert(m.count() === 1L)
  }
}
