package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.ZOrder
import graft.sources.Manifest

/** The file-manifest scan planner: Bloom equality pruning on layouts
  * min/max cannot serve, range pruning consistent with the Z-order
  * layout's footer stats, and — the safety property everything rests
  * on — never a false negative: pruned-read + residual filter must
  * equal the direct scan for every probe, present or absent.
  */
class ManifestSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private lazy val li = spark.read
    .parquet(s"${SparkTestBase.sf0001}/lineitem.parquet")
    .select("l_orderkey", "l_linenumber", "l_partkey", "l_extendedprice")

  test("bloom sketches prune a hash-partitioned layout whose min/max spans everything") {
    val dir = java.nio.file.Files.createTempDirectory("graft-manifest-hash").toString
    li.repartition(16, col("l_orderkey")).write.mode("overwrite").parquet(dir)
    val m = Manifest.build(spark, dir,
      rangeCols = Seq("l_partkey"), equalityCols = Seq("l_orderkey"),
      expectedItemsPerFile = 2000L).cache()
    assert(m.count() === 16)

    // hash layout: every file spans ~the full partkey range, so range
    // stats prune nothing...
    assert(Manifest.filesFor(m, Seq(("l_partkey", 80.0, 119.0))).size >= 15)

    // ...but each orderkey lives in exactly ONE file, and the sketches
    // find it (plus at most a couple of false positives)
    for (k <- Seq(14L, 676L, 1102L, 1499L)) {
      val files = Manifest.filesFor(m, Nil, Seq(("l_orderkey", k)))
      assert(files.nonEmpty && files.size <= 4)
      val got = Manifest.readPruned(m, dir, Nil, Seq(("l_orderkey", k)))
        .filter(col("l_orderkey") === k).count()
      val want = li.filter(col("l_orderkey") === k).count()
      assert(got === want && want > 0)
    }

    // absent key: pruning may drop every file, and the result is still
    // exactly the direct scan's (empty) answer
    val gone = Manifest.readPruned(m, dir, Nil, Seq(("l_orderkey", 999999L)))
      .filter(col("l_orderkey") === 999999L).count()
    assert(gone === 0L)
    m.unpersist()
  }

  test("extend stats only the appended files — proven by deleting an old one first") {
    val dir = java.nio.file.Files.createTempDirectory("graft-manifest-inc").toString
    val old = li.filter(col("l_orderkey") < 800)
    val app = li.filter(col("l_orderkey") >= 800)
    old.repartition(4, col("l_orderkey")).write.mode("overwrite").parquet(dir)
    val m0 = Manifest.build(spark, dir, rangeCols = Seq("l_orderkey"),
      equalityCols = Seq("l_orderkey"), expectedItemsPerFile = 2000L)
      .localCheckpoint() // pin the stats: the lazily-planned frame must
                         // not re-scan files we are about to delete
    assert(m0.count() === 4)

    // append 4 more files, then DELETE one of the originals from disk:
    // if extend ever reopened covered files, the next line would throw
    app.repartition(4, col("l_orderkey")).write.mode("append").parquet(dir)
    val victim = new java.net.URI(
      m0.select("file").head().getString(0)).getPath
    assert(new java.io.File(victim).delete())

    val m1 = Manifest.extend(m0, dir, rangeCols = Seq("l_orderkey"),
      equalityCols = Seq("l_orderkey"), expectedItemsPerFile = 2000L)
    assert(m1.count() === 8)
    // appended rows are covered: every appended orderkey's probe admits
    // at least one NEW file, and new-file stats match a fresh build's
    val probe = Manifest.filesFor(m1, Nil, Seq(("l_orderkey", 1102L)))
    assert(probe.nonEmpty)
    val freshRows = m1.join(m0.select("file"), Seq("file"), "left_anti")
      .agg(sum("rows")).head().getLong(0)
    assert(freshRows === app.count()) // the 4 fresh entries are exactly the appended rows
    // extend with nothing new appended is a no-op frame
    assert(Manifest.extend(m1, dir, Seq("l_orderkey"),
      Seq("l_orderkey"), 2000L).count() === 8)
  }

  test("range planning over a z-ordered layout skips files and loses no rows") {
    val dims = Seq("l_partkey", "l_extendedprice")
    val dir = java.nio.file.Files.createTempDirectory("graft-manifest-z").toString
    ZOrder.write(li, dims, bits = 4, dir, numFiles = 16)
    val m = Manifest.build(spark, dir, rangeCols = dims).cache()

    val stats = li.agg(min("l_extendedprice"), max("l_extendedprice")).head()
    val (pLo, pHi) = (stats.getDouble(0), stats.getDouble(1))
    val box = Seq(
      ("l_partkey", 80.0, 119.0),
      ("l_extendedprice", pLo + 0.40 * (pHi - pLo), pLo + 0.60 * (pHi - pLo)))

    val files = Manifest.filesFor(m, box)
    assert(files.nonEmpty && files.size <= 8) // measured 6/16 in ZOrderSpec

    val residual = col("l_partkey").between(80, 119) &&
      col("l_extendedprice").between(box(1)._2, box(1)._3)
    val got = Manifest.readPruned(m, dir, box).filter(residual)
      .orderBy("l_orderkey", "l_linenumber", "l_partkey", "l_extendedprice")
      .collect().toSeq
    val want = li.filter(residual)
      .orderBy("l_orderkey", "l_linenumber", "l_partkey", "l_extendedprice")
      .collect().toSeq
    assert(got === want && want.nonEmpty)
    m.unpersist()
  }
}
