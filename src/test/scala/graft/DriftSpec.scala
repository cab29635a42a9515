package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Drift

/** Drift reports: identical snapshots read as zero drift, a real
  * distribution shift reads as large drift, a mild shift sits between,
  * and null-rate accounting is exact.
  */
class DriftSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private lazy val li = spark.read
    .parquet(s"${SparkTestBase.sf0001}/lineitem.parquet")

  test("identical snapshots score (near) zero PSI on every column") {
    val rep = Drift.numericReport(li, li,
      Seq("l_quantity", "l_extendedprice", "l_discount"))
      .collect()
    assert(rep.length === 3)
    rep.foreach { r =>
      assert(r.getDouble(1) <= 1e-4, s"${r.getString(0)} psi=${r.getDouble(1)}")
      assert(r.getLong(2) === r.getLong(3)) // same row counts
    }
  }

  test("a shifted column reads large PSI; untouched columns stay flat") {
    val cur = li
      .withColumn("l_extendedprice", col("l_extendedprice") * 1.35)
    val rep = Drift.numericReport(li, cur,
      Seq("l_quantity", "l_extendedprice"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(rep("l_extendedprice") > 0.25, s"shift not flagged: $rep")
    assert(rep("l_quantity") <= 1e-4, s"false alarm: $rep")
  }

  test("null-rate deltas are exact") {
    val cur = li.withColumn("l_discount",
      when(col("l_orderkey") % 4 === 0, lit(null)).otherwise(col("l_discount")))
    val rep = Drift.numericReport(li, cur, Seq("l_discount"))
      .head()
    assert(rep.getDouble(4) === 0.0) // reference has no nulls
    val expected = cur.filter(col("l_discount").isNull).count().toDouble /
      cur.count()
    assert(math.abs(rep.getDouble(5) - expected) < 1e-6)
  }

  test("categorical drift flags a re-weighted label mix") {
    val docs = spark.read
      .parquet(s"${SparkTestBase.sf0001}/documents.parquet")
    val same = Drift.categoricalReport(docs, docs, "lang").head()
    assert(same.getDouble(1) <= 1e-4)
    // drop one language entirely: shares shift, PSI fires
    val major = docs.groupBy("lang").count()
      .orderBy(col("count").desc).head().getString(0)
    val skewed = docs.filter(col("lang") =!= major)
    val shifted = Drift.categoricalReport(docs, skewed, "lang").head()
    assert(shifted.getDouble(1) > 0.25, s"psi=${shifted.getDouble(1)}")
  }
}
