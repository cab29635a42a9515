package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Salting

/** Salting must be semantics-invariant: salted results equal the plain
  * groupBy/join on data with a planted hot key (the skew scenario the
  * helpers exist for).
  */
class SaltingSpec extends AnyFunSuite {
  import SparkTestBase._

  // 90% of events on one hot user: worst-case key skew.
  private lazy val skewed = {
    import spark.implicits._
    (1L to 2000L).map { i =>
      val k = if (i % 10 != 0) 7L else i % 50
      (i, k)
    }.toDF("event_id", "user_id")
  }

  test("saltedCount equals plain groupBy count under skew") {
    val plain = skewed.groupBy(col("user_id").as("_key"))
      .agg(count(lit(1)).as("n"))
      .orderBy("_key").collect().toSeq.map(_.toString)
    val salted = Salting
      .saltedCount(skewed, col("user_id"), col("event_id"), 8)
      .orderBy("_key").collect().toSeq.map(_.toString)
    assert(salted === plain)
  }

  test("saltedEquiJoin equals plain join under skew") {
    import spark.implicits._
    val dim = (0L to 50L).map(k => (k, s"name_$k")).toDF("user_id", "name")
    val plain = skewed.join(dim, "user_id")
      .orderBy("event_id").collect().toSeq.map(_.toString)
    val salted = Salting
      .saltedEquiJoin(skewed, dim, "user_id", col("event_id"), 8)
      .select(dim.columns.head, "event_id", "name")
      .orderBy("event_id").collect().toSeq.map(_.toString)
    assert(salted === plain)
  }
}
