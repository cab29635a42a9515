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

  // Blocked-dedup scenario: 25% of all docs share ONE blocking key (the
  // boilerplate-header hot block), the rest spread over many keys —
  // the shape that makes a plain within-block self-join put the whole
  // |B|² pair product on a single task.
  private lazy val hotBlocked = {
    import spark.implicits._
    (1L to 1000L).map { i =>
      if (i % 4 == 0) (i, "en", "HOTKEY")
      else (i, if (i % 2 == 0) "en" else "de", s"blk_${i % 40}")
    }.toDF("doc_id", "lang", "bk")
  }

  test("saltedSelfPairs equals plain within-block self-join under a hot block") {
    val plain = hotBlocked.as("a")
      .join(hotBlocked.as("b"),
        col("a.lang") === col("b.lang") && col("a.bk") === col("b.bk") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id"), col("b.doc_id"))
      .orderBy("a.doc_id", "b.doc_id").collect().toSeq.map(_.toString)
    val salted = Salting
      .saltedSelfPairs(hotBlocked, Seq("lang", "bk"), "doc_id", 8)
      .select(col("a.doc_id"), col("b.doc_id"))
      .orderBy("a.doc_id", "b.doc_id").collect().toSeq.map(_.toString)
    assert(salted.size === plain.size)
    assert(salted === plain)
  }

  test("salting spreads the hot block across tasks") {
    val nSalts = 8
    val hotN = 250L // doc_id % 4 == 0
    // the pair-owning key after salting is (block, salt of side A):
    // per-group share of the hot block must drop from hotN to ~hotN/8
    val groups = hotBlocked
      .withColumn("_salt", pmod(hash(col("doc_id")), lit(nSalts)))
      .filter(col("bk") === "HOTKEY")
      .groupBy("lang", "bk", "_salt").count()
      .collect()
    assert(groups.length === nSalts,
      "hot block must occupy every salt bucket")
    val maxGroup = groups.map(_.getLong(3)).max
    // uniform would be ~31; 2× headroom for hash unevenness. The
    // unsalted plan is one group of 250.
    assert(maxGroup <= 2 * (hotN / nSalts + 1),
      s"hot block not spread: max per-salt group $maxGroup")
  }
}
