package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The ad-hoc CLI must reproduce the contract queries' semantics —
  * same engine underneath, no second interpreter (SURVEY.md §3.1).
  */
class ShellSpec extends AnyFunSuite {
  import SparkTestBase._

  test("tokenize honors single-quoted spans") {
    assert(Shell.tokenize("filter events '^(sign|purch)'") ===
      List("filter", "events", "^(sign|purch)"))
    assert(Shell.tokenize("wordcount documents text") ===
      List("wordcount", "documents", "text"))
    assert(Shell.tokenize("filter documents 'two words here'") ===
      List("filter", "documents", "two words here"))
    intercept[IllegalArgumentException](Shell.tokenize("filter 'oops"))
  }

  test("filter command reproduces q_filter_regex rows") {
    // the demo pattern only matches event_type values, so any-column
    // grep and the contract's typed filter select the same rows
    val shell = Shell.run(spark, sf0001, "filter events '^(sign|purch)'")
      .select("event_id", "user_id", "event_type", "value")
      .orderBy("event_id").collect().toSeq.map(_.toString)
    val contract = SparkEntry.queries("q_filter_regex")(spark, sf0001)
      .collect().toSeq.map(_.toString)
    assert(shell === contract)
  }

  test("column-scoped filter matches typed filter") {
    val shell = Shell
      .run(spark, sf0001, "filter events event_type '^(sign|purch)'")
      .count()
    val contract = SparkEntry.queries("q_filter_regex")(spark, sf0001).count()
    assert(shell === contract)
  }

  test("wordcount command reproduces q_wordcount") {
    val shell = Shell.run(spark, sf0001, "wordcount documents text")
      .collect().toSeq.map(_.toString)
    val contract = SparkEntry.queries("q_wordcount")(spark, sf0001)
      .collect().toSeq.map(_.toString)
    assert(shell === contract)
  }

  test("join command matches the contract join's cardinality") {
    val n = Shell
      .run(spark, sf0001, "join orders customer o_custkey c_custkey")
      .count()
    assert(n === 1500L) // q_join_inner golden at sf0.001
  }

  test("grep command counts matching rows") {
    val n = Shell.run(spark, sf0001, "grep events '^signup$'")
      .head().getLong(0)
    val expected = graft.sources.Tables.events(spark, sf0001)
      .filter(col("event_type") === "signup").count()
    assert(n === expected)
  }

  test("dedup command keeps one row per content digest") {
    val out = Shell.run(spark, sf0001, "dedup documents text")
    // sf0.001 documents are all content-distinct (q_dedup_exact golden)
    assert(out.count() === 500L)
    assert(out.filter(col("n_dups") =!= 1).count() === 0L)
    assert(out.columns.toSeq ===
      Seq("doc_id", "text", "lang", "source", "n_chars", "n_dups"))
  }

  test("split command tags rows like q_sample_split") {
    val byTag = Shell.run(spark, sf0001, "split documents doc_id")
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val contract = SparkEntry.queries("q_sample_split")(spark, sf0001)
      .groupBy("split").agg(sum("n_docs").as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(byTag === contract)
  }

  test("contract command dispatches to SparkEntry queries") {
    val viaShell = Shell.run(spark, sf0001, "contract q_wordcount")
      .collect().toSeq.map(_.toString)
    val direct = SparkEntry.queries("q_wordcount")(spark, sf0001)
      .collect().toSeq.map(_.toString)
    assert(viaShell === direct)
    intercept[IllegalArgumentException](
      Shell.run(spark, sf0001, "contract q_nonexistent"))
  }

  test("unknown command is rejected") {
    intercept[IllegalArgumentException](
      Shell.run(spark, sf0001, "frobnicate events"))
  }
}
