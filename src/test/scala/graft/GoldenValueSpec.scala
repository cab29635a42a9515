package graft

import org.scalatest.funsuite.AnyFunSuite

/** Value-level golden checks at sf0.001 against constants captured once
  * from the DuckDB oracle (SURVEY.md §5.2) — catches silent semantic
  * drift that row counts alone would miss.
  */
class GoldenValueSpec extends AnyFunSuite {
  import SparkTestBase._

  test("q_wordcount top tokens") {
    val rows = SparkEntry.queries("q_wordcount")(spark, sf0001)
      .limit(3).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(rows.toSeq === Seq(("scan", 984L), ("column", 978L), ("window", 976L)))
  }

  test("q_agg_scalar exact cents") {
    val r = SparkEntry.queries("q_agg_scalar")(spark, sf0001).collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) ===
      ((1500L, 132051L, 49970505L)))
  }

  test("q_text_stats per-lang stats") {
    val rows = SparkEntry.queries("q_text_stats")(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.toSeq === Seq(
      ("de", 71L, 22200L, 312.68), ("en", 193L, 56684L, 293.7),
      ("es", 80L, 24806L, 310.08), ("fr", 82L, 27063L, 330.04),
      ("zh", 74L, 22403L, 302.74)))
  }

  test("q_topk head rows") {
    val rows = SparkEntry.queries("q_topk")(spark, sf0001)
      .limit(2).collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.toSeq === Seq((988L, 49970505L), (605L, 49969563L)))
  }
}
