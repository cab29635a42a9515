package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.InvertedIndex
import graft.sources.Tables

/** The inverted index: postings agree with a brute-force corpus scan
  * for conjunctive and ranked queries, the df cap bounds posting
  * lists, the written layout pushes term predicates into the parquet
  * scan, and the ranked plan never globally sorts.
  */
class InvertedIndexSpec extends AnyFunSuite {
  import SparkTestBase._

  private lazy val docs =
    Tables.documents(spark, sf0001).select("doc_id", "text")
  private lazy val index =
    InvertedIndex.build(docs, "doc_id", "text").cache()
  private lazy val nDocs = docs.count()

  private def bruteForceAnd(terms: Seq[String]): Set[Long] =
    docs.filter(terms.map(t =>
        array_contains(InvertedIndex.tokensCol("text"), t))
        .reduce(_ && _))
      .select("doc_id").collect().map(_.getLong(0)).toSet

  test("andQuery equals the brute-force corpus scan") {
    Seq(Seq("merge"), Seq("merge", "window"), Seq("fast", "key", "scan"),
      Seq("merge", "nosuchtoken")).foreach { terms =>
      val viaIndex = InvertedIndex.andQuery(index, terms)
        .collect().map(_.getLong(0)).toSet
      assert(viaIndex === bruteForceAnd(terms), s"terms=$terms")
    }
    // sanity: the two-term query is non-trivial on this corpus
    assert(bruteForceAnd(Seq("merge", "window")).nonEmpty)
  }

  test("rankedQuery equals brute-force tf-idf top-k") {
    val terms = Seq("merge", "window", "scan")
    val k = 10
    val got = InvertedIndex.rankedQuery(index, nDocs, terms, k)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))

    // brute force: recompute tf and df from the raw corpus
    val toks = docs.select(col("doc_id"),
      InvertedIndex.tokensCol("text").as("toks"))
    val rows = toks.collect().map(r =>
      r.getLong(0) -> r.getSeq[String](1))
    val df = terms.map(t =>
      t -> rows.count(_._2.contains(t)).toDouble).toMap
    val expected = rows.map { case (id, ts) =>
        id -> terms.map(t => ts.count(_ == t) *
          (if (df(t) == 0) 0.0 else math.log(nDocs.toDouble / df(t)))).sum
      }.filter(_._2 > 0)
      .sortBy { case (id, s) => (-s, id) }.take(k)

    assert(got.map(_._1).toSeq === expected.map(_._1).toSeq)
    got.map(_._2).zip(expected.map(_._2)).foreach { case (a, b) =>
      assert(math.abs(a - b) < 1e-9)
    }
  }

  test("maxDfRatio caps every posting list") {
    val capped = InvertedIndex.build(docs, "doc_id", "text",
      maxDfRatio = Some(0.5))
    val cap = 0.5 * nDocs
    assert(capped.agg(max("df")).head().getLong(0) <= cap)
    // the cap only ever removes stopword-class tokens, never docs from
    // a surviving token's list
    val full = index.filter(col("df") <= cap)
    assert(capped.count() === full.count())
  }

  test("written layout pushes the term predicate into the scan") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-invidx").toString + "/idx"
    InvertedIndex.write(index, dir, nFiles = 8)
    val onDisk = spark.read.parquet(dir)
    val q = InvertedIndex.andQuery(onDisk, Seq("merge", "window"))
    val formatted = q.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(formatted.contains("PushedFilters") &&
      formatted.contains("In(token"),
      s"term predicate not pushed:\n$formatted")
    // and the pushed scan still answers correctly
    assert(q.collect().map(_.getLong(0)).toSet ===
      bruteForceAnd(Seq("merge", "window")))
  }

  test("bm25Query equals brute-force BM25 top-k") {
    val terms = Seq("merge", "window", "scan")
    val (k1, b, k) = (1.2, 0.75, 10)
    val toks = docs.select(col("doc_id"),
      InvertedIndex.tokensCol("text").as("toks"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1))
    val avgDl = toks.map(_._2.size).sum.toDouble / toks.length
    val df = terms.map(t =>
      t -> toks.count(_._2.contains(t)).toDouble).toMap

    val got = InvertedIndex
      .bm25Query(index, nDocs, avgDl, terms, k, k1, b)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    val expected = toks.map { case (id, ts) =>
        val dl = ts.size.toDouble
        id -> terms.map { t =>
          val tf = ts.count(_ == t).toDouble
          if (tf == 0) 0.0
          else math.log(1.0 + (nDocs - df(t) + 0.5) / (df(t) + 0.5)) *
            tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * dl / avgDl))
        }.sum
      }.filter(_._2 > 0)
      .sortBy { case (id, s) => (-s, id) }.take(k)

    assert(got.map(_._1).toSeq === expected.map(_._1).toSeq)
    got.map(_._2).zip(expected.map(_._2)).foreach { case (a, e) =>
      assert(math.abs(a - e) < 1e-9)
    }
  }

  test("rankedQuery plans a partial top-k, not a global sort") {
    val explained = InvertedIndex
      .rankedQuery(index, nDocs, Seq("merge"), 5)
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("simple"))
    assert(explained.contains("TakeOrderedAndProject"),
      s"expected TakeOrderedAndProject:\n$explained")
  }
}
