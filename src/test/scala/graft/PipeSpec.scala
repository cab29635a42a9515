package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Pipe

/** The pipe stage's semantics are "whatever the executable computes",
  * so correctness is proven by running executables whose semantics ARE
  * expressible natively and comparing: the piped plan and the native
  * plan must agree row-for-row. Plus the failure contract (non-zero
  * exit fails the job — no silent truncation) and the TSV round-trip.
  */
class PipeSpec extends AnyFunSuite {
  import SparkTestBase._

  private lazy val docs = graft.sources.Tables.documents(spark, sf0001)

  test("piped tr-wordcount equals the native explode/split wordcount") {
    val piped = Pipe
      .pipeShell(docs.select(col("text")), "tr ' ' '\\n' | grep -v '^$'")
      .groupBy(col("line").as("word"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy("word").collect().toSeq.map(_.toString)
    val native = docs
      .select(explode(expr("filter(split(text, ' '), t -> t <> '')"))
        .as("word"))
      .groupBy("word")
      .agg(count(lit(1)).as("cnt"))
      .orderBy("word").collect().toSeq.map(_.toString)
    assert(piped === native)
  }

  test("piped awk field count equals native token count per doc") {
    val piped = Pipe
      .pipeTsv(docs.select(col("doc_id"), col("text")),
        Seq("/usr/bin/awk", "-F", "\t", "{ n = split($2, a, \" \"); c = 0; " +
          "for (i = 1; i <= n; i++) if (a[i] != \"\") c++; print $1 \"\\t\" c }"),
        Seq("doc_id", "n_toks"))
      .orderBy(col("doc_id").cast("long")).collect().toSeq.map(_.toString)
    val native = docs
      .select(col("doc_id").cast("string").as("doc_id"),
        expr("size(filter(split(text, ' '), t -> t <> ''))")
          .cast("string").as("n_toks"))
      .orderBy(col("doc_id").cast("long")).collect().toSeq.map(_.toString)
    assert(piped === native)
  }

  test("non-zero exit code fails the job instead of truncating output") {
    val ex = intercept[org.apache.spark.SparkException] {
      Pipe.pipeShell(docs.select(col("doc_id")), "head -1; exit 3").count()
    }
    assert(ex.getMessage.toLowerCase.contains("exit")
      || Option(ex.getCause).exists(_.getMessage.toLowerCase.contains("exit")))
  }

  test("NULL columns serialize as empty fields; cut selects a column") {
    import spark.implicits._
    val df = Seq((1L, Option("a")), (2L, None), (3L, Option("c")))
      .toDF("k", "v")
    val got = Pipe.pipe(df, Seq("/usr/bin/cut", "-f2"))
      .orderBy("line").collect().map(_.getString(0)).toSeq
    assert(got === Seq("", "a", "c"))
  }

  test("short stdout lines pad missing trailing fields as empty strings") {
    // a juice-style mapper may emit a bare key with no value — under
    // ANSI mode element_at would throw INVALID_ARRAY_INDEX here, so
    // pipeTsv must use 0-based get() (NULL out-of-bounds) instead
    import spark.implicits._
    val df = Seq("a\tb", "lonely").toDF("s")
    val got = Pipe.pipeTsv(df, Seq("/bin/cat"), Seq("k", "v"))
      .orderBy("k").collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(got === Seq(("a", "b"), ("lonely", "")))
  }

  test("shell command via Shell CLI form") {
    val df = Shell.run(spark, sf0001,
      "pipe region r_name 'tr [:upper:] [:lower:]'")
    assert(df.collect().map(_.getString(0)).toSeq ===
      Seq("africa", "america", "asia", "europe", "middle east"))
  }
}
