package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Redact

/** The PII scrub: every pattern family redacts, Luhn gates card
  * redaction, clean text passes through byte-identical, counts are
  * exact, the pass is idempotent and plans map-only, and the corpus
  * report aggregates the same counts.
  */
class RedactSpec extends AnyFunSuite {
  import SparkTestBase._

  // fixture docs with deterministic PII planted; 4539148803436467 is
  // Luhn-valid, 1234567890123456 is not
  private def seeded = {
    import spark.implicits._
    Seq(
      (1L, "reach john.doe@example.com or admin@sub.example.org today"),
      (2L, "server 192.168.0.1 and 10.0.0.255 but version 10.20.300.4"),
      (3L, "call 415-555-2671 or (212) 555-0198 or +1 646.555.1212"),
      (4L, "ssn 123-45-6789 on file"),
      (5L, "card 4539 1488 0343 6467 ok; invoice 1234 5678 9012 3456"),
      (6L, "perfectly clean text with numbers 42 and 2026 only"),
      (7L, "combo a@b.co at 8.8.8.8 card 4539-1488-0343-6467"))
      .toDF("doc_id", "text")
  }

  private def scrubbed =
    Redact.scrub(seeded, "text").orderBy("doc_id").collect()

  test("every family redacts; octet-range and Luhn gates hold") {
    val rows = scrubbed.map(r =>
      r.getLong(0) -> r.getString(r.fieldIndex("text"))).toMap
    assert(rows(1L) === "reach <EMAIL> or <EMAIL> today")
    // 10.20.300.4 is not an IPv4 (octet 300) — must survive
    assert(rows(2L) === "server <IP> and <IP> but version 10.20.300.4")
    assert(rows(3L) === "call <PHONE> or <PHONE> or <PHONE>")
    assert(rows(4L) === "ssn <SSN> on file")
    // Luhn-valid card redacted, Luhn-invalid lookalike untouched
    assert(rows(5L) === "card <CARD> ok; invoice 1234 5678 9012 3456")
    assert(rows(6L) === "perfectly clean text with numbers 42 and 2026 only")
    assert(rows(7L) === "combo <EMAIL> at <IP> card <CARD>")
  }

  test("per-row counts are exact per family") {
    val byId = scrubbed.map(r => r.getLong(0) -> r).toMap
    def n(id: Long, c: String) = byId(id).getAs[Int](s"n_$c")
    assert(n(1L, "email") === 2 && n(1L, "card") === 0)
    assert(n(2L, "ip") === 2)
    assert(n(3L, "phone") === 3)
    assert(n(4L, "ssn") === 1)
    assert(n(5L, "card") === 1) // the invalid candidate doesn't count
    assert(Seq("email", "ip", "ssn", "phone", "card")
      .forall(c => n(6L, c) === 0))
  }

  test("scrub is idempotent: placeholders never re-match") {
    val once = Redact.scrub(seeded, "text").select("doc_id", "text")
    val twice = Redact.scrub(once, "text").select("doc_id", "text")
    assert(twice.orderBy("doc_id").collect().toSeq.map(_.toString) ===
      once.orderBy("doc_id").collect().toSeq.map(_.toString))
  }

  test("scrub plans map-only: no exchange, no aggregate, no UDF") {
    val qe = Redact.scrub(seeded, "text").queryExecution
    val explained = qe.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("simple"))
    assert(!explained.contains("Exchange "),
      s"scrub shuffled:\n$explained")
    assert(qe.sparkPlan.collectFirst {
      case a: org.apache.spark.sql.execution.aggregate.BaseAggregateExec => a
    }.isEmpty, "scrub planned an aggregate")
    assert(!explained.contains("BatchEvalPython") &&
      !explained.toLowerCase.contains("scalaudf"), "scrub planned a UDF")
  }

  test("report aggregates the same counts corpus-wide") {
    val rep = Redact.report(seeded, "text").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(rep("email") === ((3L, 2L))) // 3 matches across docs 1 and 7
    assert(rep("ip") === ((3L, 2L)))
    assert(rep("phone") === ((3L, 1L)))
    assert(rep("ssn") === ((1L, 1L)))
    assert(rep("card") === ((2L, 2L)))
  }

  test("scrub leaves a PII-free fixture corpus byte-identical") {
    val docs = graft.sources.Tables.documents(spark, sf0001)
      .select("doc_id", "text")
    val out = Redact.scrub(docs, "text")
    assert(out.filter(col("n_email") + col("n_ip") + col("n_ssn") +
      col("n_phone") + col("n_card") =!= 0).count() === 0L)
    assert(out.select("doc_id", "text").exceptAll(docs).count() === 0L)
  }
}
