package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII redaction — the scrubbing stage every LLM training-data refresh
  * runs between ingestion and tokenization. Pure per-row expression
  * work (regex built-ins + one HOF fold), so the pass is map-side by
  * construction: no shuffle, no aggregate, no UDF, and it composes
  * with the rest of the corpus pipeline at zero extra passes —
  * RedactSpec pins the exchange-free plan.
  *
  * Four pattern families cover the public formats: email, IPv4
  * (octet-range-checked so version strings like `10.20.300.4` don't
  * false-positive), US-style phone numbers, and SSNs — each replaced
  * by a typed placeholder with a per-row match count from the SAME
  * projection (`regexp_count` on the original text, so counts are
  * exact even though replacements cascade). Payment-card numbers get
  * the treatment regexes cannot give: every 13–19-digit candidate is
  * validated with Spark's built-in `luhn_check` and only VALID numbers
  * are redacted — a `aggregate(candidates, text, replace)` fold, so an
  * invoice number that merely looks like a card survives. Replacement
  * order is fixed (email → IP → SSN → card → phone) and placeholders
  * contain no digits or `@`/`.`-runs, so no pattern can match inside
  * an earlier pattern's placeholder — which is what makes the scrub
  * idempotent (spec-pinned).
  *
  * At 100 TB this is the exact shape you want: the regex/Luhn work
  * rides the existing scan, `report` is one aggregate over the scrub's
  * count columns, and nothing widens the shuffle anywhere.
  */
object Redact {

  /** (type tag, regex, placeholder) in application order. */
  val patterns: Seq[(String, String, String)] = Seq(
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}",
      "<EMAIL>"),
    ("ip", "\\b(?:(?:25[0-5]|2[0-4]\\d|1\\d\\d|[1-9]?\\d)\\.){3}" +
      "(?:25[0-5]|2[0-4]\\d|1\\d\\d|[1-9]?\\d)\\b", "<IP>"),
    ("ssn", "\\b\\d{3}-\\d{2}-\\d{4}\\b", "<SSN>"),
    // digit-lookaround guards, not \b: the leading "(" or "+" of a
    // formatted number sits between two non-word chars, where \b fails
    ("phone", "(?<!\\d)(?:\\+?1[-. ])?(?:\\(\\d{3}\\)|\\d{3})[-. ]" +
      "\\d{3}[-. ]\\d{4}(?!\\d)", "<PHONE>"))

  /** Card candidates: 13–19 digits allowing single space/dash
    * separators; validity decided by `luhn_check`, not the regex.
    */
  private val cardCandidate = "\\b\\d(?:[ -]?\\d){12,18}\\b"

  // luhn_check over the digits of one candidate
  private def callLuhn(c: Column): Column = {
    val digits = regexp_replace(c, lit("[ -]"), lit(""))
    call_function("luhn_check", digits)
  }

  /** Scrub `textCol`: returns `df` with the column replaced by its
    * redacted form plus `n_email`/`n_ip`/`n_ssn`/`n_phone`/`n_card`
    * exact match counts — one map-side projection, no UDFs.
    */
  def scrub(df: DataFrame, textCol: String): DataFrame = {
    val orig = col(textCol)
    // exact per-type counts against the ORIGINAL text
    val counted = patterns.foldLeft(df) { case (d, (tag, re, _)) =>
      d.withColumn(s"n_$tag", regexp_count(orig, lit(re)))
    }.withColumn("n_card", size(filter(
      regexp_extract_all(orig, lit(cardCandidate), lit(0)),
      c => callLuhn(c))))
    // cascade the replacements; Luhn-valid cards via an exact-match
    // string-replace fold so invalid candidates survive untouched
    val regexScrubbed = patterns.foldLeft(orig) {
      case (c, (_, re, ph)) => regexp_replace(c, lit(re), lit(ph))
    }
    val fullScrubbed = aggregate(
      filter(regexp_extract_all(regexScrubbed, lit(cardCandidate), lit(0)),
        c => callLuhn(c)),
      regexScrubbed,
      (acc, m) => replace(acc, m, lit("<CARD>")))
    counted.withColumn(textCol, fullScrubbed)
  }

  /** Corpus audit: one row per PII type with total matches and the
    * number of affected documents — a single aggregate over [[scrub]]'s
    * count columns (stack → sum), nothing re-scans text.
    */
  def report(df: DataFrame, textCol: String): DataFrame = {
    val s = scrub(df, textCol)
    val tags = patterns.map(_._1) :+ "card"
    val stacked = s.select(expr(
      s"stack(${tags.size}, " +
        tags.map(t => s"'$t', n_$t").mkString(", ") +
        ") as (pii_type, n)"))
    stacked.groupBy("pii_type").agg(
      sum("n").as("total_matches"),
      sum(when(col("n") > 0, 1L).otherwise(0L)).as("affected_docs"))
      .orderBy("pii_type")
  }
}
