package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated parquet tables (FIXTURES.md).
  *
  * The reference framework reads flat files of text lines from a
  * distributed FS (SURVEY.md §1.1 — its SDFS); here every table is a
  * columnar parquet scan so Catalyst can push predicates and prune
  * columns into the reader — at 100 TB that is the difference between
  * scanning bytes you need and scanning everything.
  *
  * Parquet schemas are self-describing and fixed by the driver
  * (FIXTURES.md), so no inference happens at runtime. `events` needs the
  * ns-timestamp workaround (SURVEY.md §7.4).
  */
object Tables {
  private def path(dir: String, t: String) = s"$dir/$t.parquet"

  // Memoized per (session, dir, table): `spark.read.parquet` re-runs
  // file listing + footer schema resolution on EVERY call, and a
  // full-contract Bench session issues ~138 queries × 3 reps × 1-4
  // table reads each — a fixed per-query tax for re-deriving an
  // immutable logical plan. The DataFrame is just that plan (no state,
  // no cached blocks), so reuse is semantics-free. Keyed on the
  // session identity so a fresh session (tests) never sees a plan
  // bound to a stopped one.
  private val cache =
    new scala.collection.concurrent.TrieMap[(SparkSession, String, String),
      DataFrame]

  // events must go through the nanosAsLong-setting reader: a raw read
  // of the ns-timestamp parquet throws PARQUET_TYPE_ILLEGAL when it is
  // the session's FIRST events touch (e.g. Stats.rowCount sizing a
  // bucket ladder before any query has scanned events) — an ordering
  // hazard the round-9 verify matrix smoked out.
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    cache.getOrElseUpdate((spark, dir, name),
      if (name == "events") eventsUncached(spark, dir)
      else spark.read.parquet(path(dir, name)))

  def region(s: SparkSession, d: String): DataFrame    = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = table(s, d, "lineitem")
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")

  /** `events.ts` is parquet `timestamp[ns]`; Spark 4.x throws
    * PARQUET_TYPE_ILLEGAL on a plain read. With
    * `spark.sql.legacy.parquet.nanosAsLong=true` the column arrives as
    * LongType nanos. Conversion to a microsecond TimestampType must use
    * integer division: epoch-nanos (~1.7e18) exceeds 2^53, so a
    * double-typed division would corrupt microseconds.
    */
  def events(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "events")

  private def eventsUncached(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read
      .parquet(path(dir, "events"))
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
  }
}
