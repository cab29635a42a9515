package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.functions.Money._
import graft.sources.{LineSources, Tables}

/** Contract-grade line-file source queries (SURVEY.md §2.1 — the
  * reference's native data model is flat files of text lines).
  *
  * Each query closes the loop end-to-end: export a table to the line
  * format, read it back through [[graft.sources.LineSources]], and run
  * a t2-style query whose DuckDB oracle runs on the ORIGINAL parquet —
  * so the round trip itself sits under the hash gate (an export or
  * parse bug breaks the value compare, not just a unit test).
  *
  * Exports land under /tmp keyed by the SF dir, so Verify/Bench runs at
  * different SFs never collide; overwrite mode keeps bench reps
  * idempotent. The write is parallel (one part file per partition) and
  * the read is a distributed line scan — the same shape either end
  * would have on a real cluster's shared FS.
  */
object SourceQueries {

  // Keyed by SF dir AND process id: two concurrent sessions on the
  // same SF (e.g. parallel verify-matrix jobs) must not overwrite the
  // directory the other is mid-read. Within one JVM, bench reps
  // overwrite idempotently.
  private def exportDir(d: String): String =
    "/tmp/graft_sources/p" + ProcessHandle.current().pid() + "_" +
      d.replaceAll("[^A-Za-z0-9._-]", "_")

  // The bucketed layout is a pure function of the immutable fixture
  // dir, but `saveAsTable` binds the fixed catalog names to ONE path —
  // so memoize the *currently registered* dir (not a set): a repeat
  // invocation over the same dir skips the two table writes (Stats
  // discipline — bench reps re-measure the zero-exchange join, not the
  // one-time layout build), while a different dir rewrites and
  // re-points the catalog.
  private var bucketedFor: Option[String] = None

  private def ensureBucketed(s: SparkSession, d: String): Unit =
    synchronized {
      if (!bucketedFor.contains(d)) {
        val dir = exportDir(d)
        Tables.orders(s, d)
          .select(col("o_orderkey"), col("o_orderpriority"))
          .write.mode("overwrite")
          .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
          .option("path", dir + "/bkt_orders")
          .saveAsTable("graft_bkt_orders")
        Tables.lineitem(s, d)
          .select(col("l_orderkey"), cents(col("l_extendedprice")).as("price_c"))
          .write.mode("overwrite")
          .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
          .option("path", dir + "/bkt_lineitem")
          .saveAsTable("graft_bkt_lineitem")
        bucketedFor = Some(d)
      }
    }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // maple's input shape: a directory of raw text lines (line == doc;
    // documents.text is newline-free by construction, FIXTURES.md).
    // Wordcount over the re-read lines must hash-match wordcount over
    // the parquet column.
    "q_source_text_wordcount" -> ((s, d) => {
      val path = exportDir(d) + "/text"
      Tables.documents(s, d).select(col("text"))
        .write.mode("overwrite").text(path)
      LineSources.readTextLines(s, path)
        .select(explode(split(col("value"), " ")).as("word"))
        .filter(col("word") =!= "")
        .groupBy("word")
        .agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("word"))
    }),

    // Header-less CSV with an explicit schema (inference forbidden —
    // it reads the data twice and can drift per-file).
    "q_source_csv_stats" -> ((s, d) => {
      val path = exportDir(d) + "/csv"
      Tables.documents(s, d).select("doc_id", "lang", "n_chars")
        .write.mode("overwrite").option("header", "false").csv(path)
      val schema = StructType(Seq(
        StructField("doc_id", LongType),
        StructField("lang", StringType),
        StructField("n_chars", LongType)))
      LineSources.readCsv(s, path, schema)
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"))
        .orderBy("lang")
    }),

    // The juice SINK shape under the hash gate: run wordcount, write
    // it as `key<TAB>value` lines (the reference's dest-file format),
    // read the lines back, parse, and the re-sorted parse must
    // hash-match the wordcount oracle — proving the sink/parse pair
    // is lossless, not just that the writer ran. (documents tokens
    // contain no tabs, so the split is unambiguous.)
    "q_source_kv_roundtrip" -> ((s, d) => {
      val path = exportDir(d) + "/kv"
      val wc = Tables.documents(s, d)
        .select(explode(split(col("text"), " ")).as("word"))
        .filter(col("word") =!= "")
        .groupBy("word")
        .agg(count(lit(1)).as("cnt"))
      LineSources.writeKeyValueLines(wc, "word", "cnt", path)
      LineSources.readTextLines(s, path)
        .select(split(col("value"), "\t").as("kv"))
        .select(col("kv").getItem(0).as("word"),
          col("kv").getItem(1).cast("long").as("cnt"))
        .orderBy(col("cnt").desc, col("word"))
    }),

    // JSON-lines round trip with an explicit schema — completes the
    // LineSources trio (text, CSV, JSONL) under the hash gate.
    "q_source_jsonl_stats" -> ((s, d) => {
      val path = exportDir(d) + "/jsonl"
      Tables.documents(s, d).select("doc_id", "source", "n_chars")
        .write.mode("overwrite").json(path)
      val schema = StructType(Seq(
        StructField("doc_id", LongType),
        StructField("source", StringType),
        StructField("n_chars", LongType)))
      LineSources.readJsonLines(s, path, schema)
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"), max(col("n_chars")).as("max_chars"))
        .orderBy("source")
    }),

    // Hive-partitioned parquet SINK round trip under the hash gate —
    // the reference's partitioned-output knob (SURVEY §2.7) in its
    // persisted columnar form: write documents partitioned by lang
    // (one directory per key, the layout that makes downstream
    // per-lang reads partition-PRUNED scans at 100 TB), read the tree
    // back, and the per-lang stats must hash-match the unpartitioned
    // oracle — proving the partition columns survived the
    // write-as-directory-key/read-as-column round trip losslessly.
    "q_source_parquet_partition" -> ((s, d) => {
      val path = exportDir(d) + "/parq_lang"
      Tables.documents(s, d)
        .write.mode("overwrite").partitionBy("lang").parquet(path)
      s.read.parquet(path)
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("chars"))
        .orderBy("lang")
    }),

    // Bucketed-table round trip (round 9): write BOTH join sides
    // bucketed by the join key (the persisted form of the reference's
    // hash partitioner, SURVEY.md §2.7), re-read them through the
    // catalog, and join — with equal bucket counts the sort-merge join
    // needs NO exchange on either side (BucketingSpec proves that on
    // the plan; this contract row proves the layout round-trips
    // losslessly against a plain-join oracle on the original parquet).
    // At 100 TB this is the difference between a nightly fact-fact
    // join shuffling both tables and a local per-bucket merge. Sides
    // are projected to (key, needed columns) BEFORE the write so the
    // bucketed files carry only what the join reads; hint("merge")
    // pins the plan the layout exists for (local[*] would otherwise
    // broadcast the small SF side).
    "q_source_bucketed_join" -> ((s, d) => {
      ensureBucketed(s, d)
      s.table("graft_bkt_orders")
        .join(s.table("graft_bkt_lineitem").hint("merge"),
          col("o_orderkey") === col("l_orderkey"))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n_items"), sum(col("price_c")).as("revenue_c"))
        .orderBy("o_orderpriority")
    }),

    // ORC round trip (round 9 wave 22) — the second columnar format
    // Spark ships natively (predicate pushdown + column pruning work
    // the same as parquet): write the supplier dimension to ORC,
    // re-read it, broadcast-join the nation names and aggregate; the
    // hash-match against the parquet-reading oracle proves the
    // parquet → ORC → DataFrame trip is lossless INCLUDING the
    // DECIMAL-exact money cents. Completes the format surface (text /
    // CSV / JSONL / kv lines / parquet / partitioned parquet /
    // bucketed catalog tables / ORC).
    "q_source_orc_roundtrip" -> ((s, d) => {
      val path = exportDir(d) + "/orc_supplier"
      Tables.supplier(s, d)
        .select(col("s_suppkey"), col("s_nationkey"),
          cents(col("s_acctbal")).as("bal"))
        .write.mode("overwrite").orc(path)
      s.read.orc(path)
        .join(broadcast(Tables.nation(s, d)),
          col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name").as("nation"))
        .agg(count(lit(1)).as("n_supp"), sum(col("bal")).as("bal_c"))
        .orderBy("nation")
    })
  )

  val oracle: Map[String, String] = Map(
    // Oracles run on the parquet originals: a matching hash proves the
    // text/CSV round trip was lossless, not only that the aggregate ran.
    "q_source_text_wordcount" ->
      """SELECT word, CAST(COUNT(*) AS BIGINT) AS cnt FROM (
        |  SELECT unnest(string_split(text, ' ')) AS word FROM documents
        |) WHERE word <> '' GROUP BY word ORDER BY cnt DESC, word""".stripMargin,
    "q_source_csv_stats" ->
      """SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(n_chars) AS BIGINT) AS sum_chars
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,
    "q_source_jsonl_stats" ->
      """SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(MAX(n_chars) AS BIGINT) AS max_chars
        |FROM documents GROUP BY source ORDER BY source""".stripMargin,
    "q_source_kv_roundtrip" ->
      """SELECT word, CAST(COUNT(*) AS BIGINT) AS cnt FROM (
        |  SELECT unnest(string_split(text, ' ')) AS word FROM documents
        |) WHERE word <> '' GROUP BY word ORDER BY cnt DESC, word""".stripMargin,
    "q_source_parquet_partition" ->
      """SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(n_chars) AS BIGINT) AS chars
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin,
    // plain join on the ORIGINAL parquet: a matching hash proves the
    // bucketed write/read round trip was lossless, not only that the
    // join ran
    "q_source_bucketed_join" ->
      s"""SELECT o.o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_items,
         |  CAST(SUM(${sqlCents("l.l_extendedprice")}) AS BIGINT) AS revenue_c
         |FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
         |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_source_orc_roundtrip" ->
      s"""SELECT n.n_name AS nation, CAST(COUNT(*) AS BIGINT) AS n_supp,
         |  CAST(SUM(${sqlCents("s.s_acctbal")}) AS BIGINT) AS bal_c
         |FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
         |GROUP BY 1 ORDER BY 1""".stripMargin
  )
}
