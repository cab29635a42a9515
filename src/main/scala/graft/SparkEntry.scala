package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.functions.ScalarQueries
import graft.operators.{AggExtras, AnalyticsExtras, CorpusExtras, DataQuality, DedupExtras, JoinQueries, MultimodalQueries, PipelineQueries, RelationalQueries, SimilarityExtras, SourceQueries, StatsExtras, TextExtras, WindowExtras, WindowQueries}

/** Driver contract — see /root/repo/SURVEY.md §2 (the operator
  * inventory) and §7 (build plan). Every t2 row of SURVEY.md §2 appears
  * once in [[queries]] with a matching DuckDB oracle in [[oracleSql]];
  * query implementations live in per-section modules:
  *
  *  - [[graft.operators.RelationalQueries]] — scans, filters, aggregates,
  *    sort/top-k, set ops, range partitioning (§2.1–2.2, 2.4–2.7)
  *  - [[graft.operators.JoinQueries]] — inner/multi/left/anti/semi (§2.3)
  *  - [[graft.functions.ScalarQueries]] — string/date/math/JSON (§2.8)
  *  - [[graft.operators.WindowQueries]] — event-time windows (§2.9)
  *  - [[graft.operators.PipelineQueries]] — wordcount + dedup/similarity/
  *    text-stats north-star ops (§2.4, §2.10)
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks
    * rows>0. Word count is the reference's canonical demo app
    * (SURVEY.md §7.1).
    */
  def entry(spark: SparkSession): DataFrame =
    queries("q_wordcount")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    RelationalQueries.queries ++
      JoinQueries.queries ++
      ScalarQueries.queries ++
      WindowQueries.queries ++
      PipelineQueries.queries ++
      DedupExtras.queries ++
      SimilarityExtras.queries ++
      TextExtras.queries ++
      MultimodalQueries.queries ++
      WindowExtras.queries ++
      AggExtras.queries ++
      AnalyticsExtras.queries ++
      StatsExtras.queries ++
      SourceQueries.queries ++
      CorpusExtras.queries ++
      DataQuality.queries ++
      graft.streaming.StreamReplay.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    RelationalQueries.oracle ++
      JoinQueries.oracle ++
      ScalarQueries.oracle ++
      WindowQueries.oracle ++
      PipelineQueries.oracle ++
      DedupExtras.oracle ++
      SimilarityExtras.oracle ++
      TextExtras.oracle ++
      MultimodalQueries.oracle ++
      WindowExtras.oracle ++
      AggExtras.oracle ++
      AnalyticsExtras.oracle ++
      StatsExtras.oracle ++
      SourceQueries.oracle ++
      CorpusExtras.oracle ++
      DataQuality.oracle ++
      graft.streaming.StreamReplay.oracle
}
