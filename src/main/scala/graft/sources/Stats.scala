package graft.sources

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.SparkSession

/** Memoized table-level statistics.
  *
  * Several plans size themselves from a corpus row count — the LSH
  * signature/band width ladders (SimilarityExtras), the tf-idf N
  * (CorpusExtras), the rank-selection bucket ladder (RankSelect). Each
  * used to run its own eager `count()` job inside query construction;
  * at 100 TB that is a full metadata scan repeated per query per rep.
  * The count is a pure function of the immutable fixture directory, so
  * it is computed once per (dir, table) for the lifetime of the JVM and
  * served from memory afterwards — a Bench run issues one count job per
  * table instead of one per query × rep.
  */
object Stats {

  private val counts = TrieMap.empty[(String, String), Long]

  /** Row count of `dir/table.parquet`, computed at most once per JVM. */
  def rowCount(s: SparkSession, dir: String, table: String): Long =
    counts.getOrElseUpdate((dir, table), Tables.table(s, dir, table).count())
}
