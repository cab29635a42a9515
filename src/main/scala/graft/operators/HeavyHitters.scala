package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Exact heavy hitters over an unbounded key domain in two corpus
  * passes — the frequent-items shape that survives a 100 TB vocabulary.
  *
  * A plain `groupBy(word).count.filter` is exact but its shuffle
  * carries every distinct key each map partition saw: for power-law
  * token corpora the map-side combine barely thins the long tail, so
  * shuffle volume scales with |vocabulary|, not with the answer. The
  * classic fix is a mergeable Misra–Gries summary: each partition
  * keeps at most `k` counters (decrement-all on overflow), so
  *
  *  - pass 1 shuffles ≤ k rows per partition — BOUNDED by k·|parts|,
  *    independent of vocabulary size — and the union of survivors is a
  *    guaranteed superset of every item with true count > n/(k+1)
  *    (each decrement event destroys k+1 count units, so a partition
  *    destroys ≤ n_i/(k+1) units of any one item; summing over
  *    partitions, an item with count > n/(k+1) retains a positive
  *    counter somewhere);
  *  - pass 2 recounts ONLY the candidates exactly (broadcast semi
  *    join — the candidate set is k·|parts| rows at most), so the
  *    final counts are exact, not sketch estimates.
  *
  * The summary pass also emits one per-partition total row, so the
  * grand total n (the threshold denominator) costs no third scan.
  * HeavyHittersSpec pins the superset guarantee under adversarial
  * skew, partition-count invariance of the end-to-end result, and
  * equality with the direct one-shuffle aggregate.
  */
object HeavyHitters {

  /** Per-partition Misra–Gries summaries plus per-partition totals:
    * rows are (word, cnt, is_total) — `is_total=false` rows are the
    * surviving counters (lower bounds, NOT exact counts), the single
    * `is_total=true` row per partition carries that partition's item
    * count in `cnt` with a null word.
    */
  def summarize(items: Dataset[String], k: Int): DataFrame = {
    require(k > 0, s"capacity must be positive, got $k")
    val spark = items.sparkSession
    import spark.implicits._
    items.mapPartitions { it =>
      val m = new scala.collection.mutable.HashMap[String, Long]()
      var total = 0L
      it.foreach { w =>
        total += 1L
        m.get(w) match {
          case Some(c) => m.update(w, c + 1L)
          case None =>
            if (m.size < k) m.update(w, 1L)
            else {
              // decrement-all: amortized O(1) per item — every pass
              // here destroys k+1 count units and only n are ever added
              val dead = List.newBuilder[String]
              m.foreach { case (key, c) =>
                if (c == 1L) dead += key else m.update(key, c - 1L)
              }
              dead.result().foreach(m.remove)
            }
        }
      }
      m.iterator.map { case (w, c) => (w, c, false) } ++
        (if (total > 0L) Iterator((null: String, total, true))
         else Iterator.empty)
    }.toDF("word", "cnt", "is_total")
  }

  /** Exact counts of every item with count·`den` > n (share > 1/den),
    * as (word, cnt, share-rounded-4dp). Requires den ≤ k+1 so the
    * Misra–Gries candidate set provably covers the threshold.
    */
  def frequentItems(items: Dataset[String], k: Int, den: Int): DataFrame = {
    require(den <= k + 1,
      s"threshold 1/$den below the n/(k+1) guarantee of capacity $k")
    val summary = graft.Materialize.checkpoint(summarize(items, k))
    val total = summary.filter(col("is_total"))
      .agg(sum("cnt").as("n"))
    val cands = summary.filter(!col("is_total"))
      .select("word").distinct()
    items.toDF("word")
      .join(broadcast(cands), "word")
      .groupBy("word")
      .agg(count(lit(1)).as("cnt"))
      .crossJoin(broadcast(total))
      .filter(col("cnt") * den > col("n"))
      .select(col("word"), col("cnt"),
        round(col("cnt").cast("double") / col("n"), 4).as("share"))
      .orderBy(col("cnt").desc, col("word"))
  }
}
