package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation by key salting (SURVEY.md §7.5; the scale knob the
  * reference lacked entirely — a hot key lands on one juicer and
  * stalls the job).
  *
  * AQE's skew-join split (`spark.sql.adaptive.skewJoin`) is the first
  * line of defense and is enabled by default in the bench/verify
  * sessions; these helpers cover the cases AQE cannot re-plan:
  * a skewed aggregation (two-phase partial per salt → final per key)
  * and a skewed join against a replicable small side.
  *
  * Results are salt-invariant: counts/sums are associative, so the
  * extra pre-aggregation level changes only the shuffle layout. The
  * salt derives from a caller-supplied column (typically a unique id)
  * rather than rand() so plans stay deterministic under task retry.
  */
object Salting {

  /** Two-phase skew-safe count: groupBy(key, salt) → groupBy(key). */
  def saltedCount(df: DataFrame, key: Column, saltFrom: Column,
      nSalts: Int): DataFrame =
    df.withColumn("_salt", pmod(hash(saltFrom), lit(nSalts)))
      .groupBy(key.as("_key"), col("_salt"))
      .agg(count(lit(1)).as("_partial"))
      .groupBy(col("_key"))
      .agg(sum(col("_partial")).as("n"))

  /** Skew-safe equi-join: the big (skewed) side gets a salt from one of
    * its own columns; the small side is replicated once per salt value
    * so every (key, salt) bucket finds its match. Join key explodes to
    * (key, salt) — hot keys spread over `nSalts` tasks.
    */
  def saltedEquiJoin(big: DataFrame, small: DataFrame, key: String,
      saltFrom: Column, nSalts: Int): DataFrame = {
    val saltedBig = big.withColumn("_salt", pmod(hash(saltFrom), lit(nSalts)))
    val replicatedSmall = small.withColumn("_salt",
      explode(sequence(lit(0), lit(nSalts - 1))))
    saltedBig.join(replicatedSmall, Seq(key, "_salt")).drop("_salt")
  }

  /** Skew-safe within-block self-pairing: every (a, b) with equal
    * `blockCols` and `a.idCol < b.idCol`, the candidate-enumeration
    * shape of blocked dedup. A plain self-join keys the shuffle on the
    * block alone, so a hot block's |B|² pair product lands on ONE task
    * — the quadratic blowup AQE cannot re-plan away (it splits by
    * bytes, not by the pair product). Here side A takes one
    * deterministic salt per row and side B is replicated to all
    * `nSalts`, so each ordered pair is produced exactly once (in the
    * task owning A's salt) and a hot block spreads over `nSalts` tasks
    * of |B|²/nSalts pairs each. Replication cost is nSalts× the keyed
    * projection — keep `keyed` slim (ids + block keys, no payloads).
    *
    * Callers select through the `a`/`b` aliases, e.g.
    * `col("a.doc_id")`.
    */
  def saltedSelfPairs(keyed: DataFrame, blockCols: Seq[String],
      idCol: String, nSalts: Int): DataFrame = {
    val a = keyed.withColumn("_salt", pmod(hash(col(idCol)), lit(nSalts)))
    val b = keyed.withColumn("_salt",
      explode(sequence(lit(0), lit(nSalts - 1))))
    val cond = (blockCols :+ "_salt")
      .map(c => col(s"a.$c") === col(s"b.$c"))
      .reduce(_ && _) && col(s"a.$idCol") < col(s"b.$idCol")
    a.as("a").join(b.as("b"), cond)
  }
}
