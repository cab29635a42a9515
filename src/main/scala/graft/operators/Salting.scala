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
}
