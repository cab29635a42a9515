package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Training-data sampling and ordering: exact weighted sampling without
  * replacement (Efraimidis–Spirakis A-ES keys) and the deterministic
  * epoch shuffle an LLM training pipeline runs over its corpus.
  *
  * Both are seed-keyed HASH randomness, not RNG state: the "random"
  * draw for a row is a pure function of (its key, the seed), so results
  * are identical under any partitioning, any executor count, and any
  * retry — the only kind of randomness that is reproducible on a
  * 1000-executor cluster (Spark's own `rand()` is seeded per partition
  * INDEX, which changes when the partitioning does).
  *
  * Scale shape: the weighted sample is one `TakeOrderedAndProject`
  * (map-side partial top-k per partition, k-row reduce — never a global
  * sort); the epoch shuffle is one range exchange on the hash key
  * (exactly the shuffle a global permutation requires, and nothing
  * else — the sort inside each output partition is local).
  */
object Sampling {

  /** (0,1) uniform draw as a pure function of (key, seed):
    * xxhash64 → 53-bit mantissa → (0,1], strictly positive so
    * log(u) below is finite.
    */
  private[operators] def u01(key: Column, seed: Long): Column =
    (pmod(xxhash64(key, lit(seed)), lit(1L << 53)).cast("double") + 1.0) /
      lit((1L << 53).toDouble + 1.0)

  /** Exact k-item weighted sample WITHOUT replacement (Efraimidis &
    * Spirakis 2006): row i gets key u_i^(1/w_i); the k largest keys
    * are a weighted sample without replacement — for k=1 the inclusion
    * probability is exactly w_i / Σw. Computed as log(u)/w (monotone in
    * u^(1/w), numerically safer). Non-positive weights are excluded —
    * the same convention as a zero-probability row.
    *
    * `idCol` must be unique per row: it seeds the per-row draw and
    * breaks ordering ties deterministically.
    */
  def weightedSample(df: DataFrame, idCol: String, weightCol: String,
      k: Int, seed: Long): DataFrame = {
    val w = col(weightCol).cast("double")
    df.filter(w > 0.0)
      .withColumn("__key", log(u01(col(idCol), seed)) / w)
      .orderBy(col("__key").desc, col(idCol))
      .limit(k)
      .drop("__key")
  }

  /** Deterministic global permutation of the corpus for one training
    * epoch: rows ordered by xxhash64(id, seed), different per epoch,
    * identical across reruns and partitionings. Returns the frame
    * range-partitioned into `numPartitions` shuffle-order slices and
    * sorted within each — writing it per-partition yields the epoch's
    * shard files directly.
    */
  def epochShuffle(df: DataFrame, idCol: String, epoch: Long,
      numPartitions: Int): DataFrame = {
    val keyed = df.withColumn("__shuf", xxhash64(col(idCol), lit(epoch)))
    keyed.repartitionByRange(numPartitions, col("__shuf"))
      .sortWithinPartitions(col("__shuf"), col(idCol))
      .drop("__shuf")
  }

  /** Bernoulli sample at `fraction`, seed-keyed per row (reproducible,
    * partitioning-independent — unlike `DataFrame.sample`, whose
    * per-partition-index seeding changes membership when the input
    * repartitions).
    */
  def hashSample(df: DataFrame, idCol: String, fraction: Double,
      seed: Long): DataFrame = {
    require(fraction >= 0.0 && fraction <= 1.0, s"fraction=$fraction")
    df.filter(u01(col(idCol), seed) <= fraction)
  }
}
