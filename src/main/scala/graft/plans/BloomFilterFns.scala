package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate

/** SQL surface for Spark's own runtime-filter machinery (SURVEY.md
  * §2.3/§4): `bloom_agg(xxhash64(k))` builds a Bloom-filter sketch as a
  * binary aggregate and `bloom_contains(bloom, xxhash64(k))` is the
  * codegen'd membership probe. Spark ships both expressions for its
  * automatic `InjectRuntimeFilter` rewrite but does not expose them as
  * functions; registering them makes the big-side-prune join an
  * EXPLICIT, guaranteed operator instead of an optimizer heuristic:
  *
  *   - the sketch build is a real distributed aggregate (partial
  *     Bloom filters OR-merge map-side — no key list ever centralizes),
  *   - the probe is a per-row bit test BELOW the join's exchange, so at
  *     100 TB the shuffle carries only rows that can possibly match,
  *   - false positives are removed by the actual join that follows, so
  *     the rewrite is result-invariant for any fpp (the q_join_bloom
  *     contract pins exactly that against a plain-join oracle).
  *
  * `bloom_contains`' analysis contract requires the sketch argument to
  * be a constant or scalar subquery — the natural spelling is
  * `bloom_contains((SELECT bloom_agg(xxhash64(k)) FROM small), ...)`,
  * which materializes the sketch once per query like Spark's own
  * runtime-filter subqueries.
  */
object BloomFilterFns {
  /** Register both functions in the session registry. Idempotent. */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "bloom_agg",
      exprs => exprs match {
        case Seq(c)    => new BloomFilterAggregate(c)
        case Seq(c, n) => new BloomFilterAggregate(c, n)
        case other => throw new IllegalArgumentException(
          s"bloom_agg takes (hashedKey[, estimatedItems]), got ${other.size} args")
      },
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "bloom_contains",
      exprs => BloomFilterMightContain(exprs(0), exprs(1)),
      "built-in")
  }
}
