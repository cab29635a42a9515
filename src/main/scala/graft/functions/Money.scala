package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, LongType}

/** Exact-money discipline (SURVEY.md §7.4): all money doubles are
  * converted to integer cents through DECIMAL(18,2) so Spark and the
  * DuckDB oracle agree bit-for-bit. Integer columns hash identically
  * across engines; double sums do not.
  */
object Money {
  /** Double money column → integer cents (exact in both engines). */
  def cents(c: Column): Column =
    (c.cast(DecimalType(18, 2)) * 100).cast(LongType)

  /** SUM of a money column, in cents, as BIGINT. Spark sums longs —
    * map-side partial aggregation stays a primitive long add, which is
    * the cheapest possible combiner at scale.
    */
  def sumCents(c: Column): Column = sum(cents(c))

  /** DuckDB-side spelling of [[cents]], for oracle SQL strings. */
  def sqlCents(expr: String): String =
    s"CAST(CAST($expr AS DECIMAL(18,2)) * 100 AS BIGINT)"

  /** DuckDB-side spelling of [[sumCents]]. The outer cast matters:
    * DuckDB SUM(BIGINT) yields HUGEINT, which would not schema-match
    * Spark's LongType.
    */
  def sqlSumCents(expr: String): String =
    s"CAST(SUM(${sqlCents(expr)}) AS BIGINT)"
}
