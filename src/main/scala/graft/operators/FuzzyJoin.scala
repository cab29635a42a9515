package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Similarity join on edit distance — record linkage across TABLES
  * (match customer names against a registry, reconcile product titles
  * across catalogs), where the dedup family's blocking tricks apply
  * but the pairs span two sides.
  *
  * Soundness is the whole game: an all-pairs verify is |A|·|B| and a
  * lossy blocking silently drops matches. This uses the deletion-
  * neighborhood (SymSpell) guarantee: if edit_distance(a, b) ≤ d, then
  * some string obtained by ≤ d character DELETIONS from a equals one
  * obtained by ≤ d deletions from b — substitutions and insertions
  * both reduce to meeting at a common deletion variant. So blocking on
  * the deletion neighborhood has NO false negatives by construction
  * (FuzzyJoinSpec proves candidate ⊇ brute-force match set before
  * verification, then exact equality after).
  *
  * Scale shape: each side explodes into ≤ 1 + len + len² deletion
  * variants (d ≤ 2 — the useful range for names/titles; d is checked),
  * pairs form ONLY inside a shared-variant bucket (one equi-join on
  * the variant string — hash-shufflable, salt-able, never a product),
  * distinct candidate pairs are verified with the builtin
  * `levenshtein(l, r, threshold)` (early-exits above the threshold),
  * and payloads never ride the variant explosion — only (id, key)
  * pairs do, the dedup family's digest-on-the-shuffle discipline.
  */
object FuzzyJoin {

  /** SQL fragment producing the deletion neighborhood of column `c`
    * for a given d (array of distinct strings, the original included).
    */
  private[operators] def variantsSql(c: String, d: Int): String = {
    require(d == 1 || d == 2, "deletion blocking supports d in {1, 2}")
    val del1 = (src: String) =>
      s"""transform(sequence(1, greatest(length($src), 1)),
         |  i -> concat(substring($src, 1, i - 1),
         |              substring($src, i + 1, length($src))))""".stripMargin
    if (d == 1) s"array_distinct(array_union(array($c), ${del1(c)}))"
    else
      s"""array_distinct(array_union(
         |  array_union(array($c), ${del1(c)}),
         |  flatten(transform(${del1(c)}, v -> ${del1("v")}))))""".stripMargin
  }

  /** Pairs (a_val, b_val, dist) with edit_distance ≤ maxDist between
    * DISTINCT key values of the two sides (callers re-join payloads by
    * key — change-proportional, like SnapshotDiff's attribution).
    */
  def fuzzyJoin(a: DataFrame, aKey: String, b: DataFrame, bKey: String,
      maxDist: Int): DataFrame = {
    def side(df: DataFrame, key: String, out: String) =
      df.select(col(key).cast("string").as(out)).distinct()
        .select(col(out),
          explode(expr(variantsSql(out, maxDist))).as("__v"))
    val av = side(a, aKey, "a_val")
    val bv = side(b, bKey, "b_val")
    av.join(bv, "__v")
      .select("a_val", "b_val").distinct()
      .withColumn("dist", levenshtein(col("a_val"), col("b_val"),
        maxDist))
      .filter(col("dist") >= 0 && col("dist") <= maxDist)
  }
}
