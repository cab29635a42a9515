package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Approximate similarity search: random-hyperplane LSH bucketing over
  * the embedding column (SURVEY.md §2.12).
  *
  * `q_sim_cosine` (PipelineQueries) is the brute-force single-probe
  * baseline; this module is the scale path: a sign signature from fixed
  * pseudo-random hyperplanes buckets the table, and cosine is evaluated
  * only within buckets. At 100 TB the all-pairs product is impossible;
  * bucket-local pairs keep the join linear-ish.
  *
  * The signature WIDTH scales with corpus size ([[signatureBits]]): a
  * fixed width would let the expected bucket size — and so the
  * within-bucket pair product — grow linearly with n. The ladder doubles
  * the bucket count every 4× growth in n, holding expected bucket size
  * ≤ ~16 up to 2^28 rows; both engines derive the same width from the
  * same COUNT, so the plans stay oracle-comparable at every SF.
  *
  * The hyperplanes are deterministic integer patterns rather than
  * sampled gaussians: both engines must derive the identical planes
  * with no RNG (SURVEY.md §7.4 portability discipline). Planes j<8 keep
  * the original `((i*31 + j*17) mod 7) - 3` pattern (they fix the
  * small-SF contract output). That family reduces mod 7 to stride 3
  * with all 7 offsets (plane 7 duplicates plane 0), which poisons the
  * whole mod-7 space for extensions: any stride-4 plane is the exact
  * NEGATION of a stride-3 plane (v and -v define the same hyperplane —
  * the complementary sign bit adds no bucket discrimination), and the
  * 42-vector family only holds 21 sign-distinct planes in total. So
  * planes j≥8 switch fields entirely: `((i*h_j + k_j) mod 11) - 5`
  * with `h_j = (j-8) mod 5 + 1`, `k_j = (j-8) div 5 + 1`. Strides
  * 1..5 contain no mod-11 negation pair (negations are 10..6), same
  * stride + different offset is never a negation, and a mod-11 plane
  * takes values ±4/±5 that no mod-7 plane reaches — so every bit up to
  * j=23 is a genuinely new hyperplane up to sign (LshScalingSpec
  * asserts this numerically), and widening the signature really does
  * split buckets.
  */
object SimilarityExtras {

  /** Signature width for a corpus of `n` vectors: 2 more bits (4× the
    * buckets) per 4× rows, clamped to [8, 24]. Pure integer comparisons
    * so the DuckDB oracle reproduces the choice exactly (a float
    * log2-based rule could disagree in the last ulp at the boundaries).
    */
  private[graft] def signatureBits(n: Long): Int =
    if (n <= 4096L) 8
    else if (n <= 16384L) 10
    else if (n <= 65536L) 12
    else if (n <= 262144L) 14
    else if (n <= 1048576L) 16
    else if (n <= 4194304L) 18
    else if (n <= 16777216L) 20
    else if (n <= 67108864L) 22
    else 24

  /** The oracle's integer-ladder twin of [[signatureBits]] (DuckDB). */
  private val signatureBitsSql =
    """CASE WHEN COUNT(*) <= 4096 THEN 8
      |     WHEN COUNT(*) <= 16384 THEN 10
      |     WHEN COUNT(*) <= 65536 THEN 12
      |     WHEN COUNT(*) <= 262144 THEN 14
      |     WHEN COUNT(*) <= 1048576 THEN 16
      |     WHEN COUNT(*) <= 4194304 THEN 18
      |     WHEN COUNT(*) <= 16777216 THEN 20
      |     WHEN COUNT(*) <= 67108864 THEN 22
      |     ELSE 24 END""".stripMargin

  /** The plane family as plain JVM integers — the single source of
    * truth [[bucketSql]], [[planeSqlDuck]] and the native
    * graft.plans.HyperplaneSignature expression must all agree with
    * (LshScalingSpec asserts the planes are pairwise distinct up to
    * sign; NativeEquivalenceSpec asserts native ≡ HOF).
    */
  private[graft] def planeCoef(i: Int, j: Int): Int =
    if (j < 8) ((i * 31 + j * 17) % 7) - 3
    else ((i * ((j - 8) % 5 + 1) + ((j - 8) / 5 + 1)) % 11) - 5

  /** DuckDB twin of the piecewise hyperplane term in [[bucketSql]]. */
  private val planeSqlDuck =
    """(CASE WHEN j < 8 THEN ((i*31 + j*17) % 7) - 3
      |      ELSE ((i * ((j-8) % 5 + 1) + ((j-8) // 5 + 1)) % 11) - 5 END)""".stripMargin

  private[graft] def bucketSql(nbits: Int) =
    s"""array_join(transform(sequence(0, ${nbits - 1}), j ->
       |  CASE WHEN aggregate(sequence(0, 63),
       |    cast(0.0 as double),
       |    (acc, i) -> acc + cast(element_at(e, i + 1) as double)
       |      * (CASE WHEN j < 8 THEN ((i * 31 + j * 17) % 7) - 3
       |         ELSE ((i * ((j - 8) % 5 + 1) + ((j - 8) div 5 + 1)) % 11) - 5 END)) >= 0
       |  THEN '1' ELSE '0' END), '')""".stripMargin

  private val cosSql =
    """aggregate(zip_with(a.e, b.e, (x, y) -> cast(x as double) * cast(y as double)),
      |  cast(0.0 as double), (acc, x) -> acc + x) /
      |(sqrt(aggregate(a.e, cast(0.0 as double),
      |  (acc, x) -> acc + cast(x as double) * cast(x as double))) *
      | sqrt(aggregate(b.e, cast(0.0 as double),
      |  (acc, x) -> acc + cast(x as double) * cast(x as double))))""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Per-label embedding centroid through the typed Aggregator (the
    // reference's juice fold, §2.11), exploded to (label, pos, mean)
    // rows for the oracle. Double sums merge associatively; 4 dp
    // rounding absorbs partition-order last-ulp drift (float32 inputs).
    "q_agg_centroid" -> ((s, d) => {
      import s.implicits._
      val agg = new graft.functions.VectorMean(64).toColumn
      Tables.embeddings(s, d)
        .select(col("label"), col("embedding"))
        .as[(Int, Array[Float])]
        .groupByKey(_._1)
        .mapValues(_._2)
        .agg(agg.name("centroid"))
        .map { case (label, c) => (label.toLong, c) }
        .toDF("label", "centroid")
        .select(col("label"),
          posexplode(col("centroid")).as(Seq("pos0", "v")))
        .select(col("label"), (col("pos0") + 1).cast("long").as("pos"),
          round(col("v"), 4).as("mean_v"))
        .orderBy("label", "pos")
    }),

    // Same semantics as q_sim_cosine (PipelineQueries) but through the
    // native codegen'd CosineSimilarity expression — the hot-path form.
    // Identical accumulation order ⇒ bit-identical results ⇒ shares the
    // brute-force oracle.
    "q_sim_cosine_native" -> ((s, d) => {
      graft.plans.CosineSimilarity.register(s)
      val emb = Tables.embeddings(s, d)
        .select(col("vec_id"), col("embedding").cast("array<double>").as("e"))
      val probe = emb.filter(col("vec_id") === 0).select(col("e").as("p"))
      emb.filter(col("vec_id") =!= 0)
        .crossJoin(broadcast(probe))
        .select(col("vec_id"), round(expr("cosine_sim(e, p)"), 4).as("sim"))
        .orderBy(col("sim").desc, col("vec_id"))
        .limit(10)
    }),

    // Embedding-cosine near-dup: bucket candidates whose cosine clears
    // the dedup threshold. Same LSH shape as q_sim_lsh; the threshold
    // compares UNROUNDED sim (identical doubles in both engines), the
    // output rounds to 4 dp. Signature width scales with COUNT (one
    // cheap columnar count job — a stats read, same class as AQE).
    "q_dedup_embed" -> ((s, d) => {
      // native one-loop signature (graft.plans.HyperplaneSignature) —
      // bit-identical to the HOF bucketSql the oracle mirrors
      // (NativeEquivalenceSpec proves it)
      graft.plans.HyperplaneSignature.register(s)
      val nbits = signatureBits(Tables.embeddings(s, d).count())
      val sig = Tables.embeddings(s, d)
        .select(col("vec_id"), col("embedding").as("e"))
        .repartition(s.sparkContext.defaultParallelism, col("vec_id"))
        .withColumn("bucket", expr(s"hyperplane_sig(e, $nbits)"))
      sig.as("a")
        .join(sig.as("b"),
          col("a.bucket") === col("b.bucket") && col("a.vec_id") < col("b.vec_id"))
        .select(col("a.vec_id").as("vec_id1"), col("b.vec_id").as("vec_id2"),
          expr(cosSql).as("sim_raw"))
        .filter(col("sim_raw") >= 0.4)
        .select(col("vec_id1"), col("vec_id2"), round(col("sim_raw"), 4).as("sim"))
        .orderBy("vec_id1", "vec_id2")
    }),

    // Top-20 most-similar pairs among LSH-bucket candidates.
    "q_sim_lsh" -> ((s, d) => {
      graft.plans.HyperplaneSignature.register(s)
      val nbits = signatureBits(Tables.embeddings(s, d).count())
      val sig = Tables.embeddings(s, d)
        .select(col("vec_id"), col("embedding").as("e"))
        .repartition(s.sparkContext.defaultParallelism, col("vec_id"))
        .withColumn("bucket", expr(s"hyperplane_sig(e, $nbits)"))
      sig.as("a")
        .join(sig.as("b"),
          col("a.bucket") === col("b.bucket") && col("a.vec_id") < col("b.vec_id"))
        .select(col("a.vec_id").as("vec_id1"), col("b.vec_id").as("vec_id2"),
          round(expr(cosSql), 4).as("sim"))
        .orderBy(col("sim").desc, col("vec_id1"), col("vec_id2"))
        .limit(20)
    })
  )

  val oracle: Map[String, String] = Map(
    "q_agg_centroid" ->
      """SELECT CAST(label AS BIGINT) AS label, CAST(i AS BIGINT) AS pos,
        |  ROUND(AVG(CAST(embedding[i] AS DOUBLE)), 4) AS mean_v
        |FROM embeddings, unnest(range(1,65)) AS t(i)
        |GROUP BY label, i ORDER BY label, pos""".stripMargin,

    "q_dedup_embed" ->
      s"""WITH nb AS (
        |  SELECT $signatureBitsSql AS b FROM embeddings),
        |sig AS (
        |  SELECT vec_id, embedding AS e,
        |    array_to_string(list_transform(range(0, (SELECT b FROM nb)), j ->
        |      CASE WHEN list_sum(list_transform(range(0,64),
        |        i -> CAST(e[i+1] AS DOUBLE) * $planeSqlDuck)) >= 0
        |      THEN '1' ELSE '0' END), '') AS bucket
        |  FROM embeddings),
        |pairs AS (
        |  SELECT a.vec_id AS vec_id1, b.vec_id AS vec_id2,
        |    list_sum(list_transform(range(1,65), i -> CAST(a.e[i] AS DOUBLE)*CAST(b.e[i] AS DOUBLE))) /
        |    (sqrt(list_sum(list_transform(a.e, x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE)))) *
        |     sqrt(list_sum(list_transform(b.e, x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE))))) AS sim
        |  FROM sig a JOIN sig b ON a.bucket=b.bucket AND a.vec_id < b.vec_id)
        |SELECT vec_id1, vec_id2, ROUND(sim, 4) AS sim
        |FROM pairs WHERE sim >= 0.4 ORDER BY vec_id1, vec_id2""".stripMargin,
    "q_sim_cosine_native" ->
      """WITH probe AS (
        |  SELECT embedding FROM embeddings WHERE vec_id = 0),
        |pairs AS (
        |  SELECT b.vec_id,
        |    list_sum(list_transform(range(1, 65),
        |      i -> CAST(b.embedding[i] AS DOUBLE) * CAST(p.embedding[i] AS DOUBLE))) AS dot,
        |    sqrt(list_sum(list_transform(b.embedding,
        |      x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nb,
        |    sqrt(list_sum(list_transform(p.embedding,
        |      x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS np
        |  FROM embeddings b, probe p WHERE b.vec_id <> 0)
        |SELECT vec_id, ROUND(dot / (nb * np), 4) AS sim
        |FROM pairs ORDER BY sim DESC, vec_id LIMIT 10""".stripMargin,

    "q_sim_lsh" ->
      s"""WITH nb AS (
        |  SELECT $signatureBitsSql AS b FROM embeddings),
        |sig AS (
        |  SELECT vec_id, embedding AS e,
        |    array_to_string(list_transform(range(0, (SELECT b FROM nb)), j ->
        |      CASE WHEN list_sum(list_transform(range(0,64),
        |        i -> CAST(e[i+1] AS DOUBLE) * $planeSqlDuck)) >= 0
        |      THEN '1' ELSE '0' END), '') AS bucket
        |  FROM embeddings),
        |pairs AS (
        |  SELECT a.vec_id AS vec_id1, b.vec_id AS vec_id2,
        |    list_sum(list_transform(range(1,65), i -> CAST(a.e[i] AS DOUBLE)*CAST(b.e[i] AS DOUBLE))) /
        |    (sqrt(list_sum(list_transform(a.e, x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE)))) *
        |     sqrt(list_sum(list_transform(b.e, x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE))))) AS sim
        |  FROM sig a JOIN sig b ON a.bucket=b.bucket AND a.vec_id < b.vec_id)
        |SELECT vec_id1, vec_id2, ROUND(sim, 4) AS sim
        |FROM pairs ORDER BY sim DESC, vec_id1, vec_id2 LIMIT 20""".stripMargin
  )
}
