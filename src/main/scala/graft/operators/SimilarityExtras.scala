package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.{Stats, Tables}

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

  /** Left-to-right HOF dot/norm — same evaluation order as the
    * oracle's list_sum(list_transform(...)) (q_sim_cosine's parity
    * discipline, duplicated here for the hybrid leg).
    */
  private def vdot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  private def vnorm(a: Column): Column =
    sqrt(aggregate(a, lit(0.0), (acc, x) => acc + x * x))

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

  /** Band width (bits per band) for the banded (4×r) LSH path —
    * [[signatureBits]]'s ladder shifted down 2 (4 bands ⇒ the same
    * total bucket count at the same n) and capped at 14 so the full
    * 4×r signature stays within the 62 sign-distinct planes the
    * mod-7/mod-11 families supply (and hyperplane_sig's 64-bit limit).
    * A FIXED band width would let expected band-bucket size grow
    * linearly with n — the same scale-killer the single-signature
    * ladder fixed in round 3. Beyond the cap (n > 256k) recall/cost is
    * tuned by band count or multi-probe, not wider bands.
    */
  private[graft] def bandBits(n: Long): Int =
    if (n <= 4096L) 6
    else if (n <= 16384L) 8
    else if (n <= 65536L) 10
    else if (n <= 262144L) 12
    else 14

  /** DuckDB twin of [[bandBits]]. */
  private val bandBitsSql =
    """CASE WHEN COUNT(*) <= 4096 THEN 6
      |     WHEN COUNT(*) <= 16384 THEN 8
      |     WHEN COUNT(*) <= 65536 THEN 10
      |     WHEN COUNT(*) <= 262144 THEN 12
      |     ELSE 14 END""".stripMargin

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

  /** Cosine between two float-array columns, parameterized by column
    * name — the accumulation order (left-to-right IEEE doubles, cast
    * per element) is the one the DuckDB oracle's `list_sum` twin
    * reproduces exactly, so compares against UNROUNDED sim stay
    * engine-identical.
    */
  private[graft] def cosPair(u: String, v: String) =
    s"""aggregate(zip_with($u, $v, (x, y) -> cast(x as double) * cast(y as double)),
       |  cast(0.0 as double), (acc, x) -> acc + x) /
       |(sqrt(aggregate($u, cast(0.0 as double),
       |  (acc, x) -> acc + cast(x as double) * cast(x as double))) *
       | sqrt(aggregate($v, cast(0.0 as double),
       |  (acc, x) -> acc + cast(x as double) * cast(x as double))))""".stripMargin

  private val cosSql = cosPair("a.e", "b.e")

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

    // Nearest-centroid classification with a confusion matrix — the
    // ML-scoring/evaluation family: classify every vector by the most
    // cosine-similar per-label centroid and cross-tabulate predictions
    // against true labels. The model (≤ |labels| centroids, elements
    // ROUNDED to 4 dp so both engines score the identical model)
    // BROADCASTS over one corpus scan — the canonical scalable scoring
    // shape: no shuffle touches the vectors; the only aggregates after
    // scoring are the per-vector argmax and the bounded
    // |labels|² confusion count. The argmax is deterministic across
    // engines because the similarity is rounded to 4 dp BEFORE the
    // comparison and ties break to the smaller label (max of a
    // (sim, -label) struct) — near-ties become exact ties resolved
    // identically, so last-ulp engine drift cannot flip a prediction.
    "q_ml_confusion" -> ((s, d) => {
      import s.implicits._
      val agg = new graft.functions.VectorMean(64).toColumn
      val cent = Tables.embeddings(s, d)
        .select(col("label"), col("embedding"))
        .as[(Int, Array[Float])]
        .groupByKey(_._1)
        .mapValues(_._2)
        .agg(agg.name("c"))
        .map { case (l, c) => (l.toLong, c) }
        .toDF("clabel", "c0")
        .select(col("clabel"),
          expr("transform(c0, x -> round(x, 4))").as("cv"))
      Tables.embeddings(s, d)
        .select(col("vec_id"), col("label").cast("long").as("tl"),
          col("embedding").cast("array<double>").as("e"))
        .crossJoin(broadcast(cent))
        .select(col("vec_id"), col("tl"), col("clabel"),
          round(expr(cosPair("e", "cv")), 4).as("sim"))
        .groupBy("vec_id", "tl")
        .agg(max(struct(col("sim"), (-col("clabel")).as("nl"))).as("m"))
        .select(col("tl").as("label"), (-col("m.nl")).as("pred"))
        .groupBy("label", "pred").agg(count(lit(1)).as("n"))
        .orderBy("label", "pred")
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
      val nbits = signatureBits(Stats.rowCount(s, d, "embeddings"))
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

    // Batch ANN: exact top-5 neighbors for EVERY probe in a small probe
    // set, in one pass over the corpus. The probe set broadcasts (the
    // big side never shuffles for the scoring), and top-k is TWO-phase:
    // a partial top-5 within (probe, salt-of-candidate) bounds per-task
    // state, then the exact top-5 per probe ranks only ≤ 5×16 survivors
    // — partitioning the final window by probe alone would funnel the
    // whole corpus through |probes| partitions at 100 TB.
    "q_sim_ann_batch" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val emb = Tables.embeddings(s, d).select(col("vec_id"), col("embedding").as("e"))
      val probes = emb.filter(col("vec_id") < 8)
        .select(col("vec_id").as("probe_id"), col("e").as("p"))
      val partial = Window
        .partitionBy(col("probe_id"), pmod(col("vec_id"), lit(16)))
        .orderBy(col("sim_raw").desc, col("vec_id"))
      val exact = Window.partitionBy(col("probe_id"))
        .orderBy(col("sim_raw").desc, col("vec_id"))
      emb.filter(col("vec_id") >= 8)
        .crossJoin(broadcast(probes))
        .select(col("probe_id"), col("vec_id"),
          expr(cosPair("e", "p")).as("sim_raw"))
        .withColumn("rn1", row_number().over(partial)).filter(col("rn1") <= 5)
        .withColumn("rn", row_number().over(exact)).filter(col("rn") <= 5)
        .select(col("probe_id"), col("vec_id"),
          round(col("sim_raw"), 4).as("sim"))
        .orderBy(col("probe_id"), col("sim").desc, col("vec_id"))
    }),

    // Banded (b×r = 4 bands × bandBits) hyperplane LSH near-dup:
    // OR-of-ANDs recall — a pair is a candidate if it agrees on ALL r
    // bits of ANY band, where the single-signature q_dedup_embed needs
    // all nbits; the band width scales with corpus size (bandBits) so
    // expected band-bucket size stays bounded as n grows. Same shape
    // as the MinHash banding path: the 4×r-bit signature is computed
    // once behind an exchange (native expression, one JVM loop), bands
    // are substrings of it, pair enumeration stays within (band,
    // bucket), and the verify cosine re-joins vectors by id so the
    // band shuffle moves only (id, r-char bucket) pairs.
    "q_dedup_embed_banded" -> ((s, d) => {
      graft.plans.HyperplaneSignature.register(s)
      val bb = bandBits(Stats.rowCount(s, d, "embeddings"))
      val emb = Tables.embeddings(s, d)
        .select(col("vec_id"), col("embedding").as("e"))
        .repartition(s.sparkContext.defaultParallelism, col("vec_id"))
        .withColumn("sig", expr(s"hyperplane_sig(e, ${4 * bb})"))
        .transform(graft.Materialize.checkpoint)
      val bands = emb
        .select(col("vec_id"),
          explode(sequence(lit(0), lit(3))).as("band_id"), col("sig"))
        .select(col("vec_id"), col("band_id"),
          expr(s"substring(sig, band_id * $bb + 1, $bb)").as("bk"))
      val cand = bands.as("a")
        .join(bands.as("b"),
          col("a.band_id") === col("b.band_id") && col("a.bk") === col("b.bk") &&
            col("a.vec_id") < col("b.vec_id"))
        .select(col("a.vec_id").as("vec_id1"), col("b.vec_id").as("vec_id2"))
        .distinct()
      cand
        .join(emb.select(col("vec_id").as("vec_id1"), col("e").as("ea")), "vec_id1")
        .join(emb.select(col("vec_id").as("vec_id2"), col("e").as("eb")), "vec_id2")
        .select(col("vec_id1"), col("vec_id2"),
          expr(cosPair("ea", "eb")).as("sim_raw"))
        .filter(col("sim_raw") >= 0.4)
        .select(col("vec_id1"), col("vec_id2"),
          round(col("sim_raw"), 4).as("sim"))
        .orderBy("vec_id1", "vec_id2")
    }),

    // IVF (inverted-file) ANN as a CONTRACT query: the corpus is
    // clustered into cells around deterministic seed centroids
    // (vec_ids 0–7 — no RNG, both engines derive identical cells),
    // probes (vec_ids 8–15) search only their nprobe=2 closest cells.
    // This is the scale path brute-force q_sim_ann_batch trades recall
    // for: scoring touches |probed cells| ≈ nprobe/ncells of the
    // corpus instead of all of it. Plan shape: centroids BROADCAST to
    // the corpus scan (8-row build side), cell assignment partial-
    // aggregates map-side (max-of-struct argmax — 8 scored rows fold
    // to 1 before the exchange), the probe→cell map (16 rows, probe
    // vector attached) broadcasts to the cell-clustered index so the
    // corpus side never re-shuffles for the search, and top-5 is the
    // same two-phase salted window as q_sim_ann_batch. Ties in both
    // argmaxes break on cell asc; sim compares/rounds exactly as every
    // other cosine query (UNROUNDED doubles, 4 dp at output).
    "q_sim_ann_ivf" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val emb = Tables.embeddings(s, d)
        .select(col("vec_id"), col("embedding").as("e"))
      val cents = emb.filter(col("vec_id") < 8)
        .select(col("vec_id").as("cell"), col("e").as("ce"))
      // index build: one map-side-combining shuffle clusters the
      // corpus by cell (the IVF posting lists)
      val assign = emb.filter(col("vec_id") >= 16)
        .crossJoin(broadcast(cents))
        .select(col("vec_id"), col("cell"), col("e"),
          expr(cosPair("e", "ce")).as("a_sim"))
        .groupBy("vec_id")
        .agg(max(struct(col("a_sim"), (-col("cell")).as("negcell"),
          col("e").as("e"))).as("m"))
        .select(col("vec_id"), (-col("m.negcell")).as("cell"), col("m.e").as("e"))
      val pw = Window.partitionBy("probe_id")
        .orderBy(col("p_sim").desc, col("cell"))
      val pcells = emb.filter(col("vec_id").between(8, 15))
        .select(col("vec_id").as("probe_id"), col("e").as("p"))
        .crossJoin(broadcast(cents))
        .select(col("probe_id"), col("cell"), col("p"),
          expr(cosPair("p", "ce")).as("p_sim"))
        .withColumn("rn", row_number().over(pw))
        .filter(col("rn") <= 2)
        .select(col("probe_id"), col("cell"), col("p"))
      val partial = Window
        .partitionBy(col("probe_id"), pmod(col("vec_id"), lit(16)))
        .orderBy(col("sim_raw").desc, col("vec_id"))
      val exact = Window.partitionBy(col("probe_id"))
        .orderBy(col("sim_raw").desc, col("vec_id"))
      assign
        .join(broadcast(pcells), Seq("cell"))
        .select(col("probe_id"), col("vec_id"),
          expr(cosPair("e", "p")).as("sim_raw"))
        .withColumn("rn1", row_number().over(partial)).filter(col("rn1") <= 5)
        .withColumn("rn", row_number().over(exact)).filter(col("rn") <= 5)
        .select(col("probe_id"), col("vec_id"),
          round(col("sim_raw"), 4).as("sim"))
        .orderBy(col("probe_id"), col("sim").desc, col("vec_id"))
    }),

    // Top-20 most-similar pairs among LSH-bucket candidates.
    "q_sim_lsh" -> ((s, d) => {
      graft.plans.HyperplaneSignature.register(s)
      val nbits = signatureBits(Stats.rowCount(s, d, "embeddings"))
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
    }),

    // NDCG@10 retrieval-quality evaluation (round 10, wave 27) — the
    // ranking-eval step of an embedding-search pipeline: for each of 5
    // probe vectors, rank the rest of the corpus by cosine and score
    // the top-10 against binary same-label relevance. Discipline
    // follows q_ml_confusion: similarity is ROUNDED to 4 dp BEFORE
    // ranking (near-ties become exact ties broken by vec_id, so
    // engine last-ulp drift cannot reorder), the gain uses log2
    // directly (ONE libm call per term — never ln(x)/ln(2), whose two
    // 1-ulp errors compound), and the ideal DCG comes from an exploded
    // integer spine over the ≤5-row relevant-count frame. Scale shape:
    // probes broadcast over ONE corpus scan per consumer; the rank
    // window partitions by probe but rn ≤ 10 compiles to
    // WindowGroupLimit (map tasks forward local top-10s — the
    // q_window_rankchange pattern), so no task ever holds a full
    // probe partition. Probes with zero relevant docs drop (NDCG
    // undefined) via the inner joins in both engines.
    "q_ml_ndcg" -> ((s, d) => {
      val pairs = labeledProbePairs(s, d)
      val w = Window.partitionBy("pid")
        .orderBy(col("sim").desc, col("vec_id"))
      val dcg = pairs.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 10)
        .groupBy("pid")
        .agg(sum(when(col("rel") === 1, lit(1.0) / log2(col("rn") + 1))
          .otherwise(lit(0.0))).as("dcg"))
      val rtot = pairs.groupBy("pid").agg(sum(col("rel")).as("n_rel"))
      val idcg = rtot.filter(col("n_rel") >= 1)
        .select(col("pid"),
          explode(expr("sequence(1, least(n_rel, 10))")).as("i"))
        .groupBy("pid")
        .agg(sum(lit(1.0) / log2(col("i") + 1)).as("idcg"))
      dcg.join(rtot, "pid").join(idcg, "pid")
        .select(col("pid").as("probe_id"), col("n_rel"),
          round(col("dcg") / col("idcg"), 4).as("ndcg10"))
        .orderBy("probe_id")
    }),

    // MRR@10 + capped recall@10 beside NDCG — the other two numbers a
    // retrieval eval report carries. Shares q_ml_ndcg's construction
    // verbatim ([[labeledProbePairs]]: sims rounded to 4 dp BEFORE
    // ranking, vec_id tiebreak) so the two metrics can never disagree
    // on the ranking they score. MRR is 1/rank of the first relevant
    // hit in the top-10 (0.0 when none — an exact constant, no float
    // path); recall@10 divides hits by min(n_rel, 10), the achievable
    // maximum, so a probe with 50 relevant docs can still score 1.0.
    // Same WindowGroupLimit shape: rn ≤ 10 keeps every task at local
    // top-10 state.
    // Binned calibration curve — the reliability diagram an ML eval
    // report pairs with its ranking metrics: does a higher similarity
    // score actually mean a higher probability of same-label? Shares
    // [[labeledProbePairs]] with ndcg/mrr (4-dp-rounded sims are
    // engine-bit-identical, so the bin assignment floor((sim+1)·5) is
    // too — both engines run the same IEEE ops on the same doubles).
    // mean_sim sums ~1k 4-dp values per bin before one division (the
    // q_agg_theil accumulation argument; 4 dp absorbs ~1e-13 spread).
    // One partial-combined 10-group aggregate over the scored pairs —
    // nothing but (bin, sim, rel) leaves the map side.
    "q_ml_calibration" -> ((s, d) =>
      labeledProbePairs(s, d)
        .select(greatest(lit(0L), least(lit(9L),
          floor((col("sim") + 1) * 5).cast("long"))).as("bin"),
          col("sim"), col("rel"))
        .groupBy("bin")
        .agg(count(lit(1)).as("n_pairs"),
          round(sum(col("sim")) / count(lit(1)), 4).as("mean_sim"),
          sum(col("rel")).as("n_pos"),
          round(sum(col("rel")).cast("double") / count(lit(1)), 4)
            .as("pos_rate"))
        .orderBy("bin")),

    // Per-vector symmetric int8 quantization — the storage/ANN step
    // that turns a float32 corpus into 4×-smaller int8 codes (scale =
    // max|x|/127 per vector, q = clamp(round(x/scale))). Output is the
    // integer manifest (code checksum + saturation count) rather than
    // 64 codes per row. Parity: float→double casts are exact, the
    // scale division and per-element divisions are identical IEEE ops,
    // and round-half-away-from-zero matches between engines, so every
    // compared value is an exact integer. Pure per-row projection —
    // no shuffle but the output sort; at 100 TB this maps over the
    // corpus once and writes codes beside the index.
    "q_embed_quantize" -> ((s, d) =>
      Tables.embeddings(s, d)
        .select(col("vec_id"),
          (expr("array_max(transform(embedding, x -> abs(cast(x as double))))")
            / 127).as("scale"),
          col("embedding"))
        .select(col("vec_id"), expr(
          """transform(embedding, x ->
            |  CASE WHEN scale = 0D THEN 0L
            |  ELSE greatest(-127L, least(127L,
            |    cast(round(cast(x as double) / scale) as long))) END)"""
            .stripMargin).as("q"))
        .select(col("vec_id"),
          expr("aggregate(q, 0L, (a, x) -> a + x)").as("sum_q"),
          expr("size(filter(q, v -> abs(v) = 127))").cast("long")
            .as("n_sat"))
        .orderBy("vec_id")),

    "q_ml_mrr" -> ((s, d) => {
      val pairs = labeledProbePairs(s, d)
      val w = Window.partitionBy("pid")
        .orderBy(col("sim").desc, col("vec_id"))
      val top = pairs.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 10)
        .groupBy("pid")
        .agg(min(when(col("rel") === 1, col("rn"))).as("fr"),
          sum(col("rel")).as("n_hit"))
      val rtot = pairs.groupBy("pid").agg(sum(col("rel")).as("n_rel"))
      rtot.filter(col("n_rel") >= 1).join(top, "pid")
        .select(col("pid").as("probe_id"), col("n_rel"),
          round(coalesce(lit(1.0) / col("fr"), lit(0.0)), 4).as("mrr10"),
          round(col("n_hit").cast("double") /
            least(col("n_rel"), lit(10L)), 4).as("recall10"))
        .orderBy("probe_id")
    }),

    // Lexical retrieval under the gate (round 13): BM25 top-20 for a
    // fixed 3-term query over the inverted index (k1=1.2, b=0.75).
    // Engine-parity discipline: each term's contribution is aggregated
    // SEPARATELY (max-of-one per (token, doc) — the index is unique on
    // the pair) and the score adds the three in FIXED written order,
    // so IEEE summation order cannot differ between engines; ranking
    // and the top-k cut use the 4dp-ROUNDED score (ties to doc_id) so
    // a last-ulp ln() difference cannot flip the boundary. Plan: one
    // pushdown-pruned postings scan (3 tokens), one hash aggregate,
    // TakeOrdered — the posting-list probe shape that scales.
    "q_search_bm25" -> ((s, d) => {
      val terms = Seq("filter", "window", "hash")
      val docs = Tables.documents(s, d)
      val stats = docs
        .select(size(InvertedIndex.tokensCol("text")).cast("long").as("dl"))
        .agg(count(lit(1)).cast("double").as("n"), avg(col("dl")).as("avgdl"))
        .head
      val (n, avgdl) = (stats.getDouble(0), stats.getDouble(1))
      val contrib =
        log(lit(1.0) + (lit(n) - col("df") + lit(0.5)) / (col("df") + lit(0.5))) *
          (col("tf") * lit(2.2)) /
          (col("tf") + lit(1.2) * (lit(0.25) + lit(0.75) * col("dl") / lit(avgdl)))
      val termAggs = terms.map(t =>
        max(when(col("token") === t, contrib)).as(s"__c_$t"))
      val per = InvertedIndex.build(docs, "doc_id", "text")
        .filter(col("token").isin(terms: _*) && col("doc_id") =!= 0)
        .groupBy("doc_id")
        .agg(termAggs.head, termAggs.tail: _*)
      per
        .select(col("doc_id"),
          round(terms.map(t => coalesce(col(s"__c_$t"), lit(0.0)))
            .reduceLeft(_ + _), 4).as("score"))
        .orderBy(col("score").desc, col("doc_id"))
        .limit(20)
    }),

    // Hybrid retrieval under the gate (round 13): reciprocal-rank
    // fusion (c=60) of the BM25 ranking above with the embedding-
    // cosine ranking against probe vec 0 — HybridSearch's RRF shape
    // with both legs' ranks taken over 4dp-ROUNDED scores (ties to
    // id) so rank assignment is engine-exact, and the fused score a
    // fixed-order sum of exact small-integer reciprocals (bit-equal
    // across engines by construction). Both legs are bounded top-20
    // frames before any window — the MaxFuse discipline.
    "q_hybrid_rrf" -> ((s, d) => {
      val lex = queries("q_search_bm25")(s, d)
        .withColumn("r", row_number().over(
          Window.orderBy(col("score").desc, col("doc_id"))))
        .select(col("doc_id"), col("r").as("r_lex"))
      val emb = Tables.embeddings(s, d)
        .withColumn("e", col("embedding").cast("array<double>"))
      val probe = emb.filter(col("vec_id") === 0).select(col("e").as("p"))
      val sem = emb.filter(col("vec_id") =!= 0)
        .crossJoin(broadcast(probe))
        .select(col("vec_id").as("doc_id"),
          round(vdot(col("e"), col("p")) /
            (vnorm(col("e")) * vnorm(col("p"))), 4).as("sim"))
        .orderBy(col("sim").desc, col("doc_id"))
        .limit(20)
        .withColumn("r", row_number().over(
          Window.orderBy(col("sim").desc, col("doc_id"))))
        .select(col("doc_id"), col("r").as("r_sem"))
      lex.join(sem, Seq("doc_id"), "full_outer")
        .select(col("doc_id"),
          round(
            coalesce(lit(1.0) / (lit(60) + col("r_lex")), lit(0.0)) +
              coalesce(lit(1.0) / (lit(60) + col("r_sem")), lit(0.0)),
            6).as("rrf"),
          (col("r_lex").isNotNull.cast("int") +
            col("r_sem").isNotNull.cast("int")).as("n_lists"))
        .orderBy(col("rrf").desc, col("doc_id"))
        .limit(10)
    })
  )

  /** Shared probe/corpus scoring frame for the retrieval-eval queries
    * (q_ml_ndcg, q_ml_mrr): vec_id < 5 are probes, the rest the corpus;
    * sim is cosine ROUNDED to 4 dp before any ranking (near-ties become
    * exact ties broken by vec_id, so engine last-ulp drift cannot
    * reorder) and rel is binary same-label relevance. Probes ride a
    * broadcast nested loop over ONE corpus scan per consumer.
    */
  private def labeledProbePairs(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
    val probes = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("pid"), col("embedding").as("p"),
        col("label").as("pl"))
    emb.filter(col("vec_id") >= 5)
      .select(col("vec_id"), col("embedding").as("e"), col("label"))
      .crossJoin(broadcast(probes))
      .select(col("pid"), col("vec_id"),
        round(expr(cosPair("e", "p")), 4).as("sim"),
        when(col("label") === col("pl"), 1L).otherwise(0L).as("rel"))
  }

  /** DuckDB twin of [[cosPair]] (list_sum sums left-to-right, matching
    * the HOF accumulate order — the parity q_sim_cosine established).
    */
  private def cosPairDuck(u: String, v: String) =
    s"""list_sum(list_transform(range(1,65), i -> CAST($u[i] AS DOUBLE)*CAST($v[i] AS DOUBLE))) /
       |(sqrt(list_sum(list_transform($u, x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE)))) *
       | sqrt(list_sum(list_transform($v, x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE)))))""".stripMargin

  /** Shared BM25 CTE chain (mirrors InvertedIndex.build + the fixed
    * 3-term scorer in q_search_bm25 — identical literal structure so
    * IEEE op order matches).
    */
  private val bm25Cte =
    """toks AS (
      |  SELECT doc_id, list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), t -> t <> '') AS tk
      |  FROM documents),
      |stats AS (SELECT CAST(count(*) AS DOUBLE) AS n, avg(len(tk)) AS avgdl FROM toks),
      |post AS (
      |  SELECT token, doc_id, CAST(count(*) AS BIGINT) AS tf, CAST(max(dl) AS BIGINT) AS dl
      |  FROM (SELECT doc_id, unnest(tk) AS token, len(tk) AS dl FROM toks)
      |  GROUP BY token, doc_id),
      |postdf AS (SELECT *, count(*) OVER (PARTITION BY token) AS df FROM post),
      |contrib AS (
      |  SELECT doc_id, token,
      |    ln(1.0 + (s.n - df + 0.5) / (df + 0.5)) * (tf * 2.2)
      |      / (tf + 1.2 * (0.25 + 0.75 * dl / s.avgdl)) AS c
      |  FROM postdf, stats s
      |  WHERE token IN ('filter','window','hash') AND doc_id <> 0),
      |per AS (
      |  SELECT doc_id,
      |    max(CASE WHEN token = 'filter' THEN c END) AS c1,
      |    max(CASE WHEN token = 'window' THEN c END) AS c2,
      |    max(CASE WHEN token = 'hash' THEN c END) AS c3
      |  FROM contrib GROUP BY doc_id),
      |bm25 AS (
      |  SELECT doc_id, round(coalesce(c1, 0) + coalesce(c2, 0) + coalesce(c3, 0), 4) AS score
      |  FROM per ORDER BY score DESC, doc_id LIMIT 20)""".stripMargin

  val oracle: Map[String, String] = Map(
    "q_search_bm25" ->
      s"""WITH $bm25Cte
         |SELECT doc_id, score FROM bm25 ORDER BY score DESC, doc_id""".stripMargin,

    "q_hybrid_rrf" ->
      s"""WITH $bm25Cte,
         |lex AS (SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id) AS r_lex FROM bm25),
         |probe AS (SELECT embedding FROM embeddings WHERE vec_id = 0),
         |sem0 AS (
         |  SELECT b.vec_id AS doc_id,
         |    ROUND(list_sum(list_transform(range(1, 65),
         |      i -> CAST(b.embedding[i] AS DOUBLE) * CAST(p.embedding[i] AS DOUBLE)))
         |    / (sqrt(list_sum(list_transform(b.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
         |       * sqrt(list_sum(list_transform(p.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))), 4) AS sim
         |  FROM embeddings b, probe p WHERE b.vec_id <> 0
         |  ORDER BY sim DESC, doc_id LIMIT 20),
         |sem AS (SELECT doc_id, row_number() OVER (ORDER BY sim DESC, doc_id) AS r_sem FROM sem0),
         |f AS (
         |  SELECT coalesce(l.doc_id, s.doc_id) AS doc_id, l.r_lex, s.r_sem
         |  FROM lex l FULL OUTER JOIN sem s ON l.doc_id = s.doc_id)
         |SELECT doc_id,
         |  round(coalesce(1.0 / (60 + r_lex), 0) + coalesce(1.0 / (60 + r_sem), 0), 6) AS rrf,
         |  (CASE WHEN r_lex IS NOT NULL THEN 1 ELSE 0 END
         |    + CASE WHEN r_sem IS NOT NULL THEN 1 ELSE 0 END) AS n_lists
         |FROM f ORDER BY rrf DESC, doc_id LIMIT 10""".stripMargin,

    "q_sim_ann_batch" ->
      s"""WITH probes AS (
         |  SELECT vec_id AS probe_id, embedding AS p FROM embeddings WHERE vec_id < 8),
         |scored AS (
         |  SELECT probe_id, b.vec_id,
         |    ${cosPairDuck("b.embedding", "p")} AS sim_raw
         |  FROM embeddings b, probes WHERE b.vec_id >= 8),
         |top AS (
         |  SELECT probe_id, vec_id, sim_raw,
         |    ROW_NUMBER() OVER (PARTITION BY probe_id
         |                       ORDER BY sim_raw DESC, vec_id) AS rn
         |  FROM scored)
         |SELECT probe_id, vec_id, ROUND(sim_raw, 4) AS sim
         |FROM top WHERE rn <= 5 ORDER BY probe_id, sim DESC, vec_id""".stripMargin,

    "q_sim_ann_ivf" ->
      s"""WITH cents AS (
         |  SELECT vec_id AS cell, embedding AS ce FROM embeddings WHERE vec_id < 8),
         |corpus AS (
         |  SELECT vec_id, embedding AS e FROM embeddings WHERE vec_id >= 16),
         |probes AS (
         |  SELECT vec_id AS probe_id, embedding AS p FROM embeddings
         |  WHERE vec_id BETWEEN 8 AND 15),
         |assign AS (
         |  SELECT vec_id, cell, e FROM (
         |    SELECT c.vec_id, t.cell, c.e,
         |      ROW_NUMBER() OVER (PARTITION BY c.vec_id
         |        ORDER BY ${cosPairDuck("c.e", "t.ce")} DESC, t.cell) AS rn
         |    FROM corpus c CROSS JOIN cents t) WHERE rn = 1),
         |pcells AS (
         |  SELECT probe_id, cell, p FROM (
         |    SELECT pr.probe_id, t.cell, pr.p,
         |      ROW_NUMBER() OVER (PARTITION BY pr.probe_id
         |        ORDER BY ${cosPairDuck("pr.p", "t.ce")} DESC, t.cell) AS rn
         |    FROM probes pr CROSS JOIN cents t) WHERE rn <= 2),
         |scored AS (
         |  SELECT probe_id, a.vec_id, ${cosPairDuck("a.e", "pc.p")} AS sim_raw
         |  FROM pcells pc JOIN assign a ON a.cell = pc.cell),
         |top AS (
         |  SELECT probe_id, vec_id, sim_raw,
         |    ROW_NUMBER() OVER (PARTITION BY probe_id
         |                       ORDER BY sim_raw DESC, vec_id) AS rn
         |  FROM scored)
         |SELECT probe_id, vec_id, ROUND(sim_raw, 4) AS sim
         |FROM top WHERE rn <= 5 ORDER BY probe_id, sim DESC, vec_id""".stripMargin,

    "q_dedup_embed_banded" ->
      s"""WITH nb AS (
         |  SELECT $bandBitsSql AS bb FROM embeddings),
         |sig AS (
         |  SELECT vec_id, embedding AS e,
         |    array_to_string(list_transform(range(0, 4 * (SELECT bb FROM nb)), j ->
         |      CASE WHEN list_sum(list_transform(range(0,64),
         |        i -> CAST(e[i+1] AS DOUBLE) * $planeSqlDuck)) >= 0
         |      THEN '1' ELSE '0' END), '') AS s24
         |  FROM embeddings),
         |bands AS (
         |  SELECT vec_id, k AS band_id,
         |    substr(s24, CAST(k * (SELECT bb FROM nb) + 1 AS INT),
         |           (SELECT bb FROM nb)) AS bk
         |  FROM sig, unnest(range(0, 4)) AS t(k)),
         |cand AS (
         |  SELECT DISTINCT a.vec_id AS vec_id1, b.vec_id AS vec_id2
         |  FROM bands a JOIN bands b
         |    ON a.band_id = b.band_id AND a.bk = b.bk AND a.vec_id < b.vec_id),
         |pairs AS (
         |  SELECT vec_id1, vec_id2,
         |    ${cosPairDuck("x.embedding", "y.embedding")} AS sim
         |  FROM cand JOIN embeddings x ON x.vec_id = vec_id1
         |            JOIN embeddings y ON y.vec_id = vec_id2)
         |SELECT vec_id1, vec_id2, ROUND(sim, 4) AS sim
         |FROM pairs WHERE sim >= 0.4 ORDER BY vec_id1, vec_id2""".stripMargin,

    "q_agg_centroid" ->
      """SELECT CAST(label AS BIGINT) AS label, CAST(i AS BIGINT) AS pos,
        |  ROUND(AVG(CAST(embedding[i] AS DOUBLE)), 4) AS mean_v
        |FROM embeddings, unnest(range(1,65)) AS t(i)
        |GROUP BY label, i ORDER BY label, pos""".stripMargin,

    // Identical rounded-centroid model and rounded-before-compare
    // argmax as the Spark side; the window is the oracle's spelling of
    // the (sim, -label) struct max.
    "q_ml_confusion" ->
      """WITH c0 AS (SELECT label, i,
        |    ROUND(AVG(CAST(embedding[i] AS DOUBLE)), 4) AS m
        |  FROM embeddings, unnest(range(1, 65)) AS t(i) GROUP BY 1, 2),
        |cent AS (SELECT label AS clabel, list(m ORDER BY i) AS cv
        |  FROM c0 GROUP BY 1),
        |sc AS (SELECT e.vec_id, CAST(e.label AS BIGINT) AS tl,
        |    CAST(c.clabel AS BIGINT) AS clabel,
        |    ROUND(
        |      list_sum(list_transform(range(1, 65),
        |        i -> CAST(e.embedding[i] AS DOUBLE) * c.cv[i])) /
        |      (sqrt(list_sum(list_transform(e.embedding,
        |        x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) *
        |       sqrt(list_sum(list_transform(c.cv, x -> x * x)))), 4)
        |      AS sim
        |  FROM embeddings e, cent c),
        |p AS (SELECT tl, clabel AS pred,
        |    ROW_NUMBER() OVER (PARTITION BY vec_id
        |      ORDER BY sim DESC, clabel) AS rn
        |  FROM sc)
        |SELECT tl AS label, pred, CAST(COUNT(*) AS BIGINT) AS n
        |FROM p WHERE rn = 1 GROUP BY 1, 2 ORDER BY label, pred""".stripMargin,

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
        |FROM pairs ORDER BY sim DESC, vec_id1, vec_id2 LIMIT 20""".stripMargin,

    "q_ml_ndcg" ->
      s"""WITH probes AS (
         |  SELECT vec_id AS pid, embedding AS p, label AS pl
         |  FROM embeddings WHERE vec_id < 5),
         |pairs AS (
         |  SELECT pid, r.vec_id,
         |    ROUND(${cosPairDuck("r.embedding", "p")}, 4) AS sim,
         |    CASE WHEN r.label = pl THEN 1 ELSE 0 END AS rel
         |  FROM embeddings r, probes WHERE r.vec_id >= 5),
         |ranked AS (
         |  SELECT pid, rel,
         |    ROW_NUMBER() OVER (PARTITION BY pid
         |      ORDER BY sim DESC, vec_id) AS rn
         |  FROM pairs),
         |dcg AS (
         |  SELECT pid,
         |    SUM(CASE WHEN rel = 1 THEN CAST(1.0 AS DOUBLE) / log2(rn + 1)
         |        ELSE CAST(0.0 AS DOUBLE) END) AS dcg
         |  FROM ranked WHERE rn <= 10 GROUP BY pid),
         |rtot AS (
         |  SELECT pid, CAST(SUM(rel) AS BIGINT) AS n_rel
         |  FROM pairs GROUP BY pid),
         |idcg AS (
         |  SELECT pid, SUM(CAST(1.0 AS DOUBLE) / log2(i + 1)) AS idcg
         |  FROM (SELECT pid, UNNEST(range(1, LEAST(n_rel, 10) + 1)) AS i
         |        FROM rtot WHERE n_rel >= 1) GROUP BY pid)
         |SELECT dcg.pid AS probe_id, n_rel, ROUND(dcg / idcg, 4) AS ndcg10
         |FROM dcg JOIN rtot USING (pid) JOIN idcg USING (pid)
         |ORDER BY probe_id""".stripMargin,

    "q_ml_mrr" ->
      s"""WITH probes AS (
         |  SELECT vec_id AS pid, embedding AS p, label AS pl
         |  FROM embeddings WHERE vec_id < 5),
         |pairs AS (
         |  SELECT pid, r.vec_id,
         |    ROUND(${cosPairDuck("r.embedding", "p")}, 4) AS sim,
         |    CASE WHEN r.label = pl THEN 1 ELSE 0 END AS rel
         |  FROM embeddings r, probes WHERE r.vec_id >= 5),
         |ranked AS (
         |  SELECT pid, rel,
         |    ROW_NUMBER() OVER (PARTITION BY pid
         |      ORDER BY sim DESC, vec_id) AS rn
         |  FROM pairs),
         |rtot AS (
         |  SELECT pid, CAST(SUM(rel) AS BIGINT) AS n_rel
         |  FROM pairs GROUP BY pid),
         |top AS (
         |  SELECT pid, MIN(CASE WHEN rel = 1 THEN rn END) AS fr,
         |    CAST(SUM(rel) AS BIGINT) AS n_hit
         |  FROM ranked WHERE rn <= 10 GROUP BY pid)
         |SELECT r.pid AS probe_id, n_rel,
         |  ROUND(COALESCE(CAST(1.0 AS DOUBLE) / fr, 0.0), 4) AS mrr10,
         |  ROUND(CAST(n_hit AS DOUBLE) / LEAST(n_rel, 10), 4) AS recall10
         |FROM rtot r JOIN top USING (pid)
         |WHERE n_rel >= 1 ORDER BY probe_id""".stripMargin,

    "q_ml_calibration" ->
      s"""WITH probes AS (
         |  SELECT vec_id AS pid, embedding AS p, label AS pl
         |  FROM embeddings WHERE vec_id < 5),
         |pairs AS (
         |  SELECT pid, r.vec_id,
         |    ROUND(${cosPairDuck("r.embedding", "p")}, 4) AS sim,
         |    CASE WHEN r.label = pl THEN 1 ELSE 0 END AS rel
         |  FROM embeddings r, probes WHERE r.vec_id >= 5),
         |binned AS (
         |  SELECT GREATEST(0, LEAST(9,
         |      CAST(FLOOR((sim + 1) * 5) AS BIGINT))) AS bin, sim, rel
         |  FROM pairs)
         |SELECT bin, CAST(COUNT(*) AS BIGINT) AS n_pairs,
         |  ROUND(SUM(sim) / COUNT(*), 4) AS mean_sim,
         |  CAST(SUM(rel) AS BIGINT) AS n_pos,
         |  ROUND(CAST(SUM(rel) AS DOUBLE) / COUNT(*), 4) AS pos_rate
         |FROM binned GROUP BY bin ORDER BY bin""".stripMargin,

    "q_embed_quantize" ->
      """WITH s AS (
        |  SELECT vec_id, embedding,
        |    list_max(list_transform(embedding,
        |      x -> abs(CAST(x AS DOUBLE)))) / 127 AS scale
        |  FROM embeddings),
        |qz AS (
        |  SELECT vec_id,
        |    list_transform(embedding, x ->
        |      CASE WHEN scale = 0 THEN 0
        |        ELSE GREATEST(-127, LEAST(127,
        |          CAST(ROUND(CAST(x AS DOUBLE) / scale) AS BIGINT))) END) AS q
        |  FROM s)
        |SELECT vec_id, CAST(list_sum(q) AS BIGINT) AS sum_q,
        |  CAST(len(list_filter(q, v -> abs(v) = 127)) AS BIGINT) AS n_sat
        |FROM qz ORDER BY vec_id""".stripMargin
  )
}
