package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Product quantization for embedding similarity at 100 TB
  * (SURVEY.md §2.12 scale path — the memory-compression companion to
  * [[IvfIndex]]'s cell pruning; FAISS's IVFADC composes exactly these
  * two).
  *
  * PQ splits each D-dim vector into M contiguous subvectors and
  * k-means-quantizes every subspace independently to `ksub` centroids,
  * so a vector stores as M small codes (here 64×4 bytes → 8 codes —
  * a 32× corpus-memory cut) and approximate inner products come from
  * M table lookups instead of D multiplies (ADC: asymmetric distance
  * computation — the query stays exact, only the corpus is coded).
  *
  * Spark-first shapes, same discipline as IvfIndex:
  *  - TRAIN: each Lloyd step is one broadcast of the M×ksub codebook
  *    (tiny) + one groupBy(subspace, code) mean — per-subspace k-means
  *    runs for ALL subspaces in the same two jobs, never M sequential
  *    fits, and never an all-pairs product.
  *  - ENCODE: map-side argmin against the broadcast codebook — the
  *    corpus shuffles nothing.
  *  - SEARCH: the probe's M×ksub dot-product table broadcasts;
  *    scoring is a map-side lookup-sum over each vector's codes plus
  *    one top-k — the corpus again shuffles nothing.
  *
  * Deterministic by construction (no RNG, the q_sim_lsh/IvfIndex
  * discipline): subspace codebooks seed from the `ksub` lowest
  * vec_ids' subvectors and run a FIXED iteration count, so builds
  * reproduce across partitionings and task retries. Vectors are
  * unit-normalized at load, making dot ≡ cosine — the ADC sum then
  * approximates exactly the similarity the exact operators rank by.
  * Not a contract query (quantization error is approximate by
  * construction, so no exact cross-engine oracle exists);
  * ProductQuantizerSpec pins determinism, the code-width compression
  * claim, and recall@10 against brute-force cosine.
  */
object ProductQuantizer {

  /** A trained quantizer: `codebook` is (sub, code, c: array<double>)
    * with M×ksub rows; `codes` is (vec_id, codes: array<int>) with one
    * entry per corpus vector.
    */
  final case class PqModel(codebook: DataFrame, codes: DataFrame)

  private val dotSql =
    "aggregate(zip_with(%s, %s, (x, y) -> x * y), 0D, (a, v) -> a + v)"
  private val l2Sql =
    "aggregate(zip_with(%s, %s, (x, y) -> (x - y) * (x - y)), 0D, (a, v) -> a + v)"

  /** Unit-normalize + split an arbitrary (vec_id, e) frame into M
    * contiguous subvectors: (vec_id, sub, sv) — the frame-based core
    * shared by the corpus-table path, [[trainFrom]] and [[encode]].
    * Normalization lives HERE so training, encoding and the ADC
    * tables always see the same geometry (dot ≡ cosine).
    */
  private def subvectorsOf(emb: DataFrame, m: Int): DataFrame = {
    val unit = emb
      .withColumn("n", expr(s"sqrt(${dotSql.format("e", "e")})"))
      .select(col("vec_id"), expr("transform(e, x -> x / n)").as("e"))
    val dsub = s"(size(e) div $m)"
    unit.select(col("vec_id"),
        explode(expr(s"transform(sequence(0, ${m - 1}), " +
          s"s -> struct(s as sub, slice(e, s * $dsub + 1, $dsub) as sv))"))
          .as("x"))
      .select(col("vec_id"), col("x.sub").as("sub"), col("x.sv").as("sv"))
  }

  /** Unit-normalized corpus subvectors: (vec_id, sub, sv). */
  private def subvectors(spark: SparkSession, dir: String, m: Int)
      : DataFrame =
    subvectorsOf(
      Tables.embeddings(spark, dir)
        .select(col("vec_id"),
          col("embedding").cast("array<double>").as("e"))
        .repartition(spark.sparkContext.defaultParallelism, col("vec_id")),
      m)

  /** Argmin-L2 code per (vec_id, sub) against a broadcast codebook —
    * ties break to the smallest code, so assignment is a function of
    * the values alone.
    */
  private def assign(sv: DataFrame, codebook: DataFrame): DataFrame =
    sv.join(broadcast(codebook), "sub")
      .withColumn("d", expr(l2Sql.format("sv", "c")))
      .withColumn("rn", row_number().over(
        Window.partitionBy("vec_id", "sub")
          .orderBy(col("d"), col("code"))))
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("sub"), col("sv"), col("code"))

  /** The per-subspace Lloyd loop over an already-checkpointed
    * subvector frame — seed from the `ksub` lowest vec_ids, fixed
    * `iters`, empty codes keep their previous centroid. Returns the
    * checkpointed (sub, code, c) codebook.
    */
  private def lloyd(sv: DataFrame, ksub: Int, iters: Int): DataFrame = {
    require(ksub <= 4096,
      s"PQ ksub=$ksub: the single-partition seed window is only safe small")
    // Deterministic seed: the ksub lowest vec_ids' subvectors become
    // codes 0..ksub-1 IN EVERY subspace. The no-partition-by-sub
    // window is safe for the same reason as IvfIndex's: it runs over
    // m × ksub rows only (the join against the tiny seed-id list).
    var codebook = sv
      .join(broadcast(sv.select(col("vec_id")).distinct()
        .orderBy("vec_id").limit(ksub)), "vec_id")
      .withColumn("code", row_number().over(
        Window.partitionBy("sub").orderBy("vec_id")) - 1)
      .select(col("sub"), col("code"), col("sv").as("c"))
      .transform(graft.Materialize.checkpoint)
    var i = 0
    while (i < iters) {
      // Lloyd step for ALL subspaces at once: assign (broadcast join)
      // then per-(sub, code) position-wise mean. An empty code keeps
      // its previous centroid (left join + coalesce) so the codebook
      // never shrinks mid-train.
      val means = assign(sv, codebook)
        .select(col("sub"), col("code"), posexplode(col("sv")).as(Seq("pos", "v")))
        .groupBy("sub", "code", "pos").agg(avg("v").as("mv"))
        .groupBy("sub", "code")
        .agg(array_sort(collect_list(struct(col("pos"), col("mv")))).as("pm"))
        .select(col("sub"), col("code"), expr("transform(pm, x -> x.mv)").as("cNew"))
      val prev = codebook
      codebook = graft.Materialize.checkpoint(
        prev.join(means, Seq("sub", "code"), "left")
          .select(col("sub"), col("code"),
            coalesce(col("cNew"), col("c")).as("c")))
      graft.Materialize.release(prev)
      i += 1
    }
    codebook
  }

  /** Train per-subspace codebooks over an arbitrary (vec_id,
    * e: array<double>) frame — the quantizer an INCREMENTAL consumer
    * freezes at init time ([[IncrementalIvf.initializeCoded]]).
    * Returns the (sub, code, c) codebook (checkpointed; release via
    * [[graft.Materialize]] once persisted).
    */
  def trainFrom(spark: SparkSession, emb: DataFrame, m: Int = 8,
      ksub: Int = 16, iters: Int = 4): DataFrame = {
    val sv = graft.Materialize.checkpoint(subvectorsOf(emb, m))
    val codebook = lloyd(sv, ksub, iters)
    graft.Materialize.release(sv)
    codebook
  }

  /** Encode an arbitrary (vec_id, e) frame against a FROZEN codebook:
    * (vec_id, codes array<int>) — the map-side argmin pass an
    * incremental add runs per batch. `m` must match the codebook's
    * subspace count.
    */
  def encode(emb: DataFrame, codebook: DataFrame, m: Int): DataFrame =
    assign(subvectorsOf(emb, m), codebook)
      .groupBy("vec_id")
      .agg(array_sort(collect_list(struct(col("sub"), col("code")))).as("sc"))
      .select(col("vec_id"), expr("transform(sc, x -> x.code)").as("codes"))

  /** Reconstruction-fit statistics of an arbitrary (vec_id, e) frame
    * under a FROZEN codebook: ONE row (n, fit_sum), where `fit_sum`
    * accumulates each vector's cosine against its own PQ
    * reconstruction — cos(v, r) = Σⱼ dot(svⱼ, cⱼ) / √(Σⱼ |cⱼ|²) for
    * unit-normalized v (the geometry [[subvectorsOf]] fixes). This is
    * the quantization-error monitor a CODED deployment can afford: the
    * index stores codes, never vectors, so fit must be measured at
    * WRITE time while the batch still carries its embeddings
    * ([[IncrementalIvf.applyBatchCoded]] logs one such row per batch;
    * [[IncrementalIvf.retrainSignalCoded]] compares recent batches to
    * the training-time baseline). Map-side except the per-vector
    * partial-sum aggregate; the final row is the only driver value.
    */
  def reconFitStats(emb: DataFrame, codebook: DataFrame, m: Int)
      : DataFrame =
    assign(subvectorsOf(emb, m), codebook)
      .join(broadcast(codebook), Seq("sub", "code"))
      .select(col("vec_id"),
        expr(dotSql.format("sv", "c")).as("d"),
        expr(dotSql.format("c", "c")).as("c2"))
      .groupBy("vec_id")
      .agg(sum("d").as("d"), sum("c2").as("c2"))
      .select(col("vec_id"),
        (col("d") / sqrt(greatest(col("c2"), lit(1e-300)))).as("fit"))
      .agg(count(lit(1)).as("n"), sum("fit").as("fit_sum"))

  /** The probe's ADC lookup table for a LITERAL query vector
    * (normalized here with the same geometry as the corpus): one
    * (sub, lut) row per subspace, lut = the ksub partial dots —
    * m × ksub doubles, broadcastable at any corpus size.
    */
  def adcLut(codebook: DataFrame, probe: Seq[Double], m: Int): DataFrame = {
    val n = math.sqrt(probe.map(x => x * x).sum)
    val unit = probe.map(_ / n)
    val dsub = unit.size / m
    val spark = codebook.sparkSession
    import spark.implicits._
    val probeDF = (0 until m)
      .map(s => (s, unit.slice(s * dsub, (s + 1) * dsub)))
      .toDF("sub", "qv")
    codebook.join(broadcast(probeDF), "sub")
      .select(col("sub"), col("code"),
        expr(dotSql.format("qv", "c")).as("pdot"))
      .groupBy("sub")
      .agg(array_sort(collect_list(struct(col("code"), col("pdot")))).as("cp"))
      .select(col("sub"), expr("transform(cp, x -> x.pdot)").as("lut"))
  }

  /** [[adcLut]] for a whole PROBE SET in one frame: `probes` is
    * (probe_id, e — raw, normalized here with the corpus geometry,
    * the same left-fold norm arithmetic as the single-probe path), the
    * result one (probe_id, sub, lut) row per probe × subspace —
    * |probes| × m × ksub doubles, broadcastable for any bounded probe
    * batch. The per-probe rows are value-identical to [[adcLut]]'s.
    */
  def adcLutBatch(codebook: DataFrame, probes: DataFrame,
      m: Int): DataFrame = {
    val unit = probes
      .withColumn("n", expr(s"sqrt(${dotSql.format("e", "e")})"))
      .select(col("probe_id"), expr("transform(e, x -> x / n)").as("e"))
    val dsub = s"(size(e) div $m)"
    val probeSub = unit.select(col("probe_id"),
        explode(expr(s"transform(sequence(0, ${m - 1}), " +
          s"s -> struct(s as sub, slice(e, s * $dsub + 1, $dsub) as qv))"))
          .as("x"))
      .select(col("probe_id"), col("x.sub").as("sub"), col("x.qv").as("qv"))
    codebook.join(broadcast(probeSub), "sub")
      .select(col("probe_id"), col("sub"), col("code"),
        expr(dotSql.format("qv", "c")).as("pdot"))
      .groupBy("probe_id", "sub")
      .agg(array_sort(collect_list(struct(col("code"), col("pdot"))))
        .as("cp"))
      .select(col("probe_id"), col("sub"),
        expr("transform(cp, x -> x.pdot)").as("lut"))
  }

  /** [[adcScoreCodes]] for a probe-tagged candidate frame
    * (probe_id, vec_id, codes) against a broadcast batched LUT
    * ([[adcLutBatch]]): (probe_id, vec_id, approx_sim) — each
    * candidate scored only against the probes that shortlisted it.
    */
  def adcScoreCodesBatch(codes: DataFrame, lut: DataFrame): DataFrame =
    codes
      .select(col("probe_id"), col("vec_id"),
        posexplode(col("codes")).as(Seq("sub", "code")))
      .join(broadcast(lut), Seq("probe_id", "sub"))
      .select(col("probe_id"), col("vec_id"),
        expr("element_at(lut, code + 1)").as("pdot"))
      .groupBy("probe_id", "vec_id")
      .agg(sum("pdot").as("approx_sim"))

  /** ADC scoring of a (vec_id, codes) frame against a broadcast
    * (sub, lut) table: m `element_at`s + one sum per candidate —
    * (vec_id, approx_sim).
    */
  def adcScoreCodes(codes: DataFrame, lut: DataFrame): DataFrame =
    codes
      .select(col("vec_id"), posexplode(col("codes")).as(Seq("sub", "code")))
      .join(broadcast(lut), "sub")
      .select(col("vec_id"),
        expr("element_at(lut, code + 1)").as("pdot"))
      .groupBy("vec_id")
      .agg(sum("pdot").as("approx_sim"))

  /** Train per-subspace codebooks and encode the corpus. */
  def build(spark: SparkSession, dir: String, m: Int = 8, ksub: Int = 16,
      iters: Int = 4): PqModel = {
    val sv = graft.Materialize.checkpoint(subvectors(spark, dir, m))
    val codebook = lloyd(sv, ksub, iters)
    val codes = graft.Materialize.checkpoint(
      assign(sv, codebook)
        .groupBy("vec_id")
        .agg(array_sort(collect_list(struct(col("sub"), col("code")))).as("sc"))
        .select(col("vec_id"), expr("transform(sc, x -> x.code)").as("codes")))
    graft.Materialize.release(sv)
    PqModel(codebook, codes)
  }

  /** ADC top-k: approximate cosine of every corpus vector against the
    * probe via M codebook lookups, then TakeOrderedAndProject. The
    * probe's distance TABLE (m × ksub partial dots) is built once and
    * broadcast — at scale the only per-corpus work is the map-side
    * lookup-sum over the codes column.
    */
  def searchAdc(spark: SparkSession, dir: String, model: PqModel,
      probeVecId: Long, k: Int, m: Int = 8): DataFrame =
    adcScores(spark, dir, model, model.codes, probeVecId, m)
      .orderBy(col("approx_sim").desc, col("vec_id"))
      .limit(k)

  /** ADC scoring of (a subset of) the coded corpus against one probe:
    * the probe's per-(subspace, code) partial dots collapse to one
    * lookup ARRAY per subspace (m × ksub doubles — broadcastable at
    * any corpus size), and each candidate costs m `element_at`s plus
    * a sum.
    */
  private def adcScores(spark: SparkSession, dir: String, model: PqModel,
      codes: DataFrame, probeVecId: Long, m: Int): DataFrame = {
    val probe = subvectors(spark, dir, m)
      .filter(col("vec_id") === probeVecId)
      .select(col("sub"), col("sv").as("qv"))
    val table = model.codebook.join(broadcast(probe), "sub")
      .select(col("sub"), col("code"),
        expr(dotSql.format("qv", "c")).as("pdot"))
      .groupBy("sub")
      .agg(array_sort(collect_list(struct(col("code"), col("pdot")))).as("cp"))
      .select(col("sub"), expr("transform(cp, x -> x.pdot)").as("lut"))
    adcScoreCodes(codes.filter(col("vec_id") =!= probeVecId), table)
  }

  /** IVFADC — [[IvfIndex]] composed with the quantizer, the FAISS
    * architecture: the IVF coarse cells prune the candidate set to
    * `nprobe` cells' members WITHOUT touching vectors or codes, ADC
    * scores only those members' codes, and the exact rerank reads only
    * the final `pool` full vectors. Per 100 TB query: nprobe/k of the
    * codes scanned (codes already 32× smaller than vectors), `pool`
    * full-vector reads, zero corpus shuffles.
    */
  def searchIvfAdc(spark: SparkSession, dir: String, model: PqModel,
      ivf: IvfIndex.IvfModel, probeVecId: Long, k: Int, pool: Int = 50,
      nprobe: Int = 4, m: Int = 8): DataFrame = {
    graft.plans.CosineSimilarity.register(spark)
    val probeE = ivf.assigned.filter(col("vec_id") === probeVecId)
      .select(col("e").as("p"))
    val probedCells = ivf.centroids.crossJoin(broadcast(probeE))
      .withColumn("cell_sim", expr("cosine_sim(c, p)"))
      .orderBy(col("cell_sim").desc, col("cell"))
      .limit(nprobe)
      .select("cell")
    val candCodes = model.codes.join(
      ivf.assigned.join(broadcast(probedCells), "cell").select("vec_id"),
      "vec_id")
    val shortlist = adcScores(spark, dir, model, candCodes, probeVecId, m)
      .orderBy(col("approx_sim").desc, col("vec_id"))
      .limit(pool)
      .select("vec_id")
    val emb = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("e"))
    val probe = emb.filter(col("vec_id") === probeVecId)
      .select(col("e").as("q"))
    emb.join(broadcast(shortlist), "vec_id")
      .crossJoin(broadcast(probe))
      .select(col("vec_id"), round(expr("cosine_sim(e, q)"), 4).as("sim"))
      .orderBy(col("sim").desc, col("vec_id"))
      .limit(k)
  }

  /** The production search shape: ADC shortlists a `pool`-sized
    * candidate set from the CODES ALONE (no full vectors touched),
    * then only the shortlist's full vectors are fetched for an exact
    * cosine rerank — at 100 TB the exact pass reads `pool` rows
    * instead of the corpus, which is the entire point of keeping the
    * codes 32× smaller than the vectors. Measured on the sf0.001
    * fixture (weakly-clustered synthetic embeddings, the hard case
    * for coarse quantizers): raw ADC recall@10 = 0.2 with the default
    * 8×16 codebook, but the top-50 pool already holds 0.7 of the true
    * top-10 — rerank recovers exactly that, at 1/10th the corpus
    * reads of brute force.
    */
  def searchRerank(spark: SparkSession, dir: String, model: PqModel,
      probeVecId: Long, k: Int, pool: Int = 50, m: Int = 8): DataFrame = {
    graft.plans.CosineSimilarity.register(spark)
    val shortlist = searchAdc(spark, dir, model, probeVecId, pool, m)
      .select("vec_id")
    val emb = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("e"))
    val probe = emb.filter(col("vec_id") === probeVecId)
      .select(col("e").as("q"))
    emb.join(broadcast(shortlist), "vec_id")
      .crossJoin(broadcast(probe))
      .select(col("vec_id"), round(expr("cosine_sim(e, q)"), 4).as("sim"))
      .orderBy(col("sim").desc, col("vec_id"))
      .limit(k)
  }
}
