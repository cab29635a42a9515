package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.plans.CosineSimilarity
import graft.sources.Tables

/** IVF-style approximate nearest-neighbor index (SURVEY.md §2.12 scale
  * path, complementing the hyperplane-LSH variant).
  *
  * Classic IVF: a coarse quantizer (k-means centroids) partitions the
  * corpus into cells; a query probes only the `nprobe` nearest cells.
  * Here the quantizer is Lloyd's algorithm with DETERMINISTIC seeding
  * (centroids initialized from fixed vec_ids) and a fixed iteration
  * count, so index builds are reproducible across partitionings — no
  * RNG, same discipline as the LSH hyperplanes.
  *
  * Scale shape: each Lloyd iteration is one broadcast (k centroids,
  * k ≪ corpus) + one groupBy(cell) — never an all-pairs product; search
  * scans only the probed cells' rows. Not a contract query (ANN recall
  * is approximate by construction, so there is no exact oracle); the
  * spec asserts recall against brute force and build determinism.
  */
object IvfIndex {

  /** The built index: member→cell assignments plus the final centroid
    * per cell — both needed at search time (centroids rank the cells
    * to probe; assignments bound the scan).
    */
  final case class IvfModel(assigned: DataFrame, centroids: DataFrame)

  /** Embeddings with their assigned cell id after `iters` Lloyd steps
    * over `k` centroids seeded from the `k` lowest vec_ids.
    */
  def assignCells(spark: SparkSession, dir: String, k: Int,
      iters: Int): DataFrame = build(spark, dir, k, iters).assigned

  /** Build the IVF index (deterministic; see class doc). */
  def build(spark: SparkSession, dir: String, k: Int,
      iters: Int): IvfModel = {
    CosineSimilarity.register(spark)
    val emb = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("e"))
      .repartition(spark.sparkContext.defaultParallelism, col("vec_id"))
    buildFrom(spark, emb, k, iters)
  }

  /** Nearest-centroid assignment — the quantizer step shared by the
    * Lloyd loop, search, and [[IncrementalIvf]]'s delta path: one
    * broadcast of the k centroids + a per-vector rank-1 (deterministic
    * cosine tie-break on cell). Input needs (vec_id, e).
    */
  def assignTo(vectors: DataFrame, centroids: DataFrame): DataFrame = {
    CosineSimilarity.register(vectors.sparkSession)
    vectors.crossJoin(broadcast(centroids))
      .withColumn("sim", expr("cosine_sim(e, c)"))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("vec_id")
          .orderBy(col("sim").desc, col("cell"))))
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("e"), col("cell"))
  }

  /** [[build]] over an arbitrary (vec_id, e: array<double>) frame. */
  def buildFrom(spark: SparkSession, emb: DataFrame, k: Int,
      iters: Int): IvfModel = {
    CosineSimilarity.register(spark)

    // Deterministic seed: the k lowest vec_ids become centroids 0..k-1.
    // GUARD: the no-partition Window below collapses its input to a
    // single partition — acceptable ONLY because it runs after
    // limit(k), so at most k rows (k ≪ corpus) ever pass through it.
    // Never lift this window above the limit.
    require(k <= 4096, s"IVF k=$k: the single-partition seed window is only safe for small k")
    var centroids = emb.orderBy("vec_id").limit(k)
      .orderBy("vec_id")
      .select(col("e").as("c"))
      .withColumn("cell", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy(monotonically_increasing_id())) - 1)

    var assigned: DataFrame = null
    var i = 0
    while (i < iters) {
      // Assign: nearest centroid by cosine (deterministic tiebreak on cell).
      assigned = assignTo(emb, centroids)
      // Update: mean vector per cell (position-wise).
      centroids = assigned
        .select(col("cell"), posexplode(col("e")).as(Seq("pos", "v")))
        .groupBy("cell", "pos").agg(avg(col("v")).as("m"))
        .groupBy("cell")
        .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("pm"))
        .select(col("cell"), expr("transform(pm, x -> x.m)").as("c"))
        .transform(graft.Materialize.checkpoint)
      i += 1
    }
    IvfModel(assigned, centroids)
  }

  /** Top-k neighbors of `probeVecId`: rank the k CENTROIDS against the
    * probe (k rows — the cheap step IVF exists for), then evaluate
    * member cosine only inside the `nprobe` best cells. The corpus
    * outside the probed cells is never scored.
    */
  def search(spark: SparkSession, dir: String, probeVecId: Long, topK: Int,
      k: Int = 16, iters: Int = 2, nprobe: Int = 4): DataFrame = {
    val model = build(spark, dir, k, iters)
    val cells = graft.Materialize.checkpoint(model.assigned)
    val probe = cells.filter(col("vec_id") === probeVecId)
      .select(col("e").as("p"))
    val probedCells = model.centroids
      .crossJoin(broadcast(probe))
      .withColumn("cell_sim", expr("cosine_sim(c, p)"))
      .orderBy(col("cell_sim").desc, col("cell"))
      .limit(nprobe)
      .select("cell")
    cells.join(broadcast(probedCells), "cell")
      .filter(col("vec_id") =!= probeVecId)
      .crossJoin(broadcast(probe))
      .select(col("vec_id"), round(expr("cosine_sim(e, p)"), 4).as("sim"))
      .orderBy(col("sim").desc, col("vec_id"))
      .limit(topK)
  }
}
