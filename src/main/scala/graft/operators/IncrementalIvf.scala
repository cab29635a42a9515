package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.plans.CosineSimilarity

/** Incremental IVF maintenance — the VECTOR-retrieval freshness twin
  * of [[IncrementalIndex]]: new embeddings arrive daily and the ANN
  * index must absorb them without re-clustering the corpus. Standard
  * FAISS practice applies: the coarse quantizer (the k centroids) is
  * trained ONCE and held fixed between explicit retrains; adds are a
  * pure map-side nearest-centroid assignment into the fixed cells.
  * Under a fixed quantizer, incremental maintenance is EXACT — not an
  * approximation on top of an approximation — which is what the spec
  * pins: search over the maintained index equals the same search over
  * a from-scratch assignment of the live vectors to the same
  * centroids.
  *
  * Layout (the [[IncrementalIndex]] segment recipe, member-side):
  *
  *   root/centroids/              the fixed quantizer (cell, c)
  *   root/members/seq=<b>/cell=<c>/   batch b's assignments
  *   root/vecs/seq=<b>/           changelog (vec_id, op), written LAST
  *
  * A vector's live row is the member row matching its newest changelog
  * seq — updates that MOVE a vector between cells need no in-place
  * edit (the old cell's row is tombstoned by the fold), deletes fold
  * out the same way, and a crashed batch leaves its member segment
  * invisible. Search prunes to the probed cells at the PARTITION level
  * (`cell=` dirs), folds liveness over the thin changelog, and never
  * scores the corpus outside the probed cells. Retrain = rebuild to a
  * fresh root (quantizer drift is a bulk decision, not a delta one);
  * log growth is bounded by the marker-published compaction recipe
  * [[IncrementalIndex.compact]] implements — same fold, member-side.
  */
object IncrementalIvf {

  private def latestVecVersions(spark: SparkSession,
      root: String): DataFrame = {
    val w = Window.partitionBy("vec_id").orderBy(col("seq").desc)
    spark.read.parquet(s"$root/vecs")
      .withColumn("seq", col("seq").cast("long"))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select("vec_id", "seq", "op")
  }

  /** Train the fixed quantizer from the initial corpus and land batch
    * 0. `vectors` carries (vec_id, e: array<double>).
    */
  def initialize(spark: SparkSession, vectors: DataFrame, root: String,
      k: Int, iters: Int): Unit = {
    val model = IvfIndex.buildFrom(spark, vectors, k, iters)
    model.centroids.write.mode("overwrite").parquet(s"$root/centroids")
    applyBatch(spark, root,
      vectors.withColumn("op", lit("I")), 0L)
  }

  /** Apply one CDC batch of (vec_id, e, op): I/U assigns the vector's
    * new embedding into its nearest fixed cell, D removes it (e
    * ignored). `batchId` strictly greater than every prior batch's.
    */
  def applyBatch(spark: SparkSession, root: String, batch: DataFrame,
      batchId: Long): Unit = {
    val centroids = spark.read.parquet(s"$root/centroids")
    val staged = batch.select(col("vec_id"), col("e"), col("op")).persist()
    try {
      val assigned = IvfIndex.assignTo(
        staged.filter(col("op") =!= "D").select("vec_id", "e"), centroids)
      assigned.write.mode("overwrite").partitionBy("cell")
        .parquet(s"$root/members/seq=$batchId")
      // changelog commits LAST (torn-write discipline)
      staged.select("vec_id", "op").write.mode("overwrite")
        .parquet(s"$root/vecs/seq=$batchId")
    } finally staged.unpersist(blocking = false)
  }

  /** The live member set — (vec_id, e, cell), each vector exactly once
    * at its newest assignment. `cellFilter` prunes the member scan to
    * the named cells BEFORE the liveness fold (partition dirs).
    */
  def liveMembers(spark: SparkSession, root: String,
      cellFilter: Option[Seq[Int]] = None): DataFrame = {
    val raw = spark.read.parquet(s"$root/members")
      .withColumn("seq", col("seq").cast("long"))
    val pruned = cellFilter.fold(raw)(cs => raw.filter(col("cell").isin(cs: _*)))
    val live = latestVecVersions(spark, root)
      .filter(col("op") =!= "D").select("vec_id", "seq")
    pruned.join(live, Seq("vec_id", "seq"))
      .select("vec_id", "e", "cell")
  }

  /** Top-k by cosine against a literal probe vector: rank the k fixed
    * centroids (k rows — the cheap step IVF exists for), prune the
    * member scan to the `nprobe` best cells, fold liveness, score only
    * inside. The ≤ nprobe cell-id manifest is driver-side by design
    * (the touched-bucket discipline).
    */
  def search(spark: SparkSession, root: String, probe: Seq[Double],
      topK: Int, nprobe: Int): DataFrame = {
    CosineSimilarity.register(spark)
    val p = array(probe.map(lit): _*)
    val ranked = spark.read.parquet(s"$root/centroids")
      .withColumn("__p", p)
      .withColumn("cell_sim", expr("cosine_sim(c, __p)"))
      .orderBy(col("cell_sim").desc, col("cell"))
      .limit(nprobe)
      .select("cell").collect().map(_.getInt(0)).toSeq
    liveMembers(spark, root, Some(ranked))
      .withColumn("__p", p)
      .withColumn("sim", round(expr("cosine_sim(e, __p)"), 4))
      .orderBy(col("sim").desc, col("vec_id"))
      .limit(topK)
      .select("vec_id", "sim")
  }
}
