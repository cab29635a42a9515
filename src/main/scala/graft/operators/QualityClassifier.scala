package graft.operators

import org.apache.spark.ml.classification.{LogisticRegression, LogisticRegressionModel}
import org.apache.spark.ml.feature.{HashingTF, VectorAssembler}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** LEARNED document-quality scoring — the GPT-3/CCNet curation recipe:
  * instead of (or on top of) hand-set heuristic bands
  * (q_quality_filter), train a linear classifier to separate a
  * high-quality reference set from the raw crawl and keep documents
  * the model scores reference-like. Here the weak labels come from the
  * engine's own heuristic bands, so the classifier GENERALIZES the
  * bands into a smooth score a pipeline can threshold or
  * importance-sample on (the GPT-3 paper's Pareto-sampling trick needs
  * exactly this scalar).
  *
  * Scale shape:
  *  - features are hashed token counts (`HashingTF`, fixed 2^k dims):
  *    a pure MAP-SIDE projection — no vocabulary build, no shuffle, no
  *    driver state, which is why production quality classifiers hash;
  *  - training is MLlib's distributed L-BFGS: per iteration one
  *    partial-aggregated gradient pass over the cached training frame
  *    (tree aggregation, no corpus-sized shuffle), iterations bounded
  *    by `maxIter`;
  *  - scoring broadcasts the coefficient vector inside the model and
  *    is again map-side — the 100 TB sweep shape.
  *
  * Determinism: HashingTF is a pure hash; L-BFGS over a deterministic
  * frame with fixed maxIter/tol is deterministic (no sampling, no
  * RNG) — QualityClassifierSpec pins identical coefficients across
  * retrains and identical scores across partitionings.
  */
object QualityClassifier {

  final case class Model(lr: LogisticRegressionModel, numFeatures: Int)

  /** Tokens shared with the text-stats family (whitespace split). */
  private def toks(textCol: String) =
    expr(s"filter(split($textCol, ' '), t -> t <> '')")

  /** Hashed token counts PLUS document-shape features (length,
    * length², alphabetic ratio) — the CCNet-style feature set. The
    * quadratic length term matters: quality bands are INTERVALS in doc
    * length ("too short" and "too long" are both low-quality), which
    * no linear function of monotone count features can express; with
    * length² a logistic model carves the band exactly.
    */
  private def featurize(docs: DataFrame, textCol: String,
      numFeatures: Int): DataFrame = {
    val tf = new HashingTF()
      .setInputCol("__toks").setOutputCol("__tf")
      .setNumFeatures(numFeatures)
    val shaped = tf.transform(docs.withColumn("__toks", toks(textCol)))
      .withColumn("__nt", size(col("__toks")).cast("double"))
      .withColumn("__nt2", col("__nt") * col("__nt"))
      .withColumn("__alpha",
        coalesce(
          length(regexp_replace(col(textCol), "[^a-z]", "")).cast("double") /
            length(col(textCol)), lit(0.0)))
    new VectorAssembler()
      .setInputCols(Array("__tf", "__nt", "__nt2", "__alpha"))
      .setOutputCol("features")
      .transform(shaped)
  }

  /** The engine's heuristic quality verdict as a weak label —
    * q_quality_filter's published bands (token count in [20, 90],
    * alpha ratio ≥ 0.81).
    */
  def heuristicLabel(textCol: String) =
    (size(toks(textCol)).between(20, 90) &&
      // coalesce mirrors featurize's __alpha: an empty text makes the
      // division NULL → NULL label → LogisticRegression.fit throws.
      coalesce(
        length(regexp_replace(col(textCol), "[^a-z]", "")).cast("double") /
          length(col(textCol)), lit(0.0)) >= 0.81).cast("double")

  /** Train on `docs` with a 0/1 double `labelCol`. */
  def train(docs: DataFrame, textCol: String, labelCol: String,
      numFeatures: Int = 1 << 9, maxIter: Int = 100,
      regParam: Double = 1e-5): Model = {
    val lr = new LogisticRegression()
      .setFeaturesCol("features").setLabelCol(labelCol)
      .setMaxIter(maxIter).setRegParam(regParam).setStandardization(true)
    Model(lr.fit(featurize(docs, textCol, numFeatures)), numFeatures)
  }

  /** Map-side scoring: adds `quality_score` (P[label = 1]). The
    * probability extraction goes through MLlib's `vector_to_array`
    * (a native expression), not a Scala UDF — same no-UDF hot-path
    * discipline as the contract queries.
    */
  def score(docs: DataFrame, textCol: String, model: Model): DataFrame = {
    val scored = model.lr
      .setPredictionCol("__pred").setRawPredictionCol("__raw")
      .setProbabilityCol("__prob")
      .transform(featurize(docs, textCol, model.numFeatures))
    scored
      .withColumn("quality_score",
        org.apache.spark.ml.functions.vector_to_array(col("__prob"))
          .getItem(1))
      .drop("__toks", "__tf", "__nt", "__nt2", "__alpha", "features",
        "__pred", "__raw", "__prob")
  }

  /** Exact AUC of `scoreCol` against 0/1 `labelCol` — the Mann–Whitney
    * rank form with average ranks on ties, computed at SCALE the same
    * way as q_stats_mwu: collapse to one row per distinct score (the
    * tie groups), [[PrefixSum.globalCumsum]] for the cumulative
    * position (two-phase bucket decomposition — never a single-task
    * global rank window over the scored corpus), then one aggregate:
    * AUC = (ΣR₊ − n₊(n₊+1)/2) / (n₊ n₋), with 2·ΣR₊ kept integral via
    * the doubled-rank-sum identity.
    */
  def auc(scored: DataFrame, scoreCol: String, labelCol: String): Double = {
    val c = scored.groupBy(col(scoreCol).as("v"))
      .agg(
        sum(when(col(labelCol) === 1.0, 1L).otherwise(0L)).as("cp"),
        sum(when(col(labelCol) === 1.0, 0L).otherwise(1L)).as("cn"))
    val r = PrefixSum.globalCumsum(c, "v", Seq("cp", "cn"))
      .select(col("cp"), col("cn"),
        (col("__cw_cp") + col("__cw_cn")).as("cwa"))
      .agg(
        sum(col("cp") * (lit(2L) * col("cwa")
          - (col("cp") + col("cn")) + lit(1L))).as("r2"),
        sum(col("cp")).as("np"), sum(col("cn")).as("nn"))
      .head
    val (r2, np, nn) = (r.getLong(0), r.getLong(1), r.getLong(2))
    require(np > 0 && nn > 0, s"AUC needs both classes: np=$np nn=$nn")
    (r2.toDouble - np.toDouble * (np + 1)) / (2.0 * np * nn)
  }

  /** Persist a trained model (MLlib's own writer for the LR half plus
    * the hashing width, which scoring must reproduce exactly) — the
    * artifact a production refresh loads so every delta batch is
    * judged by the SAME frozen classifier ([[CorpusRefresh]]'s
    * retrain-is-a-full-recurate discipline).
    */
  def save(spark: SparkSession, model: Model, path: String): Unit = {
    model.lr.write.overwrite().save(s"$path/lr")
    val p = new org.apache.hadoop.fs.Path(s"$path/num_features")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write(model.numFeatures.toString.getBytes("UTF-8"))
    finally out.close()
  }

  /** Load a [[save]]d model. */
  def load(spark: SparkSession, path: String): Model = {
    val p = new org.apache.hadoop.fs.Path(s"$path/num_features")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // read-fully: a short read would truncate the hashing width and
    // silently mis-score every doc
    val nf = SegmentLog.readSmallFile(fs, p).trim.toInt
    Model(LogisticRegressionModel.load(s"$path/lr"), nf)
  }

  /** End-to-end over the documents table: weak-label with the
    * heuristic bands, train on an md5-split train set, score
    * everything; returns (model, scored frame incl. `label` and
    * `split`).
    */
  def trainAndScore(spark: SparkSession, dir: String,
      numFeatures: Int = 1 << 9): (Model, DataFrame) = {
    val docs = Tables.documents(spark, dir)
      .withColumn("label", heuristicLabel("text"))
      .withColumn("split",
        when(md5(col("doc_id").cast("string").cast("binary")) < "cc",
          "train").otherwise("heldout"))
    val model = train(docs.filter(col("split") === "train"), "text", "label",
      numFeatures)
    (model, score(docs, "text", model))
  }
}
