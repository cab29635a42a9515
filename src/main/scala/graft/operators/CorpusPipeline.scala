package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** The end-to-end corpus-curation flow every LLM data refresh runs,
  * composed from the engine's own building blocks into ONE auditable
  * pass: exact dedup → canonical-form dedup → MinHash near-dedup →
  * quality filter → language-ID tag → deterministic train/val/test
  * split. Stage definitions are shared with the contract queries
  * (same shingle SQL, same marker lexicon, same quality bands), so the
  * pipeline IS the composition of the audited operators, not a
  * re-implementation.
  *
  * Scale discipline, stage by stage:
  *  - every dedup stage reduces to a rank-1 window over a digest or
  *    signature (16-byte md5 / 8-component MinHash) — text never
  *    shuffles, partition keys are data-proportional, and cascading
  *    "survivor of the previous stage first" ordering lets ALL THREE
  *    dedup verdicts land in one flags frame without intermediate
  *    filters or joins;
  *  - the quality verdict is pure per-row arithmetic on the same frame;
  *  - the flags frame materializes ONCE ([[graft.Materialize]]) and
  *    feeds both outputs: the curated corpus (filter + broadcast-dict
  *    language argmax + md5 split tag, all map-side after one tiny
  *    dict join) and the per-stage accounting report (one aggregate —
  *    counts for every stage from the SAME pass, the audit trail a
  *    production refresh logs);
  *  - nothing in the pipeline ever enumerates pairs: the MinHash stage
  *    uses the signature-group collapse (identical signatures share
  *    every band), the q_dedup_minhash_keep discipline.
  */
object CorpusPipeline {

  /** Quality bands — q_quality_filter's published thresholds. */
  private val MinToks = 20
  private val MaxToks = 90
  private val MinAlpha = 0.81

  /** The one materialized flags pass shared by [[curate]] and
    * [[curateLearned]]: all three dedup keeper verdicts plus the
    * per-row quality inputs and the heuristic quality verdict.
    *
    * rank-1-among-survivors trick: partition by the stage's digest,
    * order PRIOR-stage survivors first then doc_id; the top row is the
    * group's keeper iff it survived the prior stage (a group whose
    * docs were all dropped earlier keeps nothing).
    */
  /** The per-doc MAP-SIDE flag inputs every dedup verdict is computed
    * from: (doc_id, lang, toks, n_toks, alpha_ratio, digest, norm_sig,
    * sg). Shared with [[CorpusRefresh]], whose delta path must stamp
    * arrivals with byte-identical keys or refresh ≢ full curate.
    */
  private[operators] def flagInputs(s: SparkSession,
      docs: DataFrame): DataFrame = {
    graft.plans.MinHashSignature.register(s)
    docs
      .select(col("doc_id"), col("lang"), col("text"),
        split(col("text"), " ").as("toks"))
      .repartition(s.sparkContext.defaultParallelism, col("doc_id"))
      .select(col("doc_id"), col("lang"), col("toks"),
        size(col("toks")).cast("long").as("n_toks"),
        (length(regexp_replace(col("text"), "[^a-z]", "")).cast("double") /
          length(col("text"))).as("alpha_ratio"),
        md5(col("text").cast("binary")).as("digest"),
        md5(array_join(array_sort(array_distinct(col("toks"))), " ")
          .cast("binary")).as("norm_sig"))
      .select(col("*"), expr(DedupExtras.shinglesSql).as("sh"))
      .select(col("doc_id"), col("lang"), col("toks"), col("n_toks"),
        col("alpha_ratio"), col("digest"), col("norm_sig"),
        expr("minhash_sig(sh)").as("sg"))
  }

  /** The heuristic quality band verdict as a column — shared with the
    * refresh path (per-row, so a refresh recomputes it locally).
    */
  private[operators] def qualityBand =
    col("n_toks").between(MinToks, MaxToks) &&
      col("alpha_ratio") >= MinAlpha

  private def dedupFlags(s: SparkSession, dir: String): DataFrame = {
    def keeper(part: String, prior: org.apache.spark.sql.Column) =
      row_number().over(Window.partitionBy(col(part))
        .orderBy(when(prior, 0).otherwise(1), col("doc_id"))) === 1 && prior

    graft.Materialize.checkpoint(
      flagInputs(s, Tables.documents(s, dir))
        .withColumn("k_exact", keeper("digest", lit(true)))
        .withColumn("k_norm", keeper("norm_sig", col("k_exact")))
        .withColumn("k_near", keeper("sg", col("k_norm")))
        .withColumn("quality_ok", col("k_near") && qualityBand))
  }

  /** Survivor tagging shared by both curation variants: broadcast-dict
    * language argmax + deterministic md5 split tag (q_sample_split's
    * exact thresholds), all map-side after one tiny dict join. Input
    * must carry (doc_id, lang, toks, n_toks) plus any `extra` columns
    * to pass through.
    */
  private[operators] def tagSurvivors(s: SparkSession, survivors: DataFrame,
      extra: Seq[String] = Nil): DataFrame = {
    import s.implicits._
    val dict = TextExtras.langMarkers.toDF("cand", "w1", "w2")
    val lw = Window.partitionBy("doc_id")
      .orderBy(col("score").desc, col("cand"))
    survivors
      .crossJoin(broadcast(dict))
      .select((Seq(col("doc_id"), col("lang"), col("n_toks"), col("cand"),
        expr("size(filter(toks, t -> t = w1 OR t = w2))").as("score")) ++
        extra.map(col)): _*)
      .withColumn("rn", row_number().over(lw))
      .filter(col("rn") === 1)
      .select((Seq(col("doc_id"), col("lang"), col("cand").as("pred_lang"),
        col("n_toks"),
        // deterministic ~80/10/10 by doc_id digest — q_sample_split's
        // exact tag expression (lexicographic hex thresholds)
        when(md5(col("doc_id").cast("string").cast("binary")) < "cc", "train")
          .when(md5(col("doc_id").cast("string").cast("binary")) < "e6", "val")
          .otherwise("test").as("split")) ++ extra.map(col)): _*)
      .orderBy("doc_id")
  }

  /** Curate the documents table at `dir`: returns (corpus, report).
    * Corpus: (doc_id, lang, pred_lang, n_toks, split) for every
    * surviving doc. Report: one row per pipeline stage with docs
    * remaining and docs dropped at that stage.
    */
  def curate(s: SparkSession, dir: String): (DataFrame, DataFrame) = {
    import s.implicits._
    val flags = dedupFlags(s, dir)

    // ---- curated corpus: langid argmax + split tag on survivors -----
    val corpus = tagSurvivors(s, flags.filter(col("quality_ok"))
      .select(col("doc_id"), col("lang"), col("toks"), col("n_toks")))

    // ---- per-stage accounting from the same flags pass --------------
    val c = flags.agg(
      count(lit(1)).as("total"),
      sum(col("k_exact").cast("long")).as("after_exact"),
      sum(col("k_norm").cast("long")).as("after_norm"),
      sum(col("k_near").cast("long")).as("after_near"),
      sum(col("quality_ok").cast("long")).as("after_quality")).head()
    val stages = Seq(
      ("00_input", c.getLong(0), 0L),
      ("01_exact_dedup", c.getLong(1), c.getLong(0) - c.getLong(1)),
      ("02_norm_dedup", c.getLong(2), c.getLong(1) - c.getLong(2)),
      ("03_minhash_dedup", c.getLong(3), c.getLong(2) - c.getLong(3)),
      ("04_quality_filter", c.getLong(4), c.getLong(3) - c.getLong(4)))
    (corpus, stages.toDF("stage", "docs_remaining", "docs_dropped"))
  }

  /** [[curate]] with the LEARNED quality stage composed in — the
    * GPT-3/CCNet data-refresh recipe the heuristic bands approximate:
    * the dedup cascade is unchanged, but the final filter keeps a
    * dedup survivor iff the [[QualityClassifier]] (weak-labeled by the
    * heuristic bands, trained on the train split only — the same
    * leakage discipline as the tokenizer) scores it ≥ `tau`.
    *
    * Returns (corpus, report, model). Corpus rows carry the same
    * columns as [[curate]]'s plus `quality_score`, so a downstream
    * Pareto importance-sampler ([[paretoKeep]], the GPT-3 paper's
    * trick) can resample without rescoring.
    *
    * Scale shape: training sees only train-split docs (one bounded
    * L-BFGS job over hashed features — no vocabulary build); scoring
    * is map-side over the documents scan; composing scores with the
    * dedup verdicts is ONE doc_id join between two frames that both
    * already exist — no extra corpus pass. Deterministic end to end:
    * fixed maxIter, hash features, no RNG (CorpusPipelineSpec pins
    * run-to-run equality), and the heuristic path ([[curate]],
    * contract row q_pipeline_curate) is untouched.
    */
  def curateLearned(s: SparkSession, dir: String, tau: Double = 0.5,
      numFeatures: Int = 1 << 9, maxIter: Int = 100,
      evalSet: Option[DataFrame] = None, deconW: Int = 13)
      : (DataFrame, DataFrame, QualityClassifier.Model) = {
    import s.implicits._
    val flags = dedupFlags(s, dir)

    // weak-label + train on the train split of the RAW docs (the crawl
    // side of the GPT-3 recipe), then score every doc map-side
    val docs = Tables.documents(s, dir)
      .withColumn("label", QualityClassifier.heuristicLabel("text"))
      .withColumn("__split",
        when(md5(col("doc_id").cast("string").cast("binary")) < "cc",
          "train").otherwise("heldout"))
    val model = QualityClassifier.train(
      docs.filter(col("__split") === "train"), "text", "label",
      numFeatures, maxIter)
    val scores = QualityClassifier.score(docs, "text", model)
      .select(col("doc_id"), col("quality_score"))

    val withLearned = flags.join(scores, Seq("doc_id"))
      .withColumn("learned_ok",
        col("k_near") && col("quality_score") >= lit(tau))

    // optional final stage: eval-set decontamination (GPT-3 appx C) —
    // one broadcast semi-join over the span stream flags any-hit docs;
    // the corpus side never shuffles ([[Decontaminate]])
    val withFinal = evalSet match {
      case None => withLearned.withColumn("final_ok", col("learned_ok"))
      case Some(es) =>
        val contaminated = Decontaminate
          .report(Tables.documents(s, dir), es, "doc_id", "text", deconW)
          .filter(col("n_hits") > 0L)
          .select(col("doc_id"), lit(true).as("__contam"))
        withLearned.join(broadcast(contaminated), Seq("doc_id"), "left_outer")
          .withColumn("final_ok", col("learned_ok") &&
            coalesce(col("__contam"), lit(false)) === false)
    }
    val joined = graft.Materialize.checkpoint(withFinal)

    val corpus = tagSurvivors(s, joined.filter(col("final_ok"))
      .select(col("doc_id"), col("lang"), col("toks"), col("n_toks"),
        col("quality_score")), extra = Seq("quality_score"))

    val c = joined.agg(
      count(lit(1)).as("total"),
      sum(col("k_exact").cast("long")).as("after_exact"),
      sum(col("k_norm").cast("long")).as("after_norm"),
      sum(col("k_near").cast("long")).as("after_near"),
      sum(col("learned_ok").cast("long")).as("after_learned"),
      sum(col("final_ok").cast("long")).as("after_final")).head()
    val stages = Seq(
      ("00_input", c.getLong(0), 0L),
      ("01_exact_dedup", c.getLong(1), c.getLong(0) - c.getLong(1)),
      ("02_norm_dedup", c.getLong(2), c.getLong(1) - c.getLong(2)),
      ("03_minhash_dedup", c.getLong(3), c.getLong(2) - c.getLong(3)),
      (f"04_learned_quality_tau$tau%.2f", c.getLong(4),
        c.getLong(3) - c.getLong(4))) ++
      (if (evalSet.isDefined)
        Seq((s"05_decontaminate_w$deconW", c.getLong(5),
          c.getLong(4) - c.getLong(5)))
      else Nil)
    (corpus, stages.toDF("stage", "docs_remaining", "docs_dropped"), model)
  }

  /** The GPT-3 paper's Pareto importance-keep, made deterministic:
    * keep a scored doc iff `paretoDraw(u) > 1 − quality_score` where
    * the Lomax(α) draw `(1−u)^(−1/α) − 1` uses a hash-uniform u keyed
    * by (doc_id, seed) — reproducible under any partitioning/retry,
    * unlike `rand()`. Keep probability is monotone in the score and
    * every doc retains a nonzero chance, which is the recipe's point:
    * a hard threshold deterministically excises whole regions of the
    * distribution; the Pareto keep only TILTS toward high scores.
    */
  def paretoKeep(scored: DataFrame, idCol: String, scoreCol: String,
      alpha: Double = 9.0, seed: Long = 0L): DataFrame = {
    require(alpha > 0.0, s"alpha=$alpha")
    val u = (pmod(xxhash64(col(idCol), lit(seed)), lit(1L << 53))
      .cast("double") + 1.0) / lit((1L << 53).toDouble + 2.0)
    val draw = pow(lit(1.0) - u, lit(-1.0 / alpha)) - lit(1.0)
    scored.filter(draw > lit(1.0) - col(scoreCol))
  }

  /** The pipeline's last mile: curate → train a BPE tokenizer on the
    * curated TRAIN split (never on raw or held-out text — the standard
    * leakage discipline) → encode the whole curated corpus to token
    * ids → pack each split into exact `seqLen` training sequences.
    *
    * Returns (shards, model): shards = (split, seq_id, token_ids,
    * n_tokens) with every chunk but each split's tail exactly seqLen;
    * EOS id = first id past the model vocabulary. Deterministic end to
    * end — curation verdicts, merges, ids and layout are all pure
    * functions of the corpus, so a re-run ships byte-identical shards
    * (CorpusPipelineSpec pins it).
    *
    * Scale: adds to [[curate]]'s cost one vocabulary-sized histogram
    * shuffle (training), a map-side encode, and packing's single
    * inherent token shuffle per split ([[Packing.packTokens]]).
    */
  def tokenizeAndShard(s: SparkSession, dir: String, numMerges: Int,
      seqLen: Int): (DataFrame, Bpe.BpeModel) = {
    val (encoded, model) = encodedSplits(s, dir, numMerges)
    val eos = model.vocabIds.size
    val shards = Seq("train", "val", "test").map { sp =>
      Packing.packTokens(encoded.filter(col("split") === sp),
        "doc_id", "token_ids", seqLen, eos)
        .select(lit(sp).as("split"), col("seq_id"), col("token_ids"),
          col("n_tokens"))
    }.reduce(_ unionAll _)
    (shards, model)
  }

  /** Shared front half of the shard writers: curate → train the BPE
    * tokenizer on the curated TRAIN split → encode every surviving doc
    * to token ids, materialized ONCE (the per-split packing loops below
    * would otherwise each re-run the curation join + map-side encode
    * over the whole corpus, and re-fire PrefixSum's stats action).
    */
  private def encodedSplits(s: SparkSession, dir: String,
      numMerges: Int): (DataFrame, Bpe.BpeModel) = {
    val (corpus, _) = curate(s, dir)
    // survivors carry no text (curation shuffles digests, not text) —
    // re-join text by id for the two text-consuming stages
    val withText = corpus.select("doc_id", "split")
      .join(Tables.documents(s, dir).select("doc_id", "text"), Seq("doc_id"))
    val model = Bpe.trainOnDocs(
      withText.filter(col("split") === "train"), "text", numMerges)
    val encoded = graft.Materialize.checkpoint(
      Bpe.encodeIds(withText, "text", model)
        .select(col("split"), col("doc_id"), col("token_ids")))
    (encoded, model)
  }

  /** The last mile a TRAINER actually consumes: one epoch's shard
    * FILES per split — curate → train-split BPE → encode → per split,
    * [[Packing.writeShardsShuffled]] under the epoch's global
    * permutation (val/test read in the same permuted order; their
    * evaluation metrics are order-invariant, and one code path beats
    * two). Layout: `<outRoot>/<split>/` parquet shard files of
    * `seqsPerFile` consecutive sequences, plus the tokenizer saved at
    * `<outRoot>/tokenizer` so the consuming job decodes with the exact
    * model that produced the ids. Returns (model, split → file count).
    *
    * Deterministic end to end for a given (corpus, numMerges, seqLen,
    * epoch, seqsPerFile) — rerunning overwrites byte-identical shard
    * files, so a failed epoch materialization is safely re-runnable
    * (CorpusPipelineSpec pins read-back equality with packShuffled and
    * cross-epoch token conservation).
    */
  def writeEpochShards(s: SparkSession, dir: String, numMerges: Int,
      seqLen: Int, epoch: Long, outRoot: String,
      seqsPerFile: Int): (Bpe.BpeModel, Map[String, Int]) = {
    val (encoded, model) = encodedSplits(s, dir, numMerges)
    val eos = model.vocabIds.size
    val counts = Seq("train", "val", "test").map { sp =>
      sp -> shardSplit(encoded, sp, eos, seqLen, epoch, outRoot,
        seqsPerFile)
    }.toMap
    Bpe.save(s, model, s"$outRoot/tokenizer")
    (model, counts)
  }

  /** One split's shard files — shared by the plain and the
    * mixture-weighted writers so the shard recipe has exactly one
    * copy.
    */
  private def shardSplit(encoded: DataFrame, sp: String, eos: Int,
      seqLen: Int, epoch: Long, outRoot: String, seqsPerFile: Int): Int =
    Packing.writeShardsShuffled(
      encoded.filter(col("split") === sp), "doc_id", "token_ids",
      seqLen, eos, epoch, s"$outRoot/$sp", seqsPerFile)

  /** [[writeEpochShards]] under a TRAINING MIXTURE: the train split's
    * contribution per source is planned against `budgetTokens` with
    * `weights` ([[MixturePlanner]] — inventories measured in REAL
    * token-id counts, not whitespace words, so the budget means what
    * the trainer thinks it means), each (doc, epoch-repeat) occurrence
    * enters the packed stream once via `expandTokens`, and the epoch
    * permutation interleaves the repeats. Val/test shard unmixed (an
    * eval set is never up/down-sampled). Returns the model, the
    * per-source realized-vs-target accounting, and the shard counts.
    */
  def writeMixedEpochShards(s: SparkSession, dir: String, numMerges: Int,
      seqLen: Int, epoch: Long, outRoot: String, seqsPerFile: Int,
      weights: Map[String, Double], budgetTokens: Long,
      seed: Long): (Bpe.BpeModel, DataFrame, Map[String, Int]) = {
    val (encoded, model) = encodedSplits(s, dir, numMerges)
    val eos = model.vocabIds.size
    val trainDocs = encoded.filter(col("split") === "train")
      .join(Tables.documents(s, dir).select("doc_id", "source"),
        Seq("doc_id"))
      .select(col("doc_id"), col("source"),
        size(col("token_ids")).cast("long").as("n_toks"))
    // the plan is one row per domain by construction — localize it so
    // its lineage (encoded-cache scan + documents join + hash agg)
    // runs ONCE instead of under each of its three consumers (the
    // materialize validation, the manifest join, and the returned
    // accounting, which the caller may collect after releaseAll)
    val plan = {
      val p = MixturePlanner.planFromDocs(s, trainDocs, "source",
        "n_toks", weights, budgetTokens)
      import scala.jdk.CollectionConverters._
      s.createDataFrame(p.collect().toList.asJava, p.schema)
    }
    val manifest = graft.Materialize.checkpoint(
      MixturePlanner.materialize(trainDocs, plan, "doc_id", "source",
        "n_toks", seed))
    val mixedTrain = MixturePlanner.expandTokens(manifest,
      encoded.filter(col("split") === "train"), "doc_id", "token_ids")
    val counts = Map(
      "train" -> Packing.writeShardsShuffled(mixedTrain, "occ_id",
        "token_ids", seqLen, eos, epoch, s"$outRoot/train",
        seqsPerFile)) ++
      Seq("val", "test").map { sp =>
        sp -> shardSplit(encoded, sp, eos, seqLen, epoch, outRoot,
          seqsPerFile)
      }.toMap
    Bpe.save(s, model, s"$outRoot/tokenizer")
    (model, MixturePlanner.account(manifest, plan), counts)
  }
}
