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

  /** Curate the documents table at `dir`: returns (corpus, report).
    * Corpus: (doc_id, lang, pred_lang, n_toks, split) for every
    * surviving doc. Report: one row per pipeline stage with docs
    * remaining and docs dropped at that stage.
    */
  def curate(s: SparkSession, dir: String): (DataFrame, DataFrame) = {
    graft.plans.MinHashSignature.register(s)
    import s.implicits._

    // ---- one flags frame: all three dedup verdicts + quality --------
    // rank-1-among-survivors trick: partition by the stage's digest,
    // order PRIOR-stage survivors first then doc_id; the top row is the
    // group's keeper iff it survived the prior stage (a group whose
    // docs were all dropped earlier keeps nothing).
    def keeper(part: String, prior: org.apache.spark.sql.Column) =
      row_number().over(Window.partitionBy(col(part))
        .orderBy(when(prior, 0).otherwise(1), col("doc_id"))) === 1 && prior

    val flags = graft.Materialize.checkpoint(
      Tables.documents(s, dir)
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
        .withColumn("k_exact", keeper("digest", lit(true)))
        .withColumn("k_norm", keeper("norm_sig", col("k_exact")))
        .withColumn("k_near", keeper("sg", col("k_norm")))
        .withColumn("quality_ok", col("k_near") &&
          col("n_toks").between(MinToks, MaxToks) &&
          col("alpha_ratio") >= MinAlpha))

    // ---- curated corpus: langid argmax + split tag on survivors -----
    val dict = TextExtras.langMarkers.toDF("cand", "w1", "w2")
    val lw = Window.partitionBy("doc_id")
      .orderBy(col("score").desc, col("cand"))
    val corpus = flags.filter(col("quality_ok"))
      .select(col("doc_id"), col("lang"), col("toks"), col("n_toks"))
      .crossJoin(broadcast(dict))
      .select(col("doc_id"), col("lang"), col("n_toks"), col("cand"),
        expr("size(filter(toks, t -> t = w1 OR t = w2))").as("score"))
      .withColumn("rn", row_number().over(lw))
      .filter(col("rn") === 1)
      .select(col("doc_id"), col("lang"), col("cand").as("pred_lang"),
        col("n_toks"),
        // deterministic ~80/10/10 by doc_id digest — q_sample_split's
        // exact tag expression (lexicographic hex thresholds)
        when(md5(col("doc_id").cast("string").cast("binary")) < "cc", "train")
          .when(md5(col("doc_id").cast("string").cast("binary")) < "e6", "val")
          .otherwise("test").as("split"))
      .orderBy("doc_id")

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
      sp -> Packing.writeShardsShuffled(
        encoded.filter(col("split") === sp), "doc_id", "token_ids",
        seqLen, eos, epoch, s"$outRoot/$sp", seqsPerFile)
    }.toMap
    Bpe.save(s, model, s"$outRoot/tokenizer")
    (model, counts)
  }
}
