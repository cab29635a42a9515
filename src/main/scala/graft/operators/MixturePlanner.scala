package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Training-mixture PLANNING — the step between a curated corpus and
  * the packer: given per-domain token inventories, target mixture
  * weights, and a total token budget, decide how much of each domain
  * a training run consumes. The published recipes (GPT-3's Table 2.2
  * weighted sampling, Llama's per-source proportions, DoReMi's learned
  * weights) all reduce to the same arithmetic: domain d should
  * contribute weight_d × budget tokens; when its inventory is smaller
  * than that, the domain REPEATS — GPT-3 famously runs its high-quality
  * sets for 2–3 epochs while CommonCrawl sees < 1 — and when larger,
  * a fraction is sampled.
  *
  * Two halves, both deterministic:
  *
  *  - [[plan]]: pure per-domain arithmetic over a tiny stats frame —
  *    (target tokens, full epochs, remainder fraction). Driver-safe at
  *    any corpus size: one row per domain.
  *  - [[materialize]]: turn the plan into a (doc, epoch) MANIFEST —
  *    every doc of a domain appears in each full epoch, and in the
  *    final partial epoch iff a hash-uniform draw keyed by
  *    (doc, epoch, seed) lands under the remainder fraction (the
  *    [[Sampling]] discipline: partitioning/retry-invariant, no RNG
  *    state). Document text is never replicated — at 100 TB the
  *    manifest is ids + epochs and the text joins in exactly once at
  *    the consumer, the same shape the `q_sample_mixture` contract row
  *    ships.
  *
  * Expected tokens from domain d = inventory_d × (full_epochs +
  * remainder) = target_d exactly; the realized count concentrates
  * around it by independence of the per-doc draws.
  */
object MixturePlanner {

  /** The per-domain plan. `stats` carries one row per domain:
    * (`domain`, `avail_tokens`). Weights are normalized internally;
    * domains absent from `weights` (or with non-positive weight or an
    * empty inventory) are dropped. Output: (domain, weight,
    * avail_tokens, target_tokens, full_epochs, rem_fraction) where
    * target = normalized-weight × budget, full_epochs =
    * ⌊target / avail⌋ and rem_fraction = the sampled fraction of the
    * final partial pass.
    */
  def plan(spark: SparkSession, stats: DataFrame,
      weights: Map[String, Double], budgetTokens: Long): DataFrame = {
    require(budgetTokens > 0, s"budgetTokens=$budgetTokens")
    val pos = weights.filter(_._2 > 0.0)
    require(pos.nonEmpty, "no positive mixture weight")
    // fail LOUD on a weighted domain with no (non-empty) inventory —
    // a typo'd or renamed source would otherwise silently forfeit its
    // whole share of the budget (stats is one tiny row per domain by
    // contract, so the check is a driver-side set compare)
    val have = stats
      .select(col("domain"), col("avail_tokens").cast("long"))
      .filter(col("avail_tokens") > 0L)
      .select("domain").collect().map(_.getString(0)).toSet
    val missing = pos.keySet -- have
    require(missing.isEmpty,
      s"mixture weights name domains with no token inventory: " +
        missing.toSeq.sorted.mkString(", "))
    val total = pos.values.sum
    import spark.implicits._
    val w = pos.toSeq.map { case (d, v) => (d, v / total) }
      .toDF("domain", "weight")
    stats
      .select(col("domain"), col("avail_tokens").cast("long"))
      .filter(col("avail_tokens") > 0L)
      .join(broadcast(w), Seq("domain"))
      .withColumn("target_tokens",
        round(col("weight") * lit(budgetTokens.toDouble)).cast("long"))
      .withColumn("full_epochs",
        // LONG, never int: a huge budget over a tiny domain overflows
        // a 32-bit cast silently negative, and sequence(0, n) runs
        // DESCENDING for n < 0 (the CLAUDE.md explode hazard)
        floor(col("target_tokens") / col("avail_tokens")).cast("long"))
      .withColumn("rem_fraction",
        (col("target_tokens") - col("full_epochs") * col("avail_tokens"))
          .cast("double") / col("avail_tokens"))
      .select("domain", "weight", "avail_tokens", "target_tokens",
        "full_epochs", "rem_fraction")
  }

  /** [[plan]] from the corpus itself: one hash aggregate for the
    * per-domain token inventory.
    */
  def planFromDocs(spark: SparkSession, docs: DataFrame, domainCol: String,
      tokensCol: String, weights: Map[String, Double],
      budgetTokens: Long): DataFrame =
    plan(spark,
      docs.groupBy(col(domainCol).as("domain"))
        .agg(sum(col(tokensCol).cast("long")).as("avail_tokens")),
      weights, budgetTokens)

  /** The (doc, epoch) manifest realizing `thePlan` over `docs`
    * (`idCol` unique, `domainCol`, `tokensCol`): each doc appears at
    * epochs 0..full_epochs−1 unconditionally and at epoch full_epochs
    * iff its (id, epoch)-keyed uniform draw < rem_fraction. One
    * broadcast join + one guarded explode; epochs ordering inside a
    * training run comes from [[Sampling.epochShuffle]] downstream.
    */
  def materialize(docs: DataFrame, thePlan: DataFrame, idCol: String,
      domainCol: String, tokensCol: String, seed: Long,
      maxEpochs: Long = 1000L): DataFrame = {
    // the plan is one row per domain — validate it driver-side before
    // the explode: an absurd epoch count (weights/budget mismatched to
    // a tiny inventory) would build a giant per-doc array; published
    // recipes repeat high-quality sets single-digit times
    thePlan.select("domain", "full_epochs").collect().foreach { r =>
      val e = r.getLong(1)
      require(e >= 0L && e <= maxEpochs,
        s"domain ${r.getString(0)} plans $e full epochs (max $maxEpochs)" +
          " — the budget asks this domain to repeat absurdly; rebalance" +
          " the weights or raise maxEpochs deliberately")
    }
    val joined = docs
      .select(col(idCol).as("doc_id"), col(domainCol).as("domain"),
        col(tokensCol).cast("long").as("n_toks"))
      .join(broadcast(thePlan.select("domain", "full_epochs",
        "rem_fraction")), Seq("domain"))
    // sequence(0, n) is safe here (full_epochs >= 0 by construction),
    // and the final entry is the partial pass, kept under its draw
    joined
      .select(col("doc_id"), col("domain"), col("n_toks"),
        explode(expr("sequence(0, full_epochs)")).as("epoch"),
        col("full_epochs"), col("rem_fraction"))
      .filter(col("epoch") < col("full_epochs") ||
        Sampling.u01(concat_ws(":", col("doc_id"), col("epoch")), seed) <
          col("rem_fraction"))
      .select("doc_id", "domain", "n_toks", "epoch")
  }

  /** Expand a manifest back into a TOKEN STREAM for the packer: one
    * row per (doc, epoch) with the doc's token ids and a composite
    * stream id unique per occurrence — exactly the frame
    * [[Packing.packShuffled]]/[[Packing.writeShardsShuffled]] consume
    * (their epoch-keyed hash order interleaves the repeats away from
    * each other). `tokens` carries (`idCol`, `tokenIdsCol`); the join
    * ships ids + epochs to the token frame, so document tokens are
    * materialized once per EMITTED occurrence and never for docs the
    * mixture dropped.
    */
  def expandTokens(manifest: DataFrame, tokens: DataFrame, idCol: String,
      tokenIdsCol: String): DataFrame =
    manifest.select(col("doc_id"), col("epoch"))
      .join(tokens.select(col(idCol).as("doc_id"),
        col(tokenIdsCol).as("__ids")), Seq("doc_id"))
      // length-prefixed, so the id is INJECTIVE even for string doc
      // ids containing the separator — a collision would give two
      // occurrences the same packer sort key and make shard bytes
      // run-dependent
      .select(concat_ws("#",
        length(col("doc_id").cast("string")).cast("string"),
        col("doc_id"), col("epoch")).as("occ_id"),
        col("__ids").as(tokenIdsCol))

  /** Per-domain accounting of a materialized manifest against its
    * plan: realized vs target token mass and the relative error — the
    * report a pipeline logs before committing a mixture.
    */
  def account(manifest: DataFrame, thePlan: DataFrame): DataFrame =
    manifest.groupBy("domain")
      .agg(countDistinct(col("doc_id")).as("n_docs_used"),
        count(lit(1)).as("n_emitted"),
        sum(col("n_toks")).as("realized_tokens"))
      .join(thePlan.select("domain", "target_tokens"), Seq("domain"))
      .withColumn("rel_err",
        // round(weight × budget) legitimately produces target_tokens=0
        // for a tiny normalized weight; a bare division would emit a
        // NULL rel_err (Spark div-by-zero) that a threshold check
        // silently passes — floor the denominator so a zero-target
        // domain reports its realized mass as the explicit error
        round(abs(col("realized_tokens") - col("target_tokens"))
          .cast("double") / greatest(col("target_tokens"), lit(1L)), 4))
      .select("domain", "n_docs_used", "n_emitted", "realized_tokens",
        "target_tokens", "rel_err")
      .orderBy("domain")
}
