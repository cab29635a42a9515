package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** GPT-style training-sequence packing: the tokenized corpus becomes
  * ONE logical token stream (each document followed by an EOS id, in
  * ascending-id order) cut into fixed-length chunks — documents cross
  * chunk boundaries, every token lands in exactly one chunk, and all
  * chunks except the stream tail are exactly `seqLen` long. This is
  * the step that turns a tokenized corpus into the shard rows a
  * trainer consumes, and the exactness properties (no token lost, no
  * token duplicated, deterministic layout) are what make checkpointed
  * training reproducible.
  *
  * Scale shape: each document's absolute offset in the stream comes
  * from [[PrefixSum.globalCumsum]] over (id, len) — the two-phase
  * bucket decomposition, never a single-task global window over the
  * corpus. Tokens then move STRAIGHT to their chunk: posexplode →
  * (chunk = abs div seqLen) → one hash-aggregate shuffle keyed by
  * chunk. That single corpus-sized exchange is inherent to packing
  * (tokens from different documents must meet in one output row);
  * everything else is bounded or map-side. Chunk reassembly sorts
  * `seqLen`-bounded in-memory arrays (`array_sort` of collected
  * (pos, id) structs), never a global sort.
  *
  * Ordering: the stream follows ascending `idCol`, which must be
  * unique — corpus order in, corpus order out, identical under any
  * partitioning. For a shuffled epoch, permute FIRST with
  * [[Sampling.epochShuffle]] semantics (re-key by xxhash64(id, epoch)
  * and pack on the new key); packing itself stays order-faithful.
  */
object Packing {

  /** Pack `tokensCol` (array<int>) rows into fixed `seqLen` chunks.
    * Output: (seq_id, token_ids, n_tokens), seq_id counting chunks
    * from 0 in stream order; every row but the last has
    * n_tokens == seqLen. `eosId` is appended after each document.
    */
  def packTokens(df: DataFrame, idCol: String, tokensCol: String,
      seqLen: Int, eosId: Int): DataFrame =
    // presentation order only (chunk-count rows, tokens/seqLen of
    // them); [[writeShards]] is the scale path — range partitions +
    // local sorts, no single global ordering
    packCore(df, idCol, tokensCol, seqLen, eosId).orderBy("seq_id")

  private def packCore(df: DataFrame, idCol: String, tokensCol: String,
      seqLen: Int, eosId: Int): DataFrame = {
    require(seqLen > 0, s"seqLen=$seqLen")
    val withLen = df.select(col(idCol).as("__id"),
      concat(col(tokensCol), array(lit(eosId))).as("__ids"))
      .withColumn("__len", size(col("__ids")).cast("long"))
    // Inclusive global cumsum of lengths under ascending id → each
    // document's absolute START offset in the stream.
    val offsets = PrefixSum.globalCumsum(withLen, "__id", Seq("__len"))
      .withColumn("__start", col("__cw___len") - col("__len"))
    assemble(offsets, seqLen)
  }

  /** [[packCore]] under the EPOCH-SHUFFLED stream order: documents are
    * re-keyed by xxhash64(id, epoch) — [[Sampling.epochShuffle]]'s
    * permutation — with hash collisions broken by the original id
    * (the cumsum runs under the total order (hash, id)), then packed
    * exactly as packCore. Same single corpus-sized exchange; the
    * permutation costs nothing extra because the offsets pass orders
    * by the new key instead of the id.
    */
  private def packShuffledCore(df: DataFrame, idCol: String,
      tokensCol: String, seqLen: Int, eosId: Int, epoch: Long,
      withBounds: Boolean = false): DataFrame = {
    require(seqLen > 0, s"seqLen=$seqLen")
    val withLen = df.select(col(idCol).as("__id"),
      concat(col(tokensCol), array(lit(eosId))).as("__ids"))
      .withColumn("__shuf", xxhash64(col("__id"), lit(epoch)))
      .withColumn("__len", size(col("__ids")).cast("long"))
    val offsets = PrefixSum.globalCumsum(withLen, "__shuf", "__id", Seq("__len"))
      .withColumn("__start", col("__cw___len") - col("__len"))
    assemble(offsets, seqLen, withBounds)
  }

  /** Shared tail of every pack variant: token → absolute stream slot →
    * one hash-aggregate shuffle keyed by chunk. With `withBounds` the
    * chunk aggregate ALSO folds `doc_starts` — the in-chunk positions
    * where a document's first token lands (cross-document
    * attention-mask metadata) — from a start flag riding the same
    * posexplode row: zero extra shuffles, `collect_list` drops the
    * nulls of non-start tokens.
    */
  private def assemble(offsets: DataFrame, seqLen: Int,
      withBounds: Boolean = false): DataFrame = {
    val packed = offsets
      .select(col("__start"), posexplode(col("__ids")).as(Seq("__p", "__tok")))
      .select((col("__start") + col("__p")).as("__abs"), col("__tok"),
        (col("__p") === 0).as("__s0"))
      // integer div/mod: absolute offsets are longs that can exceed
      // 2^53 at stream scale — double math would corrupt them
      .select(expr(s"__abs div $seqLen").as("seq_id"),
        (col("__abs") % seqLen).cast("int").as("__pos"), col("__tok"),
        col("__s0"))
    val toks = transform(
      array_sort(collect_list(struct(col("__pos"), col("__tok")))),
      x => x("__tok")).as("token_ids")
    val grouped =
      if (withBounds)
        packed.groupBy("seq_id").agg(toks,
          array_sort(collect_list(when(col("__s0"), col("__pos"))))
            .as("doc_starts"))
      else packed.groupBy("seq_id").agg(toks)
    grouped.withColumn("n_tokens", size(col("token_ids")))
  }

  /** [[packTokens]] plus per-chunk DOCUMENT BOUNDARIES: `doc_starts`
    * lists the in-chunk positions (0-based, ascending) where a
    * document's FIRST token lands — exactly what a trainer needs to
    * mask cross-document attention inside packed sequences (tokens
    * before the first start continue the previous chunk's tail
    * document). Same plan as packTokens: the start flag rides the
    * posexplode row and folds in the SAME chunk aggregate — zero extra
    * shuffles (`collect_list` drops the nulls of non-start tokens).
    */
  def packTokensWithBoundaries(df: DataFrame, idCol: String,
      tokensCol: String, seqLen: Int, eosId: Int): DataFrame = {
    require(seqLen > 0, s"seqLen=$seqLen")
    val withLen = df.select(col(idCol).as("__id"),
      concat(col(tokensCol), array(lit(eosId))).as("__ids"))
      .withColumn("__len", size(col("__ids")).cast("long"))
    val offsets = PrefixSum.globalCumsum(withLen, "__id", Seq("__len"))
      .withColumn("__start", col("__cw___len") - col("__len"))
    assemble(offsets, seqLen, withBounds = true).orderBy("seq_id")
  }

  /** Pack one training EPOCH: the corpus is globally permuted by
    * xxhash64(`idCol`, `epoch`) — the [[Sampling.epochShuffle]]
    * permutation, hash collisions broken by the original id — and the
    * PERMUTED stream is cut into `seqLen` chunks. Different epochs
    * yield different document orders over the same token multiset;
    * the same epoch is deterministic under any partitioning
    * (PackingSpec pins all three). Same plan shape as [[packTokens]]:
    * the permutation rides the offsets pass for free.
    */
  def packShuffled(df: DataFrame, idCol: String, tokensCol: String,
      seqLen: Int, eosId: Int, epoch: Long): DataFrame =
    packShuffledCore(df, idCol, tokensCol, seqLen, eosId, epoch)
      .orderBy("seq_id")

  /** Land packed sequences as shard files: `seqsPerFile` consecutive
    * sequences per parquet file, in stream order WITHOUT any global
    * sort — one range exchange on seq_id plus per-file local sorts
    * (the writer shape the packTokens scaladoc promises). Returns the
    * file count.
    */
  def writeShards(df: DataFrame, idCol: String, tokensCol: String,
      seqLen: Int, eosId: Int, path: String, seqsPerFile: Int): Int =
    shardWriter(df, tokensCol, seqLen, seqsPerFile,
      packCore(df, idCol, tokensCol, seqLen, eosId), path)

  /** [[writeShards]] over the epoch-shuffled pack — the shard files a
    * trainer actually reads for epoch `epoch`.
    */
  def writeShardsShuffled(df: DataFrame, idCol: String, tokensCol: String,
      seqLen: Int, eosId: Int, epoch: Long, path: String,
      seqsPerFile: Int): Int =
    // trainer shard files carry doc_starts: the attention-mask
    // metadata has to land WITH the tokens or the trainer cannot
    // reconstruct it (the permuted doc order exists only here)
    shardWriter(df, tokensCol, seqLen, seqsPerFile,
      packShuffledCore(df, idCol, tokensCol, seqLen, eosId, epoch,
        withBounds = true), path)

  private def shardWriter(df: DataFrame, tokensCol: String, seqLen: Int,
      seqsPerFile: Int, packed: DataFrame, path: String): Int = {
    require(seqsPerFile > 0, s"seqsPerFile=$seqsPerFile")
    // Sequence count from a CHEAP scalar over per-doc lengths — never
    // by materializing the corpus-sized pack twice: the stream is
    // sum(len(tokens)+1) tokens cut into ceil(total/seqLen) chunks
    // (a permutation never changes the count).
    val total = df
      .agg(coalesce(sum(size(col(tokensCol)) + 1).cast("long"), lit(0L)))
      .head.getLong(0)
    val nSeqs = (total + seqLen - 1) / seqLen
    val nFiles = math.max(1, ((nSeqs + seqsPerFile - 1) / seqsPerFile).toInt)
    packed
      .repartitionByRange(nFiles, col("seq_id"))
      .sortWithinPartitions("seq_id")
      .write.mode("overwrite").parquet(path)
    nFiles
  }

  /** Tokenize the documents table with a trained BPE model and pack it:
    * corpus → encodeIds (map-side) → packTokens. EOS defaults to the
    * first id past the model's vocabulary.
    */
  def packCorpus(spark: SparkSession, dir: String, model: Bpe.BpeModel,
      seqLen: Int): DataFrame = {
    val eos = model.vocabIds.size
    packTokens(
      Bpe.encodeIds(Tables.documents(spark, dir), "text", model),
      "doc_id", "token_ids", seqLen, eos)
  }
}
