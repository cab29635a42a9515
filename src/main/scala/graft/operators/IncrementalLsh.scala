package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Incremental banded-LSH candidate index — dedup-at-ingest against
  * the FULL historical corpus. The batch operators (q_dedup_minhash
  * and friends) band the whole corpus per run; at a production ingest
  * cadence the question is "which of 100 TB of already-seen documents
  * near-duplicates THIS arriving batch", and the answer must cost
  * O(|batch|), not a corpus scan. Same segment-log recipe as the
  * other two incremental indexes ([[SegmentLog]]):
  *
  *   root/members/seq=<b>/bb=<bucket>/  band rows (doc_id, band_id,
  *                                      bk, sg) of batch b's docs
  *   root/docs/seq=<b>/                 changelog (doc_id, op),
  *                                      written LAST (commit point)
  *
  * Band rows use EXACTLY the contract scheme (8-component md5 MinHash
  * over token 3-shingles, 4 bands × 2 rows, md5 band keys — the
  * formulas are shared with [[DedupExtras]], so the incremental
  * index's candidate set is the batch operator's restricted to pairs
  * touching the probe set; the spec pins that equality). The
  * signature array rides in the band rows (the batch operator's own
  * carry-the-array discipline), so similarity needs no second lookup.
  *
  * Partition pruning is the point: rows partition by
  * `bb = pmod(hash(band_id, bk), nBuckets)`, and a candidate lookup
  * reads ONLY the bucket dirs the probes' band keys hash into — a
  * driver-side ≤ nBuckets manifest, the landing zone's own
  * touched-bucket discipline. Updates/deletes fold through the thin
  * changelog exactly like [[IncrementalIvf]]'s members; [[compact]]
  * bounds log growth with the shared marker discipline.
  */
object IncrementalLsh {

  /** Bands per signature (r = 2 components each) — the contract
    * scheme. A different (b, r) from [[LshPlanner.choose]] means a
    * different index root; the scheme is frozen at creation like the
    * IVF quantizer.
    */
  private val Bands = 4

  private def bucketCol(nBuckets: Int) =
    pmod(hash(col("band_id"), col("bk")), lit(nBuckets))

  /** (doc_id, band_id, bk, sg) band rows of a (doc_id, text) frame —
    * byte-identical signature/band formulas to the batch operators.
    */
  private def bandRows(spark: SparkSession, docs: DataFrame): DataFrame = {
    graft.plans.MinHashSignature.register(spark)
    docs
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .repartition(spark.sparkContext.defaultParallelism, col("doc_id"))
      .select(col("doc_id"), expr(DedupExtras.shinglesSql).as("sh"))
      .select(col("doc_id"), expr("minhash_sig(sh)").as("sg"))
      .select(col("doc_id"), col("sg"),
        explode(sequence(lit(0), lit(Bands - 1))).as("band_id"))
      .select(col("doc_id"), col("band_id"),
        md5(concat(
          element_at(col("sg"), col("band_id") * 2 + 1), lit("|"),
          element_at(col("sg"), col("band_id") * 2 + 2)).cast("binary"))
          .as("bk"),
        col("sg"))
  }

  private def latestDocVersions(spark: SparkSession,
      root: String): DataFrame = {
    val w = Window.partitionBy("doc_id").orderBy(col("seq").desc)
    SegmentLog.readLog(spark, root, "docs")
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select("doc_id", "seq", "op")
  }

  /** Apply one CDC batch of documents (doc_id, text, op — I/U upserts
    * the doc's bands, D removes it) as batch `batchId` (strictly
    * greater than every prior). Same built-in delivery idempotence,
    * torn-write commit order, horizon guard and inline-compaction
    * cadence as the other incremental indexes.
    */
  def applyBatch(spark: SparkSession, root: String, batch: DataFrame,
      batchId: Long, nBuckets: Int = 16, compactEvery: Int = 0): Unit = {
    require(nBuckets > 0, s"nBuckets=$nBuckets")
    val f = SegmentLog.hfs(spark, root)
    if (f.exists(new org.apache.hadoop.fs.Path(
        s"$root/docs/seq=$batchId/_SUCCESS"))) return
    require(SegmentLog.compactedUpTo(spark, root).forall(_ < batchId),
      s"batch $batchId is at or below $root's compaction horizon")
    // the bucket count is part of the physical layout: freeze it at
    // creation and fail loudly on a mismatch — a silently different
    // value would send this batch's band rows to buckets the pruned
    // candidate lookup never reads (false negatives with no error)
    SegmentLog.pinLayout(spark, root, "_nbuckets", nBuckets.toLong)
    val staged = batch.select(col("doc_id"), col("text"), col("op"))
      .persist()
    try {
      val rows = bandRows(spark, staged.filter(col("op") =!= "D")
        .select("doc_id", "text")).persist()
      try {
        val memberDir = new org.apache.hadoop.fs.Path(
          s"$root/members/seq=$batchId")
        if (rows.isEmpty) {
          // delete-only batch: no member segment (zero-row partitionBy
          // husk lesson), the changelog alone tombstones
          if (f.exists(memberDir)) f.delete(memberDir, true)
        } else rows.withColumn("bb", bucketCol(nBuckets))
          .write.mode("overwrite").partitionBy("bb")
          .parquet(s"$root/members/seq=$batchId")
        staged.select("doc_id", "op").write.mode("overwrite")
          .parquet(s"$root/docs/seq=$batchId")
      } finally rows.unpersist(blocking = false)
    } finally staged.unpersist(blocking = false)
    Seq("members", "docs")
      .foreach(sub => spark.catalog.refreshByPath(s"$root/$sub"))
    if (compactEvery > 0) {
      val h = SegmentLog.compactedUpTo(spark, root).getOrElse(-1L)
      if (SegmentLog.freshSegDirs(spark, root, "docs", h)
          .size > compactEvery)
        compact(spark, root, batchId - 1)
    }
  }

  /** Near-dup CANDIDATES of `probes` (doc_id, text) against the live
    * index: (probe_id, doc_id, minhash_sim) for every indexed doc
    * sharing at least one band with a probe (self-matches excluded).
    * `minhash_sim` is the signature-agreement fraction — the same
    * verify statistic as `q_dedup_minhash` — computed from the carried
    * arrays with no second lookup. Cost: the probes' own signature
    * pass + a member read PRUNED to the ≤ 4·|probes| band buckets the
    * probes hash into, never a corpus scan. The bucket count comes
    * from the root's own layout pin, so a lookup can never hash probes
    * with a different constant than the members were written with.
    */
  def candidates(spark: SparkSession, root: String,
      probes: DataFrame): DataFrame = {
    val nBuckets = SegmentLog.layoutOf(spark, root, "_nbuckets")
      .getOrElse(sys.error(
        s"$root has no _nbuckets layout pin — apply a batch first"))
      .toInt
    // an index fed only empty/delete-only batches has no members
    // segment at all (the zero-row-partitionBy discipline skips it):
    // that is a legitimate empty index, not a read error
    if (!SegmentLog.hasBatches(spark, root, "members")) {
      import spark.implicits._
      return Seq.empty[(Long, Long, Double)]
        .toDF("probe_id", "doc_id", "minhash_sim")
    }
    val probeRows = bandRows(spark, probes)
      .withColumn("bb", bucketCol(nBuckets))
      .persist()
    try {
      val touched = probeRows.select("bb").distinct()
        .collect().map(_.getInt(0)).toSeq
      val pruned = SegmentLog.readLog(spark, root, "members")
        .filter(col("bb").isin(touched: _*))
      val live = latestDocVersions(spark, root)
        .filter(col("op") =!= "D").select("doc_id", "seq")
      val members = pruned.join(live, Seq("doc_id", "seq"))
      members.as("m")
        .join(probeRows.as("p"),
          col("m.band_id") === col("p.band_id") &&
            col("m.bk") === col("p.bk") &&
            col("m.doc_id") =!= col("p.doc_id"))
        .select(col("p.doc_id").as("probe_id"),
          col("m.doc_id").as("doc_id"),
          round(expr("size(filter(sequence(1, 8), " +
            "i -> element_at(m.sg, i) = element_at(p.sg, i))) " +
            "/ cast(8 as double)"), 4).as("minhash_sim"))
        .distinct()
    } finally probeRows.unpersist(blocking = false)
  }

  /** COMPACTION — fold every member/changelog segment ≤ `upTo` into
    * one tree (live band rows only, still `bb`-partitioned so probe
    * pruning survives), with the shared marker/cleanup discipline and
    * the torn-batch wedge guard.
    */
  def compact(spark: SparkSession, root: String, upTo: Long): Unit = {
    require(SegmentLog.compactedUpTo(spark, root).forall(_ <= upTo),
      s"cannot compact $root backwards past its marker")
    // re-run at the published horizon = crashed-cleanup retry: finish
    // the cleanup, never re-fold over the tree readers resolve from
    if (SegmentLog.compactedUpTo(spark, root).contains(upTo)) {
      SegmentLog.cleanup(spark, root, Seq("members", "docs")); return
    }
    SegmentLog.requireNoTornAtOrBelow(spark, root,
      Seq("members"), "docs", upTo)
    val liveOld = latestDocVersions(spark, root)
      .filter(col("seq") <= upTo && col("op") =!= "D")
    // an index fed only empty/delete-only batches never created the
    // members dir (candidates() treats that as a legitimate empty
    // index — so must the fold, which still bounds the CHANGELOG)
    val memberLog =
      if (SegmentLog.hasBatches(spark, root, "members"))
        SegmentLog.readLog(spark, root, "members")
      else {
        import spark.implicits._
        Seq.empty[(Long, Int, String, Seq[String], Int, Long)]
          .toDF("doc_id", "band_id", "bk", "sg", "bb", "seq")
      }
    val foldMembers = memberLog
      .join(liveOld.select("doc_id", "seq"), Seq("doc_id", "seq"))
      .drop("seq")
      .persist()
    try {
      val tmp = s"$root/_compact/$upTo"
      if (foldMembers.isEmpty)
        foldMembers.write.mode("overwrite").parquet(s"$tmp/members")
      else
        foldMembers.write.mode("overwrite").partitionBy("bb")
          .parquet(s"$tmp/members")
      liveOld.select("doc_id", "op")
        .write.mode("overwrite").parquet(s"$tmp/docs")
      SegmentLog.publishMarker(spark, root, upTo)
    } finally foldMembers.unpersist(blocking = false)
    SegmentLog.cleanup(spark, root, Seq("members", "docs"))
  }
}
