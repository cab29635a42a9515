package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{IncrementalLsh, LshPlanner}
import graft.sources.Tables

/** The incremental banded-LSH candidate index must agree with the
  * CONTRACT banding (q_dedup_minhash) on formulas, and with a
  * from-scratch index on any CDC batch sequence — dedup-at-ingest
  * cannot drift from dedup-at-rest.
  */
class IncrementalLshSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private lazy val sf = SparkTestBase.sf0001

  private def docs(): DataFrame =
    Tables.documents(spark, sf).select("doc_id", "text")

  private def pairsOf(df: DataFrame): Set[(Long, Long, Double)] =
    df.select(
        least(col("probe_id"), col("doc_id")).as("a"),
        greatest(col("probe_id"), col("doc_id")).as("b"),
        col("minhash_sim"))
      .distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  test("one-batch index probed with the corpus equals q_dedup_minhash") {
    val root = java.nio.file.Files
      .createTempDirectory("graft-inclsh-eq").toString + "/lsh"
    IncrementalLsh.applyBatch(spark, root,
      docs().withColumn("op", lit("I")), 0L)
    val got = pairsOf(
      IncrementalLsh.candidates(spark, root, docs()))
    Materialize.releaseAll()
    val expect = SparkEntry.queries("q_dedup_minhash")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    Materialize.releaseAll()
    assert(got === expect && got.nonEmpty,
      "the index's candidate set must be the contract operator's")
  }

  test("an index with no member segments answers empty, not an error") {
    import spark.implicits._
    val root = java.nio.file.Files
      .createTempDirectory("graft-inclsh-empty").toString + "/lsh"
    // a delete-only first batch pins the layout and writes the
    // changelog but (correctly) no members segment at all
    IncrementalLsh.applyBatch(spark, root,
      Seq((1L, "", "D")).toDF("doc_id", "text", "op"), 0L)
    val got = IncrementalLsh.candidates(spark, root,
      docs().limit(5))
    assert(got.collect().isEmpty)
    assert(got.columns.toSeq === Seq("probe_id", "doc_id", "minhash_sim"))
    // compaction over the changelog-only state must not crash either —
    // the inline compactEvery cadence reaches it on delete-heavy feeds
    IncrementalLsh.applyBatch(spark, root,
      Seq((2L, "", "D")).toDF("doc_id", "text", "op"), 1L,
      compactEvery = 1)
    IncrementalLsh.compact(spark, root, upTo = 1L)
    assert(IncrementalLsh.candidates(spark, root, docs().limit(5))
      .collect().isEmpty)
    // and a later real batch lands on the folded-empty base
    val someDoc = docs().limit(1).collect().head
    IncrementalLsh.applyBatch(spark, root,
      Seq((900100L, someDoc.getString(1), "I"))
        .toDF("doc_id", "text", "op"), 2L)
    val hit = IncrementalLsh.candidates(spark, root,
      Seq((900101L, someDoc.getString(1))).toDF("doc_id", "text"))
      .collect()
    assert(hit.nonEmpty && hit.head.getDouble(2) === 1.0)
  }

  test("CDC batches track the from-scratch index; compaction preserves answers") {
    val inc = java.nio.file.Files
      .createTempDirectory("graft-inclsh-cdc").toString + "/lsh"
    import spark.implicits._

    // live corpus tracked alongside
    val all = docs().collect().map(r => (r.getLong(0), r.getString(1)))
    var live = all.filter(_._1 % 2 == 0).toMap
    IncrementalLsh.applyBatch(spark, inc,
      live.toSeq.toDF("doc_id", "text").withColumn("op", lit("I")), 0L)

    // batch 1: add the odd half, UPDATE one doc to another's text (a
    // guaranteed full-signature near-dup), DELETE one
    val oddHalf = all.filter(_._1 % 2 == 1).toMap
    val (victim, _) = live.head
    val stolenText = oddHalf.head._2
    val deleted = live.keys.max
    val b1 = oddHalf.toSeq.map { case (id, t) => (id, t, "I") } ++
      Seq((victim, stolenText, "U"),
        (deleted, "", "D"))
    IncrementalLsh.applyBatch(spark, inc,
      b1.toDF("doc_id", "text", "op"), 1L)
    live = live ++ oddHalf + (victim -> stolenText) - deleted

    def check(probes: DataFrame): Unit = {
      val scratch = java.nio.file.Files
        .createTempDirectory("graft-inclsh-scr").toString + "/lsh"
      IncrementalLsh.applyBatch(spark, scratch,
        live.toSeq.toDF("doc_id", "text").withColumn("op", lit("I")), 0L)
      val got = pairsOf(IncrementalLsh.candidates(spark, inc, probes))
      val expect = pairsOf(
        IncrementalLsh.candidates(spark, scratch, probes))
      Materialize.releaseAll()
      assert(got === expect)
    }

    // probes: a fresh near-dup of an indexed doc plus a corpus slice
    val probes = (Seq((900001L, stolenText)) ++
      live.toSeq.filter(_._1 % 7 == 0)).toDF("doc_id", "text")
    check(probes)
    // the takedown is really gone and the update really moved
    val hits = pairsOf(IncrementalLsh.candidates(spark, inc, probes))
    Materialize.releaseAll()
    assert(!hits.exists(p => p._1 == deleted || p._2 == deleted),
      "a deleted doc must never surface as a candidate")
    assert(hits.exists(p =>
      (p._1 == 900001L || p._2 == 900001L) &&
        (p._1 == victim || p._2 == victim) && p._3 == 1.0),
      "the updated doc must match the probe carrying its new text")

    // compaction folds the log without changing any candidate; a
    // re-run at the published horizon is the crashed-cleanup retry and
    // must converge, never re-fold over the live tree
    IncrementalLsh.compact(spark, inc, upTo = 1L)
    check(probes)
    IncrementalLsh.compact(spark, inc, upTo = 1L)
    check(probes)
    // the bucket count is frozen at creation — a mismatched writer
    // fails loudly instead of stranding rows in unreadable buckets
    intercept[IllegalArgumentException] {
      IncrementalLsh.applyBatch(spark, inc,
        Seq((900009L, stolenText, "I")).toDF("doc_id", "text", "op"),
        9L, nBuckets = 64)
    }
    // and later batches land on the compacted base
    IncrementalLsh.applyBatch(spark, inc,
      Seq((900002L, stolenText, "I")).toDF("doc_id", "text", "op"), 2L)
    live += 900002L -> stolenText
    check(probes)
    // a redelivered batch at/below the horizon (its segments and
    // _SUCCESS evidence compacted away) no-ops instead of wedging —
    // state untouched, no segment written
    IncrementalLsh.applyBatch(spark, inc,
      Seq((900777L, stolenText, "I")).toDF("doc_id", "text", "op"), 1L)
    check(probes)
    assert(!new java.io.File(s"$inc/docs/seq=1").exists,
      "a below-horizon redelivery must not write a segment")
  }

  // ---- parameterized banding schemes ([[LshPlanner]] integration) ----

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** Independent (driver-Scala) reimplementation of the signature +
    * banding formulas: token 3-shingles at positions 1..max(len-2,1),
    * component j = min over shingles of md5(j || ':' || shingle),
    * band d = components d·r+1..d·r+r.
    */
  private def sigOf(text: String, k: Int): Seq[String] = {
    val toks = text.split(" ", -1).toSeq
    val shingles = (1 to math.max(toks.size - 2, 1))
      .map(i => toks.slice(i - 1, i + 2).mkString(" ")).distinct
    (0 until k).map(j => shingles.map(sh => md5hex(s"$j:$sh")).min)
  }

  private def round4(x: Double): Double =
    BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("a planner-chosen scheme pins, bands and matches an independent formulation") {
    import spark.implicits._
    // threshold 0.7 on a 12-component budget: a genuinely different
    // factorization than the contract 4x2 (the planner's whole point)
    val (nb, nr) = LshPlanner.choose(12, 0.7)
    assert((nb, nr) !==
      ((IncrementalLsh.DefaultBands, IncrementalLsh.DefaultRows)),
      "pick a budget whose planned banding differs from the default")
    val root = java.nio.file.Files
      .createTempDirectory("graft-inclsh-plan").toString + "/lsh"
    val corpus = docs().filter(col("doc_id") % 3 === 0)
      .collect().map(x => (x.getLong(0), x.getString(1)))
    IncrementalLsh.applyBatch(spark, root,
      corpus.toSeq.toDF("doc_id", "text").withColumn("op", lit("I")),
      0L, bands = nb, rows = nr)
    val got = pairsOf(IncrementalLsh.candidates(spark, root,
      corpus.toSeq.toDF("doc_id", "text")))
    Materialize.releaseAll()

    // from-scratch banding of the same scheme, computed independently
    val sigs = corpus.map { case (id, t) => id -> sigOf(t, nb * nr) }.toMap
    val buckets = scala.collection.mutable
      .Map.empty[(Int, String), scala.collection.mutable.TreeSet[Long]]
    for ((id, sg) <- sigs; d <- 0 until nb)
      buckets.getOrElseUpdate(
        (d, sg.slice(d * nr, d * nr + nr).mkString("|")),
        scala.collection.mutable.TreeSet.empty[Long]) += id
    val expect = buckets.values.flatMap(_.toSeq.combinations(2)).map {
      case Seq(a, b) => (a, b, round4(
        sigs(a).zip(sigs(b)).count(t => t._1 == t._2).toDouble / (nb * nr)))
    }.toSet
    assert(got === expect && got.nonEmpty,
      "the planner-scheme index must band exactly like the formulas say")

    // the scheme is frozen at the root: a contract-default writer is
    // rejected loudly instead of silently mis-banding
    val e = intercept[IllegalArgumentException] {
      IncrementalLsh.applyBatch(spark, root,
        Seq((1L, "x y z", "I")).toDF("doc_id", "text", "op"), 1L)
    }
    assert(e.getMessage.contains("frozen at creation"))
  }

  test("scheme rebuild cutover: the planner banding replaces 4x2 atomically") {
    import spark.implicits._
    val parent = java.nio.file.Files
      .createTempDirectory("graft-inclsh-bg").toString + "/lsh"
    IncrementalLsh.initializeAliased(spark, parent)
    val all = docs().filter(col("doc_id") % 5 === 0)
      .collect().map(x => (x.getLong(0), x.getString(1)))
    val (h1, h2) = all.splitAt(all.length / 2)
    IncrementalLsh.applyBatchActive(spark, parent,
      h1.toSeq.toDF("doc_id", "text").withColumn("op", lit("I")), 0L)
    IncrementalLsh.applyBatchActive(spark, parent,
      h2.toSeq.toDF("doc_id", "text").withColumn("op", lit("I")), 1L)
    val probes = (Seq((990001L, all.head._2)) ++ all.take(20).toSeq)
      .toDF("doc_id", "text")
    assert(pairsOf(IncrementalLsh.candidatesActive(spark, parent, probes))
      .nonEmpty)
    Materialize.releaseAll()

    // tuning decided a sharper scheme; the active root's pins refuse
    // an in-place scheme change (that is what the cutover is for)
    val (nb, nr) = LshPlanner.choose(12, 0.7)
    intercept[IllegalArgumentException] {
      IncrementalLsh.applyBatchActive(spark, parent,
        Seq((991L, "a b c", "I")).toDF("doc_id", "text", "op"), 2L,
        bands = nb, rows = nr)
    }

    // blue/green rebuild at the planned scheme from the authoritative
    // corpus; lookups cut over atomically at the alias flip
    val newRoot = IncrementalLsh.rebuildCutover(spark, parent,
      all.toSeq.toDF("doc_id", "text"), nb, nr)
    assert(IncrementalLsh.activeRoot(spark, parent) === newRoot)
    val scratch = java.nio.file.Files
      .createTempDirectory("graft-inclsh-bgscr").toString + "/lsh"
    IncrementalLsh.applyBatch(spark, scratch,
      all.toSeq.toDF("doc_id", "text").withColumn("op", lit("I")), 0L,
      bands = nb, rows = nr)
    val got = pairsOf(
      IncrementalLsh.candidatesActive(spark, parent, probes))
    val expect = pairsOf(
      IncrementalLsh.candidates(spark, scratch, probes))
    Materialize.releaseAll()
    assert(got === expect,
      "post-flip lookups must serve the rebuilt scheme exactly")

    // the feed continues with monotone ids at the NEW scheme (the bulk
    // load landed at the old head id); the OLD scheme now fails loud
    IncrementalLsh.applyBatchActive(spark, parent,
      Seq((990002L, all.head._2, "I")).toDF("doc_id", "text", "op"), 2L,
      bands = nb, rows = nr)
    intercept[IllegalArgumentException] {
      IncrementalLsh.applyBatchActive(spark, parent,
        Seq((990003L, "x", "I")).toDF("doc_id", "text", "op"), 3L)
    }
    val hit = IncrementalLsh.candidatesActive(spark, parent,
      Seq((990009L, all.head._2)).toDF("doc_id", "text")).collect()
    assert(hit.exists(x => x.getLong(1) == 990002L &&
      x.getDouble(2) == 1.0))

    // a never-fed aliased index refuses the cutover (id-0 reuse would
    // swallow the feed's first batch)
    val virgin = java.nio.file.Files
      .createTempDirectory("graft-inclsh-virgin").toString + "/lsh"
    IncrementalLsh.initializeAliased(spark, virgin)
    val e = intercept[IllegalArgumentException] {
      IncrementalLsh.rebuildCutover(spark, virgin,
        Seq((1L, "hello")).toDF("doc_id", "text"), nb, nr)
    }
    assert(e.getMessage.contains("never received a batch"))
  }
}
