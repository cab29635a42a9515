package graft

import org.scalatest.funsuite.AnyFunSuite

/** Semantic guarantees of the dedup operators on a planted mini-corpus
  * written in the documents-table schema: an exact duplicate MUST be
  * caught by every dedup path, a near-duplicate must surface as a
  * candidate without being flagged exact, and unrelated docs must
  * survive untouched.
  */
class DedupSemanticsSpec extends AnyFunSuite {
  import SparkTestBase._

  /** doc 1 = exact copy of doc 0; doc 2 = one-token edit of doc 0
    * (same first-3-token blocking key); doc 3 unrelated.
    */
  private lazy val corpusDir: String = {
    import spark.implicits._
    val base = "the quick scan joins every table while the merge sorts keys into order"
    val near = "the quick scan joins every table while the merge sorts rows into order"
    val other = "completely different content about windows and partitions and buckets here"
    val docs = Seq(
      (0L, base, "en", "src0", base.length.toLong),
      (1L, base, "en", "src1", base.length.toLong),
      (2L, near, "en", "src0", near.length.toLong),
      (3L, other, "en", "src1", other.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = java.nio.file.Files.createTempDirectory("graft-corpus").toString
    docs.coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("q_dedup_exact groups the exact pair under one digest") {
    val rows = SparkEntry.queries("q_dedup_exact")(spark, corpusDir)
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(rows.length === 3) // base(x2), near, other
    assert(rows.contains((0L, 2L))) // keep_id=0 with 2 duplicates
  }

  test("q_dedup_minhash reports the exact pair at sim 1.0") {
    val pairs = SparkEntry.queries("q_dedup_minhash")(spark, corpusDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(pairs.exists { case (a, b, s) => a == 0L && b == 1L && s == 1.0 })
    // the near-dup may band-collide, but never at full agreement:
    assert(!pairs.exists { case (a, b, s) => b == 2L && s == 1.0 })
  }

  test("q_dedup_minhash_keep drops only the exact duplicate") {
    val kept = SparkEntry.queries("q_dedup_minhash_keep")(spark, corpusDir)
      .collect().map(_.getLong(0)).toSet
    assert(kept === Set(0L, 2L, 3L))
  }

  test("q_dedup_simhash buckets the exact pair together") {
    val buckets = SparkEntry.queries("q_dedup_simhash")(spark, corpusDir)
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(buckets.contains((2L, 0L))) // n_docs=2, keep_id=0
  }

  test("q_dedup_jaccard: exact pair at 1.0, near pair strictly below") {
    val jac = SparkEntry.queries("q_dedup_jaccard")(spark, corpusDir)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(jac((0L, 1L)) === 1.0)
    assert(jac.get((0L, 2L)).forall(j => j > 0.5 && j < 1.0))
  }

  test("q_dedup_cluster releases superseded label frames eagerly") {
    // the fixpoint loop must hold ≤ 2 registered frames at any time
    // (bucket membership + the live labels) — a leaked round would
    // leave rounds+2 registered here
    Materialize.releaseAll()
    val out = SparkEntry.queries("q_dedup_cluster")(spark, sf0001).collect()
    assert(out.nonEmpty)
    assert(Materialize.activeCount <= 2,
      s"expected ≤ 2 registered frames, got ${Materialize.activeCount}")
    Materialize.releaseAll()
  }

  test("q_text_fingerprint groups the duplicate (and possibly near-dup) docs") {
    // Min-sampling fingerprints collide whenever the minimal 4-gram
    // lies in a shared region — so the near-dup may legitimately join
    // the exact pair's group. Required: a group keeping doc 0 with at
    // least the exact duplicate in it, and the unrelated doc alone.
    val groups = SparkEntry.queries("q_text_fingerprint")(spark, corpusDir)
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(groups.exists { case (n, keep) => keep == 0L && n >= 2L })
    assert(!groups.exists { case (_, keep) => keep == 3L })
  }
}
