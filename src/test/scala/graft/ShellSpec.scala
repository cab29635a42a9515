package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The ad-hoc CLI must reproduce the contract queries' semantics —
  * same engine underneath, no second interpreter (SURVEY.md §3.1).
  */
class ShellSpec extends AnyFunSuite {
  import SparkTestBase._

  test("tokenize honors single-quoted spans") {
    assert(Shell.tokenize("filter events '^(sign|purch)'") ===
      List("filter", "events", "^(sign|purch)"))
    assert(Shell.tokenize("wordcount documents text") ===
      List("wordcount", "documents", "text"))
    assert(Shell.tokenize("filter documents 'two words here'") ===
      List("filter", "documents", "two words here"))
    intercept[IllegalArgumentException](Shell.tokenize("filter 'oops"))
  }

  test("filter command reproduces q_filter_regex rows") {
    // the demo pattern only matches event_type values, so any-column
    // grep and the contract's typed filter select the same rows
    val shell = Shell.run(spark, sf0001, "filter events '^(sign|purch)'")
      .select("event_id", "user_id", "event_type", "value")
      .orderBy("event_id").collect().toSeq.map(_.toString)
    val contract = SparkEntry.queries("q_filter_regex")(spark, sf0001)
      .collect().toSeq.map(_.toString)
    assert(shell === contract)
  }

  test("column-scoped filter matches typed filter") {
    val shell = Shell
      .run(spark, sf0001, "filter events event_type '^(sign|purch)'")
      .count()
    val contract = SparkEntry.queries("q_filter_regex")(spark, sf0001).count()
    assert(shell === contract)
  }

  test("wordcount command reproduces q_wordcount") {
    val shell = Shell.run(spark, sf0001, "wordcount documents text")
      .collect().toSeq.map(_.toString)
    val contract = SparkEntry.queries("q_wordcount")(spark, sf0001)
      .collect().toSeq.map(_.toString)
    assert(shell === contract)
  }

  test("join command matches the contract join's cardinality") {
    val n = Shell
      .run(spark, sf0001, "join orders customer o_custkey c_custkey")
      .count()
    assert(n === 1500L) // q_join_inner golden at sf0.001
  }

  test("grep command counts matching rows") {
    val n = Shell.run(spark, sf0001, "grep events '^signup$'")
      .head().getLong(0)
    val expected = graft.sources.Tables.events(spark, sf0001)
      .filter(col("event_type") === "signup").count()
    assert(n === expected)
  }

  test("dedup command keeps one row per content digest") {
    val out = Shell.run(spark, sf0001, "dedup documents text")
    // sf0.001 documents are all content-distinct (q_dedup_exact golden)
    assert(out.count() === 500L)
    assert(out.filter(col("n_dups") =!= 1).count() === 0L)
    assert(out.columns.toSeq ===
      Seq("doc_id", "text", "lang", "source", "n_chars", "n_dups"))
  }

  test("split command tags rows like q_sample_split") {
    val byTag = Shell.run(spark, sf0001, "split documents doc_id")
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val contract = SparkEntry.queries("q_sample_split")(spark, sf0001)
      .groupBy("split").agg(sum("n_docs").as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(byTag === contract)
  }

  test("contract command dispatches to SparkEntry queries") {
    val viaShell = Shell.run(spark, sf0001, "contract q_wordcount")
      .collect().toSeq.map(_.toString)
    val direct = SparkEntry.queries("q_wordcount")(spark, sf0001)
      .collect().toSeq.map(_.toString)
    assert(viaShell === direct)
    intercept[IllegalArgumentException](
      Shell.run(spark, sf0001, "contract q_nonexistent"))
  }

  test("unknown command is rejected") {
    intercept[IllegalArgumentException](
      Shell.run(spark, sf0001, "frobnicate events"))
  }

  test("partition=range on wordcount: same rows, contiguous key ranges") {
    val plain = Shell.run(spark, sf0001, "wordcount documents text")
      .collect().map(_.toString).toSet
    val parted = Shell
      .run(spark, sf0001, "wordcount documents text partition=range:4")
    val withPid = parted.withColumn("pid", spark_partition_id())
    assert(parted.rdd.getNumPartitions === 4)
    assert(parted.collect().map(_.toString).toSet === plain)
    // range mode = contiguous, non-overlapping key spans per partition
    val spans = withPid.groupBy("pid")
      .agg(min("word").as("lo"), max("word").as("hi"))
      .orderBy("pid").collect()
      .map(r => (r.getString(1), r.getString(2)))
    spans.sliding(2).foreach {
      case Array((_, hi), (lo, _)) => assert(hi <= lo,
        s"partition spans overlap: $hi > $lo")
      case _ =>
    }
  }

  test("partition=hash on join: same rows, one partition per key") {
    val parted = Shell.run(spark, sf0001,
      "join orders customer o_custkey c_custkey partition=hash:4")
    assert(parted.rdd.getNumPartitions === 4)
    assert(parted.count() === 1500L)
    val keyPids = parted
      .select(col("o_custkey"), spark_partition_id().as("pid"))
      .groupBy("o_custkey").agg(countDistinct("pid").as("n"))
    assert(keyPids.filter(col("n") =!= 1).count() === 0L,
      "hash mode must route every key to exactly one partition")
  }

  test("partition= is rejected where it has no sink meaning") {
    intercept[IllegalArgumentException](
      Shell.run(spark, sf0001, "grep events 'signup' partition=hash"))
    intercept[IllegalArgumentException](
      Shell.run(spark, sf0001, "wordcount documents text partition=zigzag"))
  }

  test("export -> import -> query round trip via LineSources") {
    val path = java.nio.file.Files
      .createTempDirectory("graft-shell-export").toString + "/kv"
    val n = Shell.run(spark, sf0001,
      s"export nation n_nationkey n_name $path partition=range:2")
      .head().getLong(0)
    assert(n === 25L)
    val imported = Shell.run(spark, sf0001, s"import $path")
    assert(imported.columns.toSeq === Seq("key", "value"))
    val roundTrip = imported
      .select(col("key").cast("long").as("k"), col("value").as("v"))
      .orderBy("k").collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    val original = graft.sources.Tables.table(spark, sf0001, "nation")
      .select(col("n_nationkey").cast("long"), col("n_name"))
      .orderBy("n_nationkey").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(roundTrip === original)
  }

  test("pipetsv re-enters typed land with named columns") {
    val df = Shell.run(spark, sf0001,
      "pipetsv region 'cut -f1,2' rk,name")
    assert(df.columns.toSeq === Seq("rk", "name"))
    val got = df.collect().map(r => (r.getString(0), r.getString(1))).toSeq
    val expected = graft.sources.Tables.table(spark, sf0001, "region")
      .select(col("r_regionkey").cast("string"), col("r_name"))
      .orderBy("r_regionkey").collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq
    assert(got.sortBy(_._1) === expected.sortBy(_._1))
  }

  test("zorder command writes a clustered layout and audits it") {
    val out = java.nio.file.Files.createTempDirectory("graft-shell-z").toString
    val stats = Shell.run(spark, sf0001,
      s"zorder lineitem l_partkey,l_extendedprice 4 8 $out")
    assert(stats.count() === 8)
    assert(stats.agg(sum("rows")).head().getLong(0) === 6000L)
    assert(stats.columns.toSet ===
      Set("file", "rows", "min_l_partkey", "max_l_partkey",
        "min_l_extendedprice", "max_l_extendedprice"))

    // hilbert variant lays out the same rows
    val out2 = java.nio.file.Files.createTempDirectory("graft-shell-h").toString
    val stats2 = Shell.run(spark, sf0001,
      s"zorder lineitem l_partkey,l_extendedprice 4 8 $out2 hilbert")
    assert(stats2.agg(sum("rows")).head().getLong(0) === 6000L)

    // prune plans fewer files than the directory holds for a mid box
    val pruned = Shell.run(spark, sf0001, s"prune $out l_partkey 80 119")
    assert(pruned.count() > 0 && pruned.count() < 8)

    // manifest shows one row per file
    val m = Shell.run(spark, sf0001, s"manifest $out l_partkey")
    assert(m.count() === 8)
  }

  test("compact command bin-packs a fragmented dir, preserving rows") {
    val in = java.nio.file.Files.createTempDirectory("graft-shell-ci").toString
    spark.read.parquet(s"$sf0001/documents.parquet")
      .repartition(12).write.mode("overwrite").parquet(in)
    val target = new java.io.File(in).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.length).sum / 3 + 1
    val out = java.nio.file.Files.createTempDirectory("graft-shell-co")
      .toString + "/t"
    val plan = Shell.run(spark, sf0001, s"compact $in $target $out")
    val bins = plan.count()
    assert(bins > 0 && bins < 12)
    assert(plan.agg(sum("n_input_files")).head().getLong(0) === 12L)
    assert(spark.read.parquet(out).count() === 500L)
  }

  test("audit contract command lints a contract plan clean") {
    val f = Shell.run(spark, sf0001, "audit contract q_groupby_agg")
    assert(f.columns.toSeq === Seq("rule", "operator", "detail"))
    assert(f.count() === 0L)
    Materialize.releaseAll()
  }

  test("redact command audits the corpus per PII type") {
    val rep = Shell.run(spark, sf0001, "redact documents text")
    val rows = rep.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows.keySet === Set("email", "ip", "ssn", "phone", "card"))
    // the synthetic fixture corpus carries no PII
    assert(rows.values.forall(_ === 0L))
  }

  test("pack command reports exact shard accounting") {
    val row = Shell.run(spark, sf0001, "pack 512 30").head()
    val (n, total, full) = (row.getLong(0), row.getLong(1), row.getLong(2))
    assert(n > 0 && total > 0)
    // every sequence but (at most) the stream tail is full
    assert(full >= n - 1)
    assert(total > (n - 1) * 512 && total <= n * 512)
  }

  test("pack command with an epoch packs the permuted stream exactly") {
    val row0 = Shell.run(spark, sf0001, "pack 512 30").head()
    val rowE = Shell.run(spark, sf0001, "pack 512 30 1").head()
    // a permutation conserves the stream: same sequence count, same
    // total tokens, same full-chunk invariant
    assert(rowE.getLong(0) === row0.getLong(0))
    assert(rowE.getLong(1) === row0.getLong(1))
    assert(rowE.getLong(2) >= rowE.getLong(0) - 1)
  }

  test("curate command shows the monotone per-stage accounting") {
    val rep = Shell.run(spark, sf0001, "curate").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(rep.map(_._1).toSeq === Seq("00_input", "01_exact_dedup",
      "02_norm_dedup", "03_minhash_dedup", "04_quality_filter"))
    // remaining counts never increase; dropped always reconciles
    rep.sliding(2).foreach {
      case Array((_, r1, _), (_, r2, d2)) =>
        assert(r2 <= r1 && r1 - r2 === d2)
      case _ =>
    }
  }

  test("shards command writes per-split epoch files plus the tokenizer") {
    val out = java.nio.file.Files.createTempDirectory("graft-shcmd").toString
    val rep = Shell.run(spark, sf0001, s"shards 256 20 1 $out").collect()
      .map(r => (r.getString(0), r.getInt(1))).toMap
    graft.Materialize.releaseAll()
    assert(rep.keySet === Set("train", "val", "test"))
    assert(rep.values.forall(_ >= 1))
    Seq("train", "val", "test", "tokenizer").foreach { d =>
      assert(new java.io.File(s"$out/$d").exists(), s"$d missing")
    }
    // the shards really read back as token sequences
    val n = spark.read.parquet(s"$out/train").count()
    assert(n > 0)
  }

  test("despan command accounts removals; fix adds the round count") {
    val one = Shell.run(spark, sf0001, "despan 6").head()
    assert(one.getLong(0) === 500L)
    assert(one.getLong(3) >= 0L && one.getLong(3) <= one.getLong(2))
    val fix = Shell.run(spark, sf0001, "despan 6 fix").head()
    assert(fix.getLong(0) === 500L)
    // the fixpoint can only remove at least as much as one pass
    assert(fix.getLong(3) >= one.getLong(3))
    assert(fix.getInt(4) >= 1)
  }

  test("quality command surfaces the lowest-scored docs") {
    val rows = Shell.run(spark, sf0001, "quality 10").collect()
    graft.Materialize.releaseAll()
    assert(rows.length === 10)
    val scores = rows.map(_.getDouble(1)).toSeq
    assert(scores === scores.sorted, "ascending by score")
    assert(scores.forall(s => s >= 0.0 && s <= 1.0))
    // the lowest-scored docs should be mostly heuristic negatives
    assert(rows.map(_.getDouble(2)).sum <= 3.0,
      "bottom-10 by learned score must be mostly label-0 docs")
  }

  test("spans command reports top duplicated-span coverage") {
    val rep = Shell.run(spark, sf0001, "spans 6").collect()
    assert(rep.length <= 20 && rep.nonEmpty)
    val fr = rep.map(_.getDouble(4)).toSeq
    assert(fr === fr.sortBy(-(_: Double)))
    assert(fr.forall(f => f >= 0.0 && f <= 1.0))
  }

  test("search command fuses BM25 and embedding-cosine rankings") {
    val hits = Shell.run(spark, sf0001, "search filter,window 3 10").collect()
    assert(hits.length === 10)
    assert(!hits.map(_.getLong(0)).contains(3L))
    val scores = hits.map(_.getDouble(1)).toSeq
    assert(scores === scores.sortBy(-_))
  }

  test("bpe command trains and reports the merge table and stats") {
    val merges = Shell.run(spark, sf0001, "bpe 15").collect()
    assert(merges.length === 15)
    assert(merges.map(_.getInt(0)).toSeq === (0 until 15))
    merges.foreach(r =>
      assert(r.getString(3) === r.getString(1) + r.getString(2)))
    val stats = Shell.run(spark, sf0001, "bpe stats 15").collect()
    assert(stats.nonEmpty && stats.forall(_.getAs[Double]("fertility") >= 1.0))
    // mode knob reaches the trainer (bytes-mode merge products are
    // byte-char strings; the run must not be ascii's)
    val bmerges = Shell.run(spark, sf0001, "bpe 15 bytes").collect()
    assert(bmerges.length === 15)
    val bstats = Shell.run(spark, sf0001, "bpe stats 10 unicode").collect()
    assert(bstats.nonEmpty)
  }

  test("lshplan command chooses an exact-cover scheme with a monotone curve") {
    val rows = Shell.run(spark, sf0001, "lshplan 128 0.8").collect()
    assert(rows.length === 11)
    val (b, r) = (rows.head.getInt(0), rows.head.getInt(1))
    assert(b * r === 128)
    assert(math.abs(rows.head.getDouble(2) -
      math.pow(1.0 / b, 1.0 / r)) < 1e-3)
    val ps = rows.map(_.getDouble(4)).toSeq
    ps.sliding(2).foreach { case Seq(a, c) => assert(a <= c + 1e-9) }
  }

  test("mixture command plans, repeats and accounts per source") {
    // src0 (~1500 toks) at weight .75 of a 6000-token budget needs
    // ~3 epochs; src1 at .25 undersamples — both must land near target
    val rows = Shell
      .run(spark, sf0001, "mixture 6000 src0:0.75,src1:0.25")
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5))).toMap
    assert(rows.keySet === Set("src0", "src1"))
    val (nDocs0, emitted0, _, target0, err0) = rows("src0")
    assert(nDocs0 === 25L && emitted0 > 50L, "src0 must repeat epochs")
    assert(target0 === 4500L && err0 < 0.1)
    assert(rows("src1")._4 === 1500L && rows("src1")._5 < 0.25)
    intercept[IllegalArgumentException](
      Shell.run(spark, sf0001, "mixture 6000 src0=oops"))
  }

  test("refresh command's delta accounting balances against full curate") {
    val row = Shell.run(spark, sf0001, "refresh").head
    Materialize.releaseAll()
    val (arrivals, kept, dropped, demoted, restored) =
      (row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3),
        row.getLong(4))
    assert(arrivals > 0 && kept + dropped === arrivals)

    // kept(before) − demoted + restored + arrivals_kept must equal the
    // kept set of a from-scratch curate over the whole corpus — the
    // delta is a complete account of every verdict the batch moved
    import graft.operators.CorpusRefresh
    import graft.sources.Tables
    val docs = Tables.documents(spark, sf0001)
      .select("doc_id", "lang", "text")
    val isArrival =
      substring(md5(col("doc_id").cast("string").cast("binary")), 1, 1)
        .isin("0", "1", "2")
    def keptOf(df: org.apache.spark.sql.DataFrame) =
      CorpusRefresh.fullFlags(spark, df).filter(col("quality_ok")).count()
    val keptBefore = keptOf(docs.filter(!isArrival))
    val keptAll = keptOf(docs)
    Materialize.releaseAll()
    assert(keptBefore - demoted + restored + kept === keptAll)
  }

  test("index commands drive the incremental inverted index end to end") {
    import graft.operators.{IncrementalIndex, InvertedIndex}
    import graft.sources.Tables
    val root = java.nio.file.Files
      .createTempDirectory("graft-shell-idx").toString + "/idx"

    // two CDC slices cover the whole documents table (doc_id % 2)
    val s0 = Shell.run(spark, sf0001, s"index apply $root 0 2 0").head
    val s1 = Shell.run(spark, sf0001, s"index apply $root 1 2 1").head
    val total = Tables.documents(spark, sf0001).count()
    assert(s0.getLong(1) > 0 && s1.getLong(1) === total,
      "after both slices every doc must be live")

    // the REPL search equals bm25 over a from-scratch rebuild
    val shell = Shell
      .run(spark, sf0001, s"index search $root data,model 5")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val full = InvertedIndex.build(
      Tables.documents(spark, sf0001), "doc_id", "text")
    val (n, avgDl) = IncrementalIndex.stats(spark, root)
    val expect = InvertedIndex
      .bm25Query(full, n, avgDl, Seq("data", "model"), 5)
      .withColumn("score", round(col("score"), 4))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(shell === expect && shell.nonEmpty)

    // maintenance from the REPL: one fresh segment per log remains
    // (the horizon folds batch 0), and search answers do not move
    val segRows = Shell.run(spark, sf0001, s"index compact $root 0")
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(segRows.values.forall(_ === 1L),
      s"exactly the post-horizon segment should remain: $segRows")
    val after = Shell
      .run(spark, sf0001, s"index search $root data,model 5")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(after === shell)
  }

  test("lsh commands drive the incremental candidate index end to end") {
    import graft.operators.IncrementalLsh
    import graft.sources.Tables
    val root = java.nio.file.Files
      .createTempDirectory("graft-shell-lsh").toString + "/lsh"

    // index the even half, then probe with the odd half from the REPL
    Shell.run(spark, sf0001, s"lsh apply $root 0 2 0").head
    val shell = Shell.run(spark, sf0001, s"lsh candidates $root 2 1")
      .collect().map(_.toString).toSeq
    val direct = IncrementalLsh.candidates(spark, root,
        Tables.documents(spark, sf0001)
          .filter(col("doc_id") % 2 === 1).select("doc_id", "text"))
      .orderBy("probe_id", "doc_id")
      .collect().map(_.toString).toSeq
    Materialize.releaseAll()
    assert(shell === direct && shell.nonEmpty)

    // maintenance from the REPL: the horizon folds batch 0
    val segRows = Shell.run(spark, sf0001, s"lsh compact $root 0")
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(segRows.values.forall(_ === 0L),
      s"every segment is at/below the horizon: $segRows")
    val after = Shell.run(spark, sf0001, s"lsh candidates $root 2 1")
      .collect().map(_.toString).toSeq
    Materialize.releaseAll()
    assert(after === shell)
  }

  test("ivf commands drive the aliased incremental IVF end to end") {
    import graft.operators.IncrementalIvf
    import graft.sources.Tables
    val parent = java.nio.file.Files
      .createTempDirectory("graft-shell-ivf").toString + "/ann"

    val rep = Shell.run(spark, sf0001, s"ivf init $parent 4 2")
      .collect().map(r => (r.getInt(0), r.getLong(1))).toMap
    val total = Tables.embeddings(spark, sf0001).count()
    assert(rep(-1) === total, "batch 0 must hold every embedding")

    // searching from the REPL matches the module search on the active
    // generation
    val probeId = 3L
    val shell = Shell.run(spark, sf0001, s"ivf search $parent $probeId 5 2")
      .collect().map(_.toString).toSeq
    val probe = Tables.embeddings(spark, sf0001)
      .filter(col("vec_id") === probeId)
      .select(col("embedding").cast("array<double>"))
      .head.getSeq[Double](0).toSeq
    val direct = IncrementalIvf.search(spark,
      IncrementalIvf.activeRoot(spark, parent), probe, 5, 2)
      .collect().map(_.toString).toSeq
    assert(shell === direct && shell.nonEmpty)

    // retrain flips the generation and reports the new fit
    val r = Shell.run(spark, sf0001, s"ivf retrain $parent 4 2").head
    assert(r.getString(0) === "g0" && r.getString(1) === "g1")
    assert(IncrementalIvf.activeRoot(spark, parent).endsWith("/g1"))
    assert(r.getDouble(3) > 0.0, "the live fit must be measurable")
  }

  test("aliased index/lsh commands resolve the active generation; rebuilds flip it") {
    import graft.operators.{IncrementalIndex, IncrementalLsh}
    val base = java.nio.file.Files
      .createTempDirectory("graft-shell-bg").toString

    // inverted index: init an aliased parent, feed THROUGH the parent
    // path, rebuild — the reindex keeps only the live slice
    Shell.run(spark, sf0001, s"index init $base/idx")
    Shell.run(spark, sf0001, s"index apply $base/idx 0 2 0")
    val before = Shell
      .run(spark, sf0001, s"index search $base/idx data,model 5")
      .collect().map(_.toString).toSeq
    val rb = Shell.run(spark, sf0001, s"index rebuild $base/idx").head
    assert(rb.getString(0) === "g0" && rb.getString(1) === "g1")
    assert(IncrementalIndex.activeRoot(spark, s"$base/idx")
      .endsWith("/g1"))
    assert(Shell.run(spark, sf0001, s"index search $base/idx data,model 5")
      .collect().map(_.toString).toSeq === before,
      "a reindex of the same corpus must not move the ranking")

    // LSH: planner-driven scheme rebuild from the REPL — the flipped
    // generation answers under the chosen banding, and the commands
    // keep addressing the parent transparently
    Shell.run(spark, sf0001, s"lsh init $base/lsh")
    Shell.run(spark, sf0001, s"lsh apply $base/lsh 0 2 0")
    val r = Shell.run(spark, sf0001, s"lsh rebuild $base/lsh 12 0.7").head
    assert(r.getString(0) === "g0" && r.getString(1) === "g1")
    assert((r.getInt(2), r.getInt(3)) ===
      graft.operators.LshPlanner.choose(12, 0.7))
    val viaParent = Shell
      .run(spark, sf0001, s"lsh candidates $base/lsh 2 1")
      .collect().map(_.toString).toSeq
    val direct = IncrementalLsh.candidates(spark,
        IncrementalLsh.activeRoot(spark, s"$base/lsh"),
        graft.sources.Tables.documents(spark, sf0001)
          .filter(col("doc_id") % 2 === 1).select("doc_id", "text"))
      .orderBy("probe_id", "doc_id")
      .collect().map(_.toString).toSeq
    assert(viaParent === direct)
    Materialize.releaseAll()

    // the REPL feed path survives the scheme cutover: apply resolves
    // the active root's PINNED scheme instead of hardcoding the
    // contract default (which the pins would rightly refuse)
    Shell.run(spark, sf0001, s"lsh apply $base/lsh 1 7 0")
    Materialize.releaseAll()

    // re-initializing a LIVE parent is refused — it would cut
    // production over to an empty (even GC'd) g0 with no error
    intercept[IllegalArgumentException](
      Shell.run(spark, sf0001, s"index init $base/idx"))
    intercept[IllegalArgumentException](
      Shell.run(spark, sf0001, s"lsh init $base/lsh"))

    // the maintained-store hybrid query rides the same aliased paths:
    // REPL fusion == the module fusion over identical legs
    Shell.run(spark, sf0001, s"ivf init $base/ann2 4 2")
    val viaShell = Shell.run(spark, sf0001,
        s"msearch $base/idx $base/ann2 data,model 3 5 2")
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    val probe = graft.sources.Tables.embeddings(spark, sf0001)
      .filter(col("vec_id") === 3L)
      .select(col("embedding").cast("array<double>"))
      .head.getSeq[Double](0).toSeq
    val directFused = graft.operators.HybridSearch.searchMaintained(
        spark, s"$base/idx", s"$base/ann2", Seq("data", "model"), probe,
        5, 2)
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    assert(viaShell === directFused && viaShell.nonEmpty)
    Materialize.releaseAll()

    // a CODED (IVFADC) deployment serves the same REPL command: the
    // Shell passes the embeddings table as the external store and
    // searchMaintained reranks the ADC shortlist against it
    val emb = graft.sources.Tables.embeddings(spark, sf0001)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("e"))
    graft.operators.IncrementalIvf.initializeCodedAliased(spark, emb,
      s"$base/ann3", k = 4, iters = 2)
    val viaShellCoded = Shell.run(spark, sf0001,
        s"msearch $base/idx $base/ann3 data,model 3 5 2")
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    val directCoded = graft.operators.HybridSearch.searchMaintained(
        spark, s"$base/idx", s"$base/ann3", Seq("data", "model"), probe,
        5, 2, vectors = Some(emb))
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    assert(viaShellCoded === directCoded && viaShellCoded.nonEmpty,
      "the REPL must serve coded roots through the rerank leg")
    Materialize.releaseAll()

    // the PRODUCTION route: `vstore=<root>` serves the coded rerank
    // from a bucketed vector zone via the I/O-pruned handle — same
    // fusion, store-file reads bounded by the shortlist's buckets
    val vzone = s"$base/vzone"
    graft.streaming.UpsertFileSink.upsertBatchBucketed(
      emb.withColumn("op", lit("U")).withColumn("seq", lit(0L)),
      0L, vzone, Seq("vec_id"), 8)
    val viaShellStore = Shell.run(spark, sf0001,
        s"msearch $base/idx $base/ann3 data,model 3 5 2 vstore=$vzone")
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    assert(viaShellStore === directCoded && viaShellStore.nonEmpty,
      "the vstore= handle route must fuse identically to the frame")
    // flag errors name the flag
    val ef = intercept[IllegalArgumentException](Shell.run(spark, sf0001,
      s"msearch $base/idx $base/ann3 data,model 3 5 2 vguess=$vzone"))
    assert(ef.getMessage.contains("vstore="))

    // `asof=<b>` time-travels the whole hybrid query (the composed
    // as-of correctness is pinned in HybridSearchSpec; here: REPL ==
    // module, and at the head it equals the live answer)
    val viaShellAsOf = Shell.run(spark, sf0001,
        s"msearch $base/idx $base/ann3 data,model 3 5 2 asof=1 " +
          s"vstore=$vzone")
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    assert(viaShellAsOf === directCoded,
      "asof at the live head must answer the live fusion")
    Materialize.releaseAll()
  }

  test("maintain runs each store kind's hygiene against live roots") {
    import graft.operators.{CorpusRefresh, IncrementalIvf}
    import graft.sources.Tables
    val base = java.nio.file.Files
      .createTempDirectory("graft-shell-maint").toString

    // index: two slices, one maintenance call — folded to the head,
    // answers unchanged
    Shell.run(spark, sf0001, s"index apply $base/idx 0 2 0")
    Shell.run(spark, sf0001, s"index apply $base/idx 1 2 1")
    val before = Shell
      .run(spark, sf0001, s"index search $base/idx data,model 5")
      .collect().map(_.toString).toSeq
    val mi = Shell.run(spark, sf0001, s"maintain index $base/idx").head
    assert(mi.getString(1) === "compact" &&
      mi.getString(2).contains("horizon 1"))
    assert(Shell.run(spark, sf0001, s"index search $base/idx data,model 5")
      .collect().map(_.toString).toSeq === before)

    // aliased ivf: compaction of the active generation; generation GC
    // ONLY under the explicit `gc` token — the REPL default must not
    // yank the previous generation from under in-flight readers right
    // after a cutover (the quiesce window is the operator's decision)
    Shell.run(spark, sf0001, s"ivf init $base/ann 4 2")
    Shell.run(spark, sf0001, s"ivf retrain $base/ann 4 2")
    val actsSafe = Shell.run(spark, sf0001, s"maintain ivf $base/ann")
      .collect().map(_.getString(1)).toSeq
    assert(!actsSafe.contains("gc-generations"),
      s"the default maintain must not GC generations: $actsSafe")
    assert(new java.io.File(s"$base/ann/g0").exists,
      "the superseded generation must survive a default maintain")
    val acts = Shell.run(spark, sf0001, s"maintain ivf $base/ann gc")
      .collect().map(_.getString(1)).toSeq
    assert(acts.contains("gc-generations"))
    assert(!new java.io.File(s"$base/ann/g0").exists)
    assert(IncrementalIvf.activeRoot(spark, base + "/ann").endsWith("/g1"))

    // lsh: fold + unchanged candidates
    Shell.run(spark, sf0001, s"lsh apply $base/lsh 0 2 0")
    val cands = Shell.run(spark, sf0001, s"lsh candidates $base/lsh 2 1")
      .collect().map(_.toString).toSeq
    val ml = Shell.run(spark, sf0001, s"maintain lsh $base/lsh").head
    assert(ml.getString(1) === "compact")
    assert(Shell.run(spark, sf0001, s"lsh candidates $base/lsh 2 1")
      .collect().map(_.toString).toSeq === cands)
    Materialize.releaseAll()

    // refresh state: checkpoint + vacuum across the four projections
    val docs = Tables.documents(spark, sf0001)
      .select("doc_id", "lang", "text").limit(40)
    CorpusRefresh.initialize(spark, docs, s"$base/state", nBuckets = 8)
    val mr = Shell
      .run(spark, sf0001, s"maintain refresh-state $base/state").head
    assert(mr.getString(0) === "refresh-state")
    assert(CorpusRefresh.currentFlags(spark, s"$base/state").count() > 0)
    Materialize.releaseAll()

    // retain=N keeps the as-of replay window below the fold (with a
    // single batch there is then nothing foldable)
    val mlr = Shell.run(spark, sf0001, s"maintain lsh $base/lsh retain=1")
      .head
    assert(mlr.getString(1) === "noop",
      s"retain=1 over one fresh batch must fold nothing: $mlr")

    // flags are rejected where they have no meaning — a silently
    // ignored `gc` would let an operator believe a reclamation ran
    intercept[IllegalArgumentException](
      Shell.run(spark, sf0001, s"maintain landing $base/lsh gc"))
    intercept[IllegalArgumentException](
      Shell.run(spark, sf0001, s"maintain refresh-state $base/state retain=1"))

    // unknown store kinds fail loudly
    intercept[IllegalArgumentException](
      Shell.run(spark, sf0001, s"maintain warehouse $base/idx"))

    // a malformed FLAG names the flag instead of falling through to
    // the generic unrecognized-command error
    val ef = intercept[IllegalArgumentException](
      Shell.run(spark, sf0001, s"maintain index $base/idx retain=1x"))
    assert(ef.getMessage.contains("unknown flag"), ef.getMessage)
  }
}
