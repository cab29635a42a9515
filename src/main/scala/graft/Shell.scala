package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Ad-hoc job CLI — the reference's user-facing surface (SURVEY.md
  * §3.1): a user submits `maple`/`juice` jobs or the SQL-ish demo
  * commands (regex filter, equi-join, wordcount) without writing
  * program code. Here each command form compiles to the corresponding
  * declarative plan over the parquet tables, so the ad-hoc path gets
  * the same pushdown/pruning/AQE treatment as the contract queries —
  * there is no second, slower interpreter.
  *
  * Command forms (single-quoted args may contain spaces):
  *
  *   filter <table> '<regex>'             rows where ANY column matches
  *   filter <table> <column> '<regex>'    rows where <column> matches
  *   grep <table> '<regex>'               count of matching rows
  *   join <t1> <t2> <k1> <k2>             inner equi-join t1.k1 = t2.k2
  *   wordcount <table> <column>           token counts, descending
  *   dedup <table> <column>               keep lowest-first-column row
  *                                        per distinct md5(<column>)
  *   split <table> <idcol>                deterministic md5 train/val/
  *                                        test tag counts (~80/10/10)
  *   pipe <table> '<shell cmd>'           whole rows as TAB-joined lines
  *                                        through an external executable
  *                                        (the reference's maple/juice
  *                                        surface) — one output row per
  *                                        stdout line
  *   pipe <table> <column> '<shell cmd>'  one column's values through
  *                                        the executable
  *   pipetsv <table> '<cmd>' <c1,c2,...>  pipe, then parse stdout TABs
  *                                        back into named typed columns
  *                                        (the juice key<TAB>value
  *                                        re-entry)
  *   export <table> <key> <val> <path>    write key<TAB>value lines (the
  *                                        SDFS put / juice dest-file
  *                                        analog); returns the line count
  *   import <path>                        read key<TAB>value lines back
  *                                        as (key, value) columns (the
  *                                        SDFS get analog)
  *   contract <query_name>                run any SparkEntry contract
  *                                        query by name
  *   zorder <table> <c1,c2> <bits>        write the table Z-clustered on
  *          <nfiles> <out> [curve]        the columns (curve = morton |
  *                                        hilbert) and show the per-file
  *                                        min/max layout audit
  *   manifest <parquet_dir> <c1,c2>       one-pass per-file stats
  *                                        manifest of any parquet dir
  *   prune <parquet_dir> <col> <lo> <hi>  plan a scan: the files a
  *                                        [lo, hi] range must read
  *   compact <parquet_dir> <bytes> <out>  bin-pack small files into
  *                                        ~bytes outputs (the OPTIMIZE
  *                                        pass); shows the executed plan
  *   redact <table> <column>              corpus PII audit: matches +
  *                                        affected docs per PII type
  *   audit contract <query_name>          scale-discipline lint of a
  *                                        contract query's plan
  *   bpe [stats] <N> [mode]               learned merge table / per-
  *                                        source fertility+compression
  *                                        (mode = ascii | unicode |
  *                                        bytes)
  *   pack <seqLen> <N> [epoch]            tokenize-and-pack shard
  *                                        accounting (epoch present =
  *                                        that epoch's global shuffle
  *                                        order)
  *   curate                               end-to-end curation per-stage
  *                                        accounting report
  *   shards <seqLen> <N> <epoch> <out>    curate + BPE + pack: write
  *                                        one epoch's trainer shard
  *                                        files per split under <out>
  *   quality <k>                          learned quality classifier:
  *                                        k lowest-scored docs
  *   spans <w>                            top-20 docs by duplicated
  *                                        w-token span coverage
  *   despan <w> [fix]                     exact-substring span removal
  *                                        accounting (fix = rerun to
  *                                        the fixpoint)
  *   search <t1,t2,...> <probeId> <k>     hybrid BM25 + embedding RRF
  *   lshplan <nPerm> <threshold>          choose (bands, rows) for a
  *                                        banded-LSH signature budget
  *                                        and target Jaccard threshold;
  *                                        prints the S-curve samples
  *   mixture <budget> <src:w,src:w,...>   plan + materialize a training
  *                                        mixture over documents.source
  *                                        at the token budget; reports
  *                                        realized vs target tokens per
  *                                        domain (docs repeat when the
  *                                        target exceeds the inventory)
  *   index apply <root> <b> <mod> <rem>   apply documents with
  *                                        doc_id % mod == rem to the
  *                                        incremental inverted index
  *                                        at <root> as CDC batch <b>;
  *                                        shows live-doc stats
  *   index search <root> <t1,t2> <k>      BM25 top-k over the
  *                                        maintained index
  *   index compact <root> <upTo>          fold the index log up to the
  *                                        horizon; shows per-log fresh
  *                                        segment counts
  *   ivf init <parent> <k> <iters>        aliased incremental-IVF
  *                                        bootstrap from the
  *                                        embeddings table (quantizer
  *                                        + batch 0 under <parent>/g0)
  *   ivf apply <parent> <b> <mod> <rem>   assign embeddings with
  *                                        vec_id % mod == rem into the
  *                                        ACTIVE generation as batch b
  *   ivf search <parent> <probeId> <k>    top-k cosine over the active
  *              <nprobe>                  generation, pruned to nprobe
  *                                        cells
  *   ivf retrain <parent> <k> <iters>     rebuild to a fresh generation
  *                                        and atomically flip _active;
  *                                        shows the generation move +
  *                                        new quantizer fit
  *   lsh apply <root> <b> <mod> <rem>     band documents with
  *                                        doc_id % mod == rem into the
  *                                        incremental LSH candidate
  *                                        index as CDC batch <b>
  *   lsh candidates <root> <mod> <rem>    near-dup candidates of the
  *                                        matching documents against
  *                                        the index (pruned bucket
  *                                        lookup, never a corpus scan)
  *   lsh compact <root> <upTo>            fold the LSH log up to the
  *                                        horizon
  *   index init <parent>                  alias an empty blue/green
  *                                        inverted-index parent at g0
  *   index rebuild <parent>               blue/green reindex of the
  *                                        active generation's live
  *                                        corpus + atomic alias flip
  *   lsh init <parent>                    alias an empty blue/green
  *                                        LSH parent at g0
  *   lsh rebuild <parent> <nPerm> <thr>   planner-chosen (bands, rows)
  *                                        scheme rebuild + atomic flip
  *   msearch <idxPath> <ivfPath>          hybrid BM25 + IVF-cosine RRF
  *           <t1,t2> <probeId> <k> <np>   over the MAINTAINED stores
  *           [vstore=<root>] [asof=<b>]   (aliased parents resolve;
  *                                        vstore serves a coded rerank
  *                                        from a bucketed vector zone,
  *                                        asof time-travels both legs)
  *   maintain <kind> <root>               one-call store hygiene
  *            [gc] [retain=N]             (index|ivf|lsh|embedlsh|
  *                                        landing|refresh-state):
  *                                        safe-horizon
  *                                        fold / checkpoint + vacuum;
  *                                        generation GC only under the
  *                                        explicit `gc` token (the
  *                                        reader quiesce window is the
  *                                        operator's decision);
  *                                        retain=N keeps the N newest
  *                                        batches below the fold (the
  *                                        as-of replay window of
  *                                        composed consumers)
  *
  *   (index/ivf/lsh paths may be bare roots OR aliased parents — every
  *   command resolves `_active` transparently; `lsh apply` feeds under
  *   the root's pinned scheme)
  *
  *   refresh                              incremental-curation demo:
  *                                        initialize verdict state from
  *                                        ~80% of the corpus, refresh
  *                                        with the rest as an arrival
  *                                        batch, report the delta
  *                                        (kept/dropped/demoted) —
  *                                        shuffles bounded by the
  *                                        arrivals, never the corpus
  *
  * `join`, `wordcount`, and `export` accept a trailing
  * `partition=hash|range[:n]` — the reference's one physical-design
  * knob (num_juices + hash|range key partitioner, SURVEY §2.7/§3.1):
  * the result is repartitioned on its key by hash or contiguous range
  * into n tasks (default parallelism if `:n` is absent) and sorted
  * WITHIN partitions instead of globally, exactly the layout the
  * reference's partitioned dest files had.
  *
  * Usage: runMain graft.Shell "filter events '^(sign|purch)'"
  * (data dir from SPARK_GRAFT_SF_DIR, default /root/testdata/sf0.001)
  */
object Shell {

  /** Whitespace tokenizer honoring single-quoted spans. */
  private[graft] def tokenize(cmd: String): List[String] = {
    val out = scala.collection.mutable.ListBuffer.empty[String]
    val cur = new StringBuilder
    var quoted = false
    for (c <- cmd) c match {
      case '\'' => quoted = !quoted
      case ch if ch.isWhitespace && !quoted =>
        if (cur.nonEmpty) { out += cur.toString; cur.clear() }
      case ch => cur += ch
    }
    if (quoted) throw new IllegalArgumentException(s"unbalanced quote in: $cmd")
    if (cur.nonEmpty) out += cur.toString
    out.toList
  }

  /** Parsed `partition=hash|range[:n]` token. */
  private[graft] case class PartitionSpec(mode: String, n: Option[Int])

  private[graft] def parsePartition(tok: String): PartitionSpec = {
    val (mode, n) = tok.stripPrefix("partition=").split(':') match {
      case Array(m) => (m, None)
      case Array(m, k) => (m, Some(k.toInt))
      case _ => throw new IllegalArgumentException(s"malformed $tok")
    }
    require(mode == "hash" || mode == "range",
      s"partition mode must be hash|range, got: $mode")
    PartitionSpec(mode, n)
  }

  /** The reference's output-partition knob: distribute on `keys` by
    * hash or contiguous range into n tasks, rows sorted within each
    * partition — the partitioned-dest-file layout, in place of the
    * default commands' global sort.
    */
  private def applyPartition(df: DataFrame, keys: Seq[org.apache.spark.sql.Column],
      sortCols: Seq[org.apache.spark.sql.Column], spec: PartitionSpec): DataFrame = {
    val n = spec.n.getOrElse(df.sparkSession.sparkContext.defaultParallelism)
    val parted = spec.mode match {
      case "hash" => df.repartition(n, keys: _*)
      case "range" => df.repartitionByRange(n, keys: _*)
    }
    parted.sortWithinPartitions(sortCols: _*)
  }

  /** Fresh `seq=` segment count of an incremental-index log dir —
    * through the Hadoop filesystem, so scheme-qualified roots
    * (file:/, hdfs:/) report correctly, not 0.
    */
  private def segCount(s: SparkSession, root: String, sub: String): Long = {
    val p = new org.apache.hadoop.fs.Path(s"$root/$sub")
    val f = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (!f.exists(p)) 0L
    else f.listStatus(p).count(_.getPath.getName.startsWith("seq=")).toLong
  }

  /** Resolve a path that may be an aliased parent to its live
    * generation root, so every index/lsh command works on bare roots
    * AND blue/green parents alike — delegates to the one shared
    * resolver ([[graft.operators.Maintenance.activeOrSelf]]).
    */
  private def actRoot(s: SparkSession, path: String): String =
    graft.operators.Maintenance.activeOrSelf(s, path)

  private def load(s: SparkSession, dir: String, table: String): DataFrame =
    table match {
      case "events" => Tables.events(s, dir) // ns-timestamp handling
      case t => Tables.table(s, dir, t)
    }

  /** Rows where any column's string form matches `regex` — the
    * distributed-grep reading of the reference's line-wise filter (a
    * maple exe saw the whole line; columns are this engine's line).
    */
  private def anyColMatch(df: DataFrame, regex: String) =
    df.filter(df.columns
      .map(c => coalesce(col(c).cast("string"), lit("")).rlike(regex))
      .reduce(_ || _))

  def run(s: SparkSession, dir: String, cmd: String): DataFrame = {
    val toks = tokenize(cmd)
    val pspec = toks.lastOption.filter(_.startsWith("partition="))
      .map(parsePartition)
    val body = if (pspec.isDefined) toks.init else toks
    // default layout is the global unique-key sort; the knob swaps it
    // for hash|range key distribution + within-partition order
    def laidOut(df: DataFrame, keys: Seq[org.apache.spark.sql.Column],
        sortCols: Seq[org.apache.spark.sql.Column]): DataFrame =
      pspec match {
        // within-partition order leads with the keys (the reference's
        // dest files are key-runs), global order stays the tiebreak
        case Some(p) => applyPartition(df, keys, keys ++ sortCols, p)
        case None => df.orderBy(sortCols: _*)
      }
    def noKnob(): Unit = require(pspec.isEmpty,
      s"partition= applies only to join/wordcount/export: $cmd")
    val out = body match {
      // ordering: ALL columns, not just the first — first columns are
      // not unique on every table (lineitem), and a partial sort would
      // print nondeterministic rows across runs (the repo's
      // determinism discipline: every output ends in a unique-key sort)
      case List("filter", table, regex) =>
        noKnob()
        val df = load(s, dir, table)
        anyColMatch(df, regex).orderBy(df.columns.map(col).toSeq: _*)
      case List("filter", table, column, regex) =>
        noKnob()
        val df = load(s, dir, table)
        df.filter(col(column).rlike(regex))
          .orderBy(df.columns.map(col).toSeq: _*)
      case List("grep", table, regex) =>
        noKnob()
        anyColMatch(load(s, dir, table), regex)
          .agg(count(lit(1)).as("n_matches"))
      case List("join", t1, t2, k1, k2) =>
        val ta = load(s, dir, t1)
        val tb = load(s, dir, t2)
        val order = ta.columns.map(c => col(s"a.$c")) ++
          tb.columns.map(c => col(s"b.$c"))
        laidOut(
          ta.as("a").join(tb.as("b"), col(s"a.$k1") === col(s"b.$k2")),
          Seq(col(s"a.$k1")), order.toSeq)
      case List("wordcount", table, column) =>
        laidOut(
          load(s, dir, table)
            .select(explode(split(col(column), " ")).as("word"))
            .filter(col("word") =!= "")
            .groupBy("word")
            .agg(count(lit(1)).as("cnt")),
          Seq(col("word")), Seq(col("cnt").desc, col("word")))
      // exact dedup on a column digest: one hash aggregate (the
      // q_dedup_exact shape) — the survivor is the row whose leading
      // column is minimal, deterministically
      case List("dedup", table, column) =>
        noKnob()
        val df = load(s, dir, table)
        df.select(md5(col(column).cast("string").cast("binary")).as("h"),
            struct(df.columns.map(col).toSeq: _*).as("row"))
          .groupBy("h")
          .agg(min(col("row")).as("keep"), count(lit(1)).as("n_dups"))
          .select((col("keep.*") +: Seq(col("n_dups"))): _*)
          .orderBy(df.columns.map(col).toSeq: _*)
      case List("split", table, idcol) =>
        noKnob()
        val h = md5(col(idcol).cast("string").cast("binary"))
        load(s, dir, table)
          .select(when(h < "cc", "train").when(h < "e6", "val")
            .otherwise("test").as("split"))
          .groupBy("split")
          .agg(count(lit(1)).as("n_rows"))
          .orderBy("split")
      // external-executable stage (graft.operators.Pipe): output order
      // is partition-dependent by nature, so the display sorts lines —
      // programmatic users call Pipe directly to keep streaming order
      case List("pipe", table, sh) =>
        noKnob()
        graft.operators.Pipe.pipeShell(load(s, dir, table), sh)
          .orderBy("line")
      case List("pipe", table, column, sh) =>
        noKnob()
        graft.operators.Pipe
          .pipeShell(load(s, dir, table).select(col(column)), sh)
          .orderBy("line")
      // pipe + typed re-entry: stdout TAB fields become the named
      // string columns (the juice key<TAB>value shape back in
      // declarative land — Pipe.pipeTsv)
      case List("pipetsv", table, sh, colSpec) =>
        noKnob()
        val names = colSpec.split(',').toSeq
        graft.operators.Pipe
          .pipeTsv(load(s, dir, table), Seq("/bin/sh", "-c", sh), names)
          .orderBy(names.map(col): _*)
      // the SDFS put / juice dest-file analog: key<TAB>value lines via
      // LineSources, layout controlled by the partition knob; returns
      // the written line count read BACK through the kv reader, so the
      // command also proves the sink parses
      case List("export", table, key, value, path) =>
        val shaped = pspec match {
          case Some(p) =>
            applyPartition(load(s, dir, table), Seq(col(key)),
              Seq(col(key), col(value)), p)
          case None => load(s, dir, table)
        }
        graft.sources.LineSources.writeKeyValueLines(shaped, key, value, path)
        graft.sources.LineSources.readKeyValueLines(s, path)
          .agg(count(lit(1)).as("n_lines"))
      // the SDFS get analog: typed (key, value) re-entry of an export
      case List("import", path) =>
        noKnob()
        graft.sources.LineSources.readKeyValueLines(s, path)
          .orderBy("key", "value")
      case List("contract", name) =>
        noKnob()
        SparkEntry.queries.getOrElse(name,
          throw new IllegalArgumentException(
            s"unknown contract query: $name"))(s, dir)
      // physical design surface: Z-/Hilbert-cluster a table into files
      // whose footer stats prune multi-dimensional scans, then audit
      // the layout (the displayed frame IS the per-file min/max stats)
      case List("zorder", table, cols, bits, nfiles, out) =>
        noKnob()
        val cs = cols.split(",").toSeq
        graft.operators.ZOrder.write(load(s, dir, table), cs, bits.toInt,
          out, nfiles.toInt)
        graft.operators.ZOrder.fileStats(s, out, cs).orderBy("file")
      case List("zorder", table, cols, bits, nfiles, out, curve) =>
        noKnob()
        val cs = cols.split(",").toSeq
        graft.operators.ZOrder.write(load(s, dir, table), cs, bits.toInt,
          out, nfiles.toInt, curve = curve)
        graft.operators.ZOrder.fileStats(s, out, cs).orderBy("file")
      // one-pass file manifest over any parquet dir (no Bloom columns
      // in the display form — binary sketches don't print)
      case List("manifest", path, rangeCols) =>
        noKnob()
        graft.sources.Manifest.build(s, path, rangeCols.split(",").toSeq)
          .orderBy("file")
      // plan a scan from the manifest: which files must a range read?
      case List("prune", path, c, lo, hi) =>
        noKnob()
        import s.implicits._
        val m = graft.sources.Manifest.build(s, path, Seq(c))
        graft.sources.Manifest
          .filesFor(m, Seq((c, lo.toDouble, hi.toDouble)))
          .sorted.toDF("file")
      // bin-pack small files into ~targetBytes outputs; the displayed
      // frame is the executed plan (one row per output file)
      case List("compact", path, targetBytes, outPath) =>
        noKnob()
        import s.implicits._
        graft.sources.Compact
          .rewrite(s, path, outPath, targetBytes.toLong)
          .zipWithIndex
          .map { case (b, i) => (i, b.files.size, b.bytes) }
          .toDF("bin", "n_input_files", "input_bytes")
      // scale-discipline lint of a contract query's physical plan
      case List("audit", "contract", name) =>
        noKnob()
        graft.operators.PlanAudit.auditFrame(
          SparkEntry.queries.getOrElse(name,
            throw new IllegalArgumentException(
              s"unknown contract query: $name"))(s, dir))
      // corpus PII audit: total matches + affected docs per type
      case List("redact", table, column) =>
        noKnob()
        graft.operators.Redact.report(
          load(s, dir, table).select(col(column)), column)
      // train a BPE tokenizer on the documents table: `bpe N` displays
      // the learned merge table (rank order), `bpe stats N` the
      // per-source fertility / compression report it buys
      // optional trailing mode = ascii (default) | unicode | bytes
      case List("bpe", nMerges) =>
        noKnob()
        import s.implicits._
        graft.operators.Bpe.train(s, dir, nMerges.toInt)
          .merges.zipWithIndex
          .map { case ((a, b), r) => (r, a, b, a + b) }.toSeq
          .toDF("rank", "left", "right", "token")
      case List("bpe", "stats", nMerges) =>
        noKnob()
        graft.operators.Bpe.encodeStats(s, dir,
          graft.operators.Bpe.train(s, dir, nMerges.toInt))
      case List("bpe", "stats", nMerges, mode) =>
        noKnob()
        graft.operators.Bpe.encodeStats(s, dir,
          graft.operators.Bpe.train(s, dir, nMerges.toInt, mode = mode))
      // the "stats" cases above MUST precede this one: a 3-element
      // "bpe stats N" would otherwise bind nMerges="stats"
      case List("bpe", nMerges, mode) =>
        noKnob()
        import s.implicits._
        graft.operators.Bpe.train(s, dir, nMerges.toInt, mode = mode)
          .merges.zipWithIndex
          .map { case ((a, b), r) => (r, a, b, a + b) }.toSeq
          .toDF("rank", "left", "right", "token")
      // tokenize-and-pack summary: train nMerges BPE merges, encode the
      // documents table, pack into seqLen sequences; display the shard
      // accounting (the token arrays themselves stay distributed)
      case List("pack", seqLen, nMerges) =>
        noKnob()
        val model = graft.operators.Bpe.train(s, dir, nMerges.toInt)
        graft.operators.Packing.packCorpus(s, dir, model, seqLen.toInt)
          .agg(count(lit(1)).as("n_sequences"),
            sum(col("n_tokens")).as("total_tokens"),
            sum(when(col("n_tokens") === seqLen.toInt, 1L).otherwise(0L))
              .as("full_sequences"))
      // epoch-shuffled pack: same accounting over the epoch's global
      // permutation (xxhash64(doc_id, epoch) order) — what a trainer
      // reads for epoch e
      case List("pack", seqLen, nMerges, epoch) =>
        noKnob()
        val model = graft.operators.Bpe.train(s, dir, nMerges.toInt)
        val eos = model.vocabIds.size
        graft.operators.Packing.packShuffled(
          graft.operators.Bpe.encodeIds(Tables.documents(s, dir), "text",
            model),
          "doc_id", "token_ids", seqLen.toInt, eos, epoch.toLong)
          .agg(count(lit(1)).as("n_sequences"),
            sum(col("n_tokens")).as("total_tokens"),
            sum(when(col("n_tokens") === seqLen.toInt, 1L).otherwise(0L))
              .as("full_sequences"))
      // end-to-end curation accounting (q_pipeline_curate's report)
      case List("curate") =>
        noKnob()
        graft.operators.CorpusPipeline.curate(s, dir)._2.orderBy("stage")
      // the full trainer flow: curate -> train-split BPE -> encode ->
      // one epoch's shard FILES per split under <out>, tokenizer saved
      // beside them; displays the per-split file accounting
      case List("shards", seqLen, nMerges, epoch, out) =>
        noKnob()
        import s.implicits._
        val (model, counts) = graft.operators.CorpusPipeline
          .writeEpochShards(s, dir, nMerges.toInt, seqLen.toInt,
            epoch.toLong, out, seqsPerFile = 16)
        counts.toSeq.sortBy(_._1)
          .map { case (sp, n) => (sp, n, model.merges.length) }
          .toDF("split", "n_files", "n_merges")
      // exact-substring span REMOVAL accounting: one pass, or to a
      // fixpoint with `despan <w> fix`
      case List("despan", w) =>
        noKnob()
        graft.operators.SpanDedup
          .removeDuplicatedSpans(Tables.documents(s, dir), "doc_id",
            "text", w.toInt)
          .agg(count(lit(1)).as("n_docs"),
            sum(when(col("n_removed") > 0, 1L).otherwise(0L))
              .as("docs_touched"),
            sum(col("n_toks")).as("tokens_in"),
            sum(col("n_removed")).as("tokens_removed"))
      case List("despan", w, "fix") =>
        noKnob()
        val (out, rounds) = graft.operators.SpanDedup
          .removeDuplicatedSpansFixpoint(Tables.documents(s, dir),
            "doc_id", "text", w.toInt)
        out.agg(count(lit(1)).as("n_docs"),
          sum(when(col("n_removed") > 0, 1L).otherwise(0L))
            .as("docs_touched"),
          sum(col("n_toks")).as("tokens_in"),
          sum(col("n_removed")).as("tokens_removed"),
          lit(rounds).as("rounds"))
      // learned quality scoring: train the CCNet-style classifier on
      // the heuristic bands, show the k lowest-scored docs (the ones a
      // threshold would drop first) with score, label, and length
      case List("quality", k) =>
        noKnob()
        val (_, scored) = graft.operators.QualityClassifier
          .trainAndScore(s, dir)
        scored
          .select(col("doc_id"), round(col("quality_score"), 4).as("score"),
            col("label"), size(split(col("text"), " ")).as("n_toks"))
          .orderBy(col("score"), col("doc_id"))
          .limit(k.toInt)
      // exact-substring duplication: top-20 docs by duplicated w-token
      // span coverage (the Lee et al. exact-substring dedup signal)
      case List("spans", w) =>
        noKnob()
        graft.operators.SpanDedup.coverageReport(s, dir, w.toInt)
          .orderBy(col("dup_fraction").desc, col("doc_id"))
          .limit(20)
      // hybrid retrieval over documents: BM25 for the comma-separated
      // terms fused (RRF) with embedding cosine against probeDocId
      case List("search", terms, probeDocId, k) =>
        noKnob()
        graft.operators.HybridSearch.searchDocuments(
          s, dir, terms.split(",").toSeq, probeDocId.toLong, k.toInt)
      // banded-LSH tuning: the chosen (bands, rows) factorization for
      // the signature budget + the collision S-curve it buys
      case List("lshplan", nPerm, threshold) =>
        noKnob()
        val (b, r) = graft.operators.LshPlanner
          .choose(nPerm.toInt, threshold.toDouble)
        val knee = graft.operators.LshPlanner.thresholdOf(b, r)
        import s.implicits._
        (0 to 10).map { i =>
          val sim = i / 10.0
          (b, r, BigDecimal(knee).setScale(4,
            BigDecimal.RoundingMode.HALF_UP).toDouble, sim,
            BigDecimal(graft.operators.LshPlanner.collisionProb(sim, b, r))
              .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
        }.toDF("bands", "rows", "knee", "sim", "p_candidate")
      // training-mixture planning over the documents table: parse
      // "src:weight" pairs, plan against the token budget, materialize
      // the (doc, epoch) manifest, and account realized vs target
      case List("mixture", budget, spec) =>
        noKnob()
        val weights = spec.split(",").map { tok =>
          tok.split(":") match {
            case Array(d, w) => d -> w.toDouble
            case _ => throw new IllegalArgumentException(
              s"malformed domain:weight pair: $tok")
          }
        }.toMap
        val docs = Tables.documents(s, dir)
          .select(col("doc_id"), col("source"),
            size(split(col("text"), " ")).cast("long").as("n_toks"))
        val p = graft.operators.MixturePlanner
          .planFromDocs(s, docs, "source", "n_toks", weights,
            budget.toLong)
        graft.operators.MixturePlanner.account(
          graft.operators.MixturePlanner.materialize(
            docs, p, "doc_id", "source", "n_toks", seed = 42L), p)
      // ---- incremental-index operational surface (REPL twin of the
      // IncrementalIndex / IncrementalIvf modules: apply a CDC slice,
      // query the maintained state, run maintenance) -------------------
      case List("index", "init", parent) =>
        noKnob()
        import s.implicits._
        graft.operators.IncrementalIndex.initializeAliased(s, parent)
        Seq((parent, "g0")).toDF("parent", "active_gen")
      case List("index", "apply", root0, batchId, mod, rem) =>
        noKnob()
        import s.implicits._
        val root = actRoot(s, root0)
        graft.operators.IncrementalIndex.applyBatch(s, root,
          Tables.documents(s, dir)
            .filter(pmod(col("doc_id"), lit(mod.toLong)) === rem.toLong)
            .select(col("doc_id"), col("text"), lit("I").as("op")),
          batchId.toLong)
        val (nLive, avgDl) = graft.operators.IncrementalIndex.stats(s, root)
        Seq((batchId.toLong, nLive, BigDecimal(avgDl)
          .setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble))
          .toDF("batch", "live_docs", "avg_dl")
      case List("index", "search", root0, terms, k) =>
        noKnob()
        val root = actRoot(s, root0)
        val idx = graft.operators.IncrementalIndex.currentPostings(s, root)
        val (nLive, avgDl) = graft.operators.IncrementalIndex.stats(s, root)
        graft.operators.InvertedIndex
          .bm25Query(idx, nLive, avgDl, terms.split(",").toSeq, k.toInt)
          .withColumn("score", round(col("score"), 4))
      case List("index", "compact", root0, upTo) =>
        noKnob()
        import s.implicits._
        val root = actRoot(s, root0)
        graft.operators.IncrementalIndex.compact(s, root, upTo.toLong)
        Seq(("df", upTo.toLong, segCount(s, root, "df")),
          ("docs", upTo.toLong, segCount(s, root, "docs")),
          ("postings", upTo.toLong, segCount(s, root, "postings")))
          .toDF("log", "horizon", "fresh_segments")
      // blue/green REINDEX from the REPL: rebuild the ACTIVE
      // generation's live corpus (texts re-joined from the documents
      // table — the authoritative store) into a fresh generation and
      // flip the alias atomically
      case List("index", "rebuild", parent) =>
        noKnob()
        import s.implicits._
        val oldGen = new org.apache.hadoop.fs.Path(
          graft.operators.IncrementalIndex.activeRoot(s, parent)).getName
        val live = graft.operators.IncrementalIndex.liveDocIds(s,
          graft.operators.IncrementalIndex.activeRoot(s, parent))
        val docs = Tables.documents(s, dir).select("doc_id", "text")
          .join(live, Seq("doc_id"), "left_semi")
        val newRoot = graft.operators.IncrementalIndex
          .rebuildCutover(s, parent, docs)
        val (nLive, _) = graft.operators.IncrementalIndex.stats(s, newRoot)
        Seq((oldGen, new org.apache.hadoop.fs.Path(newRoot).getName,
          nLive)).toDF("old_gen", "new_gen", "live_docs")
      case List("ivf", "init", parent, k, iters) =>
        noKnob()
        graft.operators.IncrementalIvf.initializeAliased(s,
          Tables.embeddings(s, dir).select(col("vec_id"),
            col("embedding").cast("array<double>").as("e")),
          parent, k.toInt, iters.toInt)
        graft.operators.IncrementalIvf.quantizationReport(s,
          graft.operators.IncrementalIvf.activeRoot(s, parent))
      case List("ivf", "apply", parent, batchId, mod, rem) =>
        noKnob()
        graft.operators.IncrementalIvf.applyBatchActive(s, parent,
          Tables.embeddings(s, dir)
            .filter(pmod(col("vec_id"), lit(mod.toLong)) === rem.toLong)
            .select(col("vec_id"),
              col("embedding").cast("array<double>").as("e"),
              lit("I").as("op")),
          batchId.toLong)
        graft.operators.IncrementalIvf.quantizationReport(s,
          graft.operators.IncrementalIvf.activeRoot(s, parent))
      case List("ivf", "search", parent, probeId, k, nprobe) =>
        noKnob()
        val probe = Tables.embeddings(s, dir)
          .filter(col("vec_id") === probeId.toLong)
          .select(col("embedding").cast("array<double>"))
          .head.getSeq[Double](0).toSeq
        graft.operators.IncrementalIvf.searchActive(s, parent, probe,
          k.toInt, nprobe.toInt)
      case List("ivf", "retrain", parent, k, iters) =>
        noKnob()
        import s.implicits._
        val oldGen = new org.apache.hadoop.fs.Path(
          graft.operators.IncrementalIvf.activeRoot(s, parent)).getName
        val newRoot = graft.operators.IncrementalIvf
          .retrainCutover(s, parent, k.toInt, iters.toInt)
        val (_, baseline, current) = graft.operators.IncrementalIvf
          .retrainSignal(s, newRoot)
        Seq((oldGen, new org.apache.hadoop.fs.Path(newRoot).getName,
          BigDecimal(baseline).setScale(4,
            BigDecimal.RoundingMode.HALF_UP).toDouble,
          BigDecimal(current).setScale(4,
            BigDecimal.RoundingMode.HALF_UP).toDouble))
          .toDF("old_gen", "new_gen", "train_fit", "live_fit")
      case List("lsh", "init", parent) =>
        noKnob()
        import s.implicits._
        graft.operators.IncrementalLsh.initializeAliased(s, parent)
        Seq((parent, "g0")).toDF("parent", "active_gen")
      case List("lsh", "apply", root0, batchId, mod, rem) =>
        noKnob()
        import s.implicits._
        val root = actRoot(s, root0)
        val slice = Tables.documents(s, dir)
          .filter(pmod(col("doc_id"), lit(mod.toLong)) === rem.toLong)
          .select("doc_id", "text")
        // feed under the root's OWN pinned scheme — after a planner
        // rebuild the active generation is no longer the contract
        // default, and hardcoding (16, 4, 2) would trip the pins on
        // every subsequent apply (the REPL feed path must survive a
        // scheme cutover)
        val (nb, bd, rw) = graft.operators.IncrementalLsh
          .pinnedScheme(s, root)
          .getOrElse((16, graft.operators.IncrementalLsh.DefaultBands,
            graft.operators.IncrementalLsh.DefaultRows))
        graft.operators.IncrementalLsh.applyBatch(s, root,
          slice.withColumn("op", lit("I")), batchId.toLong,
          nBuckets = nb, bands = bd, rows = rw)
        Seq((batchId.toLong,
          graft.operators.IncrementalLsh.candidates(s, root, slice)
            .count()))
          .toDF("batch", "batch_candidate_pairs")
      case List("lsh", "candidates", root0, mod, rem) =>
        noKnob()
        graft.operators.IncrementalLsh.candidates(s, actRoot(s, root0),
          Tables.documents(s, dir)
            .filter(pmod(col("doc_id"), lit(mod.toLong)) === rem.toLong)
            .select("doc_id", "text"))
          .orderBy("probe_id", "doc_id")
      case List("lsh", "compact", root0, upTo) =>
        noKnob()
        import s.implicits._
        val root = actRoot(s, root0)
        graft.operators.IncrementalLsh.compact(s, root, upTo.toLong)
        Seq(("docs", upTo.toLong, segCount(s, root, "docs")),
          ("members", upTo.toLong, segCount(s, root, "members")))
          .toDF("log", "horizon", "fresh_segments")
      // planner-driven SCHEME rebuild from the REPL: choose (b, r) for
      // the signature budget + target threshold, rebuild the active
      // generation's live corpus under it, flip atomically
      case List("lsh", "rebuild", parent, nPerm, threshold) =>
        noKnob()
        import s.implicits._
        val (b, r) = graft.operators.LshPlanner
          .choose(nPerm.toInt, threshold.toDouble)
        val oldGen = new org.apache.hadoop.fs.Path(
          graft.operators.IncrementalLsh.activeRoot(s, parent)).getName
        val live = graft.operators.IncrementalLsh.liveDocIds(s,
          graft.operators.IncrementalLsh.activeRoot(s, parent))
        val docs = Tables.documents(s, dir).select("doc_id", "text")
          .join(live, Seq("doc_id"), "left_semi")
        val newRoot = graft.operators.IncrementalLsh
          .rebuildCutover(s, parent, docs, b, r)
        Seq((oldGen, new org.apache.hadoop.fs.Path(newRoot).getName,
          b, r, BigDecimal(graft.operators.LshPlanner.thresholdOf(b, r))
            .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble))
          .toDF("old_gen", "new_gen", "bands", "rows", "knee")
      // hybrid retrieval over the MAINTAINED stores (the production
      // query path of the ingest loop): BM25 over the incremental
      // inverted index fused by RRF with cosine top-k over the
      // incremental IVF — both legs resolve aliased parents, so the
      // query rides through blue/green cutovers untouched
      case "msearch" :: idxPath :: ivfPath :: terms :: probeId :: k ::
          nprobe :: rest =>
        noKnob()
        // optional flags: `vstore=<root>` serves a coded root's rerank
        // from a BUCKETED vector zone (I/O-pruned fetchByKeys — the
        // production path); `asof=<batch>` answers the whole hybrid
        // query as of that batch (searchMaintainedAsOf). Flag errors
        // name the flag, like `maintain`'s.
        rest.foreach(t => require(
          t.matches("vstore=.+") || t.matches("asof=\\d{1,18}"),
          s"msearch: unknown flag '$t' (expected 'vstore=<root>' or " +
            "'asof=<batch>')"))
        val probe = Tables.embeddings(s, dir)
          .filter(col("vec_id") === probeId.toLong)
          .select(col("embedding").cast("array<double>"))
          .head.getSeq[Double](0).toSeq
        val handle = rest.find(_.startsWith("vstore="))
          .map(_.stripPrefix("vstore=")).map(root =>
            graft.streaming.UpsertFileSink.BucketedStore(root,
              org.apache.spark.sql.types.StructType(Seq(
                org.apache.spark.sql.types.StructField("vec_id",
                  org.apache.spark.sql.types.LongType),
                org.apache.spark.sql.types.StructField("e",
                  org.apache.spark.sql.types.ArrayType(
                    org.apache.spark.sql.types.DoubleType)))),
              keyCols = Seq("vec_id")))
        // without a handle the embeddings table doubles as the
        // external vector store (fixture-scale fallback: the rerank
        // scans the frame; searchMaintained's scaladoc owns the
        // caveat). A plain root touches neither.
        val vframe =
          if (handle.isDefined) None
          else Some(Tables.embeddings(s, dir)
            .select(col("vec_id"),
              col("embedding").cast("array<double>").as("e")))
        val asOf = rest.find(_.startsWith("asof="))
          .map(_.stripPrefix("asof=").toLong)
        (asOf match {
          case Some(a) => graft.operators.HybridSearch
            .searchMaintainedAsOf(s, idxPath, ivfPath,
              terms.split(",").toSeq, probe, k.toInt, a, nprobe.toInt,
              vectors = vframe, vectorStore = handle)
          case None => graft.operators.HybridSearch.searchMaintained(
            s, idxPath, ivfPath, terms.split(",").toSeq, probe, k.toInt,
            nprobe.toInt, vectors = vframe, vectorStore = handle)
        }).withColumn("rrf", round(col("rrf"), 6))
      // one-call steady-state maintenance per store kind — compaction
      // to the safe horizon, cleanup convergence, checkpoint +
      // retention vacuum, in the documented safe order
      // ([[graft.operators.Maintenance]]). Generation GC stays an
      // EXPLICIT operator decision (`gc` token): the REPL cannot see
      // in-flight readers, and reclaiming the previous generation
      // right after a cutover would yank it from under them — the
      // quiesce window is the caller's to own.
      case "maintain" :: kind :: root :: rest =>
        noKnob()
        // flag errors name the flag — an unguarded fall-through to
        // the generic "unrecognized command" would hide that the
        // command and kind were fine; the digit bound keeps toInt
        // total
        rest.foreach(t => require(
          t == "gc" || t.matches("retain=\\d{1,9}"),
          s"maintain: unknown flag '$t' (expected 'gc' or " +
            "'retain=<n>')"))
        val gc = rest.contains("gc")
        // retain=N keeps the N newest committed batches below the
        // fold — the as-of replay window a composed refresh needs on
        // the stores it probes as-of (BandedVerify/EmbedVerify);
        // without it a cron fold to the head wedges a replayed batch
        val retain = rest.find(_.startsWith("retain="))
          .map(_.stripPrefix("retain=").toInt).getOrElse(0)
        def segmentedOnly(): Unit =
          require(!gc && retain == 0,
            s"maintain $kind takes no gc/retain flags: the store has " +
              "no generations or fold horizon (its retention knob is " +
              "vacuum's)")
        kind match {
          case "index" => graft.operators.Maintenance
            .maintainIndex(s, root, gcGenerations = gc,
              retainNewest = retain)
          case "ivf" => graft.operators.Maintenance
            .maintainIvf(s, root, gcGenerations = gc,
              retainNewest = retain)
          case "lsh" => graft.operators.Maintenance
            .maintainLsh(s, root, gcGenerations = gc,
              retainNewest = retain)
          case "embedlsh" =>
            graft.operators.Maintenance
              .maintainEmbedLsh(s, root, gcGenerations = gc,
                retainNewest = retain)
          case "landing" =>
            segmentedOnly()
            graft.operators.Maintenance.maintainLanding(s, root)
          case "refresh-state" =>
            segmentedOnly()
            graft.operators.Maintenance.maintainRefreshState(s, root)
          case other => throw new IllegalArgumentException(
            s"maintain: unknown store kind '$other' " +
              "(index|ivf|lsh|embedlsh|landing|refresh-state)")
        }
      // incremental corpus refresh, end to end: bulk-load verdict state
      // from a deterministic ~80% of the documents table, feed the
      // other ~20% in as an arrival batch, and account for the delta —
      // the daily production operation ([[graft.operators.CorpusRefresh]])
      case List("refresh") =>
        noKnob()
        val docs = Tables.documents(s, dir).select("doc_id", "lang", "text")
        val isArrival =
          substring(md5(col("doc_id").cast("string").cast("binary")), 1, 1)
            .isin("0", "1", "2")
        val tmp = java.nio.file.Files
          .createTempDirectory("graft-shell-refresh")
        // demo state is ephemeral — reap the whole tree at JVM exit so
        // repeated shell use cannot accumulate orphaned state in /tmp
        sys.addShutdownHook {
          if (java.nio.file.Files.exists(tmp))
            java.nio.file.Files.walk(tmp)
              .sorted(java.util.Comparator.reverseOrder())
              .forEach(p => java.nio.file.Files.deleteIfExists(p))
        }
        val root = tmp.toString + "/state"
        graft.operators.CorpusRefresh.initialize(
          s, docs.filter(!isArrival), root, nBuckets = 16)
        val delta = graft.operators.CorpusRefresh.refresh(
          s, root, docs.filter(isArrival), 1L, nBuckets = 16)
        delta.agg(
          sum(when(col("is_delta"), 1L).otherwise(0L)).as("arrivals"),
          sum(when(col("is_delta") && col("now_kept"), 1L).otherwise(0L))
            .as("arrivals_kept"),
          sum(when(col("is_delta") && !col("now_kept"), 1L).otherwise(0L))
            .as("arrivals_dropped"),
          sum(when(col("was_kept") === true && !col("now_kept"), 1L)
            .otherwise(0L)).as("demoted"),
          sum(when(col("was_kept") === false && col("now_kept"), 1L)
            .otherwise(0L)).as("restored"))
      case other =>
        throw new IllegalArgumentException(
          s"unrecognized command: ${other.mkString(" ")} (see Shell scaladoc)")
    }
    out
  }

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: runMain graft.Shell \"<command>\"")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    run(spark, dir, args.mkString(" ")).show(100, truncate = false)
    spark.stop()
  }
}
