package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The shared append-only segment-log discipline behind
  * [[IncrementalIndex]] and [[IncrementalIvf]]: state accumulates as
  * immutable `root/<sub>/seq=<batch>/` directories, a compaction folds
  * every segment at or below a horizon into one out-of-place tree
  * `root/_compact/<horizon>/<sub>/`, and a `_compacted` marker file
  * (temp + rename — never torn) is the single publish point. Readers
  * resolve the log as the folded tree ∪ only the segments NEWER than
  * the horizon, so a surviving pre-horizon directory is invisible
  * (never listed as data) and the post-publish cleanup can crash
  * anywhere leaving garbage, not corruption.
  *
  * This object owns the mechanics only (marker I/O, segment listing,
  * the compaction-aware read, cleanup); each index owns its fold
  * semantics — what "live at the horizon" means for its rows.
  */
private[operators] object SegmentLog {

  def hfs(spark: SparkSession, root: String): org.apache.hadoop.fs.FileSystem =
    new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  def compactMarker(root: String): org.apache.hadoop.fs.Path =
    new org.apache.hadoop.fs.Path(root, "_compacted")

  /** Read a small control file fully ([[graft.ControlFiles]] — a
    * short read would truncate the horizon number).
    */
  def readSmallFile(f: org.apache.hadoop.fs.FileSystem,
      p: org.apache.hadoop.fs.Path): String =
    graft.ControlFiles.readFully(f, p)

  /** The published compaction horizon, if any. */
  def compactedUpTo(spark: SparkSession, root: String): Option[Long] = {
    val f = hfs(spark, root)
    val p = compactMarker(root)
    if (!f.exists(p)) None
    else Some(readSmallFile(f, p).trim.toLong)
  }

  /** Segment dirs `seq=N` under `root/sub` with N > c. Directories
    * holding no data entries (a crashed zero-row `partitionBy` write
    * leaves only `_SUCCESS`) are skipped — an explicit parquet read of
    * such a dir would fail schema inference, and it carries nothing.
    */
  def freshSegDirs(spark: SparkSession, root: String, sub: String,
      c: Long): Seq[String] = {
    val f = hfs(spark, root)
    val dir = new org.apache.hadoop.fs.Path(s"$root/$sub")
    if (!f.exists(dir)) Seq.empty
    else f.listStatus(dir).toSeq.map(_.getPath.getName)
      .filter(n => n.startsWith("seq=") &&
        n.stripPrefix("seq=").forall(_.isDigit) &&
        n.stripPrefix("seq=").toLong > c)
      .filter { n =>
        f.listStatus(new org.apache.hadoop.fs.Path(s"$root/$sub/$n"))
          .exists { st =>
            val e = st.getPath.getName
            !e.startsWith("_") && !e.startsWith(".")
          }
      }
      .map(n => s"$root/$sub/$n")
  }

  /** The log as one frame, `seq` normalized to LongType: with no
    * compaction marker, the plain multi-segment read; with one, the
    * folded tree at seq=c unioned with only the newer segment dirs —
    * surviving pre-compaction dirs are never even listed as data.
    */
  def readLog(spark: SparkSession, root: String, sub: String): DataFrame =
    compactedUpTo(spark, root) match {
      case None => spark.read.parquet(s"$root/$sub")
        .withColumn("seq", col("seq").cast("long"))
      case Some(c) =>
        val folded = spark.read.parquet(s"$root/_compact/$c/$sub")
          .withColumn("seq", lit(c).cast("long"))
        val dirs = freshSegDirs(spark, root, sub, c)
        if (dirs.isEmpty) folded
        else {
          val fresh = spark.read.option("basePath", s"$root/$sub")
            .parquet(dirs: _*)
            .withColumn("seq", col("seq").cast("long"))
          // column order differs (partition cols list last on read)
          folded.select(fresh.columns.map(col): _*).unionAll(fresh)
        }
    }

  /** The folded tree of `sub` at the published horizon, its `seq`
    * column restored (= the horizon), or None without a marker.
    */
  def readFoldedTree(spark: SparkSession, root: String,
      sub: String): Option[DataFrame] =
    compactedUpTo(spark, root).map { c =>
      spark.read.parquet(s"$root/_compact/$c/$sub")
        .withColumn("seq", lit(c).cast("long"))
    }

  /** Only the segments STRICTLY above the horizon (every segment when
    * no marker exists), or None when no fresh segment dir holds data.
    */
  def readFreshSegs(spark: SparkSession, root: String,
      sub: String): Option[DataFrame] = {
    val c = compactedUpTo(spark, root).getOrElse(-1L)
    val dirs = freshSegDirs(spark, root, sub, c)
    if (dirs.isEmpty) None
    else Some(spark.read.option("basePath", s"$root/$sub")
      .parquet(dirs: _*)
      .withColumn("seq", col("seq").cast("long")))
  }

  /** Rank-1 resolution of a changelog frame: each key's newest
    * (key, seq, op) row — the one shared window both split readers
    * bound and rank with.
    */
  private def rank1Latest(log: DataFrame, key: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(key).orderBy(col("seq").desc)
    log.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(col(key), col("seq"), col("op"))
  }

  /** Each key's newest (key, seq, op) changelog row WITHOUT a
    * corpus-wide window: on a compacted root the folded tree holds
    * exactly one LIVE row per pre-horizon key (compaction's own
    * invariant), and only the ≤ compactEvery fresh batches can
    * supersede it — so the rank-1 window runs over the FRESH segments
    * alone and the folded side enters via a broadcast anti-join on the
    * small fresh-key set. Result is row-identical to windowing the
    * whole log (a key in fresh has its global newest row there; a
    * folded-only key's newest row IS its folded row; keys deleted
    * at/below the horizon are absent from both, matching the full
    * window's view after the op != 'D' fold). Without a marker this is
    * the plain one-window read — the pre-first-compaction log is
    * bounded by the compaction cadence anyway.
    */
  def latestVersionsSplit(spark: SparkSession, root: String,
      commitSub: String, key: String,
      beforeSeq: Option[Long] = None): DataFrame = {
    def bound(log: DataFrame): DataFrame =
      beforeSeq.fold(log)(b => log.filter(col("seq") < b))
    def latestOver(log: DataFrame): DataFrame = rank1Latest(bound(log), key)
    compactedUpTo(spark, root) match {
      case None => latestOver(readLog(spark, root, commitSub))
      case Some(c) =>
        // a beforeSeq at or below the horizon would need pre-fold
        // history the folded tree no longer carries — the fold's own
        // horizon guard makes this unreachable from the apply paths
        require(beforeSeq.forall(_ > c),
          s"beforeSeq ${beforeSeq.get} is at or below $root's " +
            s"compaction horizon $c: that view is folded away")
        val folded = readFoldedTree(spark, root, commitSub).get
          .select(col(key), col("seq"), col("op"))
        readFreshSegs(spark, root, commitSub) match {
          case None => folded
          case Some(fl) =>
            val fresh = latestOver(fl)
            folded
              .join(broadcast(fresh.select(key)), Seq(key), "left_anti")
              .unionByName(fresh)
        }
    }
  }

  /** The LIVE member rows of a segment-log index, pruned BEFORE the
    * liveness resolution and with shuffle volume independent of the
    * folded-corpus size (the read-side twin of [[latestVersionsSplit]],
    * shared by the IVF / LSH / inverted-index lookups): folded member
    * rows are live-by-construction at the horizon, so they need only a
    * broadcast ANTI-join against the fresh changelog's key set; fresh
    * member rows fold against the latest FRESH changelog version via a
    * broadcast join. `prune` applies partition-dir pruning (`cell=` /
    * `bb=` / `db=` filters) to each member side before any join;
    * `emptyMembers` supplies the schema when the member log never
    * materialized (a root fed only delete-only batches skips the
    * member segment — a legitimate empty index, not a read error).
    * Returns member payload columns WITHOUT `seq`.
    */
  def liveMembersPruned(spark: SparkSession, root: String,
      memberSub: String, commitSub: String, key: String,
      prune: DataFrame => DataFrame,
      emptyMembers: => DataFrame,
      asOf: Option[Long] = None): DataFrame = {
    def bound(log: DataFrame): DataFrame =
      asOf.fold(log)(a => log.filter(col("seq") <= a))
    def latestOver(log: DataFrame): DataFrame = rank1Latest(bound(log), key)
    if (!hasBatches(spark, root, memberSub) &&
      !hasBatches(spark, root, commitSub)) return emptyMembers
    compactedUpTo(spark, root) match {
      case None =>
        val mem =
          if (hasBatches(spark, root, memberSub))
            readLog(spark, root, memberSub)
          else emptyMembers.withColumn("seq", lit(0L))
        val live = latestOver(readLog(spark, root, commitSub))
          .filter(col("op") =!= "D").select(key, "seq")
        prune(mem).join(live, Seq(key, "seq")).drop("seq")
      case Some(c) =>
        // time travel is BOUNDED BY COMPACTION, exactly like the
        // sink's vacuum-retention caveat: a view strictly below the
        // horizon is folded history that no longer exists. The view AT
        // the horizon is exactly the folded tree (the fold is the
        // state as of its horizon), so asOf == c answers.
        require(asOf.forall(_ >= c),
          s"asOf ${asOf.get} is below $root's compaction " +
            s"horizon $c: that view is folded away")
        // the folded member tree always exists post-compaction (an
        // emptied index folds to a schema-carrying empty file)
        val foldedM = prune(readFoldedTree(spark, root, memberSub).get)
          .drop("seq")
        readFreshSegs(spark, root, commitSub) match {
          case None => foldedM
          case Some(fl) =>
            val fresh = latestOver(fl)
            val freshLive = fresh.filter(col("op") =!= "D")
              .select(key, "seq")
            val foldedLive = foldedM
              .join(broadcast(fresh.select(key)), Seq(key), "left_anti")
            readFreshSegs(spark, root, memberSub) match {
              case None => foldedLive
              case Some(fm) => foldedLive.unionByName(
                prune(fm).join(broadcast(freshLive), Seq(key, "seq"))
                  .drop("seq"))
            }
        }
    }
  }

  /** Seq ids of segment dirs present under `root/sub` STRICTLY above
    * the published horizon (pre-horizon survivors are superseded
    * garbage a crashed cleanup left — invisible to readers, not
    * state).
    */
  private def freshIds(spark: SparkSession, root: String,
      sub: String): Set[Long] = {
    val f = hfs(spark, root)
    val h = compactedUpTo(spark, root).getOrElse(-1L)
    val dir = new org.apache.hadoop.fs.Path(s"$root/$sub")
    if (!f.exists(dir)) Set.empty
    else f.listStatus(dir).toSeq.map(_.getPath.getName)
      .filter(n => n.startsWith("seq=") &&
        n.stripPrefix("seq=").forall(_.isDigit))
      .map(_.stripPrefix("seq=").toLong)
      .filter(_ > h).toSet
  }

  /** GUARD for an out-of-band compact(upTo): a batch whose data
    * segments are present but whose commit-log segment (`commitSub`,
    * written last, `_SUCCESS`-marked) never landed is a TORN first
    * delivery awaiting redelivery. Folding at/above its seq would
    * exclude its uncommitted rows from the fold, delete them in
    * cleanup, and move the horizon above its id — the at-least-once
    * redelivery then hits the horizon guard and the batch's data is
    * unrecoverable. Compaction must refuse: the caller either
    * redelivers the batch first or compacts strictly below it. (The
    * inline `compactEvery` path folds only up to batchId − 1 of a
    * batch that is itself committing, which an ordered CDC feed only
    * reaches after every earlier batch committed — so this guard never
    * fires there.)
    */
  def requireNoTornAtOrBelow(spark: SparkSession, root: String,
      dataSubs: Seq[String], commitSub: String, upTo: Long): Unit = {
    val f = hfs(spark, root)
    val committed = freshIds(spark, root, commitSub).filter(id =>
      f.exists(new org.apache.hadoop.fs.Path(
        s"$root/$commitSub/seq=$id/_SUCCESS")))
    val torn = (dataSubs :+ commitSub)
      .flatMap(s => freshIds(spark, root, s)).toSet -- committed
    val wedged = torn.filter(_ <= upTo)
    require(wedged.isEmpty,
      s"cannot compact $root up to $upTo: batch(es) " +
        s"${wedged.toSeq.sorted.mkString(",")} are present but " +
        "uncommitted (torn first delivery) — folding at/above them " +
        "would wedge their redelivery behind the horizon guard and " +
        "lose the batch; redeliver first or compact strictly below")
  }

  /** The highest horizon an OUT-OF-BAND compaction can safely fold to:
    * the newest committed seq, capped strictly below the lowest torn
    * (present-but-uncommitted) batch above the current horizon — the
    * wedge [[requireNoTornAtOrBelow]] would refuse, avoided instead of
    * tripped, so a scheduled maintenance job degrades to folding less
    * rather than failing while a redelivery is pending. None when
    * nothing newer than the current horizon can fold (also when no
    * MORE THAN `minFresh` committed fresh segments exist — strict,
    * matching the inline `compactEvery` cadence's comparison, so the
    * two knobs mean the same thing).
    *
    * `retainNewest` additionally EXCLUDES that many of the newest
    * committed fresh ids from folding — the as-of REPLAY WINDOW, the
    * segment-log twin of the landing zone's vacuum
    * `minRetainBatches`: a composed consumer replaying batch `b`
    * reads sibling stores AS OF `b − 1`
    * ([[graft.operators.CorpusRefresh]]'s discipline), and a cron
    * fold to the head would wedge that probe behind the as-of horizon
    * guard while the batch's redelivery is still possible. Pass ≥ 1
    * on any store a replayed consumer probes as-of.
    */
  def safeCompactionTarget(spark: SparkSession, root: String,
      dataSubs: Seq[String], commitSub: String,
      minFresh: Int = 0, retainNewest: Int = 0): Option[Long] = {
    val f = hfs(spark, root)
    val h = compactedUpTo(spark, root).getOrElse(-1L)
    val committed = freshIds(spark, root, commitSub).filter(id =>
      f.exists(new org.apache.hadoop.fs.Path(
        s"$root/$commitSub/seq=$id/_SUCCESS")))
    if (committed.size <= math.max(minFresh, 0)) return None
    val torn = (dataSubs :+ commitSub)
      .flatMap(s => freshIds(spark, root, s)).toSet -- committed
    val cap = torn.minOption.map(_ - 1).getOrElse(Long.MaxValue)
    val eligible = committed.toSeq.sorted
      .dropRight(math.max(retainNewest, 0))
    eligible.filter(_ <= cap).maxOption.filter(_ > h)
  }

  /** Freeze-or-verify a LAYOUT CONSTANT stored as a control file at
    * the root (e.g. the bucket count the partition dirs were hashed
    * with): the first writer records it, every later call must match —
    * a silent mismatch would make bucket-pruned reads miss rows with
    * no error at all, the worst failure class. Single-writer, like
    * every other control file here.
    */
  def pinLayout(spark: SparkSession, root: String, name: String,
      value: Long): Unit = {
    val f = hfs(spark, root)
    val p = new org.apache.hadoop.fs.Path(root, name)
    if (!f.exists(p)) {
      f.mkdirs(new org.apache.hadoop.fs.Path(root))
      graft.ControlFiles.atomicWrite(f, p, value.toString)
    } else {
      val stored = readSmallFile(f, p).trim.toLong
      require(stored == value,
        s"$root was created with $name=$stored, got $value — layout " +
          "constants are frozen at creation")
    }
  }

  /** The pinned layout constant, if the root has recorded one. */
  def layoutOf(spark: SparkSession, root: String,
      name: String): Option[Long] = {
    val f = hfs(spark, root)
    val p = new org.apache.hadoop.fs.Path(root, name)
    if (!f.exists(p)) None else Some(readSmallFile(f, p).trim.toLong)
  }

  /** Newest seq present in `root/sub`, 0 for a virgin or empty log —
    * the batch id a generation cutover re-adds the live set at (so the
    * external feed's strictly-monotone ids keep working across a
    * flip), and the baseline its pre-flip write-fence compares
    * against. Compaction-aware (a folded log answers its horizon even
    * if every fresh segment dir is gone).
    */
  /** Seq ids of COMMITTED segments under `root/sub` — dirs whose
    * `_SUCCESS` landed (the commit-log marker discipline). A torn
    * first delivery's partial dir is NOT a batch: counting it would
    * let a cutover reuse its id, and the torn batch's redelivery would
    * then no-op against the new root's marker — the silent-swallow
    * loss the never-fed guards exist to prevent.
    */
  private def committedSeqIds(spark: SparkSession, root: String,
      sub: String): Seq[Long] = {
    val f = hfs(spark, root)
    val dir = new org.apache.hadoop.fs.Path(s"$root/$sub")
    if (!f.exists(dir)) Seq.empty
    else f.listStatus(dir).toSeq.map(_.getPath)
      .filter { p =>
        val n = p.getName
        n.startsWith("seq=") && n.stripPrefix("seq=").forall(_.isDigit) &&
          f.exists(new org.apache.hadoop.fs.Path(p, "_SUCCESS"))
      }
      .map(_.getName.stripPrefix("seq=").toLong)
  }

  /** Newest COMMITTED seq in `root/sub`, 0 for a virgin or empty log —
    * the batch id a generation cutover re-adds the live set at (so the
    * external feed's strictly-monotone ids keep working across a
    * flip), and the baseline its pre-flip write-fence compares
    * against. Floored at the compaction horizon (a folded log whose
    * live set emptied still consumed ids up to it — answering below
    * would let a cutover reuse an id an old batch holds, turning its
    * redelivery into fresh data); torn uncommitted segments never
    * count. Pure directory listing — no Spark job.
    */
  def lastSeq(spark: SparkSession, root: String, sub: String): Long =
    (committedSeqIds(spark, root, sub) :+
      compactedUpTo(spark, root).getOrElse(0L)).max

  /** Whether any batch has ever COMMITTED into `root/sub` (a
    * `_SUCCESS`-marked segment, or a compaction horizon proving folded
    * history) — distinguishes "last seq is 0 because batch 0 exists"
    * from a virgin log, and never mistakes a torn first delivery for
    * history.
    */
  def hasBatches(spark: SparkSession, root: String, sub: String): Boolean =
    compactedUpTo(spark, root).isDefined ||
      committedSeqIds(spark, root, sub).nonEmpty

  /** ALIASED GENERATIONS — the blue/green cutover both incremental
    * indexes share: an `_active` marker at a PARENT root names the
    * live generation directory (`g<N>`), a rebuild lands in a FRESH
    * generation while readers keep resolving the alias per query, and
    * one atomic control-file write is the entire commit. A crash
    * before the flip leaves the old generation active plus at most an
    * orphaned half-built dir; each attempt takes a new name, so a
    * retried rebuild never races its crashed twin's files.
    */
  object Alias {
    def marker(parent: String): org.apache.hadoop.fs.Path =
      new org.apache.hadoop.fs.Path(parent, "_active")

    /** The live generation root (fails fast on an un-aliased parent). */
    def resolve(spark: SparkSession, parent: String): String = {
      val f = hfs(spark, parent)
      val p = marker(parent)
      require(f.exists(p), s"$parent has no _active index alias")
      s"$parent/${graft.ControlFiles.readFully(f, p).trim}"
    }

    /** Atomically point the alias at generation `gen`. */
    def publish(spark: SparkSession, parent: String, gen: String): Unit =
      graft.ControlFiles.atomicWrite(hfs(spark, parent), marker(parent),
        gen)

    /** BOOTSTRAP guard: refuse to initialize a parent that is already
      * aliased. A re-run of an init command on a live parent would
      * otherwise clobber g0's data and/or atomically cut production
      * over to an empty (possibly already-GC'd) g0: lookups go
      * silently empty, the next feed batch creates a fresh g0, and the
      * real corpus sits stranded in the old generation. Called FIRST
      * (fail fast, before any write) so a crash between a bootstrap's
      * data writes and its publish stays retryable — the marker only
      * lands at the end, via the plain [[publish]]. Rebuilding is the
      * cutover protocols; bootstrapping twice is an error.
      */
    def requireUnaliased(spark: SparkSession, parent: String): Unit = {
      val f = hfs(spark, parent)
      require(!f.exists(marker(parent)),
        s"$parent is already aliased (active generation " +
          s"'${graft.ControlFiles.readFully(f, marker(parent)).trim}') — " +
          "re-initializing would cut production over to an empty " +
          "generation; use the rebuild/retrain cutover instead")
    }

    /** [[requireUnaliased]] + [[publish]] — the bootstrap publish for
      * inits with no data writes of their own.
      */
    def publishInitial(spark: SparkSession, parent: String,
        gen: String): Unit = {
      requireUnaliased(spark, parent)
      publish(spark, parent, gen)
    }

    /** A fresh generation name: 1 + max over existing g<n> dirs AND
      * the alias target (a crashed attempt's orphan just bumps the
      * counter; the alias floor matters for a virgin aliased parent
      * whose active generation has no directory yet — allocating the
      * active name itself would build in place of the live root).
      */
    def nextGen(spark: SparkSession, parent: String): String = {
      val f = hfs(spark, parent)
      def genN(n: String): Option[Long] =
        if (n.startsWith("g") && n.drop(1).nonEmpty &&
          n.drop(1).forall(_.isDigit)) Some(n.drop(1).toLong) else None
      val dirNs = f.listStatus(
        new org.apache.hadoop.fs.Path(parent)).toSeq
        .map(_.getPath.getName).flatMap(genN)
      val aliasN =
        if (f.exists(marker(parent)))
          genN(new org.apache.hadoop.fs.Path(
            resolve(spark, parent)).getName)
        else None
      s"g${1 + (dirNs ++ aliasN).maxOption.getOrElse(-1L)}"
    }

    /** Delete every generation STRICTLY BELOW the active one — run
      * once no in-flight reader can still hold the old alias (the
      * caller's quiesce window, like vacuum retention). Generations
      * NEWER than the active one are never touched: a rebuild in
      * flight always carries a newer name ([[nextGen]] allocates above
      * every existing one), so deleting only below the alias can never
      * race a concurrent builder — a crashed newer orphan is reclaimed
      * by the cleanup after the NEXT successful flip moves the alias
      * past it.
      */
    def cleanup(spark: SparkSession, parent: String): Unit = {
      val f = hfs(spark, parent)
      val active = new org.apache.hadoop.fs.Path(
        resolve(spark, parent)).getName
      val activeN =
        if (active.startsWith("g") && active.drop(1).nonEmpty &&
          active.drop(1).forall(_.isDigit))
          active.drop(1).toLong
        else return // a non-gN alias target: nothing is provably stale
      f.listStatus(new org.apache.hadoop.fs.Path(parent)).toSeq
        .map(_.getPath.getName)
        .filter(n => n.startsWith("g") && n.drop(1).nonEmpty &&
          n.drop(1).forall(_.isDigit) && n.drop(1).toLong < activeN)
        .foreach(n => f.delete(
          new org.apache.hadoop.fs.Path(s"$parent/$n"), true))
    }
  }

  /** Publish `upTo` as the new horizon: temp write + OVERWRITE rename,
    * the one atomic commit point of a compaction. The overwrite rename
    * (FileContext — the same primitive Structured Streaming's
    * checkpoint manager relies on) is what makes RE-publishing safe: a
    * delete-then-rename pair would open a window where no marker
    * exists and every previously folded row silently vanishes from
    * reads.
    */
  def publishMarker(spark: SparkSession, root: String, upTo: Long): Unit =
    graft.ControlFiles.atomicWrite(hfs(spark, root), compactMarker(root),
      upTo.toString)

  /** Delete segment dirs (≤ horizon) and older compact trees the
    * `_compacted` marker has superseded. Safe any time, including
    * after a crashed compaction's publish; a no-op without a marker.
    */
  def cleanup(spark: SparkSession, root: String, subs: Seq[String]): Unit =
    compactedUpTo(spark, root).foreach { c =>
      val f = hfs(spark, root)
      subs.foreach { sub =>
        val dir = new org.apache.hadoop.fs.Path(s"$root/$sub")
        if (f.exists(dir)) f.listStatus(dir).toSeq
          .map(_.getPath.getName)
          .filter(n => n.startsWith("seq=") &&
            n.stripPrefix("seq=").forall(_.isDigit) &&
            n.stripPrefix("seq=").toLong <= c)
          .foreach(n => f.delete(
            new org.apache.hadoop.fs.Path(s"$root/$sub/$n"), true))
      }
      val cdir = new org.apache.hadoop.fs.Path(s"$root/_compact")
      if (f.exists(cdir)) f.listStatus(cdir).toSeq
        .map(_.getPath.getName)
        .filter(n => n.forall(_.isDigit) && n.toLong < c)
        .foreach(n => f.delete(
          new org.apache.hadoop.fs.Path(s"$root/_compact/$n"), true))
    }
}
