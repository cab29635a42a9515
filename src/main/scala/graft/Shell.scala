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
  *   contract <query_name>                run any SparkEntry contract
  *                                        query by name
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

  def run(s: SparkSession, dir: String, cmd: String): DataFrame =
    tokenize(cmd) match {
      // ordering: ALL columns, not just the first — first columns are
      // not unique on every table (lineitem), and a partial sort would
      // print nondeterministic rows across runs (the repo's
      // determinism discipline: every output ends in a unique-key sort)
      case List("filter", table, regex) =>
        val df = load(s, dir, table)
        anyColMatch(df, regex).orderBy(df.columns.map(col).toSeq: _*)
      case List("filter", table, column, regex) =>
        val df = load(s, dir, table)
        df.filter(col(column).rlike(regex))
          .orderBy(df.columns.map(col).toSeq: _*)
      case List("grep", table, regex) =>
        anyColMatch(load(s, dir, table), regex)
          .agg(count(lit(1)).as("n_matches"))
      case List("join", t1, t2, k1, k2) =>
        val ta = load(s, dir, t1)
        val tb = load(s, dir, t2)
        val order = ta.columns.map(c => col(s"a.$c")) ++
          tb.columns.map(c => col(s"b.$c"))
        ta.as("a").join(tb.as("b"), col(s"a.$k1") === col(s"b.$k2"))
          .orderBy(order.toSeq: _*)
      case List("wordcount", table, column) =>
        load(s, dir, table)
          .select(explode(split(col(column), " ")).as("word"))
          .filter(col("word") =!= "")
          .groupBy("word")
          .agg(count(lit(1)).as("cnt"))
          .orderBy(col("cnt").desc, col("word"))
      // exact dedup on a column digest: one hash aggregate (the
      // q_dedup_exact shape) — the survivor is the row whose leading
      // column is minimal, deterministically
      case List("dedup", table, column) =>
        val df = load(s, dir, table)
        df.select(md5(col(column).cast("string").cast("binary")).as("h"),
            struct(df.columns.map(col).toSeq: _*).as("row"))
          .groupBy("h")
          .agg(min(col("row")).as("keep"), count(lit(1)).as("n_dups"))
          .select((col("keep.*") +: Seq(col("n_dups"))): _*)
          .orderBy(df.columns.map(col).toSeq: _*)
      case List("split", table, idcol) =>
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
      case List("pipe", table, cmd) =>
        graft.operators.Pipe.pipeShell(load(s, dir, table), cmd)
          .orderBy("line")
      case List("pipe", table, column, cmd) =>
        graft.operators.Pipe
          .pipeShell(load(s, dir, table).select(col(column)), cmd)
          .orderBy("line")
      case List("contract", name) =>
        SparkEntry.queries.getOrElse(name,
          throw new IllegalArgumentException(
            s"unknown contract query: $name"))(s, dir)
      case other =>
        throw new IllegalArgumentException(
          s"unrecognized command: ${other.mkString(" ")} (see Shell scaladoc)")
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
