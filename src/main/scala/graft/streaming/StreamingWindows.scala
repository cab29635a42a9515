package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.GroupState

import graft.functions.Money._

/** Structured Streaming twin of the batch event-time windows
  * (SURVEY.md §2.9 / §7.6).
  *
  * The reference is strictly batch [SPEC][MR]; the north star requires
  * the same operator logic to lift onto streams unchanged. These
  * transforms are therefore written against a plain DataFrame and work
  * identically under `spark.read` and `spark.readStream` — the batch
  * contract query `q_window_tumbling` is the `date_trunc` spelling of
  * [[tumblingCounts]]'s `window()` aggregation.
  *
  * At scale this is the streaming ingestion path of the pipeline:
  * watermarked tumbling aggregates are partial-aggregated per
  * micro-batch (the MR combiner again), and per-key state lives in the
  * state store keyed exactly like the batch shuffle would be.
  */
object StreamingWindows {

  /** Typed event row for the stateful operators, ts = epoch MICROS.
    * The stored layout has varied across fixture generations (ns-long
    * vs µs-timestamp — see Tables.normalizeEventsTs), so ingestion
    * goes through [[typedEvents]] / [[typedEventsStream]], which
    * normalize ts to µs before the `as[RawEvent]` cast; the operators
    * never see a physical layout.
    */
  final case class RawEvent(event_id: Long, ts: Long, user_id: Long,
      event_type: String, value: Double, props: String)

  /** ts → epoch-µs LongType from either stored layout: ns-as-long
    * (integer div — ns exceeds 2^53, double math corrupts µs) or
    * (NTZ-)timestamp (unix_micros under the UTC-pinned session).
    */
  private def tsToMicros(df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", expr("ts div 1000"))
      case _ =>
        df.withColumn("ts", unix_micros(col("ts")
          .cast(org.apache.spark.sql.types.TimestampType)))
    }

  /** Batch read of an events parquet as a typed µs dataset. */
  def typedEvents(spark: SparkSession, path: String): Dataset[RawEvent] = {
    import spark.implicits._
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    tsToMicros(spark.read.parquet(path)).as[RawEvent]
  }

  /** File-stream read of an events directory as a typed µs dataset
    * (one arriving file per micro-batch when `maxFilesPerTrigger` is
    * passed by the caller's plan; schema from a batch twin file).
    */
  def typedEventsStream(spark: SparkSession, streamDir: String,
      schemaFrom: String, maxFilesPerTrigger: Option[Int] = None)
      : Dataset[RawEvent] = {
    import spark.implicits._
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = spark.read.parquet(schemaFrom).schema
    val reader = spark.readStream.schema(schema)
    val withOpt = maxFilesPerTrigger
      .fold(reader)(n => reader.option("maxFilesPerTrigger", n.toString))
    tsToMicros(withOpt.parquet(streamDir)).as[RawEvent]
  }

  /** Running per-user state for [[userRunningCounts]]. */
  final case class UserState(n: Long)

  /** Per-user output row. */
  final case class UserCount(user_id: Long, n_events: Long)

  /** The streaming-shaped events source: a directory of event parquet
    * files read as a file stream (each arriving file = one micro-batch
    * with the default `maxFilesPerTrigger=1`). `schemaFrom` points at
    * any batch parquet with the same layout — file-stream sources
    * require an explicit schema. `maxFilesPerTrigger = None` leaves the
    * source unthrottled — a bounded replay then drains in ONE
    * micro-batch, the Trigger.AvailableNow-style catch-up shape (same
    * result on bounded input; one planning + state-commit + sink round
    * instead of one per file).
    */
  def eventsStream(spark: SparkSession, streamDir: String,
      schemaFrom: String,
      maxFilesPerTrigger: Option[Int] = Some(1)): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = spark.read.parquet(schemaFrom).schema
    val reader = spark.readStream.schema(schema)
    val withOpt = maxFilesPerTrigger
      .fold(reader)(n => reader.option("maxFilesPerTrigger", n.toString))
    graft.sources.Tables.normalizeEventsTs(withOpt.parquet(streamDir))
  }

  /** Windowed counts × event_type with a 1-hour watermark bounding
    * state; `slide` defaults to `size` (tumbling) and a smaller slide
    * gives overlapping (sliding) windows. Works for batch and streaming
    * input alike.
    */
  def windowedCounts(events: DataFrame, size: String = "1 hour",
      slide: Option[String] = None): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), size, slide.getOrElse(size)), col("event_type"))
      .agg(count(lit(1)).as("n"), sumCents(col("value")).as("sum_value_c"))
      .select(col("window.start").as("hour_start"), col("event_type"),
        col("n"), col("sum_value_c"))

  /** 1-hour tumbling window × event_type (the q_window_tumbling twin). */
  def tumblingCounts(events: DataFrame): DataFrame = windowedCounts(events)

  /** STREAM-STREAM interval join: each view pairs with the same user's
    * purchases landing within `window` after it — the attribution
    * primitive (q_events_attribution's streaming twin), and the one
    * join class only Structured Streaming state can express: BOTH
    * sides are unbounded, so each buffers in the state store and the
    * event-time bound + watermarks are what let state evict (without
    * the interval condition the state would grow forever — Spark
    * rejects the plan). Works identically on batch frames (the
    * interval condition is just a θ-join there), which is exactly what
    * StreamingSpec exploits to prove stream == batch on bounded input.
    */
  def viewPurchaseJoin(events: DataFrame,
      window: String = "30 minutes"): DataFrame = {
    val views = events
      .filter(col("event_type") === "view")
      .select(col("user_id").as("v_user"), col("ts").as("v_ts"),
        col("event_id").as("v_event"))
      .withWatermark("v_ts", "1 hour")
    val purchases = events
      .filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"),
        col("event_id").as("p_event"), col("value"))
      .withWatermark("p_ts", "1 hour")
    views.join(purchases,
      col("v_user") === col("p_user") &&
        col("p_ts") >= col("v_ts") &&
        col("p_ts") <= col("v_ts") + expr(s"INTERVAL $window"))
      .select(col("v_user").as("user_id"), col("v_event"), col("p_event"),
        col("v_ts"), col("p_ts"), col("value"))
  }

  /** Exactly-once stream dedup on event_id: watermark-bounded
    * `dropDuplicates` — the streaming form of exact dedup, state
    * evicted once the watermark passes.
    */
  def dedupStream(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .dropDuplicates("event_id")

  /** Generic parquet file stream (one arriving file per micro-batch)
    * for tables without the events ns-timestamp quirk — the ingestion
    * side of the streaming document pipeline.
    */
  def tableStream(spark: SparkSession, streamDir: String,
      schemaFrom: String): DataFrame =
    spark.readStream
      .schema(spark.read.parquet(schemaFrom).schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(streamDir)

  /** Streaming CONTENT dedup — exact dedup-on-ingest for the document
    * pipeline (the q_dedup_exact semantics lifted onto a stream):
    * keyed by content digest, first arrival wins, re-delivered or
    * re-crawled duplicates are dropped across micro-batches. Documents
    * carry no event time, so unlike [[dedupStream]] the digest state
    * is NOT watermark-evicted — at production scale you bound it with
    * a state-store TTL or key the digest by crawl epoch; the digest
    * (16 bytes) rather than the text is what the state holds either
    * way.
    */
  def contentDedupStream(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), col("lang"),
        md5(col("text").cast("binary")).as("h"))
      .dropDuplicates("h")

  /** Watermarked stream-stream interval join — the streaming twin of
    * the batch temporal-join class (q_join_range / q_join_asof):
    * purchases matched to same-user errors at most one hour earlier.
    * The watermark plus the two-sided time bound lets Spark evict both
    * sides' join state once the watermark passes `err_ts + 1 h`, so an
    * unbounded stream holds bounded state — the property the batch
    * bucketing trick provides at rest, provided here in motion. Works
    * identically on batch DataFrames (plain ranged join).
    */
  def errorPurchaseJoin(errors: DataFrame, purchases: DataFrame): DataFrame = {
    val e = errors.select(col("event_id").as("err_id"),
        col("user_id").as("err_user"), col("ts").as("err_ts"))
      .withWatermark("err_ts", "1 hour")
    val p = purchases.select(col("event_id").as("p_id"),
        col("user_id").as("p_user"), col("ts").as("p_ts"))
      .withWatermark("p_ts", "1 hour")
    e.join(p,
        col("err_user") === col("p_user") &&
          col("p_ts") >= col("err_ts") &&
          col("p_ts") <= col("err_ts") + expr("INTERVAL 1 HOUR"))
      .select(col("err_id"), col("p_id"), col("err_user").as("user_id"),
        (unix_micros(col("p_ts")) - unix_micros(col("err_ts"))).as("gap_us"))
  }

  /** One closed session: user, session ordinal, event count. */
  final case class SessionOut(user_id: Long, session_id: Long, n_events: Long)

  /** Sessionizer state: last event time (µs), open-session ordinal and
    * size, plus already-closed sessions not yet emitted.
    */
  final case class SessState(lastUs: Long, sessionId: Long, n: Long,
      closed: List[SessionOut])

  /** Streaming twin of the batch q_window_session: 30-minute-gap
    * sessionization per user via `flatMapGroupsWithState`. Events are
    * folded in (ts, event_id) order within each micro-batch; a gap
    * > 30 min closes the open session. Closed sessions are emitted as
    * they close (append mode); the final open session stays in state —
    * exactly the watermark-less portion a batch run would still see.
    */
  def sessionize(events: Dataset[RawEvent]): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    val gapUs = 30L * 60 * 1000 * 1000
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessState, SessionOut](
        org.apache.spark.sql.streaming.OutputMode.Append,
        org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout) {
        (userId: Long, rows: Iterator[RawEvent], state: GroupState[SessState]) =>
          val sorted = rows.toSeq.sortBy(e => (e.ts, e.event_id))
          var st = state.getOption.getOrElse(SessState(Long.MinValue, 0L, 0L, Nil))
          sorted.foreach { e =>
            val us = e.ts
            st =
              if (st.n == 0L) SessState(us, 1L, 1L, st.closed)
              else if (us - st.lastUs > gapUs)
                SessState(us, st.sessionId + 1, 1L,
                  SessionOut(userId, st.sessionId, st.n) :: st.closed)
              else st.copy(lastUs = us, n = st.n + 1)
          }
          val out = st.closed.reverse
          state.update(st.copy(closed = Nil))
          out.iterator
      }
  }

  /** Closed SCD2 interval row (matches q_scd2_intervals' closed rows). */
  final case class Scd2Out(user_id: Long, rn: Long, state: String,
      from_us: Long, to_us: Long, n_ev: Long)

  /** Open-run state for [[scd2Intervals]]: current run's index, state
    * value, start, event count, plus the intervals this batch closed.
    */
  final case class Scd2State(rn: Long, st: String, fromUs: Long, n: Long,
      closed: List[Scd2Out])

  /** Streaming twin of the batch q_scd2_intervals: the continuously
    * maintained dimension-history build. State per user is ONE open
    * run; an arriving event with a different state value closes it —
    * the closed interval's to_us is the new run's from_us, exactly the
    * batch lead() semantics — and opens the next. Closed intervals are
    * emitted as they close (append mode); the open run stays in state,
    * which is precisely the batch output's to_us-IS-NULL tail.
    */
  def scd2Intervals(events: Dataset[RawEvent]): Dataset[Scd2Out] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[Scd2State, Scd2Out](
        org.apache.spark.sql.streaming.OutputMode.Append,
        org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout) {
        (userId: Long, rows: Iterator[RawEvent], state: GroupState[Scd2State]) =>
          val sorted = rows.toSeq.sortBy(e => (e.ts, e.event_id))
          var st = state.getOption.getOrElse(Scd2State(0L, "", 0L, 0L, Nil))
          sorted.foreach { e =>
            val us = e.ts
            st =
              if (st.n == 0L) Scd2State(1L, e.event_type, us, 1L, st.closed)
              else if (e.event_type != st.st)
                Scd2State(st.rn + 1, e.event_type, us, 1L,
                  Scd2Out(userId, st.rn, st.st, st.fromUs, us, st.n)
                    :: st.closed)
              else st.copy(n = st.n + 1)
          }
          val out = st.closed.reverse
          state.update(st.copy(closed = Nil))
          out.iterator
      }
  }

  /** Latest-record emission: (user, type, epoch-µs of the winner). */
  final case class LatestOut(user_id: Long, last_type: String, last_us: Long)

  /** Per-user champion: epoch-µs ts + unique id + type of the newest
    * event seen so far (the id breaks same-timestamp ties).
    */
  final case class LatestState(tsUs: Long, eventId: Long, eventType: String)

  /** Streaming twin of the batch q_agg_argmax: the continuously
    * maintained latest-record-per-key view (the upsert/compaction
    * materialized view every incremental ingest keeps). State per user
    * is ONE champion row — (ts, id, type) — updated by the same total
    * order the batch `max_by` sort key encodes: newest ts wins,
    * same-µs ties go to the SMALLEST event_id. Re-delivered events
    * compare against the champion and lose, so the view is idempotent
    * under replay — the q_dedup-style exactly-once guarantee falls out
    * of the monotone state fold rather than a digest store.
    */
  def latestRecord(events: Dataset[RawEvent]): Dataset[LatestOut] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState[LatestState, LatestOut](
        org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout) {
        (userId: Long, rows: Iterator[RawEvent], state: GroupState[LatestState]) =>
          var best = state.getOption.orNull
          rows.foreach { e =>
            val wins = best == null || e.ts > best.tsUs ||
              (e.ts == best.tsUs && e.event_id < best.eventId)
            if (wins) best = LatestState(e.ts, e.event_id, e.event_type)
          }
          state.update(best)
          LatestOut(userId, best.eventType, best.tsUs)
      }
  }

  /** Token row + Misra–Gries state/output for [[heavyHittersStream]]. */
  final case class TokenRow(token: String)
  final case class MgState(total: Long, words: List[String],
      counts: List[Long])
  final case class MgOut(bucket: Int, processed: Long,
      words: List[String], lower: List[Long])

  /** Streaming Misra–Gries heavy hitters —
    * [[graft.operators.HeavyHitters]]'s bounded-summary pass lifted
    * onto a stream. Tokens hash into `buckets` state keys (playing the
    * batch shape's partition role); each key folds its substream
    * through a capacity-`capacity` MG summary held in the state store,
    * so state is BOUNDED by buckets × capacity counters no matter how
    * large the vocabulary grows — the unbounded-domain property that
    * makes frequent-items viable on an endless stream. Every token
    * lands in exactly ONE bucket, so a token whose in-bucket count
    * exceeds n_b/(capacity+1) — in particular any token with global
    * count > n/(capacity+1), since n_b ≤ n — provably retains a
    * counter (the batch superset argument verbatim), and the union of
    * final per-bucket candidates feeds the same exact recount pass.
    * Each micro-batch emits the bucket's current (processed,
    * candidates) snapshot; the row with max `processed` per bucket is
    * the final summary (StreamingSpec reads it that way).
    */
  def heavyHittersStream(tokens: Dataset[TokenRow], buckets: Int,
      capacity: Int): Dataset[MgOut] = {
    import tokens.sparkSession.implicits._
    require(buckets > 0 && capacity > 0)
    tokens
      .groupByKey(t => math.floorMod(t.token.hashCode, buckets))
      .mapGroupsWithState[MgState, MgOut](
        org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout) {
        (bucket: Int, rows: Iterator[TokenRow], state: GroupState[MgState]) =>
          val m = scala.collection.mutable.LinkedHashMap.empty[String, Long]
          val st = state.getOption.getOrElse(MgState(0L, Nil, Nil))
          st.words.zip(st.counts).foreach { case (w, c) => m.update(w, c) }
          var total = st.total
          rows.foreach { t =>
            total += 1L
            m.get(t.token) match {
              case Some(c) => m.update(t.token, c + 1L)
              case None =>
                if (m.size < capacity) m.update(t.token, 1L)
                else {
                  // decrement-all: destroys capacity+1 units per pass
                  val dead = List.newBuilder[String]
                  m.foreach { case (w, c) =>
                    if (c == 1L) dead += w else m.update(w, c - 1L)
                  }
                  dead.result().foreach(m.remove)
                }
            }
          }
          state.update(MgState(total, m.keys.toList, m.values.toList))
          MgOut(bucket, total, m.keys.toList, m.values.toList)
      }
  }

  /** Keyed value + KMV state/output for [[thetaSketchStream]]. */
  final case class KeyedLong(key: String, value: Long)
  final case class KmvState(processed: Long, hashes: List[Long])
  final case class KmvOut(key: String, processed: Long, kmv: List[Long])

  /** Streaming twin of [[graft.operators.ThetaSketch]]: a per-key KMV
    * distinct-count sketch folded across micro-batches with BOUNDED
    * state — at most k hashes per key no matter how many distinct
    * values stream past, the property that keeps the state store
    * finite on an endless stream. Values hash through the same
    * `xxhash64` (XXH64, seed 42) the batch builder applies, and KMV
    * insertion is order- and duplication-insensitive, so on a bounded
    * replay the final per-key state is ARRAY-EQUAL to the batch
    * sketch — even when the replay delivers the data twice
    * (StreamingSpec pins exactly that). Each micro-batch emits the
    * key's current snapshot (mergeable with any other theta sketch via
    * `ThetaSketch.union`); the row with max `processed` per key is the
    * final sketch.
    */
  def thetaSketchStream(rows: Dataset[KeyedLong], k: Int): Dataset[KmvOut] = {
    import rows.sparkSession.implicits._
    require(k > 0, s"capacity must be positive, got $k")
    rows
      .groupByKey(_.key)
      .mapGroupsWithState[KmvState, KmvOut](
        org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout) {
        (key: String, it: Iterator[KeyedLong], state: GroupState[KmvState]) =>
          val st = state.getOption.getOrElse(KmvState(0L, Nil))
          val set = scala.collection.mutable.TreeSet.empty[Long]
          set ++= st.hashes
          var n = st.processed
          it.foreach { r =>
            n += 1L
            val h = org.apache.spark.sql.catalyst.expressions.XXH64
              .hashLong(r.value, 42L)
            if (set.size < k) set += h
            else if (h < set.last) {
              set += h // TreeSet dedups: a re-seen hash changes nothing
              if (set.size > k) set -= set.last
            }
          }
          state.update(KmvState(n, set.toList))
          KmvOut(key, n, set.toList)
      }
  }

  /** Stateful per-key operator: running event count per user via
    * `mapGroupsWithState` — the Spark-native form of the reference's
    * per-key juice fold, with state persisted across micro-batches.
    */
  def userRunningCounts(events: Dataset[RawEvent]): Dataset[UserCount] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState[UserState, UserCount](
        org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout) {
        (userId: Long, rows: Iterator[RawEvent], state: GroupState[UserState]) =>
          val prev = state.getOption.map(_.n).getOrElse(0L)
          val next = prev + rows.size
          state.update(UserState(next))
          UserCount(userId, next)
      }
  }
}
