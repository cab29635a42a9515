package graft

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Explicit lifecycle for intra-query materialization.
  *
  * Queries that reuse an expensive intermediate (the MinHash signature
  * table consumed by both sides of the band self-join, IVF centroids
  * across Lloyd iterations) materialize it here instead of calling
  * `localCheckpoint()` directly. The difference is the release story:
  * localCheckpoint blocks live until the RDD is GC'd, so a full-contract
  * single-session bench accumulates them and the resulting memory/GC
  * pressure shows up as multi-second per-query spikes. `checkpoint`
  * registers every persisted frame so the session driver (Bench, Verify,
  * a test suite) can `releaseAll()` once the consuming action finishes.
  *
  * persist is also safer than localCheckpoint under release: an
  * unpersisted frame silently recomputes from lineage (correct, just
  * slower), whereas dropping localCheckpoint blocks kills the frame.
  */
object Materialize {

  private val active = ArrayBuffer.empty[DataFrame]

  /** Persist `df` (memory+disk) and materialize it EAGERLY — the two
    * sides of a self-join are otherwise independent map stages that the
    * scheduler may run concurrently, computing the cache twice.
    * Registration happens BEFORE the materializing count: if the count
    * fails partway, the partially-cached frame is already registered
    * and the caller's releaseAll() still drops its blocks.
    */
  def checkpoint(df: DataFrame): DataFrame = {
    val p = df.persist(StorageLevel.MEMORY_AND_DISK)
    synchronized { active += p }
    p.count()
    p
  }

  /** Persist `df` and register it WITHOUT a materializing action — for
    * callers whose very next statement is itself an action over every
    * partition of the frame (e.g. a fixpoint's convergence count over a
    * change flag carried in the frame): that action populates the cache
    * and the separate blocking count here would be a pure extra job.
    * Not for frames whose first consumers are concurrent plan branches
    * — those need [[checkpoint]]'s eager count to avoid computing the
    * cache twice.
    */
  def checkpointLazy(df: DataFrame): DataFrame = {
    val p = df.persist(StorageLevel.MEMORY_AND_DISK)
    synchronized { active += p }
    p
  }

  /** Unpersist ONE frame before the query finishes — for iterative
    * fixpoints where each round's frame supersedes the previous one.
    * Without early release a 20-round loop holds 20 corpus-scale
    * frames persisted simultaneously when only the latest is live.
    */
  def release(df: DataFrame): Unit = {
    synchronized {
      val i = active.indexWhere(_ eq df)
      if (i >= 0) active.remove(i)
    }
    df.unpersist(blocking = false)
  }

  /** Number of currently registered frames — spec visibility for the
    * fixpoint-release discipline. */
  private[graft] def activeCount: Int = synchronized { active.size }

  /** Unpersist every frame registered since the last release. Called by
    * Bench after each timed rep and by Verify after each query dump.
    */
  def releaseAll(): Unit = synchronized {
    active.foreach(_.unpersist(blocking = false))
    active.clear()
  }
}
