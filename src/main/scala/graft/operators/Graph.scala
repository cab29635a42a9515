package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** General connected components over an arbitrary edge list — the
  * canonical beyond-one-pass graph primitive (entity resolution,
  * householding, dedup clusters when the graph does NOT come from LSH
  * buckets with small diameter).
  *
  * Algorithm: alternating large-star / small-star contraction
  * (Kiveris et al., "Connected Components in MapReduce and Beyond") —
  * each round rewires every edge toward its neighborhood minimum:
  *
  *   large-star(u): m = min(Γ(u) ∪ {u}); replace each (u, v) with
  *     v > u by (v, m)
  *   small-star(u): orient edges large→small, m = min(Γ(u) ∪ {u});
  *     connect u and all its smaller neighbors to m
  *
  * Both steps are a groupBy-min plus a join — NO per-node neighbor
  * lists are ever collected, so a celebrity node costs a hot
  * aggregation key (AQE-splittable), not an unboundable array. The
  * payoff over plain min-label propagation (the q_dedup_cluster
  * fixpoint, which is the right choice for LSH graphs whose diameter
  * is small by construction) is the convergence bound: star
  * contraction halves component height geometrically, so a PATH of
  * length L needs O(log L) rounds, not O(L) cluster-wide barriers —
  * GraphSpec pins a 400-node chain converging in ≤ 12 rounds where
  * hop-propagation would need ~400.
  *
  * Convergence detection is one aggregate per round (edge count plus
  * an order-insensitive two-seed hash sum of the edge set), the same
  * scalar-only-to-the-driver discipline as the dedup fixpoint.
  * Output: (node, component) with component = the component's minimum
  * node id — deterministic, engine-independent. Nodes with no edges
  * are absent by definition of an edge list (callers union isolated
  * ids as self-components if they track them).
  */
object Graph {

  /** Connected components of the undirected graph `edges` (columns
    * `src`, `dst`, any integral type; self-loops and duplicates are
    * fine). Returns (node, component).
    */
  def connectedComponents(edges: DataFrame, maxRounds: Int = 50)
      : DataFrame =
    connectedComponentsWithRounds(edges, maxRounds)._1

  /** [[connectedComponents]] plus the number of star rounds used —
    * spec-visible so the logarithmic convergence is testable.
    */
  def connectedComponentsWithRounds(edges: DataFrame,
      maxRounds: Int = 50): (DataFrame, Int) = {
    val e0 = edges.select(col("src").cast("long").as("a"),
        col("dst").cast("long").as("b"))
      .filter(col("a") =!= col("b"))
      .select(least(col("a"), col("b")).as("a"),
        greatest(col("a"), col("b")).as("b"))
      .distinct()

    // large-star: for every node u (symmetrized), connect its strictly
    // larger neighbors to min(Γ(u) ∪ {u})
    def largeStar(e: DataFrame): DataFrame = {
      val sym = e.select(col("a").as("u"), col("b").as("v"))
        .unionAll(e.select(col("b").as("u"), col("a").as("v")))
      val m = sym.groupBy("u")
        .agg(least(min(col("v")), first(col("u"))).as("m"))
      sym.join(m, "u")
        .filter(col("v") > col("u"))
        .select(col("v").as("a"), col("m").as("b"))
        .distinct()
    }

    // small-star: orient large→small (a > b holds after largeStar's
    // (v, m) emission? not necessarily — normalize), group by the
    // larger endpoint, connect it and all smaller neighbors to the min
    def smallStar(e: DataFrame): DataFrame = {
      val dir = e.select(greatest(col("a"), col("b")).as("u"),
        least(col("a"), col("b")).as("v"))
      val m = dir.groupBy("u").agg(min(col("v")).as("m"))
      val rewired = dir.join(m, "u")
        .filter(col("v") =!= col("m"))
        .select(col("v").as("a"), col("m").as("b"))
      val own = m.select(col("u").as("a"), col("m").as("b"))
      rewired.unionAll(own).distinct()
    }

    // order-insensitive edge-set fingerprint: one aggregate, scalars
    // to the driver only. bit_xor (not sum) — XOR never overflows
    // under ANSI and is exact on a DISTINCT edge set; two seeds guard
    // against a single-hash coincidence.
    def fingerprint(e: DataFrame): (Long, Long, Long) = {
      val r = e.select(xxhash64(col("a"), col("b"), lit(1)).as("h1"),
          xxhash64(col("a"), col("b"), lit(2)).as("h2"))
        .agg(count(lit(1)), expr("bit_xor(h1)"), expr("bit_xor(h2)"))
        .head()
      (r.getLong(0),
        if (r.isNullAt(1)) 0L else r.getLong(1),
        if (r.isNullAt(2)) 0L else r.getLong(2))
    }

    // One round = persist the new edge set (the fingerprint aggregate
    // is the materializing action — one driver job per round) and then
    // TRUNCATE the logical plan behind a LogicalRDD leaf
    // (createDataFrame over the cached plan's RDD). Without the
    // truncation each round's plan nests the previous one ~6× (both
    // stars reference their input several times) and analysis time
    // goes exponential by round ~8 — persist caches the DATA but not
    // the planner work. The RDD handle reads the registered cache, so
    // releasing round r−1 after round r materializes keeps exactly one
    // edge set persisted, same as the dedup fixpoint's discipline.
    def materializeRound(e: DataFrame)
        : (DataFrame, DataFrame, (Long, Long, Long)) = {
      val p = graft.Materialize.checkpointLazy(smallStar(largeStar(e)))
      val nfp = fingerprint(p)
      (p.sparkSession.createDataFrame(p.rdd, p.schema), p, nfp)
    }
    var (cur, handle, fp) = materializeRound(e0)
    var rounds = 1
    var done = false
    while (!done && rounds < maxRounds) {
      val (ncur, nhandle, nfp) = materializeRound(cur)
      graft.Materialize.release(handle)
      done = nfp == fp
      cur = ncur
      handle = nhandle
      fp = nfp
      rounds += 1
    }

    // converged small-star output is a star forest: every non-root
    // points at its component min; roots label themselves
    val labels = cur.select(col("a").as("node"), col("b").as("component"))
      .unionAll(cur.select(col("b").as("node"), col("b").as("component")))
      .groupBy("node").agg(min(col("component")).as("component"))
    (labels, rounds)
  }
}
