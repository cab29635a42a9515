package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
import org.apache.spark.sql.execution.joins.CartesianProductExec
import org.apache.spark.sql.execution.window.WindowExec
import org.scalatest.funsuite.AnyFunSuite

/** Static scale-shape regression guards over the contract plans.
  *
  * These inspect the planner's physical output (pre-AQE `sparkPlan`)
  * without executing the queries, so a future edit that silently
  * reintroduces a scale-killer — an unconstrained pair product, or a
  * window that funnels the fact table through |group-values| tasks —
  * fails the suite even though every row-level oracle still matches.
  */
class PlanShapeSpec extends AnyFunSuite {
  import SparkTestBase._

  private def plan(name: String): SparkPlan = {
    val p = SparkEntry.queries(name)(spark, sf0001).queryExecution.sparkPlan
    Materialize.releaseAll() // drop construction-time checkpoints
    p
  }

  test("no contract query plans a CartesianProduct") {
    SparkEntry.queries.keys.toSeq.sorted.foreach { n =>
      assert(plan(n).collectFirst { case c: CartesianProductExec => c }
        .isEmpty, s"$n plans an unconstrained CartesianProduct")
    }
  }

  // The RankSelect guarantee (SURVEY §2.12 percentile family): ranking
  // windows over FACT rows partition by (group, bucket) — never by the
  // bare low-cardinality group alone. Size-1 windows are legal only
  // over bounded aggregates (RankSelect's histogram prefix sum) or
  // data-proportional keys (user_id sessionization), so the check
  // fails exactly when a single-column group window sits on a subtree
  // with no aggregation below it.
  private val lowCardGroups = Set("st", "et", "g", "grp", "flag",
    "o_orderstatus", "event_type", "l_returnflag", "lang", "pid")

  test("rank-selection queries never window-partition facts by the bare group") {
    Seq("q_percentile", "q_agg_winsorize", "q_window_ntile", "q_agg_gini",
      "q_agg_pareto", "q_window_session_stats", "q_stats_outlier",
      "q_agg_wmedian", "q_sample_stratified", "q_ml_ndcg", "q_ml_mrr")
      .foreach { n =>
        plan(n).collect { case w: WindowExec => w }.foreach { w =>
          val parts = w.partitionSpec.flatMap(_.references).map(_.name)
            .toSet
          val overFacts =
            w.child.collectFirst { case a: BaseAggregateExec => a }.isEmpty
          // A rank-limited window (rn <= k) is exempt: WindowGroupLimit
          // below it makes map tasks forward local top-k rows, so no
          // task ever holds a full group partition even when the
          // partition key is low-cardinality (q_ml_ndcg's top-10).
          val rankLimited = w.child.collectFirst {
            case l: org.apache.spark.sql.execution.window
              .WindowGroupLimitExec => l }.nonEmpty
          assert(!(parts.nonEmpty && parts.subsetOf(lowCardGroups) &&
            overFacts && !rankLimited),
            s"$n windows raw facts partitioned only by $parts — " +
              "the |group|-task scale-killer RankSelect exists to avoid")
        }
      }
  }

  // q_multimodal_decode's scale claim is "a pure map-side metadata
  // pass": synth + parse are partition-local typed maps, so the ONLY
  // exchange in the plan must be the presentation sort's range
  // partitioning — any hash exchange, join, or aggregate appearing
  // here means the decode stage started moving payload bytes.
  test("q_multimodal_decode shuffles nothing but the presentation sort") {
    val p = plan("q_multimodal_decode")
    val exchanges = p.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }
    assert(exchanges.size <= 1, s"decode plans ${exchanges.size} exchanges")
    exchanges.foreach { e =>
      assert(e.outputPartitioning.isInstanceOf[
        org.apache.spark.sql.catalyst.plans.physical.RangePartitioning],
        s"decode's exchange is ${e.outputPartitioning}, not the sort's " +
          "range partitioning")
    }
    assert(p.collectFirst { case a: BaseAggregateExec => a }.isEmpty &&
      p.collectFirst {
        case j: org.apache.spark.sql.execution.joins.BaseJoinExec => j
      }.isEmpty,
      "decode plans an aggregate or join — it must stay a map pass")
  }

  // q_quality_lm's model joins (c2 on (w1,w2), c1 on w1, the 1-row V)
  // must all stay broadcast hash joins: a sort-merge join there would
  // shuffle the corpus-scale bigram stream by token — exactly the
  // "model rides to the data, not the data to the model" inversion the
  // query's scale story depends on.
  test("q_quality_lm joins the broadcast model, never shuffling bigrams") {
    val joins = plan("q_quality_lm").collect {
      case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j
      case j: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec => j
    }
    assert(joins.isEmpty,
      s"q_quality_lm plans ${joins.size} shuffled join(s) — the LM " +
        "model must broadcast")
  }

  // r18: SpanDedup.spanHashes uses explode_outer precisely so
  // InferFiltersFromGenerate cannot derive a `size(spans) > 0 AND
  // isnotnull(spans)` predicate that re-evaluates the WHOLE span
  // construction (transform + slice + concat_ws + xxhash64 per
  // window) twice per doc inside a Filter. Pin: no Filter condition
  // may contain an xxhash64 — the span hash may only ever be computed
  // in the Project/Generate that emits it.
  //
  // r19 (ADVICE): the r18 version of this pin checked the two contract
  // queries' plans, where spanHashes sits behind Materialize.checkpoint
  // — the span build lives inside the InMemoryRelation's cachedPlan,
  // which SparkPlan.collect does NOT traverse, so the pin passed even
  // with the regression reintroduced (verified: explode → explode_outer
  // revert still passed). Fixed two ways: (1) pin spanHashes' OWN plan,
  // built without any checkpoint, and (2) re-check the contract plans
  // recursing into every InMemoryTableScanExec's cachedPlan.
  private def collectDeep[A](p: SparkPlan)(
      pf: PartialFunction[SparkPlan, A]): Seq[A] = {
    val cached = p.collect {
      case s: org.apache.spark.sql.execution.columnar
        .InMemoryTableScanExec => s.relation.cachedPlan
    }
    p.collect(pf) ++ cached.flatMap(collectDeep(_)(pf))
  }

  private def assertNoHashInFilters(p: SparkPlan, n: String): Unit =
    collectDeep(p) {
      case f: org.apache.spark.sql.execution.FilterExec => f
    }.foreach { f =>
      assert(f.condition.collectFirst {
        case x: org.apache.spark.sql.catalyst.expressions.XxHash64 => x
      }.isEmpty,
        s"$n re-evaluates the span-hash build inside a Filter " +
          s"(derived generate filter is back): ${f.condition}")
    }

  test("span queries never re-evaluate the span build inside a Filter") {
    // the direct pin: spanHashes' own physical plan, no cache around it
    val docs = graft.sources.Tables.documents(spark, sf0001)
    assertNoHashInFilters(
      graft.operators.SpanDedup.spanHashes(docs, "doc_id", "text", 6)
        .queryExecution.sparkPlan, "spanHashes")
    // and the contract plans, traversing into cached relations
    Seq("q_span_coverage", "q_span_removal").foreach { n =>
      assertNoHashInFilters(plan(n), n)
    }
  }

  // r18: q_assoc_rules derives BOTH directed rules from ONE explode
  // over the pair aggregate — the earlier unionAll of two selects
  // duplicated the heavy in-basket pair Generate (flatten(transform(
  // ...))) into two plan subtrees, doubling the map-side explode +
  // partial-aggregate work (AQE reuses the shuffle read, not the map
  // work). Pin: exactly one Generate in the plan (cached subplans
  // included) explodes an expression whose tree contains a Flatten —
  // structural, per r18 ADVICE, so a refactor of the pair expression
  // to another flatten-free spelling fails loudly rather than
  // silently matching nothing.
  test("q_assoc_rules explodes the in-basket pair stream exactly once") {
    import org.apache.spark.sql.catalyst.expressions.{Flatten, ExplodeBase}
    val gens = collectDeep(plan("q_assoc_rules")) {
      case g: org.apache.spark.sql.execution.GenerateExec
          if (g.generator match {
            case e: ExplodeBase => e.child.collectFirst {
              case f: Flatten => f }.nonEmpty
            case _ => false
          }) => g
    }
    assert(gens.size === 1,
      s"q_assoc_rules plans ${gens.size} flatten-pair Generates — the " +
        "union-branch duplication is back")
  }
}
