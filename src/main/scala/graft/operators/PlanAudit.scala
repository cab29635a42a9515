package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.ScalaUDF
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.joins.CartesianProductExec
import org.apache.spark.sql.execution.window.WindowExec

/** Static scale-discipline linter over a query's physical plan — the
  * checks this repo's own PlanShapeSpec enforces on the contract
  * queries, productized so a user can audit THEIR queries before
  * paying for them at 100 TB. Pure plan inspection: nothing executes,
  * nothing is collected.
  *
  * Rules (each finding names the offending operator):
  *  - `cartesian-product`: an unconstrained pair enumeration —
  *    |left|×|right| rows. (Broadcast nested-loop joins are NOT
  *    flagged; they're bounded by the broadcast side.)
  *  - `global-window`: a window function with an empty PARTITION BY —
  *    every row through ONE task. Legitimate only over frames already
  *    bounded by an aggregation; the audit can't see row counts, so
  *    it reports and the caller decides (that is why this returns
  *    findings instead of throwing).
  *  - `single-partition-exchange`: a shuffle that funnels the whole
  *    dataset into one partition (the physical symptom behind
  *    global-window, also raised by repartition(1) and friends).
  *  - `scala-udf`: an opaque Scala UDF in the plan — blocks codegen,
  *    predicate pushdown, and column pruning through it; native
  *    expressions or built-in HOFs keep the optimizer sighted.
  *
  * PlanAuditSpec pins each rule against a deliberately offending
  * query, and — the regression guard — audits every contract query,
  * pinning the exact (query, rule) exemption set so a new scale-killer
  * entering the contract fails the suite with a named finding.
  */
object PlanAudit {

  /** One violation: the rule, the offending operator's nodeName, and
    * a one-line detail.
    */
  final case class Finding(rule: String, operator: String, detail: String)

  /** Is this subtree's row count already bounded by an aggregation, a
    * partial rank limit, or a constant LIMIT (so a one-task stage above
    * it is a bounded reduction, not a data funnel)? LIMIT counts by
    * definition: the subtree forwards at most a plan-time constant
    * number of rows no matter the input size — the top-k-fusion shape
    * (HybridSearch.rrf ranks ≤4096-row frames in one task).
    */
  private def boundedBelow(p: SparkPlan): Boolean =
    p.exists {
      case _: org.apache.spark.sql.execution.aggregate.BaseAggregateExec => true
      case _: org.apache.spark.sql.execution.window.WindowGroupLimitExec => true
      case _: org.apache.spark.sql.execution.GlobalLimitExec => true
      case _: org.apache.spark.sql.execution.LocalLimitExec => true
      case _: org.apache.spark.sql.execution.CollectLimitExec => true
      case _: org.apache.spark.sql.execution.TakeOrderedAndProjectExec => true
      // driver-literal relations are plan-time bounded too (and the
      // optimizer FOLDS a LIMIT over a LocalRelation away, so the
      // limit node a caller wrote may not survive to this plan)
      case _: org.apache.spark.sql.execution.LocalTableScanExec => true
      case _ => false
    }

  /** Audit a frame's pre-execution physical plan. */
  def audit(df: DataFrame): Seq[Finding] = {
    // EnsureRequirements gives the exchange-bearing tree (sparkPlan
    // precedes it; the AQE-wrapped executedPlan hides its children)
    val plan = org.apache.spark.sql.execution.exchange
      .EnsureRequirements().apply(df.queryExecution.sparkPlan)

    val cartesian = plan.collect { case c: CartesianProductExec =>
      Finding("cartesian-product", c.nodeName,
        "unconstrained pair enumeration: |left| x |right| rows")
    }
    // a global window is the |data|-through-one-task killer ONLY when
    // its input is raw rows; over an aggregate's output it is a
    // bounded reduction (the RankSelect prefix-sum idiom)
    val globalWindow = plan.collect {
      case w: WindowExec
          if w.partitionSpec.isEmpty && !boundedBelow(w.child) =>
        Finding("global-window", w.nodeName,
          "empty PARTITION BY routes every raw row through one task")
    }
    // same boundedness logic for one-partition shuffles: a partial
    // aggregate / partial rank limit below means one row per upstream
    // task crosses, not the dataset
    val singlePartition = plan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
          if e.outputPartitioning == org.apache.spark.sql.catalyst.plans
            .physical.SinglePartition && !boundedBelow(e.child) =>
        Finding("single-partition-exchange", e.nodeName,
          "a shuffle funnels unreduced data into one partition")
    }
    val udfs = plan.collect { case n => n }.flatMap(_.expressions)
      .flatMap(_.collect { case u: ScalaUDF => u })
      .map(u => Finding("scala-udf", u.udfName.getOrElse("ScalaUDF"),
        "opaque UDF blocks codegen, pushdown and pruning"))

    (cartesian ++ globalWindow ++ singlePartition ++ udfs).distinct
  }

  /** The audit as a displayable frame (Shell-friendly). */
  def auditFrame(df: DataFrame): DataFrame = {
    val s = df.sparkSession
    import s.implicits._
    audit(df).map(f => (f.rule, f.operator, f.detail))
      .toDF("rule", "operator", "detail")
  }
}
