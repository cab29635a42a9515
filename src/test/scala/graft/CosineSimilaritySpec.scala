package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.CosineSimilarity
import graft.sources.Tables

/** The native codegen'd expression must agree bit-for-bit with the
  * higher-order-function formulation (same accumulation order), stay
  * inside whole-stage codegen, and survive interpreted (non-codegen)
  * evaluation too.
  */
class CosineSimilaritySpec extends AnyFunSuite {
  import SparkTestBase._

  private lazy val pairs = {
    CosineSimilarity.register(spark)
    val emb = Tables.embeddings(spark, sf0001)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("e"))
    val probe = emb.filter(col("vec_id") === 0).select(col("e").as("p"))
    emb.crossJoin(broadcast(probe))
  }

  test("native expression equals HOF formulation on every row") {
    val hof =
      """aggregate(zip_with(e, p, (x, y) -> x * y), cast(0.0 as double), (acc, x) -> acc + x) /
        |(sqrt(aggregate(e, cast(0.0 as double), (acc, x) -> acc + x * x)) *
        | sqrt(aggregate(p, cast(0.0 as double), (acc, x) -> acc + x * x)))""".stripMargin
    val diff = pairs
      .select(expr("cosine_sim(e, p)").as("native"), expr(hof).as("hof"))
      .filter(col("native") =!= col("hof"))
      .count()
    assert(diff === 0)
  }

  test("expression participates in whole-stage codegen") {
    // AQE wraps the plan until execution; disable it so the final
    // physical plan (with codegen spans) is visible directly.
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val plan = pairs.select(expr("cosine_sim(e, p)").as("sim"))
        .queryExecution.executedPlan
      val codegenSpans = plan.collect {
        case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
      }
      assert(codegenSpans.nonEmpty, s"no codegen span in:\n$plan")
      val projectInsideCodegen = codegenSpans.exists(_.collect {
        case p: org.apache.spark.sql.execution.ProjectExec =>
          p.projectList.exists(_.exists(_.isInstanceOf[CosineSimilarity]))
      }.exists(identity))
      assert(projectInsideCodegen,
        s"cosine_sim not inside a codegen'd Project:\n$plan")
      // and the generated code actually compiles + runs:
      assert(pairs.select(expr("cosine_sim(e, p)")).count() === 500)
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("interpreted eval path (codegen off) gives identical results") {
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      val top = pairs.filter(col("vec_id") =!= 0)
        .select(col("vec_id"), round(expr("cosine_sim(e, p)"), 4).as("sim"))
        .orderBy(col("sim").desc, col("vec_id")).limit(3)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(top.nonEmpty)
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
      val topCodegen = pairs.filter(col("vec_id") =!= 0)
        .select(col("vec_id"), round(expr("cosine_sim(e, p)"), 4).as("sim"))
        .orderBy(col("sim").desc, col("vec_id")).limit(3)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(top === topCodegen)
    } finally {
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      spark.conf.unset("spark.sql.codegen.factoryMode")
    }
  }
}
