package graft

import org.scalatest.funsuite.AnyFunSuite

/** SURVEY.md §5.4: every contract query must produce identical output
  * under different shuffle-partition counts — catches missing ORDER BY
  * and partition-order dependence before the driver's hash gate does.
  */
class DeterminismSpec extends AnyFunSuite {
  import SparkTestBase._

  SparkEntry.queries.keys.toSeq.sorted.foreach { name =>
    test(s"$name identical under 4 vs 7 shuffle partitions") {
      val fn = SparkEntry.queries(name)
      def runWith(parts: String): Seq[String] = {
        spark.conf.set("spark.sql.shuffle.partitions", parts)
        try fn(spark, sf0001).collect().toSeq.map(_.toString)
        finally {
          spark.conf.set("spark.sql.shuffle.partitions", "8")
          // drop Materialize-checkpointed intermediates: the sweep
          // invokes every query twice in one shared session and must
          // not accumulate cached blocks across 124 invocations
          Materialize.releaseAll()
        }
      }
      assert(runWith("4") === runWith("7"))
    }
  }
}
