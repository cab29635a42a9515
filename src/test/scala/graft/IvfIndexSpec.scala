package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.IvfIndex

/** IVF ANN: deterministic builds and useful recall against the exact
  * brute-force baseline (q_sim_cosine).
  */
class IvfIndexSpec extends AnyFunSuite {
  import SparkTestBase._

  test("cell assignment is deterministic across shuffle partitionings") {
    def run(parts: String): Seq[String] = {
      spark.conf.set("spark.sql.shuffle.partitions", parts)
      try IvfIndex.assignCells(spark, sf0001, k = 8, iters = 2)
        .select("vec_id", "cell")
        .orderBy("vec_id").collect().toSeq.map(_.toString)
      finally spark.conf.set("spark.sql.shuffle.partitions", "8")
    }
    assert(run("4") === run("7"))
  }

  test("recall@10 vs brute force is at least 0.6 with nprobe=4 of k=16") {
    val exact = SparkEntry.queries("q_sim_cosine")(spark, sf0001)
      .collect().map(_.getLong(0)).toSet
    val approx = IvfIndex.search(spark, sf0001, probeVecId = 0L, topK = 10)
      .collect().map(_.getLong(0)).toSet
    assert(approx.size === 10)
    val recall = exact.intersect(approx).size / 10.0
    assert(recall >= 0.6, s"recall $recall, got $approx vs $exact")
  }
}
