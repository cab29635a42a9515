package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.SimilarityExtras

/** Contract-level recall guard for the IVF ANN query.
  *
  * `q_sim_ann_ivf` is hash-checked against a DuckDB oracle that runs
  * the SAME nprobe=2 cell search — so a regenerated fixture could
  * silently degrade the index's recall while both engines stay
  * hash-consistent with each other. This spec pins what the oracle
  * cannot: the IVF answer against the exact brute-force top-5 over the
  * identical probe/corpus split (probes = vec_ids 8–15, corpus =
  * vec_ids ≥ 16, cells seeded from vec_ids 0–7).
  *
  * Thresholds are measured-with-margin, and deliberately NOT high:
  * the contract query's cells are UNTRAINED deterministic seeds (the
  * price of an RNG-free, oracle-reproducible plan — SURVEY §7.4), so
  * id-recall@5 sits near 2× the nprobe/ncells = 1/4 scan fraction and
  * decays as the corpus outgrows the fixed 8 cells: measured mean
  * 0.575 at sf0.001, 0.325 at sf0.01 (per-probe min hits 0.0 — one
  * probe's true neighbors all sit across unprobed cell borders). The
  * quality-bearing metric for the returned set is the SIM-RATIO —
  * Σ sim(returned top-5) / Σ sim(exact top-5) — measured 0.929 /
  * 0.857 mean, because even a "missed" neighbor is replaced by a
  * nearly-as-close one from a probed cell. The guards:
  *
  *  - mean recall@5 > 0.25: must beat the random-quarter-scan
  *    baseline — collapses to ~0.25 if cell assignment or probe
  *    routing degenerates to noise (measured 0.575 / 0.325).
  *  - mean sim-ratio ≥ 0.80, min ≥ 0.60: catches a broken in-cell
  *    top-k or a fixture whose geometry the seed cells no longer fit
  *    (measured 0.929/0.865 at sf0.001, 0.857/0.693 at sf0.01).
  *
  * The TRAINED path (IvfIndex, Lloyd iterations) is the one expected
  * to hold high id-recall at scale; IvfIndexSpec pins that separately
  * (recall@10 ≥ 0.6).
  */
class AnnRecallSpec extends AnyFunSuite {
  import SparkTestBase._

  /** Per-probe (recall@5, simRatio) against exact brute force. */
  private def quality(dir: String): Seq[(Double, Double)] = {
    val ivf = SparkEntry.queries("q_sim_ann_ivf")(spark, dir)
      .select("probe_id", "vec_id", "sim").collect()
      .groupBy(_.getLong(0))
      .map { case (p, rs) =>
        p -> (rs.map(_.getLong(1)).toSet, rs.map(_.getDouble(2)).sum)
      }
    val emb = graft.sources.Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding").as("e"))
    val probes = emb.filter(col("vec_id").between(8, 15))
      .select(col("vec_id").as("probe_id"), col("e").as("p"))
    val w = Window.partitionBy("probe_id")
      .orderBy(col("sim_raw").desc, col("vec_id"))
    val exact = emb.filter(col("vec_id") >= 16)
      .crossJoin(broadcast(probes))
      .select(col("probe_id"), col("vec_id"),
        expr(SimilarityExtras.cosPair("e", "p")).as("sim_raw"))
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 5)
      .select(col("probe_id"), col("vec_id"), round(col("sim_raw"), 4).as("sim"))
      .collect()
      .groupBy(_.getLong(0))
      .map { case (p, rs) =>
        p -> (rs.map(_.getLong(1)).toSet, rs.map(_.getDouble(2)).sum)
      }
    assert(exact.keySet === ivf.keySet, "IVF lost an entire probe")
    exact.toSeq.sortBy(_._1).map { case (p, (truth, truthSim)) =>
      val (got, gotSim) = ivf(p)
      assert(got.size === 5, s"probe $p returned ${got.size} != 5 rows")
      ((truth & got).size.toDouble / truth.size, gotSim / truthSim)
    }
  }

  for (dir <- Seq(sf0001, sf001)) {
    test(s"q_sim_ann_ivf recall/sim-ratio vs exact at ${dir.split('/').last}") {
      val q = quality(dir)
      assert(q.size === 8, s"expected 8 probes, got ${q.size}")
      val meanRecall = q.map(_._1).sum / q.size
      val ratios = q.map(_._2)
      val meanRatio = ratios.sum / ratios.size
      assert(meanRecall > 0.25,
        s"mean recall@5 $meanRecall not above the 1/4 scan fraction ($q)")
      assert(meanRatio >= 0.80, s"mean sim-ratio $meanRatio < 0.80 ($q)")
      assert(ratios.min >= 0.60, s"min sim-ratio ${ratios.min} < 0.60 ($q)")
    }
  }
}
