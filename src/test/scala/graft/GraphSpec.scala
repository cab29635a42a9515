package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Graph

/** General connected components: exact agreement with a union-find
  * reference on structured and pseudo-random graphs, logarithmic
  * round counts on a long path, and input normalization (duplicates,
  * self-loops, both orientations).
  */
class GraphSpec extends AnyFunSuite {
  import SparkTestBase._

  private def unionFind(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    parent.keys.map(k => k -> find(k)).toMap
  }

  private def viaSpark(edges: Seq[(Long, Long)]): (Map[Long, Long], Int) = {
    import spark.implicits._
    val (labels, rounds) = Graph.connectedComponentsWithRounds(
      edges.toDF("src", "dst"))
    val got = labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    Materialize.releaseAll()
    (got, rounds)
  }

  test("structured graph: chains, a clique, a ring, bridges") {
    val edges: Seq[(Long, Long)] =
      // chain 1..6
      (1L to 5L).map(i => (i, i + 1)) ++
      // clique on 10..13
      (for (a <- 10L to 13L; b <- (a + 1) to 13L) yield (a, b)) ++
      // ring 20..24
      ((20L to 23L).map(i => (i, i + 1)) :+ ((24L, 20L))) ++
      // a bridge joining the chain to the ring
      Seq((6L, 20L)) ++
      // two-node island + duplicate + reversed + self-loop noise
      Seq((30L, 31L), (31L, 30L), (30L, 31L), (7L, 7L))
    val (got, _) = viaSpark(edges)
    val expected = unionFind(edges.filter(e => e._1 != e._2))
    assert(got === expected)
    // the bridge merged chain and ring into one component rooted at 1
    assert(got(24L) === 1L && got(6L) === 1L)
    assert(got(13L) === 10L && got(31L) === 30L)
  }

  test("pseudo-random graph matches union-find exactly") {
    // deterministic LCG edge stream over 3000 nodes, sparse enough to
    // leave many components
    var x = 88172645463325252L
    def nxt(): Long = { x ^= x << 13; x ^= x >>> 7; x ^= x << 17; x }
    val edges = Seq.fill(2500) {
      (math.floorMod(nxt(), 3000L), math.floorMod(nxt(), 3000L))
    }.filter(e => e._1 != e._2)
    val (got, _) = viaSpark(edges)
    assert(got === unionFind(edges))
    // sanity: non-trivial component structure
    assert(got.values.toSet.size > 100)
  }

  test("a 400-node path converges in logarithmic rounds") {
    val edges = (0L until 400L).map(i => (i, i + 1))
    val (got, rounds) = viaSpark(edges)
    assert(got === (0L to 400L).map(i => i -> 0L).toMap)
    assert(rounds <= 12,
      s"star contraction needed $rounds rounds on a path of 400 — " +
        "that is propagation behavior, not contraction")
  }
}
