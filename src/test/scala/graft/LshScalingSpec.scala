package graft

import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.SimilarityExtras

/** The LSH signature must WIDEN as the corpus grows, and the extra bits
  * must be genuinely new hyperplanes that split buckets — a fixed-width
  * (or duplicate-plane) signature lets the within-bucket pair product
  * grow quadratically with n, the 100 TB scale-killer VERDICT r1/r2
  * flagged.
  *
  * The stress corpus is sf0.1 embeddings replicated 10× (20k vectors)
  * with a deterministic per-replica sign-flip perturbation, so replicas
  * are distinct directions rather than exact copies (exact copies share
  * every bucket at ANY width — that is correct near-dup behavior, not
  * skew).
  */
class LshScalingSpec extends AnyFunSuite with BeforeAndAfterAll {
  import SparkTestBase._

  // shared-SparkSession suite: the 20k×64-double stress corpus must not
  // outlive this suite (same release discipline as Materialize)
  override def afterAll(): Unit = {
    replicated10x.unpersist(blocking = true)
    super.afterAll()
  }

  private val sf01dir = "/root/testdata/sf0.1"

  private lazy val replicated10x = {
    val base = spark.read.parquet(s"$sf01dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("e0"))
    base.crossJoin(spark.range(10).toDF("r"))
      .select(
        (col("vec_id") + col("r") * lit(1000000L)).as("vec_id"),
        expr("""transform(sequence(0, 63), i ->
                 CASE WHEN r > 0 AND ((i*13 + r*29) % 11) < 5
                 THEN -element_at(e0, i + 1) ELSE element_at(e0, i + 1) END)""")
          .as("e"))
      // spread BEFORE the heavy signature HOF: the crossJoin output
      // inherits the handful of parquet input splits, which would run
      // the per-row signature nearly serially (same trap as the
      // MinHash path — CLAUDE.md parity rules)
      .repartition(spark.sparkContext.defaultParallelism, col("vec_id"))
      .persist()
  }

  private def maxBucket(nbits: Int): Long =
    replicated10x
      .withColumn("bucket", expr(SimilarityExtras.bucketSql(nbits)))
      .groupBy("bucket").count()
      .agg(max("count")).head().getLong(0)

  test("signature width grows with corpus size (integer ladder)") {
    assert(SimilarityExtras.signatureBits(500L) === 8)     // sf0.01
    assert(SimilarityExtras.signatureBits(2000L) === 8)    // sf0.1
    assert(SimilarityExtras.signatureBits(20000L) === 12)  // 10× sf0.1
    assert(SimilarityExtras.signatureBits(1L << 20) === 16)
    assert(SimilarityExtras.signatureBits(1L << 40) === 24)
    // monotone over the whole ladder
    val pts = Seq(1L, 4096L, 4097L, 16384L, 65537L, 262145L, 1048577L,
      4194305L, 16777217L, 67108865L, Long.MaxValue)
    assert(pts.map(SimilarityExtras.signatureBits) ===
      pts.map(SimilarityExtras.signatureBits).sorted)
  }

  test("widened signature splits buckets on 10x replicated sf0.1") {
    val n = replicated10x.count()
    assert(n === 20000L)
    val nbits = SimilarityExtras.signatureBits(n)
    assert(nbits > SimilarityExtras.signatureBits(2000L))
    val fixed = maxBucket(8)      // the pre-scaling fixed width
    val scaled = maxBucket(nbits)
    // the extra planes must actually split (duplicate planes would
    // leave maxBucket unchanged — the bug the piecewise family fixes)
    assert(scaled < fixed,
      s"widening 8→$nbits bits did not split buckets ($fixed → $scaled)")
    // and the hot bucket stays bounded (measured 350 on this corpus;
    // 512 leaves slack for data regeneration without masking a
    // quadratic blowup — the unscaled width gives 727+)
    assert(scaled <= 512L, s"max bucket $scaled exceeds bound")
  }

  private def maxBandBucket(bb: Int): Long =
    replicated10x
      .withColumn("sig", expr(SimilarityExtras.bucketSql(4 * bb)))
      .select(explode(sequence(lit(0), lit(3))).as("band_id"), col("sig"))
      .select(col("band_id"),
        expr(s"substring(sig, band_id * $bb + 1, $bb)").as("bk"))
      .groupBy("band_id", "bk").count()
      .agg(max("count")).head().getLong(0)

  test("band width scales with corpus and splits band buckets") {
    // contract SFs stay at 6 bits (frozen output)...
    assert(SimilarityExtras.bandBits(500L) === 6)
    assert(SimilarityExtras.bandBits(2000L) === 6)
    // ...and the stress corpus widens — a FIXED band width would let
    // band-bucket size (and the within-bucket pair product) grow
    // linearly with n
    val bb = SimilarityExtras.bandBits(replicated10x.count())
    assert(bb === 10) // 20k rows: two ladder steps above the contract SFs
    val fixed = maxBandBucket(6)
    val scaled = maxBandBucket(bb)
    assert(scaled < fixed,
      s"widening bands 6→$bb bits did not split band buckets ($fixed → $scaled)")
  }

  test("no hyperplane equals ± any other across the full 24-plane family") {
    // v and -v define the SAME hyperplane (the sign bit just flips), so
    // a negated duplicate adds zero bucket discrimination — the r3
    // advisor found 6 such pairs in the old mod-7 extension family.
    // Assert pairwise sign-distinctness over the whole ladder width;
    // the one legacy exception is j=7 ≡ j=0 (the j<8 family is frozen
    // by the 8-bit contract output and documented as such).
    val planes = (0 until 24).map(j =>
      (0 until 64).map(i => SimilarityExtras.planeCoef(i, j)).toVector)
    for (a <- 0 until 24; b <- (a + 1) until 24) {
      val equal = planes(a) == planes(b)
      val negated = planes(a) == planes(b).map(-_)
      if ((a, b) == (0, 7)) assert(equal, "legacy j0≡j7 duplicate vanished")
      else assert(!equal && !negated,
        s"plane $b duplicates ${if (negated) "-" else ""}plane $a")
    }
  }

  test("contract queries still choose 8 bits at contract SFs") {
    // guards the oracle-parity invariant: at sf0.01/sf0.1 the dynamic
    // width must reproduce the historical 8-bit signature exactly
    for (sf <- Seq("/root/testdata/sf0.01", sf01dir)) {
      val n = spark.read.parquet(s"$sf/embeddings.parquet").count()
      assert(SimilarityExtras.signatureBits(n) === 8, s"at $sf")
    }
  }
}
