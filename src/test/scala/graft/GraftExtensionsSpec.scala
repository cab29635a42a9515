package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The library must be installable the way a Spark user installs any
  * extension library: `spark.sql.extensions=graft.GraftExtensions` at
  * session build, after which every native function resolves from SQL
  * with no imperative register() call — and resolves to the SAME
  * expressions the contract queries build (spot-checked by value).
  */
class GraftExtensionsSpec extends AnyFunSuite {

  test("a session built with the GraftExtensions injector resolves all graft functions") {
    // materialize the shared context first so we attach to it, then
    // build a SEPARATE SparkSession carrying the extensions
    val base = SparkTestBase.spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    // getOrCreate reuses the suite SparkContext, whose static conf a
    // builder cannot amend — so install through the public
    // withExtensions builder hook, the same injector instance the
    // spark.sql.extensions conf string loads by class name in a real
    // spark-submit
    try {
      val s2 = SparkSession.builder()
        .withExtensions(new GraftExtensions())
        .getOrCreate()
      assert(s2 ne base) // a genuinely new session, not the shared one
      val row = s2.sql(
        """SELECT
          |  round(cosine_sim(array(1.0d, 2.0d), array(2.0d, 4.0d)), 4) AS cos,
          |  hyperplane_sig(array(1.0d, 1.0d, 1.0d, 1.0d), 8) AS hp,
          |  minhash_sig(array('a b c', 'b c d')) AS mh,
          |  simhash_fp(array(md5(cast('x' as binary)))) AS sh,
          |  interleave_bits(2, 3, 1) AS zv,
          |  hilbert_index(1, 1, 1) AS hv""".stripMargin)
        .head()
      assert(row.getDouble(0) === 1.0)
      assert(row.getString(1).length === 8 &&
        row.getString(1).forall(c => c == '0' || c == '1'))
      assert(row.getSeq[String](2).length === 8)
      assert(row.getString(3).length === 32)
      // dims=2, bits=2: 3=0b11 and 1=0b01 interleave (dim 0 MSB-first)
      // to 0b1011 = 11
      assert(row.getLong(4) === 11L)
      // 2-D 1-bit Hilbert: cell (1,1) is position 2 on the 4-cell curve
      assert(row.getLong(5) === 2L)

      // the injected functions survive newSession() clones, which
      // temp-function registration does not guarantee
      val s3 = s2.newSession()
      assert(s3.sql("SELECT cosine_sim(array(1.0d), array(1.0d))")
        .head().getDouble(0) === 1.0)

      // identical expression as the imperative register() path
      graft.plans.CosineSimilarity.register(base)
      val viaRegister = base
        .sql("SELECT cosine_sim(array(3.0d, 4.0d), array(4.0d, 3.0d))")
        .head().getDouble(0)
      val viaExtension = s2
        .sql("SELECT cosine_sim(array(3.0d, 4.0d), array(4.0d, 3.0d))")
        .head().getDouble(0)
      assert(viaRegister === viaExtension)
    } finally {
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
      // do NOT stop s2 — it shares the suite-wide SparkContext
    }
  }
}
