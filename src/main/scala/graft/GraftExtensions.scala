package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.IntegerType

import graft.plans.{CosineSimilarity, HilbertIndex, HyperplaneSignature, InterleaveBits, MinHashSignature, SimHashFingerprint}

/** Library installation point: `SparkSessionExtensions` injector that
  * registers every native graft expression at session build, so a user
  * enables the whole function surface declaratively —
  *
  * {{{
  * spark.sql.extensions=graft.GraftExtensions
  * }}}
  *
  * — and `cosine_sim` / `hyperplane_sig` / `minhash_sig` / `simhash_fp`
  * work from SQL and `expr(...)` in every session of that context, with
  * no imperative `register(spark)` call (those remain for ad-hoc use and
  * are what the contract queries call; both paths build the identical
  * expressions). Functions injected here survive in `newSession()`
  * clones too, which temp-function registration does not guarantee.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name)

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((FunctionIdentifier("cosine_sim"), info("cosine_sim"),
      (exprs: Seq[Expression]) => CosineSimilarity(exprs(0), exprs(1))))
    ext.injectFunction((FunctionIdentifier("hyperplane_sig"),
      info("hyperplane_sig"),
      (exprs: Seq[Expression]) => HyperplaneSignature(exprs.head, exprs(1) match {
        case Literal(v: Int, IntegerType) => v
        case other => throw new IllegalArgumentException(
          s"hyperplane_sig nbits must be an integer literal, got $other")
      })))
    ext.injectFunction((FunctionIdentifier("minhash_sig"), info("minhash_sig"),
      (exprs: Seq[Expression]) => MinHashSignature(exprs.head)))
    ext.injectFunction((FunctionIdentifier("simhash_fp"), info("simhash_fp"),
      (exprs: Seq[Expression]) => SimHashFingerprint(exprs.head)))
    ext.injectFunction((FunctionIdentifier("interleave_bits"),
      info("interleave_bits"),
      (exprs: Seq[Expression]) => InterleaveBits(exprs.tail, exprs.head match {
        case Literal(v: Int, IntegerType) => v
        case other => throw new IllegalArgumentException(
          s"interleave_bits bits must be an integer literal, got $other")
      })))
    ext.injectFunction((FunctionIdentifier("hilbert_index"),
      info("hilbert_index"),
      (exprs: Seq[Expression]) => HilbertIndex(exprs.tail, exprs.head match {
        case Literal(v: Int, IntegerType) => v
        case other => throw new IllegalArgumentException(
          s"hilbert_index bits must be an integer literal, got $other")
      })))
  }
}
