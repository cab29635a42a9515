package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF (SURVEY.md §2.11): per-key fold of embedding vectors into
  * their mean — the Spark-native form of a reference juice executable
  * folding a key's value list.
  *
  * The buffer is a mutable sum-vector + count, merged associatively
  * across partitions (the MR combiner); `finish` divides once. Wire via
  * `ds.groupByKey(...).agg(new VectorMean(dim).toColumn)`.
  */
final case class VecBuf(sums: Array[Double], var n: Long)

class VectorMean(dim: Int)
    extends Aggregator[Array[Float], VecBuf, Array[Double]] {

  override def zero: VecBuf = VecBuf(new Array[Double](dim), 0L)

  override def reduce(b: VecBuf, a: Array[Float]): VecBuf = {
    var i = 0
    val n = math.min(dim, a.length)
    while (i < n) { b.sums(i) += a(i); i += 1 }
    b.n += 1
    b
  }

  override def merge(x: VecBuf, y: VecBuf): VecBuf = {
    var i = 0
    while (i < dim) { x.sums(i) += y.sums(i); i += 1 }
    x.n += y.n
    x
  }

  override def finish(r: VecBuf): Array[Double] = r.sums.map(_ / r.n)

  override def bufferEncoder: Encoder[VecBuf] = Encoders.product[VecBuf]
  override def outputEncoder: Encoder[Array[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Double]]()
}
