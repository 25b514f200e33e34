package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed aggregator: element-wise mean of float vectors (double
  * accumulation, map-side combine). The centroid-update step of k-means —
  * shuffles one (sum, count) pair per group, not the member vectors. */
object VectorAvg
    extends Aggregator[Array[Float], (Array[Double], Long), Array[Float]] {

  override def zero: (Array[Double], Long) = (Array.empty[Double], 0L)

  override def reduce(b: (Array[Double], Long), v: Array[Float])
      : (Array[Double], Long) = {
    val acc = if (b._1.isEmpty) new Array[Double](v.length) else b._1
    var i = 0
    while (i < v.length && i < acc.length) { acc(i) += v(i); i += 1 }
    (acc, b._2 + 1)
  }

  override def merge(a: (Array[Double], Long), b: (Array[Double], Long))
      : (Array[Double], Long) = {
    if (a._1.isEmpty) b
    else if (b._1.isEmpty) a
    else {
      var i = 0
      while (i < a._1.length) { a._1(i) += b._1(i); i += 1 }
      (a._1, a._2 + b._2)
    }
  }

  override def finish(r: (Array[Double], Long)): Array[Float] =
    if (r._2 == 0) Array.empty[Float]
    else r._1.map(x => (x / r._2).toFloat)

  import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder

  override def bufferEncoder: Encoder[(Array[Double], Long)] =
    ExpressionEncoder[(Array[Double], Long)]()
  override def outputEncoder: Encoder[Array[Float]] =
    ExpressionEncoder[Array[Float]]()
}
