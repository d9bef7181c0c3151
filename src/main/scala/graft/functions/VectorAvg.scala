package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF (the `Aggregator` surface, complementing the scalar UDFs
  * and native codegen expressions): element-wise mean of an
  * `array<float>` column. The buffer is a primitive (sums, count) pair —
  * merge is associative/commutative so Spark runs it partial+final with
  * map-side combine like any built-in aggregate. Per-dimension means are
  * rounded to 8 decimals in `finish`, the same grain as
  * [[graft.operators.Similarity.labelCentroids]], so partial-merge order
  * cannot leak into results and the UDAF query shares that oracle. */
object VectorAvg extends Aggregator[Array[Float], (Array[Double], Long), Array[Double]] {

  override def zero: (Array[Double], Long) = (Array.empty[Double], 0L)

  override def reduce(b: (Array[Double], Long), v: Array[Float]): (Array[Double], Long) = {
    if (v == null) b
    else {
      val sums = if (b._1.isEmpty) new Array[Double](v.length) else b._1
      // mixed dimensionality is a data error — fail loudly; silently
      // truncating to the first-seen length would produce wrong means
      require(v.length == sums.length,
        s"VectorAvg requires uniform dimensionality, got ${v.length} vs ${sums.length}")
      var i = 0
      while (i < v.length) { sums(i) += v(i); i += 1 }
      (sums, b._2 + 1)
    }
  }

  override def merge(a: (Array[Double], Long), b: (Array[Double], Long)): (Array[Double], Long) = {
    if (a._1.isEmpty) b
    else if (b._1.isEmpty) a
    else {
      require(a._1.length == b._1.length,
        s"VectorAvg requires uniform dimensionality, got ${a._1.length} vs ${b._1.length}")
      var i = 0
      while (i < a._1.length) { a._1(i) += b._1(i); i += 1 }
      (a._1, a._2 + b._2)
    }
  }

  // HALF_UP on the decimal expansion — the SAME rounding mode as Spark's
  // round(x, 8) in the explode-form twin; math.rint would be half-even on
  // a *1e8 fp product and could diverge by 1e-8 at a .5 boundary
  override def finish(r: (Array[Double], Long)): Array[Double] =
    if (r._2 == 0) Array.empty[Double]
    else r._1.map(s => BigDecimal(s / r._2)
      .setScale(8, BigDecimal.RoundingMode.HALF_UP).toDouble)

  override def bufferEncoder: Encoder[(Array[Double], Long)] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Array[Double], Long)]()
  override def outputEncoder: Encoder[Array[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Double]]()
}
