package graft.functions

import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.util.QuantileSummaries

/** Mergeable QUANTILE sketch partials — the member that completes the
  * sketch family (HLL cardinality partials for q33, CMS frequency
  * partials for q34, Misra-Gries heavy hitters): per-shard
  * Greenwald-Khanna summaries that persist beside the data and UNION
  * later without rescanning. Spark ships `percentile_approx` (one-shot
  * GK) but, exactly as with CMS, no union aggregate over already-built
  * summaries — these two UDAFs close that gap using the engine's own
  * `QuantileSummaries` (the class behind percentile_approx), so the
  * partial-union estimates carry the same ε·n rank guarantee as a
  * single-pass summary at the same relative error.
  *
  * Serialization is plain JDK (the class is `Serializable`); a summary
  * at ε = 0.01 is a few KB — shard-count-sized groups, never
  * corpus-sized rows. */
object QuantileSketch {
  /** Relative rank error ε: estimated rank within ±ε·n of the target.
    * Fixed here (not a dial) so partials built in different runs are
    * always merge-compatible — the same reason q33/q34 fix their
    * sketch geometry. */
  val Epsilon = 0.01

  def ser(q: QuantileSummaries): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val oos = new java.io.ObjectOutputStream(bos)
    oos.writeObject(q.compress())
    oos.close()
    bos.toByteArray
  }

  def deser(b: Array[Byte]): QuantileSummaries = {
    val ois = new java.io.ObjectInputStream(new java.io.ByteArrayInputStream(b))
    try ois.readObject().asInstanceOf[QuantileSummaries] finally ois.close()
  }

  private[functions] def empty: QuantileSummaries =
    new QuantileSummaries(QuantileSummaries.defaultCompressThreshold, Epsilon)
}

/** Build one GK summary per group from raw double values (binary out —
  * the persistable partial). */
object QuantileBuild extends Aggregator[Double, QuantileSummaries, Array[Byte]] {
  override def zero: QuantileSummaries = QuantileSketch.empty
  override def reduce(b: QuantileSummaries, v: Double): QuantileSummaries =
    b.insert(v)
  override def merge(a: QuantileSummaries, b: QuantileSummaries): QuantileSummaries =
    a.compress().merge(b.compress())
  override def finish(r: QuantileSummaries): Array[Byte] = QuantileSketch.ser(r)
  override def bufferEncoder: Encoder[QuantileSummaries] =
    Encoders.kryo[QuantileSummaries]
  override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
}

/** Union already-built GK summaries (binary in / binary out) — the day-2
  * path: yesterday's per-shard partials merge without touching rows. */
object QuantileUnion extends Aggregator[Array[Byte], Array[Byte], Array[Byte]] {
  override def zero: Array[Byte] = Array.emptyByteArray
  override def reduce(buf: Array[Byte], in: Array[Byte]): Array[Byte] =
    merge(buf, in)
  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] =
    if (a.isEmpty) b
    else if (b.isEmpty) a
    else QuantileSketch.ser(
      QuantileSketch.deser(a).compress().merge(QuantileSketch.deser(b).compress()))
  override def finish(r: Array[Byte]): Array[Byte] = r
  override def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
}
