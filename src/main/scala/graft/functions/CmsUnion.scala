package graft.functions

import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.util.sketch.CountMinSketch

/** Typed UDAF merging serialized Count-Min sketches (binary in / binary
  * out). Spark ships the `count_min_sketch` aggregate but no union
  * aggregate over already-built sketches — this closes the gap so
  * per-shard partials can persist beside the data and merge later
  * without rescanning (same motivation as `hll_union_agg` for q33).
  *
  * CMS merge is LOSSLESS: counters sum elementwise, so the union of
  * per-source partials is identical to a single corpus-wide pass when
  * every partial used the same eps/confidence/seed (mergeInPlace throws
  * on incompatible dimensions — misconfigured partials fail loudly
  * instead of merging garbage). Sketches are a few hundred KB at most;
  * groups are shard-count-sized, never corpus-sized.
  */
object CmsUnion extends Aggregator[Array[Byte], Array[Byte], Array[Byte]] {
  private def read(b: Array[Byte]): CountMinSketch =
    CountMinSketch.readFrom(new java.io.ByteArrayInputStream(b))

  private def write(s: CountMinSketch): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    s.writeTo(out)
    out.toByteArray
  }

  override def zero: Array[Byte] = Array.emptyByteArray

  override def reduce(buf: Array[Byte], in: Array[Byte]): Array[Byte] =
    merge(buf, in)

  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] =
    if (a.isEmpty) b
    else if (b.isEmpty) a
    else {
      val s = read(a)
      s.mergeInPlace(read(b))
      write(s)
    }

  override def finish(r: Array[Byte]): Array[Byte] = r
  override def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
}
