package graft.functions

import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, Encoders}
import scala.collection.mutable

/** Bounded-memory heavy-hitter state: at most `m` (word, lower-bound
  * count) counters plus the accumulated decrement mass `err`. Mutable on
  * purpose — Spark's `ScalaAggregator` keeps the buffer as a live JVM
  * object between update rows and only serializes at the partial/final
  * exchange (Kryo, a few hundred KB at m=4096), so per-row updates are
  * hashmap increments, not buffer round-trips. */
final class MGState(var counters: mutable.HashMap[String, Long], var err: Long)
    extends Serializable

/** MISRA-GRIES frequent-items summary as a typed UDAF over per-document
  * token arrays, with the Agarwal et al. (PODS'12, "Mergeable
  * Summaries") merge rule — the form whose ε = 1/m error bound SURVIVES
  * arbitrary partial merges, which is what makes it a Spark aggregate
  * rather than a single-stream trick.
  *
  * Invariant carried by every state (update and merge preserve it):
  * for EVERY word w, true count ≤ stored(w) + err, with stored(w) = 0
  * when w is absent. Trim rule: when counters exceed m, subtract the
  * (m+1)-th largest count v from all, drop the non-positive, err += v.
  * So the summary is a GUARANTEED SUPERSET of every word with true
  * count > err — the certificate [[graft.operators.TextAnalysis]]'
  * exact heavy-hitters operator checks after its recount pass.
  *
  * Scale: state is O(m) regardless of corpus size; partials combine
  * map-side like any built-in aggregate, and the merge is associative
  * and commutative (err sums; counters sum then trim), so partition
  * count and merge order cannot change the invariant.
  */
final class MisraGries(m: Int)
    extends Aggregator[Array[String], MGState, MGSummary] {
  require(m > 0, s"MisraGries needs a positive counter budget, got $m")

  override def zero: MGState = new MGState(mutable.HashMap.empty, 0L)

  /** Subtract the (m+1)-th largest count from every counter and drop the
    * non-positive — the single place the summary loses information, and
    * the only place `err` grows. No-op while ≤ m counters live. */
  private def trim(s: MGState): MGState = {
    if (s.counters.size > m) {
      val counts = s.counters.values.toArray
      java.util.Arrays.sort(counts)
      val v = counts(counts.length - (m + 1)) // (m+1)-th largest
      s.counters.filterInPlace((_, c) => c > v)
      s.counters.mapValuesInPlace((_, c) => c - v)
      s.err += v
    }
    s
  }

  override def reduce(s: MGState, tokens: Array[String]): MGState = {
    if (tokens != null) {
      var i = 0
      while (i < tokens.length) {
        s.counters.updateWith(tokens(i)) {
          case Some(c) => Some(c + 1L)
          case None => Some(1L)
        }
        i += 1
      }
    }
    trim(s)
  }

  override def merge(a: MGState, b: MGState): MGState = {
    val (into, from) = if (a.counters.size >= b.counters.size) (a, b) else (b, a)
    from.counters.foreach { case (w, c) =>
      into.counters.updateWith(w) {
        case Some(c0) => Some(c0 + c)
        case None => Some(c)
      }
    }
    into.err += from.err
    trim(into)
  }

  override def finish(s: MGState): MGSummary = {
    val arr = s.counters.toArray.sortBy { case (w, c) => (-c, w) }
    MGSummary(arr.map(_._1), arr.map(_._2), s.err)
  }

  override def bufferEncoder: Encoder[MGState] = Encoders.kryo[MGState]
  override def outputEncoder: Encoder[MGSummary] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[MGSummary]()
}

/** Final summary row: candidate words with their lower-bound counts
  * (descending, then lexicographic) and the total decrement mass. Any
  * word NOT listed has true count ≤ err. */
final case class MGSummary(words: Array[String], counts: Array[Long], err: Long)
