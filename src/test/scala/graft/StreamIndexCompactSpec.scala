package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession

/** Streamed-lifecycle index compaction (`stream_text_index_compact`):
  * folding N per-micro-batch posting dirs + a takedown through the
  * union compaction must answer byte-identically to the BATCH takedown
  * lifecycle (`text_search_compact`) — stream-accrued ≡ batch-built ≡
  * fresh survivor index. Micro-batch boundaries and the accrual order
  * must be invisible to the compacted relation. */
class StreamIndexCompactSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("stream-index-compact-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.001"

  test("stream-accrued + compacted == batch takedown lifecycle == deterministic") {
    val streamed = graft.queries.StreamQueries
      .streamTextIndexCompact(spark, sf).collect().map(_.toString).sorted
    val batch = graft.operators.TextAnalysis
      .searchCompact(spark, sf).collect().map(_.toString).sorted
    assert(streamed.nonEmpty, "phrase probe returned nothing — spec vacuous")
    assert(streamed.sameElements(batch),
      "streamed-lifecycle compaction diverges from the batch takedown")
    // no retired doc (doc_id ≡ 5 mod 17) may survive the compaction
    import spark.implicits._
    val ids = graft.queries.StreamQueries.streamTextIndexCompact(spark, sf)
      .select("doc_id").as[Long].collect()
    assert(ids.forall(_ % 17 != 5), "a retired doc surfaced post-compaction")
  }
}
