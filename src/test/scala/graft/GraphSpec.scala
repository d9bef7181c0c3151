package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import graft.operators.{Graph, TextAnalysis}

/** PageRank and inverted-index invariants the hash oracle can't express
  * as properties: mass conservation bounds, rank positivity, posting-cap
  * honoring — the checks that localize a bug when the hash gate merely
  * says "different". */
class GraphSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("graph-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.001"

  test("pagerank: every node ranked, ranks positive, total mass ≤ 1") {
    val rows = Graph.pagerank(spark, sf).collect()
    assert(rows.length == 25) // all nations, including dangling ones
    val ranks = rows.map(_.getAs[Long]("rank_fp"))
    assert(ranks.forall(_ > 0)) // teleport base keeps every node alive
    // fixed-point mass: Σr ≤ Scale (dangling + integer-floor loss only
    // ever REMOVES mass; exceeding Scale would mean double-counting)
    assert(ranks.sum <= Graph.Scale)
    // and the loss is bounded: ≥ 60% of the mass must survive 5 rounds
    assert(ranks.sum > (Graph.Scale * 6) / 10,
      s"implausible mass loss: ${ranks.sum}")
    // output is rank-sorted
    val sorted = rows.map(_.getAs[Long]("rank_fp")).toSeq
    assert(sorted == sorted.sortBy(-_))
  }

  test("pagerank: deterministic across re-runs (integer fixed-point)") {
    val a = Graph.pagerank(spark, sf).collect().toSeq
    val b = Graph.pagerank(spark, sf).collect().toSeq
    assert(a == b)
  }

  test("inverted index: df/tf consistent, postings capped, sorted, within df") {
    val rows = TextAnalysis.invertedIndex(spark, sf, cap = 20).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val df = r.getAs[Long]("df")
      val tf = r.getAs[Long]("tf_total")
      val postings = r.getAs[String]("postings").split(",").map(_.toLong).toSeq
      assert(tf >= df) // every posting contributes ≥ 1 occurrence
      assert(postings.length == math.min(df, 20L).toInt)
      assert(postings == postings.sorted)
    }
  }
}
