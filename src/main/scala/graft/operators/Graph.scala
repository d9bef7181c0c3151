package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Iterative graph analytics over relations — the family
  * [[Dedup.components]] opened (hash-min label propagation) continued
  * with a weighted-PageRank operator. Both follow the same distributed
  * shape: a cached edge relation joined against a node-sized state
  * relation once per round, state strictly node-sized, round count
  * fixed or fixpoint-guarded.
  */
object Graph {

  /** Fixed-point scale for rank values: 1.0 ≡ 10^12. */
  val Scale = 1000000000000L

  /** WEIGHTED PAGERANK, five fixed iterations, over the trade graph the
    * TPC-H-ish tables induce: an edge customer-nation → supplier-nation
    * for every lineitem (weight = line count), i.e. "which nations sit
    * at the center of the supply network".
    *
    * The numerics are ENTIRELY 64-bit integer fixed-point (rank scaled
    * by [[Scale]], damping 0.85 as ×85 div 100, per-edge contribution
    * (r·w) div outw): float PageRank is NOT portable — Σ over incoming
    * edges is order-sensitive in IEEE arithmetic and every engine sums
    * in its own order, so a double pipeline hash-diverges at the ulp
    * and the divergence compounds per iteration. Integer div/mod have
    * one defined answer everywhere, which is what lets a 5-deep
    * iterative query be oracle-gated hash-exact at all. (Overflow
    * headroom: rank < 2^40, edge weight < 2^23 at sf10 — products stay
    * under 2^63 by 20 bits.)
    *
    * Scale shape: the edge relation (with its precomputed out-weight)
    * is built once, cached, and joined per round against the node-sized
    * rank relation — rank is always the small side (nodes ≪ edges; AQE
    * broadcasts it), each round is one partial-aggregated shuffle of
    * contributions on dst, and nothing driver-side ever sees an edge.
    * Dangling nodes (no outgoing edges) keep receiving the teleport
    * base; their un-emitted mass is dropped, the documented variant
    * both engines share. At web scale the per-round plan would
    * localCheckpoint like [[Dedup.components]] to stop lineage growth;
    * at 5 fixed rounds the plan stays compiled-size-bounded without it. */
  def pagerank(s: SparkSession, dir: String, iters: Int = 5): DataFrame = {
    import s.implicits._
    def t(n: String) = s.read.parquet(s"$dir/$n.parquet")

    val nodes = t("nation")
      .select($"n_nationkey".cast("long").as("node"), $"n_name")
    val nNodes = nodes.count()

    val edges = Dedup.tracked(
      t("lineitem").select($"l_orderkey", $"l_suppkey")
        .join(t("orders").select($"o_orderkey", $"o_custkey"),
          $"l_orderkey" === $"o_orderkey")
        .join(t("customer").select($"c_custkey", $"c_nationkey"),
          $"o_custkey" === $"c_custkey")
        .join(t("supplier").select($"s_suppkey", $"s_nationkey"),
          $"l_suppkey" === $"s_suppkey")
        .groupBy($"c_nationkey".cast("long").as("src"),
                 $"s_nationkey".cast("long").as("dst"))
        .agg(count(lit(1)).as("w")))
    val outw = edges.groupBy($"src").agg(sum($"w").as("outw"))
    val edgesN = Dedup.tracked(edges.join(outw, "src"))

    val base = (15L * Scale) / (100L * nNodes)
    var rank = nodes.select($"node", lit(Scale / nNodes).as("r"))
    for (_ <- 1 to iters) {
      val contrib = edgesN
        .join(rank, $"src" === $"node")
        .select($"dst", expr("(r * w) div outw").as("c"))
        .groupBy($"dst").agg(sum($"c").as("in_mass"))
      rank = nodes
        .join(contrib, $"node" === $"dst", "left")
        .select($"node",
          (lit(base) + expr("(85 * coalesce(in_mass, cast(0 as bigint))) div 100")).as("r"))
    }
    nodes.join(rank, "node")
      .select($"node".as("n_nationkey"), $"n_name",
        $"r".as("rank_fp"),
        ($"r".cast("double") / Scale.toDouble).as("rank"))
      .orderBy($"rank_fp".desc, $"n_nationkey")
  }
}
