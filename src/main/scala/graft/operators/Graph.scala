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

  /** PER-NODE TRIANGLE COUNT over the part co-purchase graph: an
    * undirected edge (u, v) for every pair of parts with co-purchase
    * support ≥ 2 (line pairs sharing an order; the threshold is the
    * df-gate analog — it removes the one-off noise pairs that dominate
    * the raw co-purchase relation), then each node's count of closed
    * triangles.
    * Triangle density is the standard cohesion signal (clustering
    * coefficient numerator, community seeds, link-spam detection).
    *
    * Candidate-bounded shapes, never all-pairs:
    *   1. Edge build: lineitem self-joined ON the order key — the join
    *      is co-partitioned on l_orderkey and its output is bounded by
    *      Σ lines(order)² (≤ 7 lines per order in this schema), NOT by
    *      |parts|²; the `u < v` predicate halves it before the shuffle.
    *   2. Orientation: each undirected edge is stored once, directed
    *      low-DEGREE → high-DEGREE (ties on node id). This is the
    *      classic compact-forward bound: the wedge join below costs
    *      Σ outdeg(v)² and degree-orientation caps outdeg at O(√|E|)
    *      REGARDLESS of skew — a hub of degree d contributes d wedges
    *      as a destination, not d² as a source. Orientation changes
    *      only the join cost, never the triangle set, so the oracle
    *      counts the same triangles from plain `u < v` edges.
    *   3. Wedge close: oriented edges self-joined tail→head, closed by
    *      a third edge lookup — two shuffles on edge keys (the second
    *      an AQE-broadcast at small |E|); every triangle materializes
    *      exactly once, then explodes to its 3 member nodes for the
    *      per-node rollup.
    * Output is one row per node that closes ≥ 1 triangle (zero rows
    * carry no signal and would dominate the sparse regimes). */
  def triangles(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // undirected edge relation, one row per (u < v) pair with support ≥ 2
    val edges = Dedup.tracked(coPurchaseEdges(s, dir))
    val deg = degreesOf(edges)

    // orient low-(deg, id) -> high-(deg, id)
    val du = deg.select($"node".as("u"), $"deg".as("du"))
    val dv = deg.select($"node".as("v"), $"deg".as("dv"))
    val oriented = Dedup.tracked(
      edges.join(du, "u").join(dv, "v")
        .select(
          when($"du" < $"dv" || ($"du" === $"dv" && $"u" < $"v"), $"u")
            .otherwise($"v").as("src"),
          when($"du" < $"dv" || ($"du" === $"dv" && $"u" < $"v"), $"v")
            .otherwise($"u").as("dst")))

    val w1 = oriented.select($"src".as("a"), $"dst".as("b"))
    val w2 = oriented.select($"src".as("b2"), $"dst".as("c"))
    val w3 = oriented.select($"src".as("a3"), $"dst".as("c3"))
    val tris = w1.join(w2, $"b" === $"b2")
      .join(w3, $"a" === $"a3" && $"c" === $"c3")
      .select($"a", $"b", $"c")

    tris
      .select(explode(array($"a", $"b", $"c")).as("part_id"))
      .groupBy($"part_id").agg(count(lit(1)).as("n_triangles"))
      .orderBy($"part_id")
  }

  /** Label bound for [[lpa]]'s packed argmax: labels are node ids and
    * stay below 2^32; votes stay below 2^30 (bounded by degree). */
  val LpaPack = 4294967296L // 2^32

  /** Round count shared by [[lpa]] and its unrolled-CTE oracle — one
    * constant so operator and gate can never unroll different depths
    * (the [[KcoreRounds]] convention). */
  val LpaRounds = 4

  /** The support ≥ 2 co-purchase edge relation (u < v, one row per
    * pair) every graph operator here is defined over — shared so
    * [[triangles]], [[lpa]] and [[kcore]] (and their oracles, which
    * state the same CTE) can never drift onto different graphs. */
  private def coPurchaseEdges(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val li = s.read.parquet(s"$dir/lineitem.parquet")
      .select($"l_orderkey", $"l_partkey")
    li.as("a").join(li.as("b"), $"a.l_orderkey" === $"b.l_orderkey")
      .filter($"a.l_partkey" < $"b.l_partkey")
      .groupBy($"a.l_partkey".as("u"), $"b.l_partkey".as("v"))
      .agg(count(lit(1)).as("w"))
      .filter($"w" >= 2)
      .select($"u", $"v")
  }

  /** Per-node degree over an (u, v) edge relation. */
  private def degreesOf(e: DataFrame): DataFrame = {
    import e.sparkSession.implicits._
    e.select($"u".as("node")).unionAll(e.select($"v".as("node")))
      .groupBy($"node").agg(count(lit(1)).as("deg"))
  }

  /** Undirected (node, nbr) expansion of an (u, v) edge relation —
    * shared by [[lpa]], [[nodeSim]] and [[bfs]] so the three operators
    * traverse the identical adjacency. */
  private def undirectedOf(e: DataFrame): DataFrame = {
    import e.sparkSession.implicits._
    e.select($"u".as("node"), $"v".as("nbr"))
      .unionAll(e.select($"v".as("node"), $"u".as("nbr")))
  }

  /** COMMUNITY DETECTION by synchronous label propagation (LPA), four
    * fixed rounds, over the same support ≥ 2 part co-purchase graph as
    * [[triangles]]: each node starts labeled with its own id and each
    * round adopts the most frequent label among its neighbors (ties →
    * smallest label, the deterministic convention BOTH engines encode
    * identically).
    *
    * The per-node argmax is an ORDER EMBEDDING into one BIGINT instead
    * of a ranking window: packed = c·2^32 + (2^32 − 1 − lbl), so
    * max(packed) IS (max count, then min label) and each round costs two
    * partial-aggregated hash shuffles — (node, lbl) vote counts, then
    * the node argmax — with zero sort. Like [[pagerank]], every step is
    * 64-bit integer arithmetic (count, multiply, add, mod), so a 4-deep
    * iterative query hash-matches the oracle's unrolled CTEs exactly;
    * headroom: c < 2^30, lbl < 2^32 ⇒ packed < 2^62.
    *
    * Scale shape: the undirected edge relation is built once and cached;
    * the label state is strictly node-sized and is the small join side
    * every round (AQE broadcasts it at these scales; at web scale it
    * co-partitions with the edges on nbr). Synchronous min-tie LPA can
    * oscillate on bipartite structure — a FIXED round count (the
    * published convention for the sync variant) keeps the operator
    * deterministic rather than fixpoint-dependent. */
  def lpa(s: SparkSession, dir: String, iters: Int = LpaRounds): DataFrame = {
    import s.implicits._
    val und = Dedup.tracked(undirectedOf(coPurchaseEdges(s, dir)))

    var lbl = und.select($"node").distinct()
      .select($"node", $"node".cast("long").as("lbl"))
    for (_ <- 1 to iters) {
      lbl = und
        .join(lbl.select($"node".as("n2"), $"lbl"), $"nbr" === $"n2")
        .groupBy($"node", $"lbl").agg(count(lit(1)).as("c"))
        .groupBy($"node")
        .agg(expr(s"cast(${LpaPack - 1} - " +
          s"(max(c * $LpaPack + (${LpaPack - 1} - lbl)) % $LpaPack) as bigint)")
          .as("lbl"))
    }
    val sz = lbl.groupBy($"lbl").agg(count(lit(1)).as("community_size"))
    lbl.join(sz, "lbl")
      .select($"node".as("part_id"), $"lbl".as("community"), $"community_size")
      .orderBy($"part_id")
  }

  /** NODE SIMILARITY (neighbor Jaccard) for every edge of the
    * co-purchase graph — the classic link-prediction / recommendation
    * feature: sim(u, v) = |N(u) ∩ N(v)| / |N(u) ∪ N(v)| with open
    * neighborhoods (no self-loops, so common neighbors are exactly the
    * wedges closing over the edge).
    *
    * Candidate-bounded: common neighbors are counted ONLY for existing
    * edges — edge ⋈ und(u, w) ⋈ und(v, w), cost Σ_(u,v)∈E deg(u), never
    * the Σ deg(w)² all-wedge explosion (the same restriction argument as
    * [[triangles]]' orientation, here via the edge probe). Degrees and
    * the union come from integer arithmetic (|∪| = deg(u) + deg(v) −
    * common); zero-common edges survive via the left join, because a 0.0
    * similarity on an existing edge is signal (a bridge), not noise. */
  def nodeSim(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val edges = Dedup.tracked(coPurchaseEdges(s, dir))
    val und = Dedup.tracked(undirectedOf(edges))
    val deg = degreesOf(edges)

    val cn = edges
      .join(und.select($"node".as("u"), $"nbr".as("w")), "u")
      .join(und.select($"node".as("v"), $"nbr".as("w")), Seq("v", "w"))
      .groupBy($"u", $"v").agg(count(lit(1)).as("n_common"))

    edges
      .join(cn, Seq("u", "v"), "left")
      .join(deg.select($"node".as("u"), $"deg".as("du")), "u")
      .join(deg.select($"node".as("v"), $"deg".as("dv")), "v")
      .select($"u", $"v",
        coalesce($"n_common", lit(0L)).as("n_common"),
        round(coalesce($"n_common", lit(0L)).cast("double") /
          ($"du" + $"dv" - coalesce($"n_common", lit(0L))), 4).as("jaccard"))
      .orderBy($"u", $"v")
  }

  /** Hop bound for [[bfs]] — FIXED so the oracle can unroll the same
    * depth; reached-set growth is monotone, so like [[kcore]] a
    * converged round is a no-op and fixed depth ≡ fixpoint-within-K. */
  val BfsRounds = 6

  /** MULTI-SOURCE BFS (shortest hop distance) over the co-purchase
    * graph from the seed set {parts with p_size = 50} — "how many
    * co-purchase hops from any anchor product", the traversal shape
    * (reachability, influence radius, taxonomy distance) the iterative
    * family was missing.
    *
    * Frontier expansion as relations: dist starts as the seeds at 0;
    * each round joins the CURRENT dist against the undirected edges and
    * keeps the min of (old dist, neighbor dist + 1) — a node-sized
    * state relation joined once per round against the cached edges,
    * [[pagerank]]'s exact shape. Integer distances, min() merges —
    * every step has one defined answer, so the K-round result
    * hash-gates against unrolled MATERIALIZED CTEs. Nodes beyond
    * [[BfsRounds]] hops (or unreachable) are absent, the documented
    * contract. Per-round localCheckpoint keeps K joins out of the
    * compiled plan. */
  def bfs(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val und = Dedup.tracked(undirectedOf(coPurchaseEdges(s, dir)))
    val seeds = s.read.parquet(s"$dir/part.parquet")
      .filter($"p_size" === 50)
      .select($"p_partkey".as("node"))
      // seeds outside the support ≥ 2 graph never expand; keep only
      // graph nodes so the output is a sub-relation of the node set
      .join(und.select($"node").distinct(), Seq("node"), "left_semi")

    var dist = seeds.select($"node", lit(0L).as("d"))
    for (_ <- 1 to BfsRounds) {
      val next = und
        .join(dist.select($"node".as("n2"), $"d"), $"nbr" === $"n2")
        .select($"node", ($"d" + 1L).as("d"))
      dist = Dedup.trackCheckpoint(
        dist.unionAll(next)
          .groupBy($"node").agg(min($"d").as("d"))
          .localCheckpoint())
    }
    dist.select($"node".as("part_id"), $"d".as("hops"))
      .orderBy($"part_id")
  }

  /** Peeling rounds for [[kcore]] — FIXED so the oracle can unroll the
    * same depth; the operator throws if the fixpoint needs more (the
    * [[Dedup.components]] fixpoint-or-throw convention: a silently
    * unconverged answer is worse than a loud one). */
  val KcoreRounds = 12

  /** K-CORE DECOMPOSITION (k = 3) of the support ≥ 2 co-purchase graph:
    * iteratively peel nodes of degree < k until the remaining subgraph
    * (the k-core) is stable — the standard graph-curation gate (the
    * k-core is where community/triangle signal lives; the peeled fringe
    * is noise). Output: each surviving node with its within-core degree.
    *
    * Peeling is the textbook cascade: removing a weak node can drop a
    * neighbor below k, so the loop re-derives degrees over SURVIVING
    * edges each round and semi-joins the edge relation on both
    * endpoints against the still-good node set. Each round is one
    * partial-agged degree exchange plus two semi-joins against the
    * node-sized good set (AQE broadcasts it); the surviving edge
    * relation is localCheckpointed per round ([[Dedup.components]]'
    * lineage discipline — 12 rounds of stacked joins would otherwise
    * compound the plan). Rounds are FIXED at [[KcoreRounds]] with a
    * fixpoint-or-throw tail: counting, joining and comparing integers
    * only, so the whole iterative result is hash-gated against the
    * oracle's unrolled CTEs. A converged round is idempotent — extra
    * unrolled rounds are no-ops, which is what lets a fixed-depth
    * oracle gate a fixpoint computation. */
  def kcore(s: SparkSession, dir: String, k: Int = 3): DataFrame = {
    import s.implicits._
    var edges = coPurchaseEdges(s, dir)

    // edges only ever shrink, so an unchanged count IS the fixpoint —
    // the remaining fixed rounds would be no-ops (the same idempotence
    // the fixed-depth oracle relies on), so skipping them cannot change
    // the result, only the wall clock
    var prev = -1L
    var converged = false
    var round = 0
    while (round < KcoreRounds && !converged) {
      val good = degreesOf(edges).filter($"deg" >= k).select($"node")
      edges = Dedup.trackCheckpoint(
        edges
          .join(good.select($"node".as("gu")), $"u" === $"gu", "left_semi")
          .join(good.select($"node".as("gv")), $"v" === $"gv", "left_semi")
          .localCheckpoint())
      val n = edges.count()
      converged = n == prev
      prev = n
      round += 1
    }
    val fin = degreesOf(edges)
    if (!converged) {
      val stragglers = fin.filter($"deg" < k).count()
      require(stragglers == 0L,
        s"k-core peeling did not converge in $KcoreRounds rounds " +
        s"($stragglers nodes still below degree $k) — raise KcoreRounds")
    }
    fin.select($"node".as("part_id"), $"deg".as("core_degree"))
      .orderBy($"part_id")
  }

  /** PERSONALIZED PAGERANK over the same trade graph as [[pagerank]],
    * with the teleport mass concentrated on a SEED SET (the nations of
    * region ASIA) instead of spread uniformly — the recommendation /
    * local-community primitive: "importance as seen from here". PPR is
    * what link-based similar-item retrieval, seed-expanded community
    * mining, and trust propagation all reduce to.
    *
    * Same integer fixed-point discipline as [[pagerank]] (float PPR is
    * order-sensitive per iteration and can never hash-gate): rank
    * scaled by [[Scale]], restart mass (15·Scale) div (100·|S|) paid to
    * seeds only, propagation (85·mass) div 100, per-edge contribution
    * (r·w) div outw. Non-seed nodes receive ONLY propagated mass, so
    * rank mass decays with distance from the seed set — the locality
    * that distinguishes PPR from the global variant.
    *
    * Scale shape: identical to [[pagerank]] — the cached edge relation
    * joins a node-sized rank relation once per round (AQE broadcasts
    * rank), one partial-agged contribution shuffle on dst per round;
    * the seed relation is node-bounded. 5 fixed rounds, oracle-unrolled. */
  def ppr(s: SparkSession, dir: String, iters: Int = 5): DataFrame = {
    import s.implicits._
    def t(n: String) = s.read.parquet(s"$dir/$n.parquet")

    val nodes = t("nation")
      .join(t("region"), $"n_regionkey" === $"r_regionkey")
      .select($"n_nationkey".cast("long").as("node"), $"n_name",
        ($"r_name" === "ASIA").as("seed"))
    val nSeeds = nodes.filter($"seed").count()
    require(nSeeds > 0, "PPR needs a non-empty seed set")

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

    val restart = (15L * Scale) / (100L * nSeeds)
    var rank = nodes.select($"node",
      when($"seed", lit(Scale / nSeeds)).otherwise(lit(0L)).as("r"))
    for (_ <- 1 to iters) {
      val contrib = edgesN
        .join(rank, $"src" === $"node")
        .select($"dst", expr("(r * w) div outw").as("c"))
        .groupBy($"dst").agg(sum($"c").as("in_mass"))
      rank = nodes
        .join(contrib, $"node" === $"dst", "left")
        .select($"node",
          (when($"seed", lit(restart)).otherwise(lit(0L)) +
            expr("(85 * coalesce(in_mass, cast(0 as bigint))) div 100")).as("r"))
    }
    nodes.join(rank, "node")
      .select($"node".as("n_nationkey"), $"n_name",
        $"seed".cast("int").as("is_seed"),
        $"r".as("rank_fp"),
        ($"r".cast("double") / Scale.toDouble).as("rank"))
      .orderBy($"rank_fp".desc, $"n_nationkey")
  }
}
