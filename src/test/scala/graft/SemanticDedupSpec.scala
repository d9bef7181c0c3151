package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** Pins the learned-cluster semantic dedup (`dedup_semantic_kmeans`),
  * whose k-means training loop is not SQL-expressible:
  *
  *  - keep-set invariant: a kept vector has NO lower-id same-cluster
  *    neighbor at cosine ≥ τ, so no two KEPT vectors in one cluster can
  *    be ≥ τ — checked by recomputing all same-cluster kept pairs
  *    exactly, independently of the operator's join;
  *  - something is actually dropped (the rule isn't vacuously true);
  *  - determinism: two runs return identical keep-sets (md5-seeded
  *    k-means init + rounded means + hash-free assignment). */
class SemanticDedupSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("semantic-dedup-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.001"

  test("kmeans keep-set: no two kept same-cluster vectors at cos >= tau; deterministic") {
    import spark.implicits._
    val kept = Similarity.semanticDedupKmeans(spark, sf).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Int]("cluster")).toMap
    val all = spark.read.parquet(s"$sf/embeddings.parquet")
      .select($"vec_id", $"embedding").as[(Long, Array[Float])].collect().toMap
    assert(kept.nonEmpty && kept.size < all.size,
      s"rule must drop something: kept ${kept.size} of ${all.size}")
    // exact pairwise check over kept same-cluster pairs (fixture-sized)
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var (dot, na, nb) = (0.0, 0.0, 0.0)
      var i = 0
      while (i < a.length) {
        dot += a(i).toDouble * b(i); na += a(i).toDouble * a(i); nb += b(i).toDouble * b(i)
        i += 1
      }
      dot / math.sqrt(na * nb)
    }
    val byCluster = kept.toSeq.groupBy(_._2).values
    for (grp <- byCluster; Seq((ia, _), (ib, _)) <- grp.sortBy(_._1).combinations(2)) {
      val c = math.rint(cos(all(ia), all(ib)) * 10000) / 10000
      assert(c < 0.3, s"kept pair ($ia, $ib) in one cluster at cos $c >= tau")
    }
    val again = Similarity.semanticDedupKmeans(spark, sf).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Int]("cluster")).toMap
    assert(again == kept, "keep-set must be deterministic across runs")
  }

  test("cluster count scales with the corpus via targetClusterSize (k = n / target)") {
    // the sf10 lesson: fixed k makes within-cluster pairs n²/k —
    // quadratic per decade; k ∝ n keeps expected cluster size constant
    // and pair volume linear. Pin the derivation end-to-end: the dial
    // changes the number of distinct clusters the keep-set reports.
    def distinctClusters(target: Int): Int = {
      spark.conf.set("spark.graft.dedup.semantic.targetClusterSize", target.toString)
      try Similarity.semanticDedupKmeans(spark, sf).select("cluster")
        .distinct().count().toInt
      finally spark.conf.unset("spark.graft.dedup.semantic.targetClusterSize")
    }
    // 500 fixture vectors: target 100 → k = 5, target 250 → k = 2
    // (clusters with all members dropped could shrink the observed
    // count, so assert ≤ k and a strict ordering between the dials)
    val fine = distinctClusters(100)
    val coarse = distinctClusters(250)
    assert(fine <= 5 && fine >= 3, s"target 100 on 500 vecs should give ~5 clusters, saw $fine")
    assert(coarse == 2, s"target 250 on 500 vecs should give k=2 clusters, saw $coarse")
    assert(fine > coarse)
  }

  test("keep-set is salt-invariant: every pair meets exactly once at any salt width") {
    // the within-cluster pair join spreads each cluster's quadratic pair
    // space over `spark.graft.dedup.semantic.salt` tasks (sf10 finding:
    // AQE's byte-keyed skew splitter never fires on CPU-quadratic but
    // byte-small clusters); the claim that makes that safe — each (a, b)
    // pair meets exactly once, at salt = b.vec_id % S — is pinned here by
    // running the oracle-gated query at salt widths 1 (unsalted), 3
    // (non-divisor of the fixture size), and the default 16
    def run(salt: Int): Seq[(Long, Int)] = {
      spark.conf.set("spark.graft.dedup.semantic.salt", salt.toString)
      try SparkEntry.queries("dedup_semantic")(spark, sf).collect()
        .map(r => r.getAs[Long]("vec_id") -> r.getAs[Int]("label")).toSeq.sorted
      finally spark.conf.unset("spark.graft.dedup.semantic.salt")
    }
    val unsalted = run(1)
    assert(unsalted.nonEmpty)
    assert(run(3) == unsalted, "salt=3 keep-set diverged from unsalted")
    assert(run(16) == unsalted, "salt=16 keep-set diverged from unsalted")
  }
}
