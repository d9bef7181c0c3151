package graft

import org.apache.spark.sql.SparkSession

/** Recall-vs-cost curve for the ANN tier — the dial sheet a user reads
  * before picking an operating point ("what does 0.9 recall cost?").
  *
  * Sweeps the three approximate paths against exact brute force
  * (recall@10 of vec 0's neighbors, the family's shared query):
  *   - learned k-means IVF: nprobe ∈ {2, 4, 8} of 10 lists
  *   - IVF-PQ: nprobe ∈ {2, 4, 8} × rerank ∈ {50, 200}
  *   - hyperplane LSH: (tables, bits) ∈ {(4,6), (8,6), (8,4)}
  * Each point records recall@10 and wall seconds (min of `passes`,
  * end-to-end per entry: the self-contained entries retrain per call,
  * so the number is the whole-entry cost the bench measures — relative
  * cost across dials is the signal; at production scale training/encode
  * amortizes through the persisted PQ index and the query-side cost is
  * the probed-list scan ∝ nprobe plus the rerank-sized exact join).
  *
  * Output: one JSON line + target/recall_curve.json; the round commits
  * it as RECALL_CURVE_r{N}.json next to RECALL_BASELINE.json, and
  * SimilarityRecallSpec gates the chosen high-recall default
  * (nprobe=8, rerank=200) against the committed baseline. */
object RecallCurve {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val passes = sys.env.getOrElse("SPARK_GRAFT_RECALL_RUNS", "2").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.Similarity

    def ids(df: org.apache.spark.sql.DataFrame): Set[Long] =
      df.collect().map(_.getAs[Long]("vec_id")).toSet
    val truth = ids(Similarity.topkBrute(spark, sfDir))
    require(truth.size == 10, s"brute-force truth has ${truth.size} rows")

    def fmt(d: Double) = "%.6f".formatLocal(java.util.Locale.ROOT, d)
    def point(label: String)(run: => org.apache.spark.sql.DataFrame): (String, Double, Double) = {
      var best = Double.MaxValue
      var recall = 0.0
      for (_ <- 1 to passes) {
        val t0 = System.nanoTime()
        val got = ids(run)
        best = math.min(best, (System.nanoTime() - t0) / 1e9)
        recall = (got & truth).size / 10.0
        spark.catalog.clearCache()
        graft.operators.Dedup.unpersistIntermediates(spark)
      }
      System.err.println(f"[recall_curve] $label%-28s recall@10 = $recall%.2f  ${fmt(best)}s")
      (label, recall, best)
    }

    val points = scala.collection.mutable.ArrayBuffer[(String, Double, Double)]()
    points += point("brute_exact")(Similarity.topkBrute(spark, sfDir))
    for (np <- Seq(2, 4, 8))
      points += point(s"ivf_kmeans_nprobe$np")(
        Similarity.ivfKmeansTopk(spark, sfDir, nprobe = np))
    for (np <- Seq(2, 4, 8); rr <- Seq(50, 200))
      points += point(s"ivf_pq_nprobe${np}_rerank$rr")(
        Similarity.ivfPqTopk(spark, sfDir, nprobe = np, rerank = rr))
    // the shipped default: geometry derived from the corpus count
    // (Similarity.annGeometry) — the row a user gets out of the box
    points += point("lsh_auto")(Similarity.annLsh(spark, sfDir))
    for ((tables, bits) <- Seq((4, 6), (8, 6), (8, 4))) {
      spark.conf.set("spark.graft.lsh.tables", tables.toString)
      spark.conf.set("spark.graft.lsh.bits", bits.toString)
      try points += point(s"lsh_t${tables}_b$bits")(Similarity.annLsh(spark, sfDir))
      finally {
        spark.conf.unset("spark.graft.lsh.tables")
        spark.conf.unset("spark.graft.lsh.bits")
      }
    }

    // fused-retrieval quality (VERDICT r11 #6): the float production arm
    // has dense-arm recall above, but the USER-facing artifact is the
    // fused list — measure overlap@20 of hybridSearch at the production
    // ivf_pq dials (nprobe = geometry-driven auto since r14, rerank=200)
    // vs the brute-dense-arm fusion, so end-to-end retrieval quality is
    // a recorded number, not an inference from dense-arm recall.
    def fusedIds(arm: String): Seq[Long] = {
      if (arm != "brute") spark.conf.set("spark.graft.hybrid.denseArm", arm)
      try graft.operators.TextAnalysis.hybridSearch(spark, sfDir)
        .collect().map(_.getAs[Long]("doc_id")).toSeq
      finally spark.conf.unset("spark.graft.hybrid.denseArm")
    }
    val bruteFused = fusedIds("brute")
    var pqSec = Double.MaxValue
    var overlap = 0.0
    for (_ <- 1 to passes) {
      val t0 = System.nanoTime()
      val pqFused = fusedIds("ivf_pq")
      pqSec = math.min(pqSec, (System.nanoTime() - t0) / 1e9)
      overlap = (pqFused.toSet & bruteFused.toSet).size.toDouble / bruteFused.size
      spark.catalog.clearCache()
      graft.operators.Dedup.unpersistIntermediates(spark)
    }
    System.err.println(
      f"[recall_curve] hybrid_pq_vs_brute_fusion   overlap@20 = $overlap%.2f  ${fmt(pqSec)}s")

    // fusion dial attribution (VERDICT r12 #6): the sf0.01 r12 dip
    // (overlap@20 = 0.65 at nprobe=8/rerank=200) needs a CAUSE — per
    // dial, record the fused overlap@20 NEXT TO the dense arm's own
    // recall@100 (the armN=100 cut that actually enters fusion), so a
    // low fused row is attributable to the dense arm (recall@100 low
    // too) vs the RRF arithmetic (recall@100 high, fused still low).
    import org.apache.spark.sql.functions.{broadcast, col}
    graft.functions.VectorExpressions.register(spark)
    val e100 = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .selectExpr("vec_id", "embedding",
        "sqrt(graft_dot(embedding, embedding)) AS nrm")
    val q100 = e100.filter(col("vec_id") === 0)
      .selectExpr("embedding AS q_emb", "nrm AS q_nrm")
    val brute100 = e100.filter(col("vec_id") =!= 0).join(broadcast(q100))
      .selectExpr("vec_id",
        "round(graft_dot(embedding, q_emb) / (nrm * q_nrm), 6) AS cos_sim")
      .orderBy(col("cos_sim").desc, col("vec_id")).limit(100)
      .collect().map(_.getAs[Long]("vec_id")).toSet
    // the GEOMETRY-DRIVEN default (VERDICT r13 #4): what a user gets with
    // no dial at this corpus — record the chosen nprobe per SF next to
    // its dense recall@100 and fused overlap@20, so the auto dial's
    // operating point is a recorded artifact row, not an inference
    // geometry + rerank come from the SHARED constants the production
    // hybridSearch resolves (ADVICE r14: literal 10/200 here would
    // silently measure a different operating point if PqCoarseLists or
    // the rerank conf ever moved)
    val nVecs = e100.count()
    val autoRr = Similarity.hybridRerank(spark)
    val autoNp = Similarity.autoNprobe(nVecs, Similarity.PqCoarseLists, autoRr)
    val autoDense = Similarity.ivfPqTopk(spark, sfDir, nprobe = autoNp,
        rerank = autoRr, topN = 100)
      .collect().map(_.getAs[Long]("vec_id")).toSet
    val autoDenseRecall = (autoDense & brute100).size.toDouble / brute100.size
    spark.conf.set("spark.graft.hybrid.denseArm", "ivf_pq")
    val autoFused = try graft.operators.TextAnalysis.hybridSearch(spark, sfDir)
      .collect().map(_.getAs[Long]("doc_id")).toSet
    finally spark.conf.unset("spark.graft.hybrid.denseArm")
    val autoOverlap = (autoFused & bruteFused.toSet).size.toDouble / bruteFused.size
    spark.catalog.clearCache()
    graft.operators.Dedup.unpersistIntermediates(spark)
    System.err.println(
      f"[recall_curve] auto_dial  n=$nVecs np=$autoNp  dense recall@100 = " +
        f"$autoDenseRecall%.2f  fused overlap@20 = $autoOverlap%.2f")

    val dialRows = for ((np, rr) <- Seq((4, 200), (8, 200), (16, 200), (8, 50))) yield {
      val dense = Similarity.ivfPqTopk(spark, sfDir, nprobe = np,
          rerank = rr, topN = 100)
        .collect().map(_.getAs[Long]("vec_id")).toSet
      val denseRecall = (dense & brute100).size.toDouble / brute100.size
      spark.conf.set("spark.graft.hybrid.denseArm", "ivf_pq")
      spark.conf.set("spark.graft.hybrid.nprobe", np.toString)
      spark.conf.set("spark.graft.hybrid.rerank", rr.toString)
      val fused = try graft.operators.TextAnalysis.hybridSearch(spark, sfDir)
        .collect().map(_.getAs[Long]("doc_id")).toSet
      finally {
        spark.conf.unset("spark.graft.hybrid.denseArm")
        spark.conf.unset("spark.graft.hybrid.nprobe")
        spark.conf.unset("spark.graft.hybrid.rerank")
      }
      val fusedOverlap = (fused & bruteFused.toSet).size.toDouble / bruteFused.size
      spark.catalog.clearCache()
      graft.operators.Dedup.unpersistIntermediates(spark)
      System.err.println(
        f"[recall_curve] hybrid_dial np=$np%-2d rr=$rr%-3d  dense recall@100 = " +
          f"$denseRecall%.2f  fused overlap@20 = $fusedOverlap%.2f")
      s""""np${np}_rr$rr":{"dense_recall_at_100":${fmt(denseRecall)},""" +
        s""""fused_overlap_at_20":${fmt(fusedOverlap)}}"""
    }

    val body = points.map { case (l, r, sec) =>
      s""""$l":{"recall_at_10":${fmt(r)},"sec":${fmt(sec)}}"""
    }.mkString(",")
    val json = s"""{"metric":"recall_curve","sf":"$sfDir","passes":$passes,""" +
      s""""hybrid_fusion":{"overlap_at_20":${fmt(overlap)},"sec":${fmt(pqSec)}},""" +
      s""""auto_dial":{"n_vectors":$nVecs,"nprobe":$autoNp,"rerank":$autoRr,""" +
      s""""dense_recall_at_100":${fmt(autoDenseRecall)},""" +
      s""""fused_overlap_at_20":${fmt(autoOverlap)}},""" +
      s""""hybrid_dials":{${dialRows.mkString(",")}},""" +
      s""""points":{$body}}"""
    println(json)
    val out = java.nio.file.Paths.get("target", "recall_curve.json")
    java.nio.file.Files.createDirectories(out.getParent)
    java.nio.file.Files.write(out, (json + "\n").getBytes("UTF-8"))
    spark.stop()
  }
}
