package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale rehearsal (one notch up): generates a 10× copy of the
  * documents/embeddings tables (sf1-equivalent) under `target/sf1`,
  * runs the dedup/similarity family at sf0.1 and sf1, and records
  * per-query wall time plus LSH candidate volumes at two geometries —
  * the evidence that candidate growth tracks Σn_b² (and that the
  * geometry dials control it) rather than the all-pairs n².
  *
  * Generation is fully deterministic (hash-derived decisions only, no
  * RNG): each source row is replicated 10×; replicas keep ~30% of texts
  * byte-identical (exact-dup mass) and append a replica token to the
  * rest (near-dup mass); embedding replicas add ±0.025/dim hash noise
  * and renormalize (cos ≈ 0.98 near-dups, preserving cluster
  * structure). The output lives under target/ — /root/testdata is
  * read-only and stays untouched.
  *
  * Run: SPARK_GRAFT_CPUS=32 sbt "runMain graft.ScaleRehearsal"
  * Output: one JSON line + target/scale_rehearsal.json
  */
object ScaleRehearsal {

  private val Sf01 = "/root/testdata/sf0.1"
  // resolved lazily against spark.graft.scratchDir (default target/)
  private var Sf1 = "target/sf1"

  /** The rehearsal family: every dedup/similarity/text/curation operator
    * that reads only documents/embeddings — the full training-pipeline
    * surface. The intentionally-quadratic `dedup_embed_cosine` baseline
    * is EXCLUDED by design — it is the documented O(n²) floor with its
    * own row-cap guard, not a scale path (CONFIG.md
    * `spark.graft.dedup.exactCosineMaxRows`). */
  private val Family = Seq(
    "dedup_exact", "dedup_minhash_lsh", "dedup_incremental",
    "dedup_incremental_idx", "dedup_components",
    "dedup_simhash", "dedup_simhash_pairs",
    "dedup_ngram_jaccard", "dedup_embed_lsh", "dedup_semantic",
    "dedup_semantic_kmeans", "corpus_clean",
    // the replica-heavy sf1 corpus is the substring family's WORST case
    // (nearly every gram crosses documents) — measured deliberately
    "dedup_substring", "dedup_substring_scrub",
    "corpus_split", "corpus_sample_strat", "corpus_group_cap", "corpus_pack",
    "corpus_contamination", "corpus_mix", "corpus_mix_temperature",
    "corpus_quality_funnel",
    "text_fingerprint", "text_langid", "text_quality", "text_tokens",
    "text_tfidf_topk", "text_surprisal", "text_heavy_hitters",
    // round-7 additions: the lossless prefix join (worst-case dense
    // output), tokenizer encode, the events family (population-scaled
    // replicas), the graph/CDC/MV lineitem family
    "dedup_jaccard_prefix", "text_bpe_encode", "table_profile",
    "events_gapfill", "events_rolling", "events_retention",
    "events_outliers", "events_funnel",
    "graph_triangles", "cdc_merge", "cdc_scd2", "mv_incremental",
    "sim_topk_brute", "sim_ann_lsh", "sim_ivf_topk", "sim_ivf_probe2",
    "sim_ivf_kmeans", "sim_ivf_pq", "sim_knn_join", "sim_label_centroids",
    "sim_centroids_udaf",
    // round-8 corpus tooling: the chunker and CDC relation are
    // output-bound; search cost tracks the phrase's df via the index;
    // overlap tracks shared shingle mass; canonical / leakage-safe split
    // ride the components closure; contamination is a broadcast argmax
    "text_chunk", "dedup_cdc_chunks", "text_search", "dedup_source_overlap",
    "dedup_canonical", "corpus_split_leakage_safe",
    "corpus_contamination_semantic", "text_quality_regression",
    // round-9 retrieval tier: BM25's cost is the shared tokenize +
    // a query-term-sized score; the hybrid adds a brute cosine arm
    // and an O(armN) fusion join
    "text_search_bm25", "text_search_hybrid",
    // round-9 quality-classifier tier: in-query NB train+score — cost
    // is one corpus tokenize into the count grain + vocab-sized model
    // aggregates; the deployed capped-model path is the nb_model arm
    "corpus_quality_classifier")

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    ensureSf1(spark)

    def fmt(d: Double) = "%.3f".formatLocal(java.util.Locale.ROOT, d)
    def timeOne(name: String, dir: String): (Double, Long) = {
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(name)(spark, dir).count()
      val sec = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      (sec, n)
    }
    // warm-up pass at the small scale so JIT/codegen cost doesn't land on
    // the first measured family member
    timeOne("dedup_exact", "/root/testdata/sf0.01")

    val rows = Family.map { name =>
      val (s01, n01) = timeOne(name, Sf01)
      val (s1, n1) = timeOne(name, Sf1)
      val ratio = if (s01 > 0) s1 / s01 else -1.0
      System.err.println(f"[rehearsal] $name%-22s sf0.1 ${fmt(s01)}s ($n01 rows)  sf1 ${fmt(s1)}s ($n1 rows)  ×${fmt(ratio)}")
      (name, s01, n01, s1, n1, ratio)
    }

    // LSH candidate volume at both scales and two geometries: the
    // default dials, then bits turned up — showing Σn_b² is the lever
    def candidates(dir: String, tables: Int, bits: Int): Long = {
      spark.conf.set("spark.graft.lsh.tables", tables.toString)
      spark.conf.set("spark.graft.lsh.bits", bits.toString)
      val n = graft.operators.Similarity.embedLshCandidates(spark, dir, minSim = None).count()
      spark.conf.unset("spark.graft.lsh.tables")
      spark.conf.unset("spark.graft.lsh.bits")
      n
    }
    def vecs(dir: String): Long = spark.read.parquet(s"$dir/embeddings.parquet").count()
    val (n01, n1) = (vecs(Sf01), vecs(Sf1))
    val cand = Seq(
      ("default(4x6)", candidates(Sf01, 4, 6), candidates(Sf1, 4, 6)),
      ("scaled(4x9)", candidates(Sf01, 4, 9), candidates(Sf1, 4, 9)))
    cand.foreach { case (g, c01, c1) =>
      System.err.println(s"[rehearsal] candidates $g: sf0.1=$c01 sf1=$c1 " +
        f"(all-pairs would be ${n01 * (n01 - 1) / 2}%d / ${n1 * (n1 - 1) / 2}%d)")
    }
    // the rare-gram df cap is the same kind of dial: the duplicated sf1
    // corpus inflates every gram's df ~10×, so the oracle-pinned default
    // (20) correctly yields zero candidates until the cap scales with it
    spark.conf.set("spark.graft.dedup.ngram.maxDf", "200")
    val t0 = System.nanoTime()
    val ngramScaled = SparkEntry.queries("dedup_ngram_jaccard")(spark, Sf1).count()
    val ngramScaledSec = (System.nanoTime() - t0) / 1e9
    spark.conf.unset("spark.graft.dedup.ngram.maxDf")
    spark.catalog.clearCache()
    System.err.println(f"[rehearsal] dedup_ngram_jaccard sf1 with maxDf=200: $ngramScaled rows in ${fmt(ngramScaledSec)}s")

    // The family loop consumes queries with count(), and the scrub's row
    // count does not depend on clean_text — Catalyst prunes the whole
    // string re-assembly, so the loop's scrub row measures only the gram
    // gate. Time the FULL materialization explicitly (a sum over
    // clean_text lengths forces every document to be re-joined) so the
    // recorded number is the one a pipeline writing the scrubbed corpus
    // would pay.
    def scrubFull(dir: String): (Double, Long) = {
      val t0 = System.nanoTime()
      val r = graft.operators.Dedup.substringScrub(spark, dir)
        .agg(sum(length(col("clean_text"))).as("chars"),
          sum(col("n_removed")).as("removed")).head()
      val sec = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      (sec, r.getAs[Long]("removed"))
    }
    val (scr01, rem01) = scrubFull(Sf01)
    val (scr1, rem1) = scrubFull(Sf1)
    System.err.println(
      f"[rehearsal] scrub full materialization: sf0.1 ${fmt(scr01)}s ($rem01 tokens removed)  " +
      f"sf1 ${fmt(scr1)}s ($rem1 removed)  ×${fmt(scr1 / math.max(scr01, 1e-9))}")

    // Streaming near-dup STATE growth (r5 verdict #2): drain the corpus
    // through the RocksDB-backed filter at both scales and record the
    // state-operator footprint. The check: state rows track live BUCKETS
    // (≤ 4 bands × docs, and well under when near-dups share buckets) —
    // not document bytes — so 10× corpus ⇒ ~10× rows, with bytes/row
    // flat. That is the growth law a production deployment sizes disks
    // against (RocksDB spills; the default heap provider would OOM).
    def streamState(dir: String): (Double, Long, Long, Long) = {
      val t0 = System.nanoTime()
      val n = SparkEntry.queries("stream_neardup_filter")(spark, dir).count()
      val sec = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      val (st, by) = graft.queries.StreamQueries.lastNearDupState.getOrElse((-1L, -1L))
      (sec, n, st, by)
    }
    val (ss01, sn01, sr01, sb01) = streamState(Sf01)
    val (ss1, sn1, sr1, sb1) = streamState(Sf1)
    System.err.println(
      f"[rehearsal] stream_neardup state: sf0.1 $sr01 buckets/$sb01 B (${fmt(ss01)}s, $sn01 hits)  " +
      f"sf1 $sr1 buckets/$sb1 B (${fmt(ss1)}s, $sn1 hits)  rows ×${fmt(sr1.toDouble / math.max(1, sr01))}")

    // Day-2 persisted-index read path (r6 verdict #1): pre-build the sf1
    // index ONCE (timed separately), then time ONLY the read+query side
    // — incrementalPairsFromIndex against the existing artifact — with
    // bytes-read from task input metrics. Two batch widths hit both
    // routes: the 10% gate batch overflows the pushdown cap (sequential
    // sets scan), the 0.1% batch rides the In-pushdown row-group
    // skipping the doc_id-range-sorted layout exists for.
    def diskBytes(p: String): Long = graft.util.Metrics.diskBytes(p)
    // (result, input bytes read, shuffle bytes written) over the block —
    // extracted to graft.util.Metrics so Sf10Rehearsal measures its
    // tiers with the same listener mechanics
    def bytesReadDuring[A](f: => A): (A, Long, Long) =
      graft.util.Metrics.bytesReadDuring(spark)(f)
    val idxDir = java.nio.file.Files.createTempDirectory(
      graft.util.Fs.scratchDir(spark, "dayidx"), "idx").toAbsolutePath.toString
    val sf1docs = spark.read.parquet(s"$Sf1/documents.parquet")
    val isBatch10 = pmod(col("doc_id"), lit(10)) === lit(7)
    val tb0 = System.nanoTime()
    graft.operators.Dedup.writeIndex(spark, sf1docs.filter(!isBatch10), idxDir)
    val buildSec = (System.nanoTime() - tb0) / 1e9
    val (bandsBytes, setsBytes) = (diskBytes(s"$idxDir/bands"), diskBytes(s"$idxDir/sets"))
    // control: what one full pass over the batch's source table costs in
    // input bytes — the floor any day-2 run pays before touching the
    // index (sum(length(text)) forces a real data-column read; a bare
    // count() would be answered from parquet footers alone)
    val (_, docsScanBytes, _) = bytesReadDuring(
      sf1docs.agg(sum(length(col("text")))).head())
    // each batch width runs as a bloom on/off A/B: the runtime filter's
    // claim is shuffle-volume reduction on the index side, so record
    // shuffle-write bytes alongside wall + input bytes for both arms.
    // `smj` arms disable AUTO broadcast (explicit broadcast() hints in
    // the verify stage survive) — the production condition where the
    // daily batch bands exceed the broadcast threshold and the
    // candidate join becomes a real exchange; at fixture scale Spark
    // broadcasts the batch side and the target exchange never exists,
    // which is itself worth recording (the bloom's two driver jobs are
    // its only cost there)
    def day2(label: String, batch: org.apache.spark.sql.DataFrame,
             bloom: Boolean, smj: Boolean = false): (String, Double, Long, Long, Long) = {
      spark.conf.set("spark.graft.dedup.index.bloom.enabled", bloom.toString)
      val prevThresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      if (smj) spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val t0 = System.nanoTime()
      // restore in finally: one failed arm must not leave broadcast
      // joins globally disabled (or the bloom pinned) for every
      // remaining measurement in the run
      val (n, bytes, shufBytes) =
        try bytesReadDuring {
          graft.operators.Dedup.incrementalPairsFromIndex(spark, idxDir, batch).count()
        } finally {
          spark.conf.unset("spark.graft.dedup.index.bloom.enabled")
          spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThresh)
        }
      val sec = (System.nanoTime() - t0) / 1e9
      graft.operators.Dedup.unpersistIntermediates(spark)
      spark.catalog.clearCache()
      val tag = s"$label${if (smj) "_smj" else ""}${if (bloom) "" else "_nobloom"}"
      System.err.println(f"[rehearsal] day2 $tag%-26s ${fmt(sec)}s  $n rows  ${bytes / 1048576}%d MiB read  " +
        f"${shufBytes / 1048576}%d MiB shuffled " +
        f"(index: bands ${bandsBytes / 1048576}%d MiB + sets ${setsBytes / 1048576}%d MiB; one docs scan ${docsScanBytes / 1048576}%d MiB)")
      (tag, sec, n, bytes, shufBytes)
    }
    val batch0p1 = sf1docs.filter(pmod(col("doc_id"), lit(1000)) === lit(7))
    val day2Rows = Seq(
      day2("batch_10pct", sf1docs.filter(isBatch10), bloom = true),
      day2("batch_10pct", sf1docs.filter(isBatch10), bloom = false),
      day2("batch_10pct", sf1docs.filter(isBatch10), bloom = true, smj = true),
      day2("batch_10pct", sf1docs.filter(isBatch10), bloom = false, smj = true),
      day2("batch_0p1pct", batch0p1, bloom = true),
      day2("batch_0p1pct", batch0p1, bloom = false),
      day2("batch_0p1pct", batch0p1, bloom = true, smj = true),
      day2("batch_0p1pct", batch0p1, bloom = false, smj = true))
    System.err.println(f"[rehearsal] day2 index build+write: ${fmt(buildSec)}s")
    graft.util.Fs.deleteRecursively(java.nio.file.Paths.get(idxDir))

    // ---- components day-2: the first componentsIncremental call per
    // process builds + persists the day-1 artifacts (index + labels);
    // the second call reads them — its wall clock IS the day-2-only
    // cost (batch shingles + candidate index bytes + a CC loop over
    // star ∪ new edges), the number the operator exists to deliver.
    val tcc1 = System.nanoTime()
    val ccN1 = graft.operators.Dedup.componentsIncremental(spark, Sf1).count()
    val ccColdSec = (System.nanoTime() - tcc1) / 1e9
    graft.operators.Dedup.unpersistIntermediates(spark)
    spark.catalog.clearCache()
    val tcc2 = System.nanoTime()
    val (ccN2, ccDay2Bytes, ccDay2Shuf) = bytesReadDuring {
      graft.operators.Dedup.componentsIncremental(spark, Sf1).count()
    }
    val ccDay2Sec = (System.nanoTime() - tcc2) / 1e9
    graft.operators.Dedup.unpersistIntermediates(spark)
    spark.catalog.clearCache()
    assert(ccN1 == ccN2, s"day-2 components drifted across store reads: $ccN1 vs $ccN2")
    System.err.println(f"[rehearsal] cc_day2 cold (build day-1 + day-2) ${fmt(ccColdSec)}s; " +
      f"day-2 only ${fmt(ccDay2Sec)}s  $ccN2 rows  ${ccDay2Bytes / 1048576}%d MiB read  " +
      f"${ccDay2Shuf / 1048576}%d MiB shuffled")

    // ---- PQ day-2: append encodes ONLY the batch with the frozen
    // codebooks (never reads existing codes), compaction rewrites
    // 8-byte codes — both must cost batch-/index-bytes while the
    // day-1 build pays the full train+encode. bytes_read per arm is
    // the proportionality evidence.
    val pqDir = java.nio.file.Files.createTempDirectory(
      graft.util.Fs.scratchDir(spark, "dayidx"), "pq").toAbsolutePath.toString
    val pqDir2 = pqDir + "_compacted"
    val tpq0 = System.nanoTime()
    graft.operators.Similarity.writePqIndexOf(spark,
      graft.operators.Similarity.unitVecs(spark, Sf1).filter(v => v._1 % 10 != 7), pqDir)
    val pqBuildSec = (System.nanoTime() - tpq0) / 1e9
    val pqCodesBytes = diskBytes(s"$pqDir/codes")
    val (_, embScanBytes, _) = bytesReadDuring(
      spark.read.parquet(s"$Sf1/embeddings.parquet")
        .agg(sum(size(col("embedding")))).head())
    def pqAppend(label: String, keep: Long => Boolean): (String, Double, Long) = {
      val t0 = System.nanoTime()
      val (_, bytes, _) = bytesReadDuring {
        graft.operators.Similarity.appendPqIndex(spark, pqDir,
          graft.operators.Similarity.unitVecs(spark, Sf1).filter(v => keep(v._1)))
      }
      val sec = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      System.err.println(f"[rehearsal] pq_day2 $label%-16s ${fmt(sec)}s  ${bytes / 1048576}%d MiB read " +
        f"(build ${fmt(pqBuildSec)}s, codes ${pqCodesBytes / 1048576}%d MiB, one emb scan ${embScanBytes / 1048576}%d MiB)")
      (label, sec, bytes)
    }
    // 0.1% first: appends never read existing codes, so arms stay
    // independent measurements even into one index
    val pqAppends = Seq(
      pqAppend("append_0p1pct", id => id % 1000 == 7),
      // exclude the ids the first arm already appended: both arms write
      // into ONE day-1 index, so re-appending id%1000==7 would leave
      // ~0.1% of vec_ids double-encoded and let the compact/probe arms
      // measure (and surface in top-k) a duplicate-bearing index
      pqAppend("append_10pct", id => id % 10 == 7 && id % 1000 != 7))
    val retiredVecs = spark.read.parquet(s"$Sf1/embeddings.parquet")
      .filter(pmod(col("vec_id"), lit(10)) =!= lit(7) &&
        pmod(col("vec_id"), lit(17)) === lit(5))
      .select(col("vec_id"))
    val tpc0 = System.nanoTime()
    val (_, pqCompactBytes, _) = bytesReadDuring {
      graft.operators.Similarity.compactPqIndex(spark, pqDir, retiredVecs, pqDir2)
    }
    val pqCompactSec = (System.nanoTime() - tpc0) / 1e9
    val tpr0 = System.nanoTime()
    val (_, pqProbeBytes, _) = bytesReadDuring {
      graft.operators.Similarity.pqTopkFromIndex(spark, Sf1, pqDir2).collect()
    }
    val pqProbeSec = (System.nanoTime() - tpr0) / 1e9
    graft.operators.Dedup.unpersistIntermediates(spark)
    System.err.println(f"[rehearsal] pq_day2 compact          ${fmt(pqCompactSec)}s  ${pqCompactBytes / 1048576}%d MiB read")
    System.err.println(f"[rehearsal] pq_day2 probe_query      ${fmt(pqProbeSec)}s  ${pqProbeBytes / 1048576}%d MiB read (pruned to probed clusters + shortlist rerank)")
    graft.util.Fs.deleteRecursively(java.nio.file.Paths.get(pqDir))
    graft.util.Fs.deleteRecursively(java.nio.file.Paths.get(pqDir2))

    // ---- BM25 day-2: the positional-index lifecycle behind
    // text_search_bm25_day2 — build once (the only corpus tokenize),
    // append a batch (batch tokenize only), probe forever (posting
    // bytes for the query terms + the doc-count-sized doclen sidecar).
    // The corpus-derived one-shot BM25 is the contrast arm; probe
    // bytes_read vs its bytes_read is the "query path never touches
    // the corpus" claim as a measurement.
    val txtIdxRoot = java.nio.file.Files.createTempDirectory(
      graft.util.Fs.scratchDir(spark, "dayidx"), "bm25").toAbsolutePath.toString
    val txtDay1 = s"$txtIdxRoot/day1"
    val txtBatch = s"$txtIdxRoot/batch"
    val tti0 = System.nanoTime()
    graft.operators.TextAnalysis.writePositionalIndexOf(
      spark, sf1docs.filter(!isBatch10), txtDay1)
    val txtBuildSec = (System.nanoTime() - tti0) / 1e9
    val txtIdxBytes = diskBytes(txtDay1) + diskBytes(s"${txtDay1}_doclen")
    val tta0 = System.nanoTime()
    graft.operators.TextAnalysis.writePositionalIndexOf(
      spark, sf1docs.filter(isBatch10), txtBatch)
    val txtAppendSec = (System.nanoTime() - tta0) / 1e9
    val ttp0 = System.nanoTime()
    val (_, txtProbeBytes, _) = bytesReadDuring {
      graft.operators.TextAnalysis.bm25ViaIndex(
        spark, Seq(txtDay1, txtBatch), Seq("dup", "merge")).collect()
    }
    val txtProbeSec = (System.nanoTime() - ttp0) / 1e9
    val ttc0 = System.nanoTime()
    val (_, txtCorpusBytes, _) = bytesReadDuring {
      graft.operators.TextAnalysis.bm25(spark, Sf1).collect()
    }
    val txtCorpusSec = (System.nanoTime() - ttc0) / 1e9
    // takedown at this decade too (the sf10 tiers row's sf1 twin):
    // compaction is whole-index-priced (anti-join + rewrite of INDEX
    // bytes, never a corpus re-tokenize) and the NEXT probe off the
    // compacted set stays query-term-postings-sized — both claims need
    // the ×10 ratio, so measure wall + bytes-rewritten + probe bytes
    // here exactly as Sf10Rehearsal does at 500k docs
    val ttk0 = System.nanoTime()
    graft.operators.TextAnalysis.compactPositionalIndex(spark,
      Seq(txtDay1, txtBatch),
      sf1docs.filter(pmod(col("doc_id"), lit(17)) === lit(5)).select(col("doc_id")),
      s"$txtIdxRoot/compact")
    val txtCompactSec = (System.nanoTime() - ttk0) / 1e9
    val txtCompactBytes = diskBytes(s"$txtIdxRoot/compact") +
      diskBytes(s"$txtIdxRoot/compact_doclen")
    val ttk1 = System.nanoTime()
    val (_, txtProbe2Bytes, _) = bytesReadDuring {
      graft.operators.TextAnalysis.bm25ViaIndex(
        spark, Seq(s"$txtIdxRoot/compact"), Seq("dup", "merge")).collect()
    }
    val txtProbe2Sec = (System.nanoTime() - ttk1) / 1e9
    graft.operators.Dedup.unpersistIntermediates(spark)
    spark.catalog.clearCache()
    System.err.println(f"[rehearsal] bm25_day2 build ${fmt(txtBuildSec)}s (index ${txtIdxBytes / 1048576}%d MiB), " +
      f"append ${fmt(txtAppendSec)}s, probe ${fmt(txtProbeSec)}s ${txtProbeBytes / 1048576}%d MiB read " +
      f"vs corpus one-shot ${fmt(txtCorpusSec)}s ${txtCorpusBytes / 1048576}%d MiB read; " +
      f"compact ${fmt(txtCompactSec)}s (${txtCompactBytes / 1048576}%d MiB rewritten), " +
      f"probe_compacted ${fmt(txtProbe2Sec)}s ${txtProbe2Bytes / 1048576}%d MiB read")
    graft.util.Fs.deleteRecursively(java.nio.file.Paths.get(txtIdxRoot))

    // ---- NB quality-model lifecycle behind stream_corpus_nb_score:
    // train ONCE (the only corpus tokenize — vocab-sized model
    // aggregates past the count grain), ship the capped artifact, then
    // score arriving batches forever through the literal-map fold —
    // cost strictly proportional to the scored batch, never the
    // corpus. The in-query classifier (train+score fused) is the
    // contrast arm: what a deployment WITHOUT the persisted model
    // would pay on every batch.
    val nbRoot = java.nio.file.Files.createTempDirectory(
      graft.util.Fs.scratchDir(spark, "nbmodel"), "reh").toAbsolutePath.toString
    val tnb0 = System.nanoTime()
    val (_, nbTrainBytes, _) = bytesReadDuring {
      graft.operators.Curation.writeNbModel(spark, Sf1, s"$nbRoot/model")
    }
    val nbTrainSec = (System.nanoTime() - tnb0) / 1e9
    val nbModelBytes = diskBytes(s"$nbRoot/model")
    val tns0 = System.nanoTime()
    val (nbBatchRows, nbScoreBytes, _) = bytesReadDuring {
      graft.operators.Curation.nbScoreBatch(
        spark, sf1docs.filter(isBatch10), s"$nbRoot/model").count()
    }
    val nbScoreSec = (System.nanoTime() - tns0) / 1e9
    val tnf0 = System.nanoTime()
    val (nbFullRows, nbFullBytes, _) = bytesReadDuring {
      graft.operators.Curation.nbQualityClassifier(spark, Sf1).count()
    }
    val nbFullSec = (System.nanoTime() - tnf0) / 1e9
    graft.operators.Dedup.unpersistIntermediates(spark)
    System.err.println(f"[rehearsal] nb_model train ${fmt(nbTrainSec)}s ${nbTrainBytes / 1048576}%d MiB read (model ${nbModelBytes / 1024}%d KiB), " +
      f"score_batch ${fmt(nbScoreSec)}s $nbBatchRows rows ${nbScoreBytes / 1048576}%d MiB read " +
      f"vs in-query train+score ${fmt(nbFullSec)}s $nbFullRows rows ${nbFullBytes / 1048576}%d MiB read")
    graft.util.Fs.deleteRecursively(java.nio.file.Paths.get(nbRoot))

    // ---- composed pipeline at sf1: the funnel-bounded-state claim as
    // a SCALE measurement — the stateful bucket store behind
    // stream_corpus_pipeline vs the unfiltered streaming near-dup's
    // store on the same corpus (the stream_neardup_state arm above).
    val tpl0 = System.nanoTime()
    val plKept = graft.queries.StreamQueries.streamCorpusPipeline(spark, Sf1).count()
    val plSec = (System.nanoTime() - tpl0) / 1e9
    val (plRows, plBytes) =
      graft.queries.StreamQueries.lastNearDupState.getOrElse((-1L, -1L))
    graft.operators.Dedup.unpersistIntermediates(spark)
    System.err.println(f"[rehearsal] pipeline sf1 ${fmt(plSec)}s kept=$plKept " +
      f"state_rows=$plRows state_bytes=$plBytes (unfiltered near-dup store: $sr1 rows)")

    // ---- streamed-maintenance decade rows (VERDICT r11 #5): per-batch
    // cost of LIVE index maintenance at sf1 batch sizes, and the probe
    // cost as a function of ACCUMULATED batch dirs — the degradation
    // curve that motivates composing compaction into the streamed
    // lifecycle (stream_text_index_compact) and prices its cadence.
    // The per-batch writes ARE the foreachBatch bodies of
    // stream_text_index_refresh / stream_pq_index_refresh, measured
    // without the micro-batch harness overhead the bench floors price.
    val smRoot = java.nio.file.Files.createTempDirectory(
      graft.util.Fs.scratchDir(spark, "dayidx"), "smaint").toAbsolutePath.toString
    val B = 32
    val txtBatchSecs = (0 until B).map { i =>
      val t0 = System.nanoTime()
      graft.operators.TextAnalysis.writePositionalIndexOf(spark,
        sf1docs.filter(pmod(col("doc_id"), lit(B)) === lit(i)),
        s"$smRoot/tidx/b$i")
      (System.nanoTime() - t0) / 1e9
    }
    val tidxDirs = (0 until B).map(i => s"$smRoot/tidx/b$i")
    val txtIdxUnionBytes =
      tidxDirs.map(p => diskBytes(p) + diskBytes(s"${p}_doclen")).sum
    // probe wall + bytes vs accumulated batch-dir count (same phrase as
    // the gated entries) — the curve a deployment reads the compaction
    // cadence off
    val probeCurve = Seq(1, 2, 4, 8, 16, 32).map { k =>
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      val (_, b, _) = bytesReadDuring {
        graft.operators.TextAnalysis.searchViaIndexPaths(
          spark, tidxDirs.take(k), Seq("agg", "join")).collect()
      }
      (k, (System.nanoTime() - t0) / 1e9, b)
    }
    // the compaction payoff: fold all dirs (+ the ≡ 5 mod 17 takedown)
    // into ONE set and probe again — next-probe bytes vs the
    // uncompacted union is stream_text_index_compact's pricing row
    val tsc0 = System.nanoTime()
    graft.operators.TextAnalysis.compactPositionalIndex(spark, tidxDirs,
      sf1docs.filter(pmod(col("doc_id"), lit(17)) === lit(5)).select(col("doc_id")),
      s"$smRoot/tidx_compact")
    val smCompactSec = (System.nanoTime() - tsc0) / 1e9
    val smCompactBytes = diskBytes(s"$smRoot/tidx_compact") +
      diskBytes(s"$smRoot/tidx_compact_doclen")
    spark.catalog.clearCache()
    val tscp0 = System.nanoTime()
    val (_, smProbeCompBytes, _) = bytesReadDuring {
      graft.operators.TextAnalysis.searchViaIndexPaths(
        spark, Seq(s"$smRoot/tidx_compact"), Seq("agg", "join")).collect()
    }
    val smProbeCompSec = (System.nanoTime() - tscp0) / 1e9
    val txtBatchMean = txtBatchSecs.sum / B
    System.err.println(
      f"[rehearsal] stream_maint text: $B batches, per-batch ${fmt(txtBatchMean)}s mean " +
      f"(min ${fmt(txtBatchSecs.min)} max ${fmt(txtBatchSecs.max)}), union ${txtIdxUnionBytes / 1048576}%d MiB; " +
      "probe curve " + probeCurve.map { case (k, s, b) =>
        f"$k dirs=${fmt(s)}s/${b / 1024}%d KiB" }.mkString(", ") +
      f"; compact ${fmt(smCompactSec)}s (${smCompactBytes / 1048576}%d MiB rewritten), " +
      f"probe_compacted ${fmt(smProbeCompSec)}s/${smProbeCompBytes / 1024}%d KiB")

    // PQ twin: day-0 codebook sidecar, then per-batch frozen-codebook
    // encodes into batchId-keyed partitions; probe the 32-batch layout
    // vs a single-set encode of the same corpus — the footprint cost of
    // the batch dimension on the probe path
    val tcb0 = System.nanoTime()
    graft.operators.Similarity.writePqCodebooks(spark, Sf1, s"$smRoot/pidx")
    val pqCodebookSec = (System.nanoTime() - tcb0) / 1e9
    val sf1emb = spark.read.parquet(s"$Sf1/embeddings.parquet")
    val pqBatchSecs = (0 until B).map { i =>
      val t0 = System.nanoTime()
      graft.operators.Similarity.writePqCodesBatch(spark, s"$smRoot/pidx",
        sf1emb.filter(pmod(col("vec_id"), lit(B)) === lit(i)), i.toLong)
      (System.nanoTime() - t0) / 1e9
    }
    val pqBatchedCodesBytes = diskBytes(s"$smRoot/pidx/codes")
    spark.catalog.clearCache()
    val tpb0 = System.nanoTime()
    val (_, pqProbeBatchedBytes, _) = bytesReadDuring {
      graft.operators.Similarity.pqTopkFromIndex(spark, Sf1, s"$smRoot/pidx").collect()
    }
    val pqProbeBatchedSec = (System.nanoTime() - tpb0) / 1e9
    graft.operators.Similarity.writePqIndexOf(spark,
      graft.operators.Similarity.unitVecs(spark, Sf1), s"$smRoot/pone")
    spark.catalog.clearCache()
    val tps0 = System.nanoTime()
    val (_, pqProbeSingleBytes, _) = bytesReadDuring {
      graft.operators.Similarity.pqTopkFromIndex(spark, Sf1, s"$smRoot/pone").collect()
    }
    val pqProbeSingleSec = (System.nanoTime() - tps0) / 1e9
    // PQ compaction payoff (stream_pq_index_compact's pricing row): fold
    // the 32-batch layout + the ≡ 5 mod 17 takedown into the batch-free
    // cluster layout and probe again — index bytes only, vectors never
    // re-read
    val tpqc0 = System.nanoTime()
    graft.operators.Similarity.compactPqIndex(spark, s"$smRoot/pidx",
      sf1emb.filter(pmod(col("vec_id"), lit(17)) === lit(5)).select(col("vec_id")),
      s"$smRoot/pidx_compact")
    val pqCompactStreamSec = (System.nanoTime() - tpqc0) / 1e9
    val pqCompactStreamBytes = diskBytes(s"$smRoot/pidx_compact/codes")
    spark.catalog.clearCache()
    val tpqcq0 = System.nanoTime()
    val (_, pqProbeCompactBytes, _) = bytesReadDuring {
      graft.operators.Similarity.pqTopkFromIndex(spark, Sf1, s"$smRoot/pidx_compact").collect()
    }
    val pqProbeCompactSec = (System.nanoTime() - tpqcq0) / 1e9
    graft.operators.Dedup.unpersistIntermediates(spark)
    val pqBatchMean = pqBatchSecs.sum / B
    System.err.println(
      f"[rehearsal] stream_maint pq: codebooks ${fmt(pqCodebookSec)}s, $B batches per-batch ${fmt(pqBatchMean)}s mean " +
      f"(min ${fmt(pqBatchSecs.min)} max ${fmt(pqBatchSecs.max)}), codes ${pqBatchedCodesBytes / 1048576}%d MiB; " +
      f"probe batched ${fmt(pqProbeBatchedSec)}s/${pqProbeBatchedBytes / 1024}%d KiB " +
      f"vs single-set ${fmt(pqProbeSingleSec)}s/${pqProbeSingleBytes / 1024}%d KiB; " +
      f"compact ${fmt(pqCompactStreamSec)}s (${pqCompactStreamBytes / 1048576}%d MiB rewritten), " +
      f"probe_compacted ${fmt(pqProbeCompactSec)}s/${pqProbeCompactBytes / 1024}%d KiB")
    graft.util.Fs.deleteRecursively(java.nio.file.Paths.get(smRoot))

    val qjson = rows.map { case (n, s01, r01, s1, r1, ratio) =>
      s""""$n":{"sf01_sec":${fmt(s01)},"sf01_rows":$r01,"sf1_sec":${fmt(s1)},"sf1_rows":$r1,"ratio":${fmt(ratio)}}"""
    }.mkString("{", ",", "}")
    val cjson = cand.map { case (g, c01, c1) =>
      s""""$g":{"sf01":$c01,"sf1":$c1}"""
    }.mkString("{", ",", "}")
    val sjson = s""""stream_neardup_state":{"sf01":{"sec":${fmt(ss01)},"hits":$sn01,"state_rows":$sr01,"state_bytes":$sb01},"sf1":{"sec":${fmt(ss1)},"hits":$sn1,"state_rows":$sr1,"state_bytes":$sb1}}"""
    val djson = day2Rows.map { case (l, sec, n, bytes, shufBytes) =>
      s""""$l":{"sec":${fmt(sec)},"rows":$n,"bytes_read":$bytes,"shuffle_bytes":$shufBytes}"""
    }.mkString(
      s""""day2_index":{"build_sec":${fmt(buildSec)},"bands_bytes":$bandsBytes,"sets_bytes":$setsBytes,"docs_scan_bytes":$docsScanBytes,"runs":{""",
      ",", "}}")
    val scrubJson = s""""scrub_full":{"sf01":{"sec":${fmt(scr01)},"removed":$rem01},"sf1":{"sec":${fmt(scr1)},"removed":$rem1}}"""
    val pqAppendJson = pqAppends.map { case (l, sec, bytes) =>
      s""""$l":{"sec":${fmt(sec)},"bytes_read":$bytes}"""
    }.mkString(",")
    val pqJson =
      s""""pq_day2":{"build_sec":${fmt(pqBuildSec)},"codes_bytes":$pqCodesBytes,"emb_scan_bytes":$embScanBytes,$pqAppendJson,"compact":{"sec":${fmt(pqCompactSec)},"bytes_read":$pqCompactBytes},"probe_query":{"sec":${fmt(pqProbeSec)},"bytes_read":$pqProbeBytes}}"""
    val ccJson =
      s""""cc_day2":{"cold_sec":${fmt(ccColdSec)},"day2_only_sec":${fmt(ccDay2Sec)},"rows":$ccN2,"bytes_read":$ccDay2Bytes,"shuffle_bytes":$ccDay2Shuf}"""
    val bm25Json =
      s""""bm25_day2":{"build_sec":${fmt(txtBuildSec)},"index_bytes":$txtIdxBytes,"append_sec":${fmt(txtAppendSec)},"probe":{"sec":${fmt(txtProbeSec)},"bytes_read":$txtProbeBytes},"corpus_one_shot":{"sec":${fmt(txtCorpusSec)},"bytes_read":$txtCorpusBytes},"compact_sec":${fmt(txtCompactSec)},"compact_bytes":$txtCompactBytes,"probe_compacted":{"sec":${fmt(txtProbe2Sec)},"bytes_read":$txtProbe2Bytes}}"""
    val nbJson =
      s""""nb_model":{"train_sec":${fmt(nbTrainSec)},"train_bytes":$nbTrainBytes,"model_bytes":$nbModelBytes,"score_batch":{"sec":${fmt(nbScoreSec)},"rows":$nbBatchRows,"bytes_read":$nbScoreBytes},"in_query":{"sec":${fmt(nbFullSec)},"rows":$nbFullRows,"bytes_read":$nbFullBytes}}"""
    val plJson =
      s""""pipeline_state":{"sf1":{"sec":${fmt(plSec)},"kept":$plKept,"state_rows":$plRows,"state_bytes":$plBytes,"unfiltered_state_rows":$sr1}}"""
    val probeCurveJson = probeCurve.map { case (k, s, b) =>
      s"""{"dirs":$k,"sec":${fmt(s)},"bytes_read":$b}"""
    }.mkString("[", ",", "]")
    val smJson =
      s""""stream_maint":{"batches":$B,""" +
      s""""text":{"batch_sec_mean":${fmt(txtBatchMean)},"batch_sec_min":${fmt(txtBatchSecs.min)},"batch_sec_max":${fmt(txtBatchSecs.max)},"union_index_bytes":$txtIdxUnionBytes,"probe_curve":$probeCurveJson,"compact":{"sec":${fmt(smCompactSec)},"bytes_rewritten":$smCompactBytes},"probe_compacted":{"sec":${fmt(smProbeCompSec)},"bytes_read":$smProbeCompBytes}},""" +
      s""""pq":{"codebook_sec":${fmt(pqCodebookSec)},"batch_sec_mean":${fmt(pqBatchMean)},"batch_sec_min":${fmt(pqBatchSecs.min)},"batch_sec_max":${fmt(pqBatchSecs.max)},"codes_bytes":$pqBatchedCodesBytes,"probe_batched":{"sec":${fmt(pqProbeBatchedSec)},"bytes_read":$pqProbeBatchedBytes},"probe_single_set":{"sec":${fmt(pqProbeSingleSec)},"bytes_read":$pqProbeSingleBytes},"compact":{"sec":${fmt(pqCompactStreamSec)},"bytes_rewritten":$pqCompactStreamBytes},"probe_compacted":{"sec":${fmt(pqProbeCompactSec)},"bytes_read":$pqProbeCompactBytes}}}"""
    val json = s"""{"metric":"scale_rehearsal","n_vectors":{"sf01":$n01,"sf1":$n1},"queries":$qjson,"lsh_candidates":$cjson,"ngram_maxdf200_sf1":{"rows":$ngramScaled,"sec":${fmt(ngramScaledSec)}},$scrubJson,$sjson,$djson,$ccJson,$pqJson,$bm25Json,$nbJson,$plJson,$smJson}"""
    println(json)
    val out = java.nio.file.Paths.get("target/scale_rehearsal.json")
    java.nio.file.Files.createDirectories(out.getParent)
    java.nio.file.Files.write(out, (json + "\n").getBytes("UTF-8"))
    spark.stop()
  }

  /** The sf1 corpus completeness marker — referenced by Sf10Rehearsal's
    * baseline check, so the name lives in ONE place (an earlier silent
    * v1→v2 bump left the sf10 check pointing at the dead name). */
  private[graft] val Sf1Marker = "_REHEARSAL_OK_V2"

  /** Deterministic 10× generation (idempotent: skips when present). */
  private def ensureSf1(s: SparkSession): Unit = {
    import s.implicits._
    Sf1 = graft.util.Fs.scratchDir(s, "sf1").toString
    // v2 marker: v1 scratch dirs predate the events/lineitem/orders
    // replicas and must regenerate
    val done = java.nio.file.Paths.get(s"$Sf1/$Sf1Marker")
    if (java.nio.file.Files.exists(done)) return
    val reps = s.range(10).withColumnRenamed("id", "replica")

    val docs = s.read.parquet(s"$Sf01/documents.parquet")
    // replica stride = max(id)+1, NOT count(): a sparse or offset id
    // space would make count-based strides collide across replicas and
    // silently corrupt the generated corpus with duplicate ids
    val nDocs = docs.agg(max($"doc_id")).head().getLong(0) + 1L
    docs.crossJoin(broadcast(reps))
      .withColumn("keep",
        $"replica" === 0 ||
          pmod(hash(concat($"doc_id", lit(":"), $"replica")), lit(10)) < 3)
      .withColumn("text",
        when($"keep", $"text")
          .otherwise(concat($"text", lit(" rep"), $"replica")))
      .withColumn("doc_id", $"doc_id" + $"replica" * nDocs)
      .withColumn("n_chars", length($"text").cast("long"))
      .select("doc_id", "text", "lang", "source", "n_chars")
      .repartition(16)
      .write.mode("overwrite").parquet(s"$Sf1/documents.parquet")

    val emb = s.read.parquet(s"$Sf01/embeddings.parquet")
    val nVecs = emb.agg(max($"vec_id")).head().getLong(0) + 1L
    val noisy = emb.crossJoin(broadcast(reps))
      .withColumn("vec_id", $"vec_id" + $"replica" * nVecs)
      .withColumn("embedding",
        when($"replica" === 0, $"embedding").otherwise(
          transform($"embedding", (v, i) =>
            v + (pmod(hash(concat($"vec_id", lit(":"), i)), lit(1001)) - 500)
              .cast("float") / 20000f)))
      .withColumn("nrm",
        sqrt(aggregate($"embedding", lit(0.0d), (a, v) => a + v.cast("double") * v)))
      .withColumn("embedding", transform($"embedding", v => (v / $"nrm").cast("float")))
      .select("vec_id", "embedding", "label")
    noisy.repartition(16).write.mode("overwrite").parquet(s"$Sf1/embeddings.parquet")

    // events ×10: disjoint user populations per replica (id-strided),
    // same time span — the growth shape of a service gaining users, so
    // per-user state (gapfill grids, rolling frames, retention cells)
    // scales in POPULATION while span-driven costs stay fixed
    val ev = s.read.parquet(s"$Sf01/events.parquet")
    val nUsers = ev.agg(max($"user_id")).head().getLong(0) + 1L
    val nEvents = ev.agg(max($"event_id")).head().getLong(0) + 1L
    ev.crossJoin(broadcast(reps))
      .withColumn("user_id", $"user_id" + $"replica" * nUsers)
      .withColumn("event_id", $"event_id" + $"replica" * nEvents)
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .repartition(16)
      .write.mode("overwrite").parquet(s"$Sf1/events.parquet")

    // lineitem/orders ×10: order keys strided, part/supplier keys SHARED
    // — replicated orders re-hit the same parts, so co-purchase support
    // (graph_triangles' edge gate) inflates with volume exactly as a
    // growing order book would; changelog keys stay unique per replica
    // for the CDC family
    val li = s.read.parquet(s"$Sf01/lineitem.parquet")
    val nOrders = li.agg(max($"l_orderkey")).head().getLong(0) + 1L
    li.crossJoin(broadcast(reps))
      .withColumn("l_orderkey", $"l_orderkey" + $"replica" * nOrders)
      .drop("replica")
      .repartition(16)
      .write.mode("overwrite").parquet(s"$Sf1/lineitem.parquet")
    s.read.parquet(s"$Sf01/orders.parquet").crossJoin(broadcast(reps))
      .withColumn("o_orderkey", $"o_orderkey" + $"replica" * nOrders)
      .drop("replica")
      .repartition(16)
      .write.mode("overwrite").parquet(s"$Sf1/orders.parquet")

    java.nio.file.Files.write(done, "ok\n".getBytes("UTF-8"))
  }
}
