package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.{DicomQueries, Relational, StreamQueries}
import graft.operators.{Bpe, Curation, Dedup, Graph, Maintenance, Multimodal, Similarity, TextAnalysis}

/** Driver contract — see SURVEY.md §7 + the builder prompt.
  *
  * `queries` carries one entry per implemented operator from SURVEY.md §2
  * (relational surface delegated-to-Athena in the reference → native Spark
  * SQL here) plus the training-data extensions (dedup / similarity / text).
  * `oracleSql` holds the DuckDB-equivalent SQL for each query; every
  * computed column is aliased identically in both (the driver's compare
  * sorts columns by name before hashing).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Multi-way broadcast join + aggregate — the shape the engine is built
    * around. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q2JoinAgg(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ——— relational surface (SURVEY.md §2.4) ———
    "q1_agg"            -> (Relational.q1Agg _),
    "q2_join_agg"       -> (Relational.q2JoinAgg _),
    "q3_topk"           -> (Relational.q3Topk _),
    "q4_window"         -> (Relational.q4Window _),
    "q5_semi_join"      -> (Relational.q5Semi _),
    "q6_anti_join"      -> (Relational.q6Anti _),
    "q7_rollup"         -> (Relational.q7Rollup _),
    "q8_cube"           -> (Relational.q8Cube _),
    "q9_grouping_sets"  -> (Relational.q9GroupingSets _),
    "q10_set_ops"       -> (Relational.q10SetOps _),
    "q11_distinct_agg"  -> (Relational.q11DistinctAgg _),
    "q12_scalar_fns"    -> (Relational.q12ScalarFns _),
    "q13_word_count"    -> (Relational.q13WordCount _),
    "q14_tumbling_window" -> (Relational.q14Tumbling _),
    "q15_sessionize"    -> (Relational.q15Sessionize _),
    "q16_subquery"      -> (Relational.q16Subquery _),
    "q17_outer_join"    -> (Relational.q17OuterJoin _),
    "q18_percentiles"   -> (Relational.q18Percentiles _),
    "q19_salted_agg"    -> (Relational.q19SaltedAgg _),
    "q20_sketches"      -> (Relational.q20Sketches _),
    "q21_json_fns"      -> (Relational.q21JsonFns _),
    "q22_window_suite"  -> (Relational.q22WindowSuite _),
    "q23_string_fns"    -> (Relational.q23StringFns _),
    "q24_date_fns"      -> (Relational.q24DateFns _),
    "q25_asof_join"     -> (Relational.q25AsofJoin _),
    "q26_pivot"         -> (Relational.q26Pivot _),
    "q27_unpivot"       -> (Relational.q27Unpivot _),
    "q28_range_join"    -> (Relational.q28RangeJoin _),
    "q29_recursive_cte" -> (Relational.q29RecursiveCte _),
    "q30_lateral"       -> (Relational.q30Lateral _),
    "q31_set_ops_all"   -> (Relational.q31SetOpsAll _),
    "q32_filtered_agg"  -> (Relational.q32FilteredAgg _),
    // mergeable DataSketches HLL (daily partials → union) — estimates are
    // implementation-specific → rows-only; SketchBoundsSpec gates the
    // merged estimate against the exact distinct count
    "q33_sketch_union"  -> (Relational.q33SketchUnion _),
    // mergeable Count-Min frequency sketch (per-source partials → lossless
    // union via the CmsUnion UDAF) scoring q19's oracle-gated heavy
    // hitters — rows-only; SketchBoundsSpec checks n ≤ est_n ≤ n + eps·N
    // and merged-equals-single-pass
    "q34_cms_heavy_hitters" -> (Relational.q34CmsHeavyHitters _),
    // mergeable GK quantile partials + union UDAF (order-dependent
    // estimates → rows-only; ε·n rank bound pinned in QuantileSketchSpec)
    "q35_quantile_partials" -> (Relational.q35QuantilePartials _),
    // distributed 2D Pareto frontier: range-partition + per-partition
    // sweep, global pass over the tiny union of local frontiers
    "q36_skyline"       -> (Relational.q36Skyline _),
    // ——— dedup extensions ———
    "dedup_exact"         -> (Dedup.exact _),
    "dedup_minhash_lsh"   -> (Dedup.minhashLsh _),
    // incremental (new-batch-vs-index) near-dup: index×index pairs never
    // generated; oracle = the full pair set restricted to batch-involving
    "dedup_incremental"   -> (Dedup.minhashIncremental _),
    // the same batch-vs-index run fed from a PERSISTED parquet index
    // (write → read → query); hash-gated against the identical oracle,
    // proving persisted-index ≡ recomputed-index
    "dedup_incremental_idx" -> (Dedup.minhashIncrementalFromIndex _),
    // day-2 deletions: retire a slice, compact both index relations,
    // run the incremental batch against the compacted index — oracle =
    // the incremental SQL over a universe excluding the retired docs
    "dedup_index_compact" -> (Dedup.minhashIncrementalCompacted _),
    // day-2 transitive groups: day-1 labels as star edges + fresh
    // batch-involving pairs; must land on the full-recompute answer
    "dedup_components_incremental" -> ((s, d) => Dedup.componentsIncremental(s, d)),
    "dedup_components"    -> ((s, d) => Dedup.components(s, d)),
    // components + per-component keeper by (n_chars DESC, doc_id):
    // the labeling → curated-corpus step, hash-exact keep flags
    "dedup_canonical"     -> ((s, d) => Dedup.canonical(s, d)),
    // which sources dumped the same sites: per-source union-shingle
    // MinHash estimate (8 strings/source) + exact distinct-shingle
    // Jaccard drill-down, both from ONE (source, shingle) exchange
    "dedup_source_overlap" -> ((s, d) => Dedup.sourceOverlap(s, d)),
    // day-2 overlap: yesterday's signatures ⊕ batch signatures via
    // least() must equal the full recompute (min is associative) —
    // the mergeability that makes source signatures a standing table
    "dedup_source_overlap_incremental" -> ((s, d) => Dedup.sourceOverlapIncremental(s, d)),
    // soft dedup: survive with p = 1/group_size via the integer md5
    // ladder — one expected copy per component, diversity preserved
    "dedup_soft"          -> ((s, d) => Dedup.softDedup(s, d)),
    // content-defined chunking (FastCDC lineage): boundaries from an
    // 8-bit local hash gate — insertions re-chunk ONE chunk; single
    // chunk-hash exchange annotates corpus-wide occurrence counts
    "dedup_cdc_chunks"    -> ((s, d) => Dedup.cdcChunks(s, d)),
    "dedup_simhash"       -> (Dedup.simhash _),
    "dedup_simhash_pairs" -> (Dedup.simhashPairs _),
    "dedup_ngram_jaccard" -> (Dedup.ngramJaccard _),
    // LOSSLESS prefix-filtered similarity join (PPJoin family): no df
    // cap, no recall dial — candidates provably superset at τ=4/5, all
    // thresholds integer; oracle is the naive pairwise Jaccard
    "dedup_jaccard_prefix" -> (Dedup.jaccardPrefix _),
    // pre-flight for the rare-gram df cap: candidate volume per df value
    // in closed form (n_grams × C(df,2)) — no pair generated; the sf10
    // rehearsal's 36 GB cap-2000 spill is answered by this relation in
    // seconds (BENCH_NOTES round 7)
    "dedup_ngram_df_hist" -> (Dedup.ngramDfHist _),
    // edit-distance ≤ 1 name join via symmetric-delete signatures —
    // proven candidate superset (no recall dial), exact levenshtein
    // verify; candidates output-bound (Σ signature-df²), never |n|²
    "dedup_edit_join"     -> (Dedup.editJoin _),
    // asymmetric containment join (excerpt detection): a's rare-first
    // prefix probes b's full token relation; thresholds integer
    "dedup_containment"   -> (Dedup.containment _),
    // span-level exact substring dedup: maximal ≥5-token word spans
    // shared across documents (gram-df gate → gaps-and-islands merge)
    "dedup_substring"     -> ((s, d) => Dedup.substringSpans(s, d)),
    // the removal form: every token under a cross-doc duplicated window
    // cut, text re-joined — a drop-in replacement corpus
    "dedup_substring_scrub" -> ((s, d) => Dedup.substringScrub(s, d)),
    "dedup_embed_cosine"  -> (Dedup.embedCosine _),
    "corpus_clean"        -> (Dedup.corpusClean _),
    // the DICOM funnel's stage order (normalize → exact → near-dup →
    // quality) hash-gated on the documents table, attrition-accounted
    // per doc — certifies the binary-sourced funnel's COMPOSITION, not
    // just its stages
    "corpus_funnel_accounting" -> (Dedup.corpusFunnelAccounting _),
    // day-2 twin of the accounting oracle (the 175th): the INCREMENTAL
    // funnel composition the dicom delta twins run — hash semi-join +
    // incrementalPairs under the bloom prune — hash-gated against the
    // FULL arrival-ordered recompute restricted to the delta docs
    "corpus_funnel_accounting_delta" -> (Dedup.corpusFunnelAccountingDelta _),
    // RefinedWeb-style repeated-segment (boilerplate "line") removal:
    // df-gated aligned segments, order-preserving reassembly
    "dedup_lines"         -> ((s, d) => Dedup.lineDedup(s, d)),
    // ——— dataset curation ———
    "corpus_split"         -> (Curation.split _),
    // the dedup-aware twin: hash ladder keys on the duplicate COMPONENT,
    // so a near-dup cluster can never straddle train/test
    "corpus_split_leakage_safe" -> (Curation.splitLeakageSafe _),
    "corpus_sample_strat"  -> (Curation.sampleStratified _),
    // exact-k cap per (lang, source) via hashed-rank window; the
    // WindowGroupLimit map-side prune is the 100 TB shape (plan-pinned)
    "corpus_group_cap"     -> ((s, d) => Curation.groupCap(s, d)),
    "corpus_pack"          -> ((s, d) => Curation.pack(s, d)),
    "corpus_contamination" -> (Curation.contamination _),
    // the semantic twin: nearest-TRAIN cosine per held-out eval vector,
    // benchmark broadcast, corpus never shuffles, map-side argmax
    "corpus_contamination_semantic" -> ((s, d) => Similarity.semanticContamination(s, d)),
    "corpus_mix"           -> (Curation.mix _),
    // temperature-2 language flattening: rate = min(1, sqrt(N/(L·n_l)))
    // from exact-rounded IEEE ops only — engine-portable by construction
    "corpus_mix_temperature" -> (Curation.mixTemperature _),
    // Efraimidis-Spirakis weighted reservoir, octave-quantized weights so
    // u^(1/w) is an iterated CORRECTLY-ROUNDED sqrt — bit-portable keys
    "corpus_sample_weighted" -> (Curation.sampleWeighted _),
    // DSIR importance selection: hashed-unigram log-likelihood ratio vs
    // the target slice, broadcast 512-row weight table, exact top-20%
    // keep via histogram-binned distributed top-k (no global window)
    "corpus_dsir"          -> ((s, d) => Curation.dsirSelect(s, d)),
    // loader-side length-bucketed batching with per-batch padding
    // accounting; global order position via per-length offsets +
    // partitioned windows — no single-partition rank
    "corpus_length_buckets" -> ((s, d) => Curation.lengthBuckets(s, d)),
    // model-based quality filter: multinomial NB trained in-query on
    // weak rule labels (even-doc_id half), scored corpus-wide through
    // a vocab-sized integer weight relation; held-out half measures
    // generalization
    "corpus_quality_classifier" -> (Curation.nbQualityClassifier _),
    "corpus_nb_day2"     -> (Curation.nbModelDay2 _),
    "stream_corpus_nb_refresh" -> (StreamQueries.streamCorpusNbRefresh _),
    // live search-index maintenance: per-micro-batch posting appends
    // (disjoint doc_ids ⇒ disjoint rows), post-drain phrase probe over
    // the unioned file sets shares text_search's full-corpus oracle
    "stream_text_index_refresh" -> (StreamQueries.streamTextIndexRefresh _),
    // compaction composed into the streamed lifecycle: the accumulated
    // per-batch posting dirs + a takedown fold into ONE file set via the
    // oracle-gated union compaction; probe shares text_search_compact's
    // survivor oracle — closes the unbounded-batch-dir growth gap
    "stream_text_index_compact" -> (StreamQueries.streamTextIndexCompact _),
    // streaming ANN-index maintenance: frozen day-0 codebooks, per-batch
    // encode + batchId-keyed code append; the probe-all/rerank-all probe
    // is definitionally exact, so the brute oracle gates the lifecycle
    "stream_pq_index_refresh" -> (StreamQueries.streamPqIndexRefresh _),
    // the vector twin of stream_text_index_compact: fold the accrued
    // batch=<id> code partitions + a takedown through the day-2
    // compaction into the batch-free cluster layout; probe-all over the
    // compacted index is exact, so brute-over-survivors gates it
    "stream_pq_index_compact" -> (StreamQueries.streamPqIndexCompact _),
    // writer-side layout: md5-bucketed shards with contiguous
    // within-shard positions in hash-shuffled order (one exchange)
    "corpus_shard"         -> ((s, d) => Curation.shard(s, d)),
    // seeded global permutation with CONTIGUOUS positions via range
    // exchange + zipWithIndex — never a single-partition window
    "corpus_shuffle"       -> ((s, d) => Curation.shuffleOrder(s, d)),
    // proportional-stride source interleave (low-discrepancy midpoint
    // keys): any stream prefix holds each source near its proportion
    "corpus_interleave"    -> (Curation.interleave _),
    // per-source fractional-epoch upsampling: floor(e) copies + one
    // hash-selected extra for the fractional share
    "corpus_epochs"        -> (Curation.epochs _),
    // ——— table maintenance ———
    // latest-wins changelog apply (MERGE without the table format):
    // one changelog exchange (window + join share the key partitioning)
    "cdc_merge"            -> (Maintenance.cdcMerge _),
    // SCD Type-2 history: every version + validity interval from the
    // same changelog, one key window; WHERE is_current=1 ≡ cdc_merge
    "cdc_scd2"             -> (Maintenance.cdcScd2 _),
    // incremental MV refresh: checkpointed day-1 partials ⊕ delta
    // partials ≡ full recompute (the oracle IS the recompute) — all
    // stored measures integer-mergeable, ratios derived at read time
    "mv_incremental"       -> (Maintenance.mvIncremental _),
    // hourly grid + forward fill per user: one user_id exchange feeds
    // agg, grid explode, join and the running-fill window
    "events_gapfill"       -> (Maintenance.eventsGapfill _),
    // ANALYZE-style long-format column profile: one scan, stack(),
    // per-value partial-agg exchange, value-level rollup + top-1
    "table_profile"        -> (Maintenance.tableProfile _),
    // keyed snapshot diff (added/removed/updated audit): one
    // co-partitioned full-outer SMJ, narrow classify, unchanged filtered
    "table_diff"           -> (Maintenance.tableDiff _),
    // ordered-step funnel: three stacked conditional window minima on
    // one user_id exchange — no self-joins
    "events_funnel"        -> (Relational.eventsFunnel _),
    // median/MAD robust outlier flags per event type: exact index-based
    // order statistics (no interpolation) so the gate is ulp-free; the
    // GK-sketch family (q35) is the 100 TB route this anchors
    "events_outliers"      -> (Relational.eventsOutliers _),
    // first-order Markov transition matrix: one user_id exchange for the
    // lead() window, denominators on the types²-sized pair relation
    "events_transitions"   -> (Relational.eventsTransitions _),
    // time-weighted average value per user: integer cent·second sums
    // (float Σ v·Δt is order-sensitive, never hash-portable)
    "events_twap"          -> (Relational.eventsTwap _),
    // interval-union active time per user: gaps-and-islands on one
    // user_id exchange, epoch-ns integers end to end
    "events_active_time"   -> (Relational.eventsActiveTime _),
    // growth accounting: first-seen day per user, running total on the
    // days-sized relation
    "events_cumulative_users" -> (Relational.eventsCumulativeUsers _),
    // RFM segmentation with deterministic ntile cuts; exact anchor of
    // the q35 sketch route (the eventsOutliers split)
    "events_rfm"           -> (Relational.eventsRfm _),
    // 24h rolling count/cent-sum per user: one sort, one Window, both
    // features share the RANGE frame; integer sums only (sliding double
    // sums ulp-diverge between engines)
    "events_rolling"       -> (Relational.eventsRolling _),
    // first-event-week cohorts × distinct active users per offset week
    "events_retention"     -> (Relational.eventsRetention _),
    // last-touch attribution: conversions credited to the most recent
    // preceding non-purchase touch (last-non-null carry over one
    // user_id exchange); revenue in order-exact integer cents
    "events_attribution"   -> (Relational.eventsAttribution _),
    // Morton-code zone map: per-cell min/max envelopes showing the
    // 2-D skipping a Z-ordered rewrite buys (write path in zorderWrite;
    // measured pruning in ZorderSpec)
    "layout_zorder"        -> (Maintenance.zorderMap _),
    // ——— similarity search ———
    "sim_topk_brute"      -> (Similarity.topkBrute _),
    // MMR-diversified retrieval: brute top-30 shortlist (the topkBrute
    // scan), then a greedy integer argmax 7·relq − 3·maxsimq over the
    // collected shortlist (≤ dial rows — the rerank convention); the
    // oracle replays all 10 selections as generated MATERIALIZED CTEs
    "sim_mmr_diversify"   -> ((s, d) => Similarity.mmrDiversify(s, d)),
    // FAISS-style range_search: every corpus vector at cosine ≥ τ of
    // each probe (10% probe set) — probe batch broadcasts, corpus scans
    // once; exact, so hash-gated
    "sim_range_search"    -> ((s, d) => Similarity.rangeSearch(s, d)),
    // filtered vector search: top-k cosine restricted to neighbors
    // sharing the query's label — filter BEFORE rank (exact under
    // selective predicates, where post-filtered ANN under-fills);
    // broadcast query batch, one corpus scan, WindowGroupLimit top-k
    "sim_ann_filtered"    -> ((s, d) => Similarity.annFiltered(s, d)),
    // hash-exact LEARNED clustering: quantized-integer k-means whose
    // seeding + unrolled Lloyd rounds replay as generated CTEs in the
    // oracle — any trainer drift hash-fails; fixed gate geometry (k=4),
    // the corpus-scalable k ∝ n path stays dedup_semantic_kmeans
    "dedup_semantic_kmeans_exact" -> (Similarity.semanticDedupKmeansExact _),
    "sim_ann_lsh"         -> (Similarity.annLsh _),
    "sim_ivf_topk"        -> (Similarity.ivfTopk _),
    "sim_ivf_probe2"      -> (Similarity.ivfProbe2 _),
    // learned-quantizer IVF: Lloyd's k-means coarse quantizer (rows-only —
    // the fixed-iteration training loop is not SQL-expressible in DuckDB;
    // SimilarityRecallSpec pins recall@10 >= the per-label probe-2 path)
    "sim_ivf_kmeans"      -> ((s, d) => Similarity.ivfKmeansTopk(s, d)),
    // IVF-PQ: learned coarse lists + product-quantized codes scored by
    // the codegen'd ADC expression, exact re-rank of the shortlist
    // (k-means training → rows-only; recall ladder + rerank-all ≡ exact
    // identity pinned in SimilarityRecallSpec)
    "sim_ivf_pq"          -> ((s, d) => Similarity.ivfPqTopk(s, d)),
    // the geometry-driven probe rule as a hash-gated dial sheet: one row
    // per simulated corpus decade (n = count << 0..20, spanning the
    // probe-everything regime AND the avgList ≫ rerank branch a 100 TB
    // deployment runs), the dial computed by the SHIPPED Scala rule via
    // UDF so its exact integer arithmetic sits under the cross-engine
    // gate; probed_vectors = nprobe·avg_list is each point's scan bound
    "sim_auto_nprobe_dial" -> (Similarity.autoNprobeDial _),
    "sim_pq_exact"        -> (Similarity.pqExact _),
    "sim_mmr_pq"          -> ((s, d) => Similarity.mmrDiversifyPqExact(s, d)),
    "sim_ivf_exact"       -> (Similarity.ivfExact _),
    // persisted-PQ-index twin (build + write + read in one run, like
    // dedup_incremental_idx): codes partitioned by coarse list so probe
    // filters prune whole directories; persisted ≡ recomputed pinned
    "sim_pq_index"        -> (Similarity.pqTopkViaIndex _),
    // day-2 vector-index maintenance: append a batch encoded with the
    // FROZEN day-1 codebooks, retire a takedown slice, compact, query —
    // batch-/index-bytes per step, never a corpus re-encode; step
    // equivalences pinned in PqIndexDay2Spec (rows-gated: learned
    // codebooks have no SQL replay, same justification as sim_pq_index)
    "sim_pq_index_day2"   -> (Similarity.pqDay2ViaIndex _),
    // day-N codebook retrain/re-encode/swap through the versioned root:
    // the sidecar drifts (appends encoded in a pre-growth coordinate
    // system), the scheduled migration retrains on the grown corpus,
    // re-encodes into v2 and swaps CURRENT atomically; the probe-all/
    // rerank-all probe is definitionally exact → brute oracle gates it
    "sim_pq_index_retrain" -> (Similarity.pqIndexRetrain _),
    // one-pass fixed-state second-moment partials vs DuckDB's naive
    // quadratic definition — the partial-aggregation path is hash-gated
    "sim_gram_matrix"     -> (Similarity.gramMatrix _),
    // PCA projection onto top-4 components (deterministic power
    // iteration on the driver-assembled covariance; training loop not
    // SQL-expressible → rows-only; PcaSpec pins the math)
    "sim_pca_project"     -> ((s, d) => Similarity.pcaProject(s, d)),
    "dedup_embed_lsh"     -> (Similarity.embedLshNearDup _),
    "dedup_semantic"      -> (Similarity.semanticDedup _),
    // learned-cluster variant (k-means assignment; training loop not
    // SQL-expressible → rows-only; SemanticDedupSpec pins the keep-set
    // invariant and determinism)
    // HASH-GATED learned k ∝ n variant: integer-exact trainer at the
    // corpus-derived k (shared derivedSemanticK rule; oracle replays
    // seeding as a recursive CTE). The float trainer
    // (semanticDedupKmeans) stays the spec-pinned FP arm.
    "dedup_semantic_kmeans" -> ((s, d) =>
      Similarity.semanticDedupKmeansDerived(requireSemanticOracleDefaults(s, d), d)),
    "sim_knn_join"        -> ((s, d) => Similarity.knnJoin(s, d)),
    "sim_label_centroids" -> (Similarity.labelCentroids _),
    // typed-UDAF (Aggregator) twin of the explode-based centroids —
    // single-buffer vector mean, shares the same oracle values
    "sim_centroids_udaf"  -> (Similarity.labelCentroidsUdaf _),
    // ——— text analysis ———
    "text_langid"      -> (TextAnalysis.langid _),
    "text_quality"     -> (TextAnalysis.quality _),
    "text_tokens"      -> (TextAnalysis.tokens _),
    "text_fingerprint" -> (TextAnalysis.fingerprint _),
    "text_scrub"       -> (TextAnalysis.scrub _),
    "text_normalize"   -> (TextAnalysis.normalize _),
    "text_repetition"  -> (TextAnalysis.repetition _),
    // sliding context-window splitter: L=64-token windows at stride 48,
    // integer chunk arithmetic, zero-shuffle narrow pass
    "text_chunk"       -> ((s, d) => TextAnalysis.chunk(s, d)),
    // phrase search through the PERSISTED positional index: pushed
    // word-IN filter on the index scan, corpus never touched at query
    // time, adjacency verified on position lists
    "text_search"      -> ((s, d) => TextAnalysis.search(s, d)),
    // day-2 index append: yesterday's postings are a standing artifact,
    // the batch writes only its own posting files (disjoint doc_ids ⇒
    // an append never touches day-1 bytes), the probe reads the union;
    // the full-corpus oracle certifies append ≡ rebuild
    "text_search_day2" -> ((s, d) => TextAnalysis.searchDay2(s, d)),
    "text_search_compact" -> ((s, d) => TextAnalysis.searchCompact(s, d)),
    // BM25 ranked retrieval: per-(doc,term) contribution quantized to an
    // integer at 1e6 before the per-doc sum (exact cross-engine rank),
    // top-N via TakeOrderedAndProject — no global window over candidates
    "text_search_bm25" -> ((s, d) => TextAnalysis.bm25(s, d)),
    "text_search_bm25_compact" -> ((s, d) => TextAnalysis.bm25Compact(s, d)),
    // day-2 BM25 through the persisted positional index + doc-length
    // sidecar: tf = len(positions) off the pruned posting scan, dl off
    // the sidecar — no corpus re-tokenize; the full-corpus oracle
    // certifies index ≡ corpus and append ≡ rebuild at once
    "text_search_bm25_day2" -> ((s, d) => TextAnalysis.bm25Day2(s, d)),
    // hybrid RRF: BM25 arm + cosine arm, fused with integer
    // floor(1e6/(60+rank)) per arm on a full-outer join of two
    // top-100 relations; 0-rank sentinel marks a missing arm
    "text_search_hybrid" -> ((s, d) => TextAnalysis.hybridSearch(s, d)),
    // hybrid with the dense arm = the integer-exact PQ twin's ADC
    // ranking: the fuse-BM25-with-a-PQ-index composition hash-gated
    // end-to-end (the sim_mmr_pq twin-CTE recipe applied to retrieval)
    "text_search_hybrid_pq" -> ((s, d) => TextAnalysis.hybridSearchPqExact(s, d)),
    // per-source tokens~chars least-squares fit (slope/intercept/R²):
    // closed-form regr_* aggregates, 5 doubles per source cross the wire
    "text_quality_regression" -> (TextAnalysis.qualityRegression _),
    // per-doc top-3 tf-idf terms; ranked by the integer (tf, df, term)
    // triple so rank order can never flip on a libm ulp
    "text_tfidf_topk"  -> ((s, d) => TextAnalysis.tfidfTopK(s, d)),
    // perplexity-proxy: mean −ln p(word) under the corpus unigram LM
    "text_surprisal"   -> (TextAnalysis.unigramSurprisal _),
    // CCNet-style bigram-LM scoring: add-one-smoothed LM trained on the
    // `en` slice, every doc scored by mean bigram log-prob; the LM is a
    // distributed relation joined on the bigram key, never collected
    "text_lm_score"    -> ((s, d) => TextAnalysis.lmScore(s, d)),
    // EXACT top-20 frequent words: Misra-Gries pass (O(m) mergeable
    // state, token stream never shuffles) + exact recount of the ≤ m
    // candidates, certificate-checked (kth count > summary err)
    "text_heavy_hitters" -> ((s, d) => TextAnalysis.heavyHitters(s, d)),
    // five-rule first-fail filter cascade with per-stage attrition
    "corpus_quality_funnel" -> (Curation.qualityFunnel _),
    // word → (df, tf, bounded posting list); the cap rides
    // WindowGroupLimit so stopword postings never exceed cap map-side
    "text_inverted_index" -> ((s, d) => TextAnalysis.invertedIndex(s, d)),
    // BPE tokenizer training on the word-freq dictionary (corpus touched
    // once; K vocab-sized rounds). Round-k input depends on k-1 prior
    // argmaxes → rows-only; BpeSpec pins reference-impl parity
    "text_bpe_learn"      -> ((s, d) => Bpe.learn(s, d)),
    // serving half of the tokenizer: distinct words encoded once with
    // the learned merges, corpus pays a vocab join; integer counts only
    // (rows-only like learn — the merge table is data-dependent;
    // BpeSpec pins train→encode parity vs the independent reference)
    "text_bpe_encode"     -> ((s, d) => Bpe.encode(s, d)),
    // 5-iteration weighted PageRank in 64-bit fixed-point (float Σ is
    // summation-order-sensitive → never hash-portable; integer div is)
    "graph_pagerank"      -> ((s, d) => Graph.pagerank(s, d)),
    // personalized PageRank: restart mass on the ASIA seed set only —
    // the seed-local importance primitive; same integer fixed-point and
    // per-round edge⋈node-sized-rank shape as the global variant
    "graph_ppr"           -> ((s, d) => Graph.ppr(s, d)),
    // per-node triangle counts on the ≥2-support co-purchase graph:
    // degree-oriented wedge join (Σ outdeg² ≤ O(|E|^1.5) regardless of
    // skew); orientation never changes the triangle set
    "graph_triangles"     -> (Graph.triangles _),
    // 4-round synchronous LPA communities; per-node argmax as an order
    // embedding into one BIGINT (no ranking window), all-integer rounds
    "graph_lpa"           -> ((s, d) => Graph.lpa(s, d)),
    // 3-core peeling, fixed rounds + fixpoint-or-throw; converged rounds
    // are idempotent, which lets a fixed-depth oracle gate a fixpoint
    "graph_kcore"         -> ((s, d) => Graph.kcore(s, d)),
    // neighbor-Jaccard per edge (link-prediction feature): common
    // neighbors counted only for existing edges, integer union
    "graph_node_sim"      -> (Graph.nodeSim _),
    // multi-source BFS hop distances, K fixed rounds of node-sized
    // min-merge state against the cached edges
    "graph_bfs"           -> (Graph.bfs _),
    // ——— DICOM pipeline (SURVEY §2.1-2.3; fixture-driven, rows-only) ———
    "dicom_extract_flat"   -> (DicomQueries.extractFlat _),
    // the two halves composed: binary ingest → extracted metadata →
    // normalize → exact dedup → quality gate, attrition-accounted per
    // doc (rows-only: binary fixture source, same justification as
    // every dicom_* entry; stage expressions are the oracle-gated ones)
    "dicom_corpus_funnel"  -> (DicomQueries.corpusFunnel _),
    // day-2 funnel: manifest-delta extraction only, docs deduped
    // against the standing sink (hash semi-join + incremental minhash);
    // incremental ≡ arrival-ordered recompute pinned in DicomPipelineSpec
    "dicom_corpus_funnel_delta" -> (DicomQueries.corpusFunnelDelta _),
    // the morning-job twin (VERDICT r13 #1): the delta funnels against
    // yesterday's PERSISTED hash relation + band/set index — standing
    // corpus extracted once per process (day-1), steady-state cost is
    // delta extraction + hash semi-join + index probe; ≡ the recomputing
    // delta entry row-for-row (DicomPipelineSpec)
    "dicom_corpus_funnel_delta_idx" -> (DicomQueries.corpusFunnelDeltaIdx _),
    // listing-free twin: routing + content reads driven by a (path,
    // length) manifest — the 10M+-object entry point (ManifestSpec pins
    // rows+errors parity with the listed route)
    "dicom_manifest_extract" -> (DicomQueries.manifestExtract _),
    // day-2 incremental: extract ONLY the new/changed manifest subset
    // (anti-join vs the processed log); parity + cost ∝ delta pinned in
    // ManifestSpec and ExtractionRehearsal
    "dicom_manifest_delta" -> (DicomQueries.manifestDelta _),
    "dicom_errors"         -> (DicomQueries.errors _),
    "dicom_partitioned_sql" -> (DicomQueries.partitionedSql _),
    "dicom_crawl_schema"   -> (DicomQueries.crawlSchema _),
    "dicom_source_sql"     -> (DicomQueries.sourceSql _),
    // non-parquet corpus ingestion: stage-once text copies read back
    // with explicit schemas; the digest oracle gates escape/round-trip
    "source_jsonl"         -> (graft.sources.DocumentSources.jsonlRoundtrip _),
    "source_csv"           -> (graft.sources.DocumentSources.csvRoundtrip _),
    "dicom_parse_da_fn"    -> (DicomQueries.parseDaFn _),
    "dicom_parse_pn_fn"    -> (DicomQueries.parsePnFn _),
    "dicom_stream_ingest"  -> (StreamQueries.streamIngest _),
    // the live twin of dicom_corpus_funnel: per-object micro-batch
    // extraction into the checkpointed sink, then the same curation
    // funnel over the sink relation (streamed ≡ batch, spec-pinned)
    "stream_dicom_corpus_funnel" -> (StreamQueries.streamCorpusFunnel _),
    // day-2 symmetry: ONLY delta objects drain through the per-object
    // stream; the incremental funnel runs vs the standing batch relation
    // (streamed ≡ batch delta, spec-pinned)
    "stream_dicom_corpus_funnel_delta" -> (StreamQueries.streamCorpusFunnelDelta _),
    "stream_events_window" -> (StreamQueries.streamEventsWindow _),
    "stream_sessionize"    -> (StreamQueries.streamSessionize _),
    // engine-native session_window twin of the custom sessionizer
    // (gap = 30 min + 1 µs so half-open window ends match the
    // strictly-greater gap rule); oracle-gated at µs grain
    "stream_session_window" -> (StreamQueries.streamSessionWindow _),
    "stream_dedup"         -> (StreamQueries.streamDedup _),
    "stream_dedup_watermarked" -> (StreamQueries.streamDedupWatermarked _),
    // streaming NEAR-dup (MinHash-LSH bucket state): each doc reports the
    // min lower id sharing an LSH bucket — same band SQL as the batch
    // minhash family in the oracle
    "stream_neardup_filter" -> (StreamQueries.streamNearDup _),
    // day-2 warm start: the persisted writeIndex band relation becomes
    // the streaming bucket store's INITIAL STATE (frozen day-1 owners);
    // stream docs dedup against yesterday's corpus without replaying it
    "stream_neardup_indexed" -> (StreamQueries.streamNearDupIndexed _),
    // vector-stream near-dup: hyperplane-LSH bucket owners verified by
    // exact cosine ≥ 0.3 (the edit-dup owner-check pattern); state
    // bounded by the GEOMETRY (≤ tables × 2^bits keys), not the corpus
    "stream_embed_neardup" -> (StreamQueries.streamEmbedNearDup _),
    // streaming corpus curation: the C4-style quality + langid gate as a
    // STATELESS append stage (no state store, no watermark) reusing the
    // batch operators' expressions — the ingest-side filter in front of
    // the stateful streaming dedup family
    "stream_corpus_quality_gate" -> (StreamQueries.streamCorpusQualityGate _),
    // train offline / score online: the persisted capped NB model ships
    // to every task as a literal map; stateless per-row integer fold
    "stream_corpus_nb_score" -> (StreamQueries.streamCorpusNbScore _),
    // the three curation tiers composed in ONE continuous query:
    // stateless gate → stateless persisted-model scoring → stateful
    // near-dup ownership over the survivors; upstream filters bound
    // the bucket store to accepted content, and one oracle hash gates
    // all three stages and their composition order
    "stream_corpus_pipeline" -> (StreamQueries.streamCorpusPipeline _),
    // online symmetric-delete edit-distance filter: one (owner id, owner
    // name) per live signature, exact Levenshtein check against the
    // owner; the owner-check contract has a closed-form SQL oracle
    "stream_editdup_filter" -> (StreamQueries.streamEditDup _),
    // TTL twin of the edit-dup filter: owners expire horizon-of-event-
    // time after their newest carrier (absolute state bound — closes the
    // r7 PLANS caveat that NoTimeout keys never expire); drain horizon
    // outlives the corpus so it shares the NoTimeout oracle verbatim
    "stream_editdup_ttl" -> (StreamQueries.streamEditDupTtl _),
    // LEFT OUTER stream-stream join: null emission gated on watermark
    // state closure — the closed-form oracle states the emission rule
    "stream_stream_outer"  -> (StreamQueries.streamStreamOuter _),
    // the TTL twin: bucket state expires horizon-of-event-time after its
    // newest member (absolute state bound); the drain horizon exceeds the
    // corpus span so the gate result — and oracle — match the NoTimeout
    // filter exactly; re-admission semantics pinned in NearDupStreamSpec
    "stream_neardup_ttl" -> (StreamQueries.streamNearDupTtl _),
    // streaming CDC latest-wins: one state row per key via an
    // associative+commutative fold; shares cdc_merge's oracle
    "stream_cdc_latest" -> (StreamQueries.streamCdcLatest _),
    // expiry-hardened twin: 8 event-time-ordered micro-batches with a
    // ONE-batch-width horizon, so buckets provably expire mid-drain and
    // re-admission is hash-gated (epoch closed form in the oracle)
    "stream_neardup_ttl_expiry" -> (StreamQueries.streamNearDupTtlExpiry _),
    // bounded-state online top-k: per-word-shard Misra-Gries summaries
    // as flatMapGroupsWithState state (S × O(m) counters live, ever);
    // exact while no shard trims → shares the batch heavy-hitters oracle
    "stream_heavy_hitters" -> (StreamQueries.streamHeavyHitters _),
    // append-mode windowed percentiles: emission cutoff (window end ≤
    // max event − delay, ms grain) reproduced in the oracle — the
    // append window lifecycle itself is hash-gated
    "stream_quantiles"     -> (StreamQueries.streamQuantiles _),
    "stream_stream_join"   -> (StreamQueries.streamStreamJoin _),
    "stream_static_join"   -> (StreamQueries.streamStaticJoin _),
    // ——— multimodal columns (binary + typed metadata; decode stubbed) ———
    "mm_decode_meta"  -> ((s, d) => Multimodal.decodeMeta(s, DicomQueries.Fixtures)),
    "mm_resize_meta"  -> ((s, d) => Multimodal.resizeMeta(
      s, Seq(DicomQueries.Fixtures, Multimodal.ensureImageFixtures()))),
    "mm_frame_sample" -> ((s, d) => Multimodal.frameSample(s, DicomQueries.Fixtures)),
    "mm_pseudo_embed" -> ((s, d) => Multimodal.pseudoEmbedFlat(s, DicomQueries.Fixtures)),
    // full multimodal -> embed -> ANN chain over fixtures + real images
    "mm_embed_ann"    -> ((s, d) => Multimodal.assetNeighbors(
      s, Seq(DicomQueries.Fixtures, Multimodal.ensureImageFixtures()))),
    // perceptual-hash (dHash) image near-dup: 8-band Hamming LSH join,
    // lossless at distance ≤ 6, exact bit_count verify; rows-only (the
    // hash embeds JVM ImageIO decode) — semantics pinned in PhashSpec
    "mm_phash_neardup" -> ((s, d) => Multimodal.phashNearDup(
      s, Seq(Multimodal.ensureImageFixtures(), Multimodal.ensurePhashFixtures()))),
  )

  /** `graph_pagerank`'s oracle: the fixed-point integer recurrence of
    * [[graft.operators.Graph.pagerank]] with the iteration loop unrolled
    * into chained CTEs (r0 → r5). Every arithmetic step is 64-bit
    * integer (sums re-cast to BIGINT — DuckDB widens Σ BIGINT to
    * INT128), so both engines compute the identical bit pattern. */
  private val PagerankOracleSql: String = {
    val scale = graft.operators.Graph.Scale
    val iters = (1 to 5).map { k =>
      s"""m$k AS (SELECT dst, CAST(sum((r * w) // outw) AS BIGINT) AS in_mass
         |  FROM en JOIN r${k - 1} ON src = node GROUP BY dst),
         |r$k AS (SELECT nd.node,
         |  CAST((SELECT (15 * $scale) // (100 * cnt) FROM n)
         |    + (85 * COALESCE(m$k.in_mass, 0)) // 100 AS BIGINT) AS r
         |  FROM nds nd LEFT JOIN m$k ON nd.node = m$k.dst)""".stripMargin
    }.mkString(",\n")
    s"""WITH e AS (SELECT CAST(c_nationkey AS BIGINT) AS src,
       |  CAST(s_nationkey AS BIGINT) AS dst, count(*) AS w
       |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       |    JOIN customer ON o_custkey = c_custkey
       |    JOIN supplier ON l_suppkey = s_suppkey
       |  GROUP BY 1, 2),
       |ow AS (SELECT src, CAST(sum(w) AS BIGINT) AS outw FROM e GROUP BY 1),
       |en AS (SELECT e.src, e.dst, e.w, ow.outw FROM e JOIN ow USING (src)),
       |n AS (SELECT count(*) AS cnt FROM nation),
       |nds AS (SELECT CAST(n_nationkey AS BIGINT) AS node, n_name FROM nation),
       |r0 AS (SELECT node, CAST((SELECT $scale // cnt FROM n) AS BIGINT) AS r FROM nds),
       |$iters
       |SELECT node AS n_nationkey, n_name, r AS rank_fp,
       |  CAST(r AS DOUBLE) / $scale.0 AS rank
       |FROM nds JOIN r5 USING (node)
       |ORDER BY rank_fp DESC, n_nationkey""".stripMargin
  }

  /** `graph_ppr`'s oracle: [[graft.operators.Graph.ppr]]'s 5 rounds
    * unrolled — the [[PagerankOracleSql]] generator with the uniform
    * teleport replaced by seed-only restart mass (seeds = ASIA
    * nations). All integer fixed-point, so the iterative result
    * hash-gates exactly. */
  private val PprOracleSql: String = {
    val scale = graft.operators.Graph.Scale
    val iters = (1 to 5).map { k =>
      s"""m$k AS (SELECT dst, CAST(sum((r * w) // outw) AS BIGINT) AS in_mass
         |  FROM en JOIN r${k - 1} ON src = node GROUP BY dst),
         |r$k AS (SELECT nd.node,
         |  CAST(CASE WHEN nd.seed THEN (SELECT (15 * $scale) // (100 * cnt) FROM ns)
         |       ELSE 0 END
         |    + (85 * COALESCE(m$k.in_mass, 0)) // 100 AS BIGINT) AS r
         |  FROM nds nd LEFT JOIN m$k ON nd.node = m$k.dst)""".stripMargin
    }.mkString(",\n")
    s"""WITH e AS (SELECT CAST(c_nationkey AS BIGINT) AS src,
       |  CAST(s_nationkey AS BIGINT) AS dst, count(*) AS w
       |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       |    JOIN customer ON o_custkey = c_custkey
       |    JOIN supplier ON l_suppkey = s_suppkey
       |  GROUP BY 1, 2),
       |ow AS (SELECT src, CAST(sum(w) AS BIGINT) AS outw FROM e GROUP BY 1),
       |en AS (SELECT e.src, e.dst, e.w, ow.outw FROM e JOIN ow USING (src)),
       |nds AS (SELECT CAST(n_nationkey AS BIGINT) AS node, n_name,
       |  r_name = 'ASIA' AS seed
       |  FROM nation JOIN region ON n_regionkey = r_regionkey),
       |ns AS (SELECT count(*) AS cnt FROM nds WHERE seed),
       |r0 AS (SELECT node,
       |  CAST(CASE WHEN seed THEN (SELECT $scale // cnt FROM ns) ELSE 0 END AS BIGINT) AS r
       |  FROM nds),
       |$iters
       |SELECT node AS n_nationkey, n_name, CAST(seed AS INT) AS is_seed,
       |  r AS rank_fp, CAST(r AS DOUBLE) / $scale.0 AS rank
       |FROM nds JOIN r5 USING (node)
       |ORDER BY rank_fp DESC, n_nationkey""".stripMargin
  }

  /** `graph_lpa`'s oracle: the same 4 synchronous label-propagation
    * rounds as [[graft.operators.Graph.lpa]] unrolled into CTEs. The
    * per-node (max count, min label) argmax is the identical order
    * embedding into one BIGINT (packed = c·2^32 + (2^32−1−lbl)) — all
    * integer, so the iterative query hash-matches exactly. */
  private val LpaOracleSql: String = {
    val m = graft.operators.Graph.LpaPack
    val m1 = m - 1
    val r = graft.operators.Graph.LpaRounds
    val rounds = (1 to r).map { k =>
      s"""v$k AS (SELECT e.node, l.lbl, count(*) AS c
         |  FROM und e JOIN l${k - 1} l ON e.nbr = l.node GROUP BY 1, 2),
         |l$k AS (SELECT node,
         |  CAST($m1 - (max(c * $m + ($m1 - lbl)) % $m) AS BIGINT) AS lbl
         |  FROM v$k GROUP BY node)""".stripMargin
    }.mkString(",\n")
    s"""WITH pairs AS (SELECT a.l_partkey AS u, b.l_partkey AS v
       |  FROM lineitem a JOIN lineitem b
       |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
       |  GROUP BY 1, 2 HAVING count(*) >= 2),
       |und AS (SELECT u AS node, v AS nbr FROM pairs
       |        UNION ALL SELECT v, u FROM pairs),
       |l0 AS (SELECT DISTINCT node, CAST(node AS BIGINT) AS lbl FROM und),
       |$rounds,
       |sz AS (SELECT lbl, count(*) AS community_size FROM l$r GROUP BY 1)
       |SELECT node AS part_id, lbl AS community, community_size
       |FROM l$r JOIN sz USING (lbl) ORDER BY part_id""".stripMargin
  }

  /** `graph_kcore`'s oracle: [[graft.operators.Graph.KcoreRounds]]
    * peeling rounds unrolled into CTEs — each round recomputes degrees
    * over surviving edges and keeps edges whose BOTH endpoints still
    * clear k = 3. The Spark side throws if the fixpoint needs more
    * rounds, and a converged round is a no-op, so fixed depth ≡
    * fixpoint. */
  private val KcoreOracleSql: String = {
    // every e_i is referenced 3× by round i+1 — WITHOUT `MATERIALIZED`,
    // DuckDB's CTE inlining expands the chain 3^rounds times and dies
    // on file handles before it dies on CPU
    val rounds = (1 to graft.operators.Graph.KcoreRounds).map { i =>
      s"""d$i AS MATERIALIZED (SELECT node, count(*) AS deg FROM (
         |    SELECT u AS node FROM e${i - 1} UNION ALL SELECT v FROM e${i - 1})
         |  GROUP BY 1),
         |g$i AS MATERIALIZED (SELECT node FROM d$i WHERE deg >= 3),
         |e$i AS MATERIALIZED (SELECT u, v FROM e${i - 1}
         |  WHERE u IN (SELECT node FROM g$i) AND v IN (SELECT node FROM g$i))""".stripMargin
    }.mkString(",\n")
    val last = s"e${graft.operators.Graph.KcoreRounds}"
    s"""WITH e0 AS MATERIALIZED (SELECT a.l_partkey AS u, b.l_partkey AS v
       |  FROM lineitem a JOIN lineitem b
       |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
       |  GROUP BY 1, 2 HAVING count(*) >= 2),
       |$rounds
       |SELECT node AS part_id, count(*) AS core_degree FROM (
       |  SELECT u AS node FROM $last UNION ALL SELECT v FROM $last)
       |GROUP BY 1 ORDER BY 1""".stripMargin
  }

  /** `graph_bfs`'s oracle: [[graft.operators.Graph.BfsRounds]] frontier
    * rounds unrolled (MATERIALIZED — each d_i is referenced twice by
    * round i+1). min() over BIGINT hop counts merges identically
    * everywhere; a converged round is a no-op, so fixed depth gates the
    * within-K fixpoint. */
  private val BfsOracleSql: String = {
    val rounds = (1 to graft.operators.Graph.BfsRounds).map { i =>
      s"""d$i AS MATERIALIZED (SELECT node, CAST(min(d) AS BIGINT) AS d FROM (
         |    SELECT node, d FROM d${i - 1}
         |    UNION ALL
         |    SELECT e.node, l.d + 1 FROM und e JOIN d${i - 1} l ON e.nbr = l.node)
         |  GROUP BY 1)""".stripMargin
    }.mkString(",\n")
    val last = s"d${graft.operators.Graph.BfsRounds}"
    s"""WITH pairs AS MATERIALIZED (SELECT a.l_partkey AS u, b.l_partkey AS v
       |  FROM lineitem a JOIN lineitem b
       |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
       |  GROUP BY 1, 2 HAVING count(*) >= 2),
       |und AS MATERIALIZED (SELECT u AS node, v AS nbr FROM pairs
       |        UNION ALL SELECT v, u FROM pairs),
       |d0 AS MATERIALIZED (SELECT p_partkey AS node, CAST(0 AS BIGINT) AS d
       |  FROM part WHERE p_size = 50
       |    AND p_partkey IN (SELECT node FROM und)),
       |$rounds
       |SELECT node AS part_id, d AS hops FROM $last ORDER BY part_id""".stripMargin
  }

  /** The error/click CTEs + 10-minute interval condition shared by the
    * inner and LEFT OUTER stream–stream join oracles — the SQL twin of
    * [[graft.queries.StreamQueries]]' shared `errorClickSides` builder,
    * deduplicated for the same reason: the interval, delay, and grain
    * must be stated once. */
  private val ErrClickCtes: String =
    """e AS (SELECT event_id, user_id, epoch_ns(ts) AS ts_ns
      |           FROM events WHERE event_type = 'error'),
      |c AS (SELECT user_id, epoch_ns(ts) AS ts_ns
      |      FROM events WHERE event_type = 'click')""".stripMargin

  private val ErrClickCond: String =
    """c.user_id = e.user_id
      | AND c.ts_ns >= e.ts_ns - 600000000000
      | AND c.ts_ns < e.ts_ns""".stripMargin

  /** The Naive-Bayes training CTEs (weak labels → count grain →
    * quantized per-word weights `lw` + 1-row prior `pri`) shared by the
    * batch classifier oracle and the streaming scorer oracle — one
    * training definition, so the persisted-model path must reproduce
    * the in-query model exactly. */
  private val NbTrainCtes: String =
      """WITH lab AS (
        |  SELECT doc_id, text,
        |    CASE WHEN len(list_filter(string_split(lower(text), ' '), x -> x = 'hash')) * 25
        |           >= len(list_filter(string_split(text, ' '), x -> len(x) > 0))
        |         THEN 1 ELSE 0 END AS y
        |  FROM documents),
        |tok AS (
        |  SELECT doc_id, y,
        |    unnest(list_filter(string_split(lower(text), ' '), x -> len(x) > 0)) AS w
        |  FROM lab),
        |cnt AS (SELECT doc_id, y, w, count(*) AS n FROM tok GROUP BY 1, 2, 3),
        |cls AS (SELECT y, CAST(sum(n) AS DOUBLE) AS nc, CAST(count(DISTINCT doc_id) AS DOUBLE) AS dc
        |        FROM cnt WHERE doc_id % 2 = 0 GROUP BY y),
        |cby AS (SELECT w,
        |    sum(CASE WHEN y = 1 THEN n ELSE 0 END) AS c1,
        |    sum(CASE WHEN y = 0 THEN n ELSE 0 END) AS c0
        |  FROM cnt WHERE doc_id % 2 = 0 GROUP BY w),
        |tots AS (SELECT
        |    COALESCE((SELECT nc FROM cls WHERE y = 1), 0) AS n1,
        |    COALESCE((SELECT nc FROM cls WHERE y = 0), 0) AS n0,
        |    COALESCE((SELECT dc FROM cls WHERE y = 1), 0) AS d1,
        |    COALESCE((SELECT dc FROM cls WHERE y = 0), 0) AS d0,
        |    (SELECT CAST(count(*) AS DOUBLE) FROM cby) AS v),
        |lw AS (SELECT bkt.w,
        |    CAST(floor((ln((bkt.c1 + 1) / (t.n1 + t.v)) - ln((bkt.c0 + 1) / (t.n0 + t.v))) * 1e9 + 0.5) AS BIGINT) AS wq
        |  FROM cby bkt, tots t),
        |pri AS (SELECT
        |    CAST(floor((ln((d1 + 1) / (d1 + d0 + 2.0)) - ln((d0 + 1) / (d1 + d0 + 2.0))) * 1e9 + 0.5) AS BIGINT) AS pq
        |  FROM tots)""".stripMargin

  /** Full-corpus retrain + |wq|-desc cap + stateless score — shared by
    * `stream_corpus_nb_score` (persisted capped model, streaming fold)
    * and `corpus_nb_day2` (model derived from merged persisted counts):
    * three execution models, ONE training definition, so the persisted
    * model, the count-append refresh AND the in-query trainer must all
    * agree bit for bit; docs with no model token score exactly the
    * prior (LEFT JOIN + COALESCE 0). */
  private val NbScoreOracleSql: String = NbTrainCtes + """,
        |cap AS (SELECT w, wq FROM lw ORDER BY abs(wq) DESC, w LIMIT 4096),
        |wt AS (SELECT c.doc_id, CAST(sum(c.n * w.wq) AS BIGINT) AS sw
        |       FROM cnt c JOIN cap w USING (w) GROUP BY 1)
        |SELECT d.doc_id, CAST(p.pq + COALESCE(wt.sw, 0) AS BIGINT) AS score_q,
        |  CAST(CASE WHEN p.pq + COALESCE(wt.sw, 0) > 0 THEN 1 ELSE 0 END AS INT) AS pred
        |FROM documents d LEFT JOIN wt USING (doc_id), pri p ORDER BY d.doc_id""".stripMargin

  /** `sim_mmr_diversify`'s oracle: the brute shortlist + pairwise
    * micro-unit cosines, then each of the 10 greedy MMR selections
    * replayed as a generated MATERIALIZED CTE pair (sᵢ = the integer
    * argmax among candidates not yet in selᵢ₋₁; selᵢ = selᵢ₋₁ ∪ sᵢ) —
    * MATERIALIZED is load-bearing: the selᵢ chain references selᵢ₋₁
    * twice, so inlined CTEs would expand 2^k copies of the whole
    * plan. Every data-dependent selection is hash-gated, not just the
    * final set. */
  private val MmrOracleSql: String = {
    val base =
      """WITH n AS MATERIALIZED (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb,
        |         sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[]))) AS nrm
        |  FROM embeddings),
        |q AS MATERIALIZED (SELECT emb AS q_emb, nrm AS q_nrm FROM n WHERE vec_id = 0),
        |rel AS MATERIALIZED (SELECT vec_id, CAST(round(list_dot_product(emb, q_emb) / (nrm * q_nrm) * 1e6) AS BIGINT) AS relq
        |        FROM n, q WHERE vec_id <> 0),
        |sl AS MATERIALIZED (SELECT n.vec_id, n.emb, n.nrm, r.relq FROM n JOIN rel r USING (vec_id)
        |       ORDER BY r.relq DESC, n.vec_id LIMIT 30),
        |ps AS MATERIALIZED (SELECT a.vec_id AS va, b.vec_id AS vb,
        |         CAST(round(list_dot_product(a.emb, b.emb) / (a.nrm * b.nrm) * 1e6) AS BIGINT) AS sq
        |       FROM sl a JOIN sl b ON a.vec_id <> b.vec_id)""".stripMargin
    base + ",\n" + MmrStepsSql
  }

  /** The k greedy MMR selections as generated MATERIALIZED CTEs plus
    * the rank-ordered emission — shared by the brute-shortlist oracle
    * ([[MmrOracleSql]]) and the PQ-shortlist oracle ([[MmrPqOracleSql]]):
    * the preceding CTE chain must define `sl` (vec_id, emb, nrm, relq)
    * and `ps` (pairwise micro-unit cosines over sl). One greedy
    * definition, two shortlist provenances. */
  // a def, not a val: referenced by oracle vals declared BEFORE this
  // point (object vals initialize in declaration order — a forward val
  // reference is null at init time, which an r10 refactor hit)
  private def MmrStepsSql: String = {
    val steps = (1 to 10).map { i =>
      if (i == 1)
        """s1 AS MATERIALIZED (SELECT vec_id, relq, 7 * relq AS mmr_q FROM sl ORDER BY 7 * relq DESC, vec_id LIMIT 1),
          |sel1 AS MATERIALIZED (SELECT vec_id FROM s1)""".stripMargin
      else
        s"""s$i AS MATERIALIZED (SELECT c.vec_id, c.relq,
           |    7 * c.relq - 3 * (SELECT max(sq) FROM ps WHERE va = c.vec_id AND vb IN (SELECT vec_id FROM sel${i - 1})) AS mmr_q
           |  FROM sl c WHERE c.vec_id NOT IN (SELECT vec_id FROM sel${i - 1})
           |  ORDER BY mmr_q DESC, c.vec_id LIMIT 1),
           |sel$i AS MATERIALIZED (SELECT vec_id FROM sel${i - 1} UNION ALL SELECT vec_id FROM s$i)""".stripMargin
    }
    val finals = (1 to 10).map { i =>
      s"SELECT $i AS sel_rank, vec_id, round(CAST(relq AS DOUBLE)/1e6, 6) AS cos_sim, mmr_q FROM s$i"
    }.mkString("\nUNION ALL\n")
    steps.mkString(",\n") + "\n" + finals + "\nORDER BY sel_rank"
  }

  /** The minhash band CTEs (documents → (doc_id, band, band_hash)) every
    * near-dup stream oracle builds on — identical hash family to the
    * batch minhash operators. */
  private val NearDupBandCtes: String =
      """WITH tk AS (
        |  SELECT doc_id, list_filter(string_split(text, ' '), x -> len(x) > 0) AS tk
        |  FROM documents),
        |pos AS (SELECT doc_id, tk, unnest(range(len(tk) - 2)) AS i FROM tk WHERE len(tk) >= 3),
        |sh AS (SELECT DISTINCT doc_id, tk[i+1] || ' ' || tk[i+2] || ' ' || tk[i+3] AS shingle FROM pos),
        |perms AS (SELECT doc_id, shingle, unnest(range(8)) AS perm FROM sh),
        |sig AS (SELECT doc_id, perm, min(substr(md5(CAST(perm // 4 AS VARCHAR) || '|' || shingle), (perm % 4) * 8 + 1, 8)) AS mh
        |        FROM perms GROUP BY 1, 2),
        |bands AS (SELECT doc_id, perm // 2 AS band,
        |  md5(string_agg(CAST(perm AS VARCHAR) || ':' || mh, '|'
        |      ORDER BY CAST(perm AS VARCHAR) || ':' || mh)) AS band_hash
        |  FROM sig GROUP BY 1, 2)""".stripMargin

  /** Shared by `stream_neardup_filter` and `stream_neardup_ttl`: the
    * single-batch drain's first-owner-wins rule == "min lower id sharing
    * any LSH band bucket" — the same band CTEs as the batch minhash
    * oracle. */
  /** `stream_sessionize`'s oracle (q15's ns-grain SQL): per-user
    * 30-minute-gap session counts. `stream_session_window` carries its
    * own µs-grain twin of this SQL — see its registration note. */
  private val SessionizeOracleSql: String =
    """WITH x AS (
      |  SELECT user_id, epoch_ns(ts) AS ets,
      |    lag(epoch_ns(ts)) OVER (PARTITION BY user_id ORDER BY epoch_ns(ts), event_id) AS prev
      |  FROM events)
      |SELECT user_id,
      |  CAST(sum(CASE WHEN prev IS NULL OR ets - prev > 1800000000000 THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions,
      |  count(*) AS n_events
      |FROM x GROUP BY user_id ORDER BY user_id""".stripMargin

  /** Shared by `text_heavy_hitters` (Misra-Gries + certified recount)
    * and `stream_heavy_hitters` (per-shard MG state, exact while no
    * shard trims): exact corpus top-20 words by count. */
  private val HeavyHittersOracleSql: String =
    """WITH w AS (
      |  SELECT unnest(list_filter(string_split(lower(text), ' '), x -> len(x) > 0)) AS word
      |  FROM documents),
      |c AS (SELECT word, count(*) AS n FROM w GROUP BY word)
      |SELECT word, n FROM c ORDER BY n DESC, word LIMIT 20""".stripMargin

  /** Shared by `text_search_bm25` (corpus-derived scoring) and
    * `text_search_bm25_day2` (scoring through the persisted positional
    * index + doc-length sidecar): one full-corpus oracle, so the day-2
    * gate certifies index ≡ corpus and append ≡ rebuild at once.
    * Per-(doc, term) contributions are integer-quantized at 1e6 before
    * the per-doc sum — both engines rank on an exact integer. */
  private val Bm25OracleSql: String = bm25OracleSql("")

  /** The BM25 SQL over a restrictable document universe: after a
    * takedown the compacted index's sidecar carries SURVIVOR statistics
    * (N, avgdl, df), so the compaction gate is this same SQL with the
    * retired slice excluded — a full re-normalized ranking, not just
    * absence of the retired docs. */
  private def bm25OracleSql(universe: String): String =
    s"""WITH tok AS (
      |  SELECT doc_id, w FROM (SELECT * FROM documents$universe) documents,
      |    UNNEST(str_split(lower(text), ' ')) AS t(w) WHERE length(w) > 0),
      |dt AS (SELECT doc_id, w AS word, CAST(count(*) AS BIGINT) AS tf FROM tok GROUP BY 1, 2),
      |dl AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS dl FROM dt GROUP BY 1),
      |tot AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
      |               CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl FROM dl),
      |q AS (SELECT unnest(['dup', 'merge']) AS word),
      |df AS (SELECT word, CAST(count(*) AS BIGINT) AS df FROM dt JOIN q USING (word) GROUP BY 1),
      |contrib AS (
      |  SELECT dt.doc_id,
      |    CAST(round(1e6 * ln(1 + (tot.n_docs - df.df + 0.5) / (df.df + 0.5))
      |      * (dt.tf * 2.2) / (dt.tf + 1.2 * (0.25 + 0.75 * dl.dl / tot.avgdl))) AS BIGINT) AS wq
      |  FROM dt JOIN q USING (word) JOIN df USING (word)
      |  JOIN dl USING (doc_id) CROSS JOIN tot),
      |sc AS (SELECT doc_id, CAST(sum(wq) AS BIGINT) AS score_q,
      |              CAST(count(*) AS BIGINT) AS n_hit FROM contrib GROUP BY 1),
      |topn AS (SELECT * FROM sc ORDER BY score_q DESC, doc_id LIMIT 20)
      |SELECT CAST(row_number() OVER (ORDER BY score_q DESC, doc_id) AS BIGINT) AS rank,
      |       doc_id, n_hit, score_q
      |FROM topn ORDER BY rank""".stripMargin

  /** Shared by `cdc_merge` (batch latest-wins) and `stream_cdc_latest`
    * (the stateful streaming twin): one oracle, two execution models —
    * the fold's associativity/commutativity is exactly the claim the
    * shared gate checks. */
  private val CdcMergeOracleSql: String =
    """WITH base AS (
        |  SELECT o_orderkey AS key, o_orderstatus AS base_status,
        |         round(o_totalprice, 2) AS base_price
        |  FROM orders WHERE o_orderkey % 4 != 0),
        |latest AS (
        |  SELECT key, op, new_price, new_qty FROM (
        |    SELECT l_orderkey AS key,
        |      CASE WHEN l_returnflag = 'R' THEN 'D' ELSE 'U' END AS op,
        |      floor(l_extendedprice * (1.0 - l_discount) * 100 + 0.5) / 100 AS new_price,
        |      l_quantity AS new_qty,
        |      row_number() OVER (PARTITION BY l_orderkey
        |        ORDER BY l_linenumber DESC,
        |          CASE WHEN l_returnflag = 'R' THEN 'D' ELSE 'U' END,
        |          floor(l_extendedprice * (1.0 - l_discount) * 100 + 0.5) / 100,
        |          l_quantity) AS rn
        |    FROM lineitem)
        |  WHERE rn = 1)
        |SELECT key,
        |  CASE WHEN op IS NULL THEN 'keep'
        |       WHEN base_status IS NULL THEN 'insert'
        |       ELSE 'update' END AS action,
        |  CASE WHEN op IS NULL THEN base_price ELSE new_price END AS price,
        |  CASE WHEN op IS NULL THEN NULL ELSE new_qty END AS qty
        |FROM base FULL OUTER JOIN latest USING (key)
        |WHERE op IS NULL OR op = 'U'
        |ORDER BY key""".stripMargin

  /** Shared by `dedup_components`, `dedup_components_incremental`
    * (the day-2 merge must equal the full recompute) and
    * `dedup_canonical` (components + keeper selection): transitive
    * closure + min-reachable over the full MinHash pair SQL. */
  private val ComponentsCtes: String =
      """WITH RECURSIVE tk AS (
        |  SELECT doc_id, list_filter(string_split(text, ' '), x -> len(x) > 0) AS tk
        |  FROM documents),
        |pos AS (SELECT doc_id, tk, unnest(range(len(tk) - 2)) AS i FROM tk WHERE len(tk) >= 3),
        |sh AS (SELECT DISTINCT doc_id, tk[i+1] || ' ' || tk[i+2] || ' ' || tk[i+3] AS shingle FROM pos),
        |perms AS (SELECT doc_id, shingle, unnest(range(8)) AS perm FROM sh),
        |sig AS (SELECT doc_id, perm, min(substr(md5(CAST(perm // 4 AS VARCHAR) || '|' || shingle), (perm % 4) * 8 + 1, 8)) AS mh
        |        FROM perms GROUP BY 1, 2),
        |bands AS (SELECT doc_id, perm // 2 AS band,
        |  md5(string_agg(CAST(perm AS VARCHAR) || ':' || mh, '|'
        |      ORDER BY CAST(perm AS VARCHAR) || ':' || mh)) AS band_hash
        |  FROM sig GROUP BY 1, 2),
        |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        |  FROM bands a JOIN bands b
        |  ON a.band = b.band AND a.band_hash = b.band_hash AND a.doc_id < b.doc_id),
        |shh AS (SELECT DISTINCT doc_id,
        |  ('0x' || substr(md5(shingle), 1, 15))::BIGINT AS sh FROM sh),
        |cnt AS (SELECT doc_id, count(*) AS n_sh FROM shh GROUP BY 1),
        |inter AS (SELECT doc_a, doc_b, count(*) AS n_inter
        |  FROM cand JOIN shh sa ON doc_a = sa.doc_id
        |  JOIN shh sb ON doc_b = sb.doc_id AND sa.sh = sb.sh
        |  GROUP BY 1, 2),
        |pr AS (SELECT doc_a, doc_b FROM (
        |  SELECT doc_a, doc_b,
        |    round(CAST(n_inter AS DOUBLE) / (ca.n_sh + cb.n_sh - n_inter), 4) AS jaccard
        |  FROM inter JOIN cnt ca ON doc_a = ca.doc_id JOIN cnt cb ON doc_b = cb.doc_id)
        |  WHERE jaccard >= 0.5),
        |e AS (SELECT doc_a AS src, doc_b AS dst FROM pr
        |      UNION SELECT doc_b, doc_a FROM pr),
        |reach(src, dst) AS (
        |  SELECT src, dst FROM e
        |  UNION
        |  SELECT r.src, e2.dst FROM reach r JOIN e e2 ON r.dst = e2.src)""".stripMargin

  private val ComponentsOracleSql: String = ComponentsCtes +
      """
        |SELECT src AS doc_id, least(src, min(dst)) AS component
        |FROM reach GROUP BY src ORDER BY doc_id""".stripMargin

  /** Components + component-keyed 90/5/5 hash ladder: the leakage-safe
    * split — Spark twin `Curation.splitLeakageSafe`. */
  private val SplitLeakageSafeOracleSql: String = ComponentsCtes +
      """,
        |comp AS (SELECT src AS doc_id, least(src, min(dst)) AS component
        |         FROM reach GROUP BY src),
        |lab AS (SELECT d.doc_id, coalesce(c.component, d.doc_id) AS component
        |        FROM documents d LEFT JOIN comp c USING (doc_id)),
        |b AS (SELECT doc_id, component,
        |  ('0x' || substr(md5(CAST(component AS VARCHAR)), 1, 15))::BIGINT % 100 AS bucket
        |  FROM lab)
        |SELECT doc_id, component, bucket,
        |  CASE WHEN bucket < 90 THEN 'train'
        |       WHEN bucket < 95 THEN 'val'
        |       ELSE 'test' END AS split
        |FROM b ORDER BY doc_id""".stripMargin

  /** Components + canonical keeper: every document labeled (singletons
    * self-labeled), keep = 1 on the (n_chars DESC, doc_id) window head
    * per component — the Spark twin is `Dedup.canonical`. */
  private val CanonicalOracleSql: String = ComponentsCtes +
      """,
        |comp AS (SELECT src AS doc_id, least(src, min(dst)) AS component
        |         FROM reach GROUP BY src)
        |SELECT d.doc_id, coalesce(c.component, d.doc_id) AS component,
        |  CAST(CASE WHEN row_number() OVER (
        |      PARTITION BY coalesce(c.component, d.doc_id)
        |      ORDER BY d.n_chars DESC, d.doc_id) = 1 THEN 1 ELSE 0 END AS BIGINT) AS keep
        |FROM documents d LEFT JOIN comp c USING (doc_id)
        |ORDER BY doc_id""".stripMargin

  /** Shared by `stream_editdup_filter` (NoTimeout) and
    * `stream_editdup_ttl` (horizon outlives the corpus, so the finite
    * drain expires nothing): the online owner-check contract in closed
    * form. */
  private val EditDupFilterOracleSql: String =
      """WITH c AS (SELECT c_custkey AS id, c_name AS nm FROM customer),
        |dels AS (SELECT id, nm, unnest(range(1, len(nm) + 1)) AS i FROM c),
        |sigs AS (SELECT DISTINCT id, sig FROM (
        |  SELECT id, nm AS sig FROM c
        |  UNION ALL
        |  SELECT id, substr(nm, 1, CAST(i AS INT) - 1) ||
        |             substr(nm, CAST(i AS INT) + 1) AS sig FROM dels)),
        |own AS (SELECT sig, min(id) AS owner FROM sigs GROUP BY 1),
        |hits AS (SELECT s.id, o.owner
        |  FROM sigs s JOIN own o USING (sig)
        |  JOIN c a ON a.id = s.id JOIN c b ON b.id = o.owner
        |  WHERE o.owner < s.id AND levenshtein(a.nm, b.nm) <= 1)
        |SELECT id AS doc_id, min(owner) AS dup_of
        |FROM hits GROUP BY 1 ORDER BY doc_id""".stripMargin

  private val NearDupStreamOracleSql: String = NearDupBandCtes + "\n" +
      """SELECT b.doc_id AS doc_id, min(a.doc_id) AS near_dup_of
        |FROM bands a JOIN bands b
        |  ON a.band = b.band AND a.band_hash = b.band_hash AND a.doc_id < b.doc_id
        |GROUP BY 1 ORDER BY doc_id""".stripMargin

  /** `stream_neardup_indexed`: per bucket, a day-1 member (doc_id % 10
    * != 7) freezes ownership at the day-1 min — every stream member of
    * such a bucket reports it REGARDLESS of id order (the frozen-owner
    * rule; the sf0.01 corpus contains a stream doc owned by a
    * HIGHER-id day-1 doc, so the hash pins the rule, not just the
    * pairs). Index-free buckets fall back to min-lower-stream-id —
    * [[NearDupStreamOracleSql]]'s rule restricted to stream docs. */
  private val IndexedNearDupOracleSql: String = NearDupBandCtes + ",\n" +
      """own AS (SELECT band, band_hash,
        |  min(CASE WHEN doc_id % 10 != 7 THEN doc_id END) AS d1
        |  FROM bands GROUP BY 1, 2),
        |sb AS (SELECT band, band_hash, doc_id FROM bands WHERE doc_id % 10 = 7),
        |lo AS (SELECT s.band, s.band_hash, s.doc_id, min(t.doc_id) AS lower_id
        |  FROM sb s LEFT JOIN sb t
        |    ON s.band = t.band AND s.band_hash = t.band_hash AND t.doc_id < s.doc_id
        |  GROUP BY 1, 2, 3),
        |per AS (SELECT l.doc_id, coalesce(o.d1, l.lower_id) AS owner
        |  FROM lo l JOIN own o ON l.band = o.band AND l.band_hash = o.band_hash)
        |SELECT doc_id, min(owner) AS near_dup_of
        |FROM per WHERE owner IS NOT NULL GROUP BY 1 ORDER BY doc_id""".stripMargin

  /** `dedup_semantic_kmeans_exact`: the generated-CTE replay of the
    * quantized-integer k-means (the `text_bpe_encode` pattern applied
    * to clustering). Vectors quantize to integer milli-units; seeding
    * (farthest-point, tie → lowest id) and 3 unrolled Lloyd rounds run
    * in exact integer arithmetic (squared-L2 via the dot-product
    * identity — every term an integer-valued DOUBLE < 2^53; centroids
    * re-quantize with half-away integer division; empty clusters keep
    * their centroid via the coalesce); the final assignment feeds the
    * standard cluster-bounded τ = 0.3 keep-set. Any drift in the
    * engine's trainer — seed order, tie rule, rounding, update count —
    * lands on a different assignment and hash-fails. */
  private val QuantKmeansOracleSql: String = {
    val (ctes, last) = QuantKmeansParts
    ctes + s""",
      |dropped AS (
      |  SELECT DISTINCT cb.vec_id
      |  FROM $last ca JOIN $last cb ON ca.cluster = cb.cluster AND ca.vec_id < cb.vec_id
      |  JOIN nv a ON a.vec_id = ca.vec_id JOIN nv b ON b.vec_id = cb.vec_id
      |  WHERE round(list_dot_product(a.emb, b.emb) / (a.nrm * b.nrm), 4) >= 0.3)
      |SELECT vec_id, CAST(cluster AS BIGINT) AS cluster FROM $last
      |WHERE vec_id NOT IN (SELECT vec_id FROM dropped) ORDER BY vec_id""".stripMargin
  }

  /** `dedup_semantic_kmeans`: the DERIVED-k replay — identical integer
    * arithmetic to [[QuantKmeansOracleSql]], but k comes from the data
    * (`GREATEST(2, (2·count + t) // (2t))`, the Spark side's
    * [[graft.operators.Similarity.derivedSemanticK]] in SQL) and the
    * farthest-point seeding runs as a RECURSIVE CTE accumulating the
    * seed list to that k — the one data-dependent loop static unrolling
    * can't express. The Lloyd rounds are k-AGNOSTIC (per-vector argmin
    * via row_number, per-cluster GROUP BY update), so the same 3
    * unrolled rounds serve any derived k; the τ = 0.3 keep-set tail is
    * verbatim. */
  /** [[QuantKmeansDerivedOracleSql]] bakes targetClusterSize=200, τ=0.3
    * and Dim=64 into its generated SQL, while the Spark side reads the
    * dials from session conf and the dimension from the data — a
    * non-default conf or an off-spec embeddings table would surface as
    * a confusing hash mismatch rather than an error (CONFIG.md documents
    * the contract; this enforces it in the verify path, pinned by
    * SemanticDedupSpec). Fail fast on drift. */
  private def requireSemanticOracleDefaults(s: SparkSession,
                                            dir: String): SparkSession = {
    val t = s.conf.get("spark.graft.dedup.semantic.targetClusterSize", "200")
    val tau = s.conf.get("spark.graft.dedup.semantic.tau", "0.3")
    require(t.toInt == 200 && tau.toDouble == 0.3,
      s"dedup_semantic_kmeans oracle SQL bakes targetClusterSize=200, tau=0.3; " +
        s"session conf has targetClusterSize=$t, tau=$tau — unset the conf " +
        "for gated verification (the operator itself honors any conf)")
    // the oracle's Lloyd-update loop is unrolled over exactly 64
    // dimensions; one head row (a bounded single-row scan) checks the
    // corpus matches before any hash can silently diverge
    val dim = s.read.parquet(s"$dir/embeddings.parquet")
      .select(org.apache.spark.sql.functions.size(
        org.apache.spark.sql.functions.col("embedding")).as("d"))
      .head().getInt(0)
    require(dim == 64,
      s"dedup_semantic_kmeans oracle SQL bakes Dim=64; $dir/embeddings.parquet " +
        s"has $dim-dim embeddings — regenerate the oracle for this corpus")
    s
  }

  /** Phrase search over the survivor universe (doc_id ≢ 5 mod 17) —
    * shared verbatim by the batch takedown (`text_search_compact`) and
    * the streamed-lifecycle compaction (`stream_text_index_compact`). */
  private val CompactPhraseOracleSql: String =
    """WITH tk AS (
      |  SELECT doc_id, list_filter(string_split(lower(text), ' '), x -> len(x) > 0) AS t
      |  FROM documents WHERE doc_id % 17 <> 5),
      |m AS (SELECT doc_id, unnest(range(len(t) - 1)) AS i, t FROM tk WHERE len(t) >= 2),
      |hit AS (SELECT doc_id, CAST(i AS BIGINT) AS pos FROM m
      |        WHERE t[i+1] = 'agg' AND t[i+2] = 'join')
      |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_matches, min(pos) AS first_pos
      |FROM hit GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** Exact brute-force cosine top-10 from query vec_id=0 — the oracle
    * every probe-all/rerank-all PQ identity entry shares verbatim
    * (`sim_topk_brute`, `stream_pq_index_refresh`,
    * `sim_pq_index_retrain`). */
  private val BruteTopkOracleSql: String =
    """WITH n AS (
      |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb,
      |         sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[]))) AS nrm
      |  FROM embeddings),
      |q AS (SELECT emb AS q_emb, nrm AS q_nrm FROM n WHERE vec_id = 0)
      |SELECT vec_id, round(list_dot_product(emb, q_emb) / (nrm * q_nrm), 6) AS cos_sim
      |FROM n, q WHERE vec_id <> 0
      |ORDER BY cos_sim DESC, vec_id LIMIT 10""".stripMargin

  /** [[BruteTopkOracleSql]] restricted to the compaction survivors
    * (vec_id ≢ 5 mod 17): the candidate universe is filtered, the query
    * vector comes from the unfiltered corpus — mirroring the probe path,
    * which reads the query row directly and scans only surviving codes. */
  private val BruteTopkSurvivorsOracleSql: String =
    """WITH n AS (
      |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb,
      |         sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[]))) AS nrm
      |  FROM embeddings),
      |q AS (SELECT emb AS q_emb, nrm AS q_nrm FROM n WHERE vec_id = 0)
      |SELECT vec_id, round(list_dot_product(emb, q_emb) / (nrm * q_nrm), 6) AS cos_sim
      |FROM n, q WHERE vec_id <> 0 AND vec_id % 17 <> 5
      |ORDER BY cos_sim DESC, vec_id LIMIT 10""".stripMargin

  private val QuantKmeansDerivedOracleSql: String = {
    val Iters = 3; val Dim = 64; val TargetSize = 200
    def d2(a: String, b: String): String =
      s"(list_dot_product(CAST($a AS DOUBLE[]), CAST($a AS DOUBLE[])) - " +
        s"2*list_dot_product(CAST($a AS DOUBLE[]), CAST($b AS DOUBLE[])) + " +
        s"list_dot_product(CAST($b AS DOUBLE[]), CAST($b AS DOUBLE[])))"
    val parts = scala.collection.mutable.ArrayBuffer[String]()
    parts += s"""WITH RECURSIVE nv AS (
      |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb,
      |         sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[]))) AS nrm
      |  FROM embeddings),
      |qv AS (
      |  SELECT vec_id, list_transform(emb, x -> CAST(round(x / nrm * 1000) AS BIGINT)) AS q
      |  FROM nv WHERE nrm > 0),
      |kval AS (SELECT GREATEST(2, (2*count(*) + $TargetSize) // (2*$TargetSize)) AS k FROM qv),
      |sr(i, cs) AS (
      |  SELECT 1, [(SELECT q FROM qv WHERE vec_id = (SELECT min(vec_id) FROM qv))]
      |  UNION ALL
      |  SELECT i + 1, list_append(cs, (
      |      SELECT q FROM qv
      |      ORDER BY list_min(list_transform(cs, c -> ${d2("q", "c")})) DESC, vec_id
      |      LIMIT 1))
      |  FROM sr WHERE i < (SELECT k FROM kval)),
      |seeds AS (SELECT cs FROM sr ORDER BY i DESC LIMIT 1),
      |cent0 AS (SELECT CAST(j AS INT) AS cluster, cs[CAST(j AS INT)+1] AS c
      |          FROM seeds, unnest(range(len(cs))) AS t(j))""".stripMargin
    for (it <- 0 until Iters) {
      parts += s"""a$it AS (
        |  SELECT vec_id, q, cluster FROM (
        |    SELECT v.vec_id, v.q, c.cluster,
        |      row_number() OVER (PARTITION BY v.vec_id
        |        ORDER BY ${d2("v.q", "c.c")}, c.cluster) AS rn
        |    FROM qv v CROSS JOIN cent$it c) WHERE rn = 1)""".stripMargin
      if (it < Iters - 1)
        parts += s"""upd$it AS (
          |  SELECT cluster, list(CAST(m AS BIGINT) ORDER BY j) AS c FROM (
          |    SELECT cluster, j,
          |      CASE WHEN S >= 0 THEN (2*S + cnt) // (2*cnt)
          |           ELSE -((2*(-S) + cnt) // (2*cnt)) END AS m
          |    FROM (
          |      SELECT cluster, j, SUM(q[j + 1]) AS S, count(*) AS cnt
          |      FROM (SELECT cluster, q, unnest(range($Dim)) AS j FROM a$it)
          |      GROUP BY 1, 2))
          |  GROUP BY cluster),
          |cent${it + 1} AS (
          |  SELECT p.cluster, coalesce(u.c, p.c) AS c
          |  FROM cent$it p LEFT JOIN upd$it u USING (cluster))""".stripMargin
    }
    val last = s"a${Iters - 1}"
    parts.mkString(",\n") + s""",
      |dropped AS (
      |  SELECT DISTINCT cb.vec_id
      |  FROM $last ca JOIN $last cb ON ca.cluster = cb.cluster AND ca.vec_id < cb.vec_id
      |  JOIN nv a ON a.vec_id = ca.vec_id JOIN nv b ON b.vec_id = cb.vec_id
      |  WHERE round(list_dot_product(a.emb, b.emb) / (a.nrm * b.nrm), 4) >= 0.3)
      |SELECT vec_id, CAST(cluster AS BIGINT) AS cluster FROM $last
      |WHERE vec_id NOT IN (SELECT vec_id FROM dropped) ORDER BY vec_id""".stripMargin
  }

  /** `sim_ivf_exact`: the IVF PROBE mechanics hash-gated — the same
    * integer coarse quantizer as `dedup_semantic_kmeans_exact` (one CTE
    * chain, shared verbatim), probe = the query's own final assignment
    * (its nearest centroid under the assigner's integer d²), search =
    * exact top-10 cosine among THAT list's members only. Alongside
    * [[PqExactOracleSql]] this closes the ANN family's mechanics: the
    * float production entries (`sim_ivf_kmeans`, `sim_ivf_pq`, the
    * persisted index) keep their recall-artifact contracts, while the
    * quantizer/probe/rank arithmetic is cross-engine exact. */
  private val IvfExactOracleSql: String = {
    val (ctes, last) = QuantKmeansParts
    ctes + s""",
      |qc AS (SELECT cluster FROM $last WHERE vec_id = 0),
      |qv2 AS (SELECT emb AS q_emb, nrm AS q_nrm FROM nv WHERE vec_id = 0)
      |SELECT n.vec_id,
      |  round(list_dot_product(n.emb, q.q_emb) / (n.nrm * q.q_nrm), 6) AS cos_sim
      |FROM $last a JOIN qc USING (cluster)
      |JOIN nv n ON n.vec_id = a.vec_id, qv2 q
      |WHERE n.vec_id <> 0
      |ORDER BY cos_sim DESC, n.vec_id LIMIT 10""".stripMargin
  }

  // lazy: referenced by oracle vals declared above (object vals
  // initialize in declaration order — a forward val reference is null)
  private lazy val QuantKmeansParts: (String, String) = {
    val K = 4; val Iters = 3; val Dim = 64
    def d2(a: String, b: String): String =
      s"(list_dot_product(CAST($a AS DOUBLE[]), CAST($a AS DOUBLE[])) - " +
        s"2*list_dot_product(CAST($a AS DOUBLE[]), CAST($b AS DOUBLE[])) + " +
        s"list_dot_product(CAST($b AS DOUBLE[]), CAST($b AS DOUBLE[])))"
    val parts = scala.collection.mutable.ArrayBuffer[String]()
    parts += """WITH nv AS (
      |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb,
      |         sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[]))) AS nrm
      |  FROM embeddings),
      |qv AS (
      |  SELECT vec_id, list_transform(emb, x -> CAST(round(x / nrm * 1000) AS BIGINT)) AS q
      |  FROM nv WHERE nrm > 0),
      |seed0 AS (SELECT 0 AS cluster, q AS c FROM qv WHERE vec_id = (SELECT min(vec_id) FROM qv))""".stripMargin
    for (i <- 1 until K) {
      val prev = (0 until i).map(j => s"SELECT cluster, c FROM seed$j").mkString(" UNION ALL ")
      parts += s"""seeds${i}_prev AS ($prev),
        |seed$i AS (
        |  SELECT $i AS cluster, q AS c FROM (
        |    SELECT v.vec_id, v.q, min(${d2("v.q", "s.c")}) AS dm
        |    FROM qv v CROSS JOIN seeds${i}_prev s
        |    GROUP BY v.vec_id, v.q)
        |  ORDER BY dm DESC, vec_id LIMIT 1)""".stripMargin
    }
    parts += "cent0 AS (" +
      (0 until K).map(j => s"SELECT cluster, c FROM seed$j").mkString(" UNION ALL ") + ")"
    for (it <- 0 until Iters) {
      parts += s"""a$it AS (
        |  SELECT vec_id, q, cluster FROM (
        |    SELECT v.vec_id, v.q, c.cluster,
        |      row_number() OVER (PARTITION BY v.vec_id
        |        ORDER BY ${d2("v.q", "c.c")}, c.cluster) AS rn
        |    FROM qv v CROSS JOIN cent$it c) WHERE rn = 1)""".stripMargin
      if (it < Iters - 1)
        parts += s"""upd$it AS (
          |  SELECT cluster, list(CAST(m AS BIGINT) ORDER BY j) AS c FROM (
          |    SELECT cluster, j,
          |      CASE WHEN S >= 0 THEN (2*S + cnt) // (2*cnt)
          |           ELSE -((2*(-S) + cnt) // (2*cnt)) END AS m
          |    FROM (
          |      SELECT cluster, j, SUM(q[j + 1]) AS S, count(*) AS cnt
          |      FROM (SELECT cluster, q, unnest(range($Dim)) AS j FROM a$it)
          |      GROUP BY 1, 2))
          |  GROUP BY cluster),
          |cent${it + 1} AS (
          |  SELECT p.cluster, coalesce(u.c, p.c) AS c
          |  FROM cent$it p LEFT JOIN upd$it u USING (cluster))""".stripMargin
    }
    (parts.mkString(",\n"), s"a${Iters - 1}")
  }

  /** `sim_pq_exact`: generated-CTE replay of the integer-exact PQ twin —
    * per SUBSPACE, the same farthest-point seeding + integer Lloyd
    * rounds as [[QuantKmeansOracleSql]] over the milli-quantized slice
    * (DuckDB 1-based inclusive list slicing), then the final assignment
    * IS the encode (tie → lowest code via the (d², cluster) row_number)
    * and the query-0 ADC lookup joins each vector's assigned
    * sub-centroid against the quantized query slice — integer dot
    * products exact in doubles (all terms ≪ 2^53), cast back to BIGINT.
    * One static SQL at the fixed gate geometry (M=4, Sub=16, Ksub=4,
    * Iters=3), valid at every SF. */
  private val PqExactParts: (String, Int) = {
    val M = 4; val Sub = 16; val Ksub = 4; val Iters = 3
    def d2(a: String, b: String): String =
      s"(list_dot_product(CAST($a AS DOUBLE[]), CAST($a AS DOUBLE[])) - " +
        s"2*list_dot_product(CAST($a AS DOUBLE[]), CAST($b AS DOUBLE[])) + " +
        s"list_dot_product(CAST($b AS DOUBLE[]), CAST($b AS DOUBLE[])))"
    val parts = scala.collection.mutable.ArrayBuffer[String]()
    parts += """WITH nv AS (
      |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb,
      |         sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[]))) AS nrm
      |  FROM embeddings),
      |qv AS (
      |  SELECT vec_id, list_transform(emb, x -> CAST(round(x / nrm * 1000) AS BIGINT)) AS q
      |  FROM nv WHERE nrm > 0)""".stripMargin
    for (m <- 0 until M) {
      val off = m * Sub
      parts += s"qs$m AS MATERIALIZED (SELECT vec_id, q[${off + 1}:${off + Sub}] AS q FROM qv)"
      parts += s"seed${m}_0 AS (SELECT 0 AS cluster, q AS c FROM qs$m " +
        s"WHERE vec_id = (SELECT min(vec_id) FROM qs$m))"
      for (i <- 1 until Ksub) {
        val prev = (0 until i).map(j => s"SELECT cluster, c FROM seed${m}_$j")
          .mkString(" UNION ALL ")
        parts += s"""seeds${m}_${i}_prev AS ($prev),
          |seed${m}_$i AS (
          |  SELECT $i AS cluster, q AS c FROM (
          |    SELECT v.vec_id, v.q, min(${d2("v.q", "s.c")}) AS dm
          |    FROM qs$m v CROSS JOIN seeds${m}_${i}_prev s
          |    GROUP BY v.vec_id, v.q)
          |  ORDER BY dm DESC, vec_id LIMIT 1)""".stripMargin
      }
      parts += s"cent${m}_0 AS (" +
        (0 until Ksub).map(j => s"SELECT cluster, c FROM seed${m}_$j").mkString(" UNION ALL ") + ")"
      for (it <- 0 until Iters) {
        parts += s"""asn${m}_$it AS MATERIALIZED (
          |  SELECT vec_id, q, cluster FROM (
          |    SELECT v.vec_id, v.q, c.cluster,
          |      row_number() OVER (PARTITION BY v.vec_id
          |        ORDER BY ${d2("v.q", "c.c")}, c.cluster) AS rn
          |    FROM qs$m v CROSS JOIN cent${m}_$it c) WHERE rn = 1)""".stripMargin
        if (it < Iters - 1)
          parts += s"""upd${m}_$it AS (
            |  SELECT cluster, list(CAST(mv AS BIGINT) ORDER BY j) AS c FROM (
            |    SELECT cluster, j,
            |      CASE WHEN S >= 0 THEN (2*S + cnt) // (2*cnt)
            |           ELSE -((2*(-S) + cnt) // (2*cnt)) END AS mv
            |    FROM (
            |      SELECT cluster, j, SUM(q[j + 1]) AS S, count(*) AS cnt
            |      FROM (SELECT cluster, q, unnest(range($Sub)) AS j FROM asn${m}_$it)
            |      GROUP BY 1, 2))
            |  GROUP BY cluster),
            |cent${m}_${it + 1} AS (
            |  SELECT p.cluster, coalesce(u.c, p.c) AS c
            |  FROM cent${m}_$it p LEFT JOIN upd${m}_$it u USING (cluster))""".stripMargin
      }
      parts += s"""lut$m AS (
        |  SELECT c.cluster,
        |    CAST(list_dot_product(CAST(qq.q AS DOUBLE[]), CAST(c.c AS DOUBLE[])) AS BIGINT) AS lv
        |  FROM cent${m}_${Iters - 1} c, (SELECT q FROM qs$m WHERE vec_id = 0) qq)""".stripMargin
    }
    val last = Iters - 1
    (parts.mkString(",\n"), last)
  }

  private val PqExactOracleSql: String = {
    val (ctes, last) = PqExactParts
    ctes + s"""
      |SELECT a0.vec_id,
      |  CAST(a0.cluster AS BIGINT) AS c0, CAST(a1.cluster AS BIGINT) AS c1,
      |  CAST(a2.cluster AS BIGINT) AS c2, CAST(a3.cluster AS BIGINT) AS c3,
      |  CAST(l0.lv + l1.lv + l2.lv + l3.lv AS BIGINT) AS adc_q
      |FROM asn0_$last a0
      |JOIN asn1_$last a1 USING (vec_id)
      |JOIN asn2_$last a2 USING (vec_id)
      |JOIN asn3_$last a3 USING (vec_id)
      |JOIN lut0 l0 ON l0.cluster = a0.cluster
      |JOIN lut1 l1 ON l1.cluster = a1.cluster
      |JOIN lut2 l2 ON l2.cluster = a2.cluster
      |JOIN lut3 l3 ON l3.cluster = a3.cluster
      |ORDER BY a0.vec_id""".stripMargin
  }

  /** `sim_mmr_pq`: the two exact machineries CONCATENATED — the PQ
    * twin's per-subspace trainer/encoder/LUT CTEs select the integer-ADC
    * top-30 shortlist, then the shared greedy MMR step CTEs
    * ([[MmrStepsSql]]) run over it. Every data-dependent decision in
    * the composition — subspace seeding, Lloyd rounds, encode ties, the
    * additive ADC ranking, the shortlist cut, and each of the 10 greedy
    * selections — is hash-gated by one SQL string. */
  private val MmrPqOracleSql: String = {
    val (ctes, last) = PqExactParts
    ctes + s""",
      |enc AS MATERIALIZED (
      |  SELECT a0.vec_id, CAST(l0.lv + l1.lv + l2.lv + l3.lv AS BIGINT) AS adc_q
      |  FROM asn0_$last a0
      |  JOIN asn1_$last a1 USING (vec_id)
      |  JOIN asn2_$last a2 USING (vec_id)
      |  JOIN asn3_$last a3 USING (vec_id)
      |  JOIN lut0 l0 ON l0.cluster = a0.cluster
      |  JOIN lut1 l1 ON l1.cluster = a1.cluster
      |  JOIN lut2 l2 ON l2.cluster = a2.cluster
      |  JOIN lut3 l3 ON l3.cluster = a3.cluster
      |  WHERE a0.vec_id <> 0),
      |slids AS MATERIALIZED (SELECT vec_id FROM enc ORDER BY adc_q DESC, vec_id LIMIT 30),
      |q2 AS MATERIALIZED (SELECT emb AS q_emb, nrm AS q_nrm FROM nv WHERE vec_id = 0),
      |rel AS MATERIALIZED (
      |  SELECT n.vec_id, CAST(round(list_dot_product(n.emb, q2.q_emb) / (n.nrm * q2.q_nrm) * 1e6) AS BIGINT) AS relq
      |  FROM nv n, q2 WHERE n.vec_id <> 0),
      |sl AS MATERIALIZED (SELECT n.vec_id, n.emb, n.nrm, r.relq
      |  FROM nv n JOIN rel r USING (vec_id) JOIN slids USING (vec_id)),
      |ps AS MATERIALIZED (SELECT a.vec_id AS va, b.vec_id AS vb,
      |  CAST(round(list_dot_product(a.emb, b.emb) / (a.nrm * b.nrm) * 1e6) AS BIGINT) AS sq
      |  FROM sl a JOIN sl b ON a.vec_id <> b.vec_id),
      |""".stripMargin + MmrStepsSql
  }

  /** `text_search_hybrid_pq`: the retrieval composition hash-gated —
    * the PQ twin's trainer/encoder/LUT CTEs produce the integer ADC
    * ranking that IS the dense arm (top-100 cut + rank assignment),
    * the BM25 CTEs (verbatim from `text_search_hybrid`'s oracle, query
    * CTE renamed `qterms` to stay clear of the PQ columns) produce the
    * lexical arm, and the integer RRF full-outer fusion runs over
    * both — one SQL string certifies subspace training, encode ties,
    * ADC, both arm cuts, both rank orders, and the fused top-20. */
  private val HybridPqOracleSql: String = {
    val (ctes, last) = PqExactParts
    ctes + s""",
      |adc AS MATERIALIZED (
      |  SELECT a0.vec_id, CAST(l0.lv + l1.lv + l2.lv + l3.lv AS BIGINT) AS adc_q
      |  FROM asn0_$last a0
      |  JOIN asn1_$last a1 USING (vec_id)
      |  JOIN asn2_$last a2 USING (vec_id)
      |  JOIN asn3_$last a3 USING (vec_id)
      |  JOIN lut0 l0 ON l0.cluster = a0.cluster
      |  JOIN lut1 l1 ON l1.cluster = a1.cluster
      |  JOIN lut2 l2 ON l2.cluster = a2.cluster
      |  JOIN lut3 l3 ON l3.cluster = a3.cluster
      |  WHERE a0.vec_id <> 0),
      |vec AS (SELECT doc_id,
      |          CAST(row_number() OVER (ORDER BY adc_q DESC, doc_id) AS BIGINT) AS rank_vec
      |        FROM (SELECT vec_id AS doc_id, adc_q FROM adc
      |              ORDER BY adc_q DESC, doc_id LIMIT 100)),
      |tok AS (
      |  SELECT doc_id, w FROM documents,
      |    UNNEST(str_split(lower(text), ' ')) AS t(w) WHERE length(w) > 0),
      |dt AS (SELECT doc_id, w AS word, CAST(count(*) AS BIGINT) AS tf FROM tok GROUP BY 1, 2),
      |dl AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS dl FROM dt GROUP BY 1),
      |tot AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
      |               CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl FROM dl),
      |qterms AS (SELECT unnest(['dup', 'merge']) AS word),
      |df AS (SELECT word, CAST(count(*) AS BIGINT) AS df FROM dt JOIN qterms USING (word) GROUP BY 1),
      |contrib AS (
      |  SELECT dt.doc_id,
      |    CAST(round(1e6 * ln(1 + (tot.n_docs - df.df + 0.5) / (df.df + 0.5))
      |      * (dt.tf * 2.2) / (dt.tf + 1.2 * (0.25 + 0.75 * dl.dl / tot.avgdl))) AS BIGINT) AS wq
      |  FROM dt JOIN qterms USING (word) JOIN df USING (word)
      |  JOIN dl USING (doc_id) CROSS JOIN tot),
      |lexsc AS (SELECT doc_id, CAST(sum(wq) AS BIGINT) AS score_q FROM contrib GROUP BY 1),
      |lex AS (SELECT doc_id,
      |          CAST(row_number() OVER (ORDER BY score_q DESC, doc_id) AS BIGINT) AS rank_lex
      |        FROM (SELECT * FROM lexsc ORDER BY score_q DESC, doc_id LIMIT 100)),
      |fused AS (
      |  SELECT COALESCE(lex.doc_id, vec.doc_id) AS doc_id,
      |    CAST(COALESCE(1000000 // (60 + rank_lex), 0)
      |       + COALESCE(1000000 // (60 + rank_vec), 0) AS BIGINT) AS rrf,
      |    COALESCE(rank_lex, CAST(0 AS BIGINT)) AS rank_lex,
      |    COALESCE(rank_vec, CAST(0 AS BIGINT)) AS rank_vec
      |  FROM lex FULL OUTER JOIN vec ON lex.doc_id = vec.doc_id),
      |topn AS (SELECT * FROM fused ORDER BY rrf DESC, doc_id LIMIT 20)
      |SELECT CAST(row_number() OVER (ORDER BY rrf DESC, doc_id) AS BIGINT) AS rank,
      |       doc_id, rank_lex, rank_vec, rrf
      |FROM topn ORDER BY rank""".stripMargin
  }

  /** `sim_pca_project`: generated-CTE replay of the ENTIRE fixed-point
    * PCA (`Similarity.topEigenQuant`) — moments → quantized integer
    * covariance → per component: rescale₂₇, six integer matrix
    * squarings (M ∝ A^64), sign-pinned rescale₂₀ start-vector product,
    * integer Rayleigh quotient, integer deflation — then the quantized
    * centered projection. Every intermediate is exact integer
    * arithmetic (hugeint where 64-bit would overflow), truncation
    * toward zero stated as `CASE WHEN x >= 0 THEN x // d ELSE
    * -((-x) // d) END` so the engines cannot disagree on negative
    * division; the only doubles are correctly-rounded IEEE ops over
    * exactly-representable integers. The rescale shifts are generated
    * threshold CASE chains (pure integer compares — the engine picks
    * the same power-of-two divisor from the same max). */
  private val PcaOracleSql: String = {
    val Dim = 64; val K = 4; val Squarings = 6
    // smallest power-of-two divisor d with max/d < 2^target — the SQL
    // twin of Similarity.shiftFor (bitlength comparison chain)
    def dvCase(mx: String, target: Int): String = {
      val branches = (0 to (62 - target)).map { sft =>
        s"WHEN $mx < ${1L << (target + sft)} THEN ${1L << sft}"
      }.mkString(" ")
      s"CASE $branches ELSE ${1L << (62 - target)} END"
    }
    def tdiv(x: String, d: String): String =
      s"CASE WHEN $x >= 0 THEN $x // $d ELSE -((-($x)) // $d) END"
    val parts = scala.collection.mutable.ArrayBuffer[String]()
    parts += s"""WITH e AS MATERIALIZED (
      |  SELECT vec_id, j AS i, CAST(embedding[j + 1] AS DOUBLE) AS x
      |  FROM (SELECT vec_id, embedding, unnest(range($Dim)) AS j FROM embeddings)),
      |cn AS (SELECT count(*) AS n FROM embeddings),
      |sm AS MATERIALIZED (SELECT i, sum(x) AS s FROM e GROUP BY i),
      |pr AS MATERIALIZED (SELECT a.i AS i, b.i AS j, sum(a.x * b.x) AS p
      |  FROM e a JOIN e b ON a.vec_id = b.vec_id AND a.i <= b.i GROUP BY 1, 2),
      |mu AS (SELECT i, s / n AS mu FROM sm, cn),
      |muq AS MATERIALIZED (SELECT i, CAST(floor(s / n * 1e6 + 0.5) AS BIGINT) AS m FROM sm, cn),
      |cu AS (SELECT p.i AS i, p.j AS j,
      |  CAST(floor((p.p - n * ma.mu * mb.mu) / (n - 1) * 1e6 + 0.5) AS BIGINT) AS qv
      |  FROM pr p CROSS JOIN cn JOIN mu ma ON ma.i = p.i JOIN mu mb ON mb.i = p.j),
      |a0 AS MATERIALIZED (SELECT i, j, qv FROM cu
      |  UNION ALL SELECT j AS i, i AS j, qv FROM cu WHERE i <> j),
      |xq AS MATERIALIZED (SELECT vec_id, j AS i,
      |  CAST(floor(CAST(embedding[j + 1] AS DOUBLE) * 1e6 + 0.5) AS BIGINT) AS xq
      |  FROM (SELECT vec_id, embedding, unnest(range($Dim)) AS j FROM embeddings))""".stripMargin
    for (c <- 0 until K) {
      parts += s"""m${c}_0 AS MATERIALIZED (
        |  SELECT i, j, ${tdiv("qv", "dv")} AS qv
        |  FROM a$c, (SELECT ${dvCase("mx", 27)} AS dv
        |             FROM (SELECT max(abs(qv)) AS mx FROM a$c)))""".stripMargin
      for (t <- 1 to Squarings) {
        parts += s"""sq${c}_$t AS MATERIALIZED (
          |  SELECT a.i AS i, b.j AS j, CAST(sum(a.qv * b.qv) AS BIGINT) AS qv
          |  FROM m${c}_${t - 1} a JOIN m${c}_${t - 1} b ON a.j = b.i GROUP BY 1, 2),
          |m${c}_$t AS MATERIALIZED (
          |  SELECT i, j, ${tdiv("qv", "dv")} AS qv
          |  FROM sq${c}_$t, (SELECT ${dvCase("mx", 27)} AS dv
          |                   FROM (SELECT max(abs(qv)) AS mx FROM sq${c}_$t)))""".stripMargin
      }
      parts += s"""vr$c AS (SELECT i, CAST(sum(qv) AS BIGINT) AS x FROM m${c}_$Squarings GROUP BY i),
        |vs$c AS MATERIALIZED (SELECT i, ${tdiv("x", "dv")} AS x
        |  FROM vr$c, (SELECT ${dvCase("mx", 20)} AS dv
        |              FROM (SELECT max(abs(x)) AS mx FROM vr$c))),
        |v$c AS MATERIALIZED (SELECT i, x * (SELECT CASE WHEN x < 0 THEN -1 ELSE 1 END
        |  FROM vs$c WHERE x <> 0 ORDER BY i LIMIT 1) AS x FROM vs$c),
        |w$c AS MATERIALIZED (SELECT q.i AS i, CAST(sum(q.qv * v.x) AS BIGINT) AS wx
        |  FROM a$c q JOIN v$c v ON q.j = v.i GROUP BY 1),
        |sc$c AS MATERIALIZED (SELECT
        |  (SELECT CAST(sum(x * x) AS BIGINT) FROM v$c) AS vv,
        |  (SELECT sum(CAST(x AS HUGEINT) * wx) FROM v$c JOIN w$c USING (i)) AS r),
        |lam$c AS MATERIALIZED (SELECT vv,
        |  CAST(${tdiv("r", "vv")} AS BIGINT) AS lam FROM sc$c),
        |pc$c AS MATERIALIZED (SELECT x.vec_id,
        |  round(CAST(sum((x.xq - mq.m) * v.x) AS DOUBLE) /
        |        (1e6 * sqrt(CAST((SELECT vv FROM lam$c) AS DOUBLE))), 6) AS pc
        |  FROM xq x JOIN muq mq ON mq.i = x.i JOIN v$c v ON v.i = x.i
        |  GROUP BY x.vec_id)""".stripMargin
      if (c < K - 1)
        parts += s"""a${c + 1} AS MATERIALIZED (
          |  SELECT i, j, qv - CAST(${tdiv("tt", "vv")} AS BIGINT) AS qv
          |  FROM (SELECT q.i AS i, q.j AS j, q.qv AS qv,
          |          CAST(l.lam AS HUGEINT) * va.x * vb.x AS tt, l.vv AS vv
          |        FROM a$c q JOIN v$c va ON va.i = q.i JOIN v$c vb ON vb.i = q.j
          |        CROSS JOIN lam$c l) d)""".stripMargin
    }
    parts.mkString(",\n") + s"""
      |SELECT b.vec_id,
      |  ${(0 until K).map(c => s"p$c.pc AS pc_${c + 1}").mkString(", ")},
      |  ${(0 until K).map(c => s"(SELECT CAST(lam AS DOUBLE) / 1e6 FROM lam$c) AS ev_${c + 1}").mkString(", ")}
      |FROM (SELECT vec_id FROM embeddings) b
      |${(0 until K).map(c => s"JOIN pc$c p$c USING (vec_id)").mkString(" ")}
      |ORDER BY vec_id""".stripMargin
  }

  /** `stream_neardup_ttl_expiry`: the closed form of the EventTimeTimeout
    * state machine under the query's replay geometry — 8 doc_id-range
    * micro-batches (the count is load-bearing: it fixes the watermark
    * checkpoints, so query and oracle must move together, and a coarser
    * split starves the 500-doc gate corpus of any firing expiry), event
    * time = epoch + doc_id seconds, horizon = one batch width `w`. Per bucket (members id-sorted): a member opens a
    * new EPOCH iff its batch is ≥ 2 past its predecessor's (the timeout
    * only fires in a batch where the key has no data) and the eviction
    * watermark of the last dataless batch — max id before batch(cur)−1,
    * minus w — STRICTLY passed the predecessor's timeout (pred + w);
    * Spark's timeout comparison is strict (`timeoutTimestamp <
    * watermark`), hence `>` not `>=`. Every non-opener reports its
    * epoch's opener; the drain folds min over bands. */
  private val NearDupTtlExpiryOracleSql: String = NearDupBandCtes + ",\n" +
      """params AS (SELECT (max(doc_id) + 8) // 8 AS w FROM documents),
        |bmax AS (SELECT doc_id // (SELECT w FROM params) AS b, max(doc_id) AS mx
        |         FROM documents GROUP BY 1),
        |memb AS (SELECT band, band_hash, doc_id,
        |  lag(doc_id) OVER (PARTITION BY band, band_hash ORDER BY doc_id) AS prev
        |  FROM bands),
        |seg AS (SELECT band, band_hash, doc_id, prev,
        |  (prev IS NULL OR (
        |     doc_id // (SELECT w FROM params) - prev // (SELECT w FROM params) >= 2
        |     AND coalesce((SELECT max(mx) FROM bmax
        |                   WHERE b <= doc_id // (SELECT w FROM params) - 2), -1)
        |         > prev + 2 * (SELECT w FROM params))) AS is_start
        |  FROM memb),
        |ep AS (SELECT doc_id, is_start,
        |  max(CASE WHEN is_start THEN doc_id END) OVER
        |    (PARTITION BY band, band_hash ORDER BY doc_id
        |     ROWS UNBOUNDED PRECEDING) AS owner
        |  FROM seg)
        |SELECT doc_id, min(owner) AS near_dup_of
        |FROM ep WHERE NOT is_start GROUP BY 1 ORDER BY doc_id""".stripMargin

  /** Shared by `dedup_incremental` and `dedup_incremental_idx`: the full
    * pair computation restricted to pairs touching the "new batch"
    * (doc_id % 10 = 7) — the engine must reproduce it while NEVER
    * generating an index×index candidate (and, for `_idx`, while reading
    * the index from its persisted parquet form). */
  private val IncrementalOracleSql: String =
      """WITH tk AS (
        |  SELECT doc_id, list_filter(string_split(text, ' '), x -> len(x) > 0) AS tk
        |  FROM documents),
        |pos AS (SELECT doc_id, tk, unnest(range(len(tk) - 2)) AS i FROM tk WHERE len(tk) >= 3),
        |sh AS (SELECT DISTINCT doc_id, tk[i+1] || ' ' || tk[i+2] || ' ' || tk[i+3] AS shingle FROM pos),
        |perms AS (SELECT doc_id, shingle, unnest(range(8)) AS perm FROM sh),
        |sig AS (SELECT doc_id, perm, min(substr(md5(CAST(perm // 4 AS VARCHAR) || '|' || shingle), (perm % 4) * 8 + 1, 8)) AS mh
        |        FROM perms GROUP BY 1, 2),
        |bands AS (SELECT doc_id, perm // 2 AS band,
        |  md5(string_agg(CAST(perm AS VARCHAR) || ':' || mh, '|'
        |      ORDER BY CAST(perm AS VARCHAR) || ':' || mh)) AS band_hash
        |  FROM sig GROUP BY 1, 2),
        |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        |  FROM bands a JOIN bands b
        |  ON a.band = b.band AND a.band_hash = b.band_hash AND a.doc_id < b.doc_id
        |  WHERE a.doc_id % 10 = 7 OR b.doc_id % 10 = 7),
        |shh AS (SELECT DISTINCT doc_id,
        |  ('0x' || substr(md5(shingle), 1, 15))::BIGINT AS sh FROM sh),
        |cnt AS (SELECT doc_id, count(*) AS n_sh FROM shh GROUP BY 1),
        |inter AS (SELECT doc_a, doc_b, count(*) AS n_inter
        |  FROM cand JOIN shh sa ON doc_a = sa.doc_id
        |  JOIN shh sb ON doc_b = sb.doc_id AND sa.sh = sb.sh
        |  GROUP BY 1, 2)
        |SELECT * FROM (
        |  SELECT doc_a, doc_b,
        |    round(CAST(n_inter AS DOUBLE) / (ca.n_sh + cb.n_sh - n_inter), 4) AS jaccard
        |  FROM inter JOIN cnt ca ON doc_a = ca.doc_id JOIN cnt cb ON doc_b = cb.doc_id)
        |WHERE jaccard >= 0.5 ORDER BY doc_a, doc_b""".stripMargin

  def oracleSql: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |round(sum(l_quantity), 2) AS sum_qty,
        |round(sum(l_extendedprice), 2) AS sum_base_price,
        |round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS sum_disc_price,
        |round(avg(l_quantity), 4) AS avg_qty,
        |round(avg(l_discount), 4) AS avg_disc,
        |count(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q2_join_agg" ->
      """SELECT r_name, n_name,
        |round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue,
        |count(*) AS n_lines
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin,

    "q3_topk" ->
      """SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS o_date,
        |round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE o_orderstatus = 'F'
        |GROUP BY o_orderkey, strftime(o_orderdate, '%Y-%m-%d')
        |ORDER BY revenue DESC, o_orderkey LIMIT 10""".stripMargin,

    "q4_window" ->
      """SELECT l_suppkey, rn, l_orderkey, l_linenumber, run_qty FROM (
        |  SELECT l_suppkey, l_orderkey, l_linenumber,
        |    CAST(row_number() OVER w AS INT) AS rn,
        |    round(sum(l_quantity) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS run_qty
        |  FROM lineitem
        |  WINDOW w AS (PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber))
        |WHERE rn <= 3 ORDER BY l_suppkey, rn""".stripMargin,

    "q5_semi_join" ->
      """SELECT c_mktsegment, count(*) AS n_customers FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,

    "q6_anti_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'P')
        |ORDER BY c_custkey""".stripMargin,

    "q7_rollup" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
        |coalesce(l_linestatus, 'ALL') AS linestatus,
        |round(sum(l_extendedprice), 2) AS sum_price, count(*) AS n
        |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY returnflag, linestatus""".stripMargin,

    "q8_cube" ->
      """SELECT coalesce(o_orderstatus, 'ALL') AS orderstatus,
        |coalesce(o_orderpriority, 'ALL') AS orderpriority,
        |round(sum(o_totalprice), 2) AS sum_price, count(*) AS n
        |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
        |ORDER BY orderstatus, orderpriority""".stripMargin,

    "q9_grouping_sets" ->
      """SELECT coalesce(o_orderstatus, 'ALL') AS orderstatus,
        |coalesce(CAST(year(o_orderdate) AS VARCHAR), 'ALL') AS order_year,
        |round(sum(o_totalprice), 2) AS sum_price, count(*) AS n
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus), (year(o_orderdate)), ())
        |ORDER BY orderstatus, order_year""".stripMargin,

    "q10_set_ops" ->
      """SELECT c_custkey FROM (
        |  (SELECT c_custkey FROM (
        |     SELECT c_custkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE'
        |     UNION
        |     SELECT c_custkey FROM customer WHERE c_acctbal > 5000.0)
        |   INTERSECT SELECT c_custkey FROM customer)
        |  EXCEPT SELECT c_custkey FROM customer WHERE c_nationkey < 5)
        |ORDER BY c_custkey""".stripMargin,

    "q11_distinct_agg" ->
      """SELECT l_suppkey, count(DISTINCT l_partkey) AS n_parts,
        |count(DISTINCT (l_returnflag, l_linestatus)) AS n_flag_status,
        |count(*) AS n_lines
        |FROM lineitem GROUP BY l_suppkey ORDER BY l_suppkey""".stripMargin,

    "q12_scalar_fns" ->
      """SELECT o_orderkey,
        |CAST(year(o_orderdate) AS BIGINT) AS order_year,
        |CAST(month(o_orderdate) AS BIGINT) AS order_month,
        |upper(substring(o_orderpriority, 1, 8)) AS prio_upper,
        |CAST(length(o_orderstatus) AS BIGINT) AS status_len,
        |round(abs(o_totalprice - 100000.0), 2) AS price_dist,
        |o_orderkey % 7 AS key_mod,
        |o_orderstatus || '-' || o_orderpriority AS status_prio
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "q13_word_count" ->
      """SELECT word, count(*) AS n FROM (
        |  SELECT unnest(string_split(text, ' ')) AS word FROM documents)
        |WHERE len(word) > 0 GROUP BY word
        |ORDER BY n DESC, word LIMIT 50""".stripMargin,

    "q14_tumbling_window" ->
      """SELECT (epoch_ns(ts) // 300000000000) * 300 AS bucket,
        |event_type, count(*) AS n_events, round(sum(value), 2) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY bucket, event_type""".stripMargin,

    "q15_sessionize" ->
      """WITH x AS (
        |  SELECT user_id, epoch_ns(ts) AS ets,
        |    lag(epoch_ns(ts)) OVER (PARTITION BY user_id ORDER BY epoch_ns(ts), event_id) AS prev
        |  FROM events)
        |SELECT user_id,
        |  CAST(sum(CASE WHEN prev IS NULL OR ets - prev > 1800000000000 THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions,
        |  count(*) AS n_events
        |FROM x GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q16_subquery" ->
      """WITH a AS (SELECT o_custkey AS ck, avg(o_totalprice) AS avg_price
        |           FROM orders GROUP BY 1)
        |SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS o_totalprice
        |FROM orders JOIN a ON o_custkey = ck
        |WHERE o_totalprice > avg_price * 1.5 ORDER BY o_orderkey""".stripMargin,

    "q17_outer_join" ->
      """SELECT coalesce(c_custkey, o_custkey) AS custkey,
        |CASE WHEN c_custkey IS NULL THEN 'right_only'
        |     WHEN o_custkey IS NULL THEN 'left_only'
        |     ELSE 'both' END AS side,
        |coalesce(n_orders, 0) AS n_orders
        |FROM (SELECT c_custkey, c_name FROM customer WHERE c_custkey <= 60) c
        |FULL OUTER JOIN (SELECT o_custkey, count(*) AS n_orders
        |                 FROM orders WHERE o_custkey <= 120 GROUP BY 1) o
        |ON c_custkey = o_custkey
        |ORDER BY custkey""".stripMargin,

    "q18_percentiles" ->
      """SELECT c_mktsegment,
        |round(quantile_cont(c_acctbal, 0.5), 4) AS p50,
        |round(quantile_cont(c_acctbal, 0.9), 4) AS p90,
        |round(stddev_samp(c_acctbal), 4) AS sd,
        |round(avg(c_acctbal), 4) AS mean,
        |count(*) AS n
        |FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,

    "q19_salted_agg" ->
      """SELECT word, count(*) AS n FROM (
        |  SELECT unnest(string_split(text, ' ')) AS word FROM documents)
        |WHERE len(word) > 0 GROUP BY word HAVING count(*) >= 50
        |ORDER BY n DESC, word""".stripMargin,

    "q21_json_fns" ->
      """SELECT event_type,
        |count(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS n_with_k,
        |coalesce(CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT), 0) AS sum_k,
        |round(avg(CAST(json_extract_string(props, '$.k') AS BIGINT)), 4) AS avg_k
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q22_window_suite" ->
      """SELECT o_custkey, o_orderkey,
        |row_number() OVER w AS rn,
        |dense_rank() OVER w AS drk,
        |ntile(4) OVER w AS quartile,
        |lead(o_orderkey, 1) OVER w AS next_key,
        |lag(o_orderkey, 1) OVER w AS prev_key,
        |first_value(o_orderkey) OVER w AS first_key,
        |round(percent_rank() OVER w, 6) AS pct_rank
        |FROM orders WHERE o_custkey <= 30
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_custkey, rn""".stripMargin,

    "q23_string_fns" ->
      """SELECT c_custkey,
        |lpad(c_mktsegment, 12, '*') AS padded,
        |reverse(c_name) AS rev,
        |translate(c_mktsegment, 'AEIOU', 'aeiou') AS xlat,
        |repeat(substring(c_mktsegment, 1, 2), 3) AS rep,
        |CAST(strpos(c_name, '0') AS BIGINT) AS pos0,
        |CAST(levenshtein(c_mktsegment, 'MACHINERY') AS BIGINT) AS lev,
        |concat_ws('|', upper(c_mktsegment), lower(c_name)) AS joined
        |FROM customer WHERE c_custkey <= 100 ORDER BY c_custkey""".stripMargin,

    "q24_date_fns" ->
      """SELECT o_orderkey,
        |CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '1998-01-01') AS BIGINT) AS days_to_98,
        |strftime(CAST(o_orderdate + INTERVAL 3 MONTH AS DATE), '%Y-%m-%d') AS plus3m,
        |strftime(last_day(CAST(o_orderdate AS DATE)), '%Y-%m-%d') AS month_end,
        |CAST(isodow(o_orderdate) AS BIGINT) AS isodow,
        |CAST(quarter(o_orderdate) AS BIGINT) AS qtr,
        |strftime(CAST(date_trunc('month', o_orderdate) AS DATE), '%Y-%m-%d') AS month_start
        |FROM orders WHERE o_orderkey <= 300 ORDER BY o_orderkey""".stripMargin,

    "q25_asof_join" ->
      """WITH e AS (
        |  SELECT event_id, user_id, epoch_ns(ts) AS ts_ns, event_type
        |  FROM events WHERE event_type IN ('error', 'click')),
        |w AS (
        |  SELECT *, max(CASE WHEN event_type = 'click' THEN ts_ns END) OVER
        |    (PARTITION BY user_id ORDER BY ts_ns
        |     RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS click_ts
        |  FROM e)
        |SELECT event_id, user_id, ts_ns AS error_ts, click_ts,
        |       ts_ns - click_ts AS gap_ns
        |FROM w WHERE event_type = 'error' AND click_ts IS NOT NULL
        |ORDER BY event_id""".stripMargin,

    "q26_pivot" ->
      """SELECT epoch_ns(ts) // 3600000000000 AS hour_bucket,
        |count(*) FILTER (WHERE event_type = 'click') AS n_click,
        |count(*) FILTER (WHERE event_type = 'error') AS n_error,
        |count(*) FILTER (WHERE event_type = 'purchase') AS n_purchase,
        |count(*) FILTER (WHERE event_type = 'signup') AS n_signup,
        |count(*) FILTER (WHERE event_type = 'view') AS n_view
        |FROM events GROUP BY 1 ORDER BY hour_bucket""".stripMargin,

    "q27_unpivot" ->
      """WITH a AS (
        |  SELECT l_returnflag,
        |         round(sum(l_quantity), 2) AS sum_qty,
        |         round(sum(l_extendedprice), 2) AS sum_price,
        |         round(sum(l_discount), 2) AS sum_disc
        |  FROM lineitem GROUP BY 1)
        |SELECT l_returnflag, 'sum_qty' AS measure, sum_qty AS value FROM a
        |UNION ALL SELECT l_returnflag, 'sum_price', sum_price FROM a
        |UNION ALL SELECT l_returnflag, 'sum_disc', sum_disc FROM a
        |ORDER BY l_returnflag, measure""".stripMargin,

    "q28_range_join" ->
      """WITH e AS (SELECT event_id, user_id, epoch_ns(ts) AS ts_ns
        |           FROM events WHERE event_type = 'error'),
        |c AS (SELECT user_id, epoch_ns(ts) AS ts_ns
        |      FROM events WHERE event_type = 'click')
        |SELECT e.event_id, count(c.user_id) AS n_prior_clicks
        |FROM e LEFT JOIN c
        |  ON c.user_id = e.user_id
        | AND c.ts_ns >= e.ts_ns - 600000000000
        | AND c.ts_ns < e.ts_ns
        |GROUP BY 1 ORDER BY event_id""".stripMargin,

    "q31_set_ops_all" ->
      """WITH ship AS (SELECT l_suppkey AS k FROM lineitem),
        |rcpt AS (SELECT l_suppkey AS k FROM lineitem WHERE l_quantity >= 25),
        |disc AS (SELECT l_suppkey AS k FROM lineitem WHERE l_discount > 0.09),
        |bag AS (
        |  SELECT k FROM (SELECT k FROM ship INTERSECT ALL SELECT k FROM rcpt)
        |  EXCEPT ALL SELECT k FROM disc)
        |SELECT k, count(*) AS copies FROM bag GROUP BY k ORDER BY k""".stripMargin,

    "q32_filtered_agg" ->
      """SELECT o_orderpriority,
        |       count(*) AS n_all,
        |       count(*) FILTER (WHERE o_totalprice > 100000) AS n_big,
        |       count(*) FILTER (WHERE o_orderstatus = 'F') AS n_final,
        |       cast(round(sum(o_totalprice) FILTER (WHERE o_orderstatus = 'O'), 2) AS DOUBLE) AS open_value
        |FROM orders
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,

    "q29_recursive_cte" ->
      """WITH RECURSIVE months(m) AS (
        |  SELECT cast(date_trunc('month', (SELECT min(o_orderdate) FROM orders)) AS date)
        |  UNION ALL
        |  SELECT cast(m + INTERVAL 1 MONTH AS date) FROM months
        |  WHERE m < cast(date_trunc('month', (SELECT max(o_orderdate) FROM orders)) AS date)
        |),
        |per_month AS (
        |  SELECT cast(date_trunc('month', o_orderdate) AS date) AS m,
        |         count(*) AS cnt
        |  FROM orders GROUP BY 1
        |)
        |SELECT strftime(months.m, '%Y-%m-%d') AS m,
        |       cast(coalesce(cnt, 0) AS bigint) AS n
        |FROM months LEFT JOIN per_month ON months.m = per_month.m
        |ORDER BY m""".stripMargin,

    "q30_lateral" ->
      """SELECT n_name, c.c_custkey, c.c_acctbal
        |FROM nation, LATERAL (
        |  SELECT c_custkey, c_acctbal FROM customer
        |  WHERE c_nationkey = n_nationkey
        |  ORDER BY c_acctbal DESC, c_custkey LIMIT 2
        |) c
        |ORDER BY n_name, c_acctbal DESC, c_custkey""".stripMargin,

    "dedup_exact" ->
      """SELECT md5(text) AS text_hash, min(doc_id) AS keep_id,
        |       count(*) AS n_copies
        |FROM documents GROUP BY 1 ORDER BY text_hash""".stripMargin,

    "dedup_minhash_lsh" ->
      """WITH tk AS (
        |  SELECT doc_id, list_filter(string_split(text, ' '), x -> len(x) > 0) AS tk
        |  FROM documents),
        |pos AS (SELECT doc_id, tk, unnest(range(len(tk) - 2)) AS i FROM tk WHERE len(tk) >= 3),
        |sh AS (SELECT DISTINCT doc_id, tk[i+1] || ' ' || tk[i+2] || ' ' || tk[i+3] AS shingle FROM pos),
        |perms AS (SELECT doc_id, shingle, unnest(range(8)) AS perm FROM sh),
        |sig AS (SELECT doc_id, perm, min(substr(md5(CAST(perm // 4 AS VARCHAR) || '|' || shingle), (perm % 4) * 8 + 1, 8)) AS mh
        |        FROM perms GROUP BY 1, 2),
        |bands AS (SELECT doc_id, perm // 2 AS band,
        |  md5(string_agg(CAST(perm AS VARCHAR) || ':' || mh, '|'
        |      ORDER BY CAST(perm AS VARCHAR) || ':' || mh)) AS band_hash
        |  FROM sig GROUP BY 1, 2),
        |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        |  FROM bands a JOIN bands b
        |  ON a.band = b.band AND a.band_hash = b.band_hash AND a.doc_id < b.doc_id),
        |shh AS (SELECT DISTINCT doc_id,
        |  ('0x' || substr(md5(shingle), 1, 15))::BIGINT AS sh FROM sh),
        |cnt AS (SELECT doc_id, count(*) AS n_sh FROM shh GROUP BY 1),
        |inter AS (SELECT doc_a, doc_b, count(*) AS n_inter
        |  FROM cand JOIN shh sa ON doc_a = sa.doc_id
        |  JOIN shh sb ON doc_b = sb.doc_id AND sa.sh = sb.sh
        |  GROUP BY 1, 2)
        |SELECT * FROM (
        |  SELECT doc_a, doc_b,
        |    round(CAST(n_inter AS DOUBLE) / (ca.n_sh + cb.n_sh - n_inter), 4) AS jaccard
        |  FROM inter JOIN cnt ca ON doc_a = ca.doc_id JOIN cnt cb ON doc_b = cb.doc_id)
        |WHERE jaccard >= 0.5 ORDER BY doc_a, doc_b""".stripMargin,

    // the full pair computation restricted to pairs touching the "new
    // batch" (doc_id % 10 = 7) — the engine side must reproduce it while
    // NEVER generating an index×index candidate
    "dedup_incremental" -> IncrementalOracleSql,

    // identical statement: the persisted-index path must hash-match the
    // same oracle as the recompute path
    "dedup_incremental_idx" -> IncrementalOracleSql,

    // same pair SQL over the survivor universe: retired index docs
    // (doc_id % 17 = 5, non-batch) never existed as far as day 2 cares
    "dedup_index_compact" -> IncrementalOracleSql.replace(
      "FROM documents)",
      "FROM documents WHERE NOT (doc_id % 10 != 7 AND doc_id % 17 = 5))"),

    "dedup_components" -> ComponentsOracleSql,

    // the incremental merge (day-1 labels as star edges + the
    // batch-involving pairs) must land on the FULL recompute answer —
    // same oracle, stronger claim
    "dedup_components_incremental" -> ComponentsOracleSql,

    "dedup_canonical" -> CanonicalOracleSql,

    "corpus_split_leakage_safe" -> SplitLeakageSafeOracleSql,

    // the day-2 merged-signature estimate must equal the full-recompute
    // estimate — the oracle IS the full recompute's est CTE
    "dedup_source_overlap_incremental" ->
      """WITH tk AS (
        |  SELECT doc_id, source, list_filter(string_split(text, ' '), x -> len(x) > 0) AS tk
        |  FROM documents),
        |pos AS (SELECT source, tk, unnest(range(len(tk) - 2)) AS i FROM tk WHERE len(tk) >= 3),
        |sh AS (SELECT DISTINCT source, tk[i+1] || ' ' || tk[i+2] || ' ' || tk[i+3] AS shingle FROM pos),
        |perms AS (SELECT source, shingle, unnest(range(8)) AS perm FROM sh),
        |sig AS (SELECT source, perm, min(substr(md5(CAST(perm // 4 AS VARCHAR) || '|' || shingle), (perm % 4) * 8 + 1, 8)) AS mh
        |        FROM perms GROUP BY 1, 2)
        |SELECT a.source AS src_a, b.source AS src_b,
        |  round(sum(CASE WHEN a.mh = b.mh THEN 1 ELSE 0 END) / 8.0, 4) AS est_jaccard
        |FROM sig a JOIN sig b ON a.perm = b.perm AND a.source < b.source
        |GROUP BY 1, 2 ORDER BY src_a, src_b""".stripMargin,

    "dedup_soft" -> (ComponentsCtes +
      """,
        |comp AS (SELECT src AS doc_id, least(src, min(dst)) AS component
        |         FROM reach GROUP BY src),
        |lab AS (SELECT d.doc_id, coalesce(c.component, d.doc_id) AS component
        |        FROM documents d LEFT JOIN comp c USING (doc_id)),
        |sz AS (SELECT doc_id, component,
        |         CAST(count(*) OVER (PARTITION BY component) AS BIGINT) AS group_size
        |       FROM lab)
        |SELECT doc_id, component, group_size,
        |  CAST(CASE WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
        |      < 1152921504606846976 // group_size THEN 1 ELSE 0 END AS BIGINT) AS keep
        |FROM sz ORDER BY doc_id""".stripMargin),

    "dedup_cdc_chunks" ->
      """WITH b AS (
        |  SELECT doc_id, text, len(text) AS n,
        |    list_filter(range(8, len(text)), i -> substr(md5(substr(text, CAST(i - 7 AS INT), 8)), 1, 2) = '00') AS bnd
        |  FROM documents),
        |e AS (SELECT doc_id, text, n, list_concat([0], bnd) AS starts, list_concat(bnd, [n]) AS ends FROM b),
        |ch AS (SELECT doc_id, text, starts, ends, unnest(range(len(starts))) AS k FROM e),
        |cc AS (SELECT doc_id, CAST(k AS BIGINT) AS chunk_id, CAST(starts[k+1] AS BIGINT) AS start_pos,
        |         CAST(ends[k+1] - starts[k+1] AS BIGINT) AS chunk_len,
        |         md5(substr(text, CAST(starts[k+1] + 1 AS INT), CAST(ends[k+1] - starts[k+1] AS INT))) AS chunk_hash
        |       FROM ch)
        |SELECT doc_id, chunk_id, start_pos, chunk_len, chunk_hash,
        |  CAST(count(*) OVER (PARTITION BY chunk_hash) AS BIGINT) AS df
        |FROM cc ORDER BY doc_id, chunk_id""".stripMargin,

    "dedup_source_overlap" ->
      """WITH tk AS (
        |  SELECT doc_id, source, list_filter(string_split(text, ' '), x -> len(x) > 0) AS tk
        |  FROM documents),
        |pos AS (SELECT source, tk, unnest(range(len(tk) - 2)) AS i FROM tk WHERE len(tk) >= 3),
        |sh AS (SELECT DISTINCT source, tk[i+1] || ' ' || tk[i+2] || ' ' || tk[i+3] AS shingle FROM pos),
        |perms AS (SELECT source, shingle, unnest(range(8)) AS perm FROM sh),
        |sig AS (SELECT source, perm, min(substr(md5(CAST(perm // 4 AS VARCHAR) || '|' || shingle), (perm % 4) * 8 + 1, 8)) AS mh
        |        FROM perms GROUP BY 1, 2),
        |est AS (SELECT a.source AS sa, b.source AS sb,
        |          round(sum(CASE WHEN a.mh = b.mh THEN 1 ELSE 0 END) / 8.0, 4) AS est_jaccard
        |        FROM sig a JOIN sig b ON a.perm = b.perm AND a.source < b.source GROUP BY 1, 2),
        |cnt AS (SELECT source, count(*) AS n_sh FROM sh GROUP BY 1),
        |inter AS (SELECT a.source AS sa, b.source AS sb, count(*) AS n_inter
        |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.source < b.source GROUP BY 1, 2)
        |SELECT e.sa AS src_a, e.sb AS src_b, e.est_jaccard,
        |  round(CAST(coalesce(i.n_inter, 0) AS DOUBLE) / (ca.n_sh + cb.n_sh - coalesce(i.n_inter, 0)), 4) AS jaccard
        |FROM est e LEFT JOIN inter i ON e.sa = i.sa AND e.sb = i.sb
        |JOIN cnt ca ON e.sa = ca.source JOIN cnt cb ON e.sb = cb.source
        |ORDER BY src_a, src_b""".stripMargin,

    "dedup_simhash" ->
      """WITH tok AS (
        |  SELECT doc_id, unnest(list_filter(string_split(text, ' '), x -> len(x) > 0)) AS word
        |  FROM documents),
        |h AS (SELECT doc_id, CAST(('0x' || substr(md5(word), 1, 15)) AS BIGINT) AS h FROM tok),
        |hb AS (SELECT doc_id, h, unnest(range(60)) AS b FROM h),
        |bits AS (SELECT doc_id, b,
        |  CAST(sum(CASE WHEN (h >> CAST(b AS INT)) & 1 = 1 THEN 1 ELSE -1 END) AS BIGINT) AS balance
        |  FROM hb GROUP BY 1, 2)
        |SELECT doc_id,
        |  CAST(sum(CASE WHEN balance >= 0 THEN (CAST(1 AS BIGINT) << CAST(b AS INT)) ELSE 0 END) AS BIGINT) AS simhash
        |FROM bits GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "dedup_simhash_pairs" ->
      """WITH tok AS (
        |  SELECT doc_id, unnest(list_filter(string_split(text, ' '), x -> len(x) > 0)) AS word
        |  FROM documents),
        |h AS (SELECT doc_id, CAST(('0x' || substr(md5(word), 1, 15)) AS BIGINT) AS h FROM tok),
        |hb AS (SELECT doc_id, h, unnest(range(60)) AS b FROM h),
        |bits AS (SELECT doc_id, b,
        |  CAST(sum(CASE WHEN (h >> CAST(b AS INT)) & 1 = 1 THEN 1 ELSE -1 END) AS BIGINT) AS balance
        |  FROM hb GROUP BY 1, 2),
        |sig AS (SELECT doc_id,
        |  CAST(sum(CASE WHEN balance >= 0 THEN (CAST(1 AS BIGINT) << CAST(b AS INT)) ELSE 0 END) AS BIGINT) AS simhash
        |  FROM bits GROUP BY doc_id),
        |bands AS (SELECT doc_id, simhash, t, (simhash >> CAST(15*t AS INT)) & 32767 AS bval
        |  FROM (SELECT doc_id, simhash, unnest(range(4)) AS t FROM sig)),
        |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        |  FROM bands a JOIN bands b ON a.t = b.t AND a.bval = b.bval AND a.doc_id < b.doc_id)
        |SELECT * FROM (
        |  SELECT doc_a, doc_b,
        |    CAST(bit_count(xor(sa.simhash, sb.simhash)) AS BIGINT) AS hamming
        |  FROM cand JOIN sig sa ON doc_a = sa.doc_id JOIN sig sb ON doc_b = sb.doc_id)
        |WHERE hamming <= 12 ORDER BY doc_a, doc_b""".stripMargin,

    "dedup_ngram_jaccard" ->
      """WITH g0 AS (SELECT doc_id, text, unnest(range(len(text) - 4)) AS i
        |            FROM documents WHERE len(text) >= 5),
        |grams AS (SELECT DISTINCT doc_id, substr(text, CAST(i AS INT) + 1, 5) AS gram FROM g0),
        |rare AS (SELECT gram FROM (SELECT gram, count(*) AS df FROM grams GROUP BY 1) WHERE df <= 20),
        |cand AS (SELECT DISTINCT ga.doc_id AS doc_a, gb.doc_id AS doc_b
        |  FROM grams ga JOIN rare USING (gram)
        |  JOIN grams gb ON ga.gram = gb.gram AND ga.doc_id < gb.doc_id),
        |cnt AS (SELECT doc_id, count(*) AS n_g FROM grams GROUP BY 1),
        |inter AS (SELECT doc_a, doc_b, count(*) AS n_inter
        |  FROM cand JOIN grams sa ON doc_a = sa.doc_id
        |  JOIN grams sb ON doc_b = sb.doc_id AND sa.gram = sb.gram
        |  GROUP BY 1, 2)
        |SELECT * FROM (
        |  SELECT doc_a, doc_b,
        |    round(CAST(n_inter AS DOUBLE) / (ca.n_g + cb.n_g - n_inter), 4) AS jaccard
        |  FROM inter JOIN cnt ca ON doc_a = ca.doc_id JOIN cnt cb ON doc_b = cb.doc_id)
        |WHERE jaccard >= 0.7 ORDER BY doc_a, doc_b""".stripMargin,

    // naive all-shared-token enumeration — the prefix filter on the
    // Spark side is lossless, so the sets must match exactly; both
    // final predicates are the integer 9I ≥ 4(na+nb). Tokens are the
    // shared 60-bit md5 hash (the h60 twin), so both engines intersect
    // the SAME sets and parity holds even under a hash collision
    "dedup_jaccard_prefix" ->
      """WITH toks AS (
        |  SELECT DISTINCT doc_id,
        |    ('0x' || substr(md5(w), 1, 15))::BIGINT AS w
        |  FROM (SELECT doc_id, unnest(list_filter(string_split(text, ' '),
        |          x -> len(x) > 0)) AS w
        |        FROM documents)),
        |sizes AS (SELECT doc_id, count(*) AS n FROM toks GROUP BY 1),
        |inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |    count(*) AS n_inter
        |  FROM toks a JOIN toks b ON a.w = b.w AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2)
        |SELECT doc_a, doc_b, n_inter,
        |  round(CAST(n_inter AS DOUBLE) / (sa.n + sb.n - n_inter), 4)
        |    AS jaccard
        |FROM inter JOIN sizes sa ON doc_a = sa.doc_id
        |JOIN sizes sb ON doc_b = sb.doc_id
        |WHERE 9 * n_inter >= 4 * (sa.n + sb.n)
        |ORDER BY doc_a, doc_b""".stripMargin,

    // the naive pairwise form the containment prefix filter avoids;
    // same h60 token hashing as the jaccard oracle, ordered pairs
    "dedup_containment" ->
      """WITH toks AS (
        |  SELECT DISTINCT doc_id,
        |    ('0x' || substr(md5(w), 1, 15))::BIGINT AS w
        |  FROM (SELECT doc_id, unnest(list_filter(string_split(text, ' '),
        |          x -> len(x) > 0)) AS w
        |        FROM documents)),
        |sizes AS (SELECT doc_id, count(*) AS n FROM toks GROUP BY 1),
        |inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |    count(*) AS n_inter
        |  FROM toks a JOIN toks b ON a.w = b.w AND a.doc_id <> b.doc_id
        |  GROUP BY 1, 2)
        |SELECT doc_a, doc_b, n_inter,
        |  round(CAST(n_inter AS DOUBLE) / sa.n, 4) AS containment
        |FROM inter JOIN sizes sa ON doc_a = sa.doc_id
        |JOIN sizes sb ON doc_b = sb.doc_id
        |WHERE sa.n < sb.n AND 10 * n_inter >= 9 * sa.n
        |ORDER BY doc_a, doc_b""".stripMargin,

    // the naive pairwise form the symmetric-delete signatures avoid —
    // same integer Levenshtein DP on both engines
    "dedup_edit_join" ->
      """SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
        |  CAST(levenshtein(a.c_name, b.c_name) AS BIGINT) AS dist
        |FROM customer a JOIN customer b ON a.c_custkey < b.c_custkey
        |WHERE levenshtein(a.c_name, b.c_name) <= 1
        |ORDER BY id_a, id_b""".stripMargin,

    "dedup_ngram_df_hist" ->
      """WITH g0 AS (SELECT doc_id, text, unnest(range(len(text) - 4)) AS i
        |            FROM documents WHERE len(text) >= 5),
        |grams AS (SELECT DISTINCT doc_id, substr(text, CAST(i AS INT) + 1, 5) AS gram FROM g0),
        |dfs AS (SELECT gram, count(*) AS df FROM grams GROUP BY 1)
        |SELECT df, count(*) AS n_grams, count(*) * (df * (df - 1) // 2) AS pair_volume
        |FROM dfs GROUP BY df ORDER BY df""".stripMargin,

    "dedup_substring" ->
      """WITH tk AS (
        |  SELECT doc_id, list_filter(string_split(text, ' '), x -> len(x) > 0) AS tkl
        |  FROM documents),
        |g0 AS (SELECT doc_id, tkl, unnest(range(len(tkl) - 4)) AS i
        |       FROM tk WHERE len(tkl) >= 5),
        |grams AS (SELECT doc_id, CAST(i AS BIGINT) AS i,
        |  array_to_string(list_slice(tkl, CAST(i AS INT) + 1, CAST(i AS INT) + 5), ' ') AS g
        |  FROM g0),
        |dup AS (SELECT g FROM (
        |  SELECT g, count(DISTINCT doc_id) AS dd FROM grams GROUP BY 1) WHERE dd >= 2),
        |dg AS (SELECT doc_id, i FROM grams JOIN dup USING (g)),
        |isl AS (SELECT doc_id, i,
        |  CASE WHEN lag(i) OVER w IS NULL OR i - lag(i) OVER w > 5 THEN 1 ELSE 0 END AS brk
        |  FROM dg WINDOW w AS (PARTITION BY doc_id ORDER BY i)),
        |isl2 AS (SELECT doc_id, i,
        |  sum(brk) OVER (PARTITION BY doc_id ORDER BY i) AS island FROM isl),
        |spans AS (SELECT doc_id, island, min(i) AS s, max(i) + 4 AS e
        |          FROM isl2 GROUP BY 1, 2)
        |SELECT doc_id, count(*) AS n_spans,
        |  CAST(sum(e - s + 1) AS BIGINT) AS dup_tokens,
        |  CAST(max(e - s + 1) AS BIGINT) AS longest_span
        |FROM spans GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "source_jsonl" ->
      """SELECT doc_id, lang, source, n_chars, md5(text) AS text_md5
        |FROM documents ORDER BY doc_id""".stripMargin,

    "source_csv" ->
      """SELECT doc_id, lang, source, n_chars, md5(text) AS text_md5
        |FROM documents ORDER BY doc_id""".stripMargin,

    "dedup_lines" ->
      """WITH tk AS (
        |  SELECT doc_id, list_filter(string_split(text, ' '), x -> len(x) > 0) AS tk
        |  FROM documents),
        |segs0 AS (SELECT doc_id, tk, unnest(range((len(tk) - 1) // 8 + 1)) AS i
        |          FROM tk WHERE len(tk) > 0),
        |segs AS (SELECT doc_id, CAST(i AS BIGINT) AS seg_i,
        |  array_to_string(tk[(i*8 + 1):(i*8 + 8)], ' ') AS seg FROM segs0),
        |g AS (SELECT doc_id, seg_i, seg,
        |  ('0x' || substr(md5(seg), 1, 15))::BIGINT AS g FROM segs),
        |boiler AS (SELECT g FROM g GROUP BY g HAVING min(doc_id) <> max(doc_id)),
        |kept AS (SELECT doc_id, string_agg(seg, ' ' ORDER BY seg_i) AS clean_text,
        |         CAST(count(*) AS BIGINT) AS n_kept
        |         FROM g WHERE g NOT IN (SELECT g FROM boiler) GROUP BY doc_id),
        |tot AS (SELECT doc_id,
        |  CAST((len(list_filter(string_split(text, ' '), x -> len(x) > 0)) + 7) // 8 AS BIGINT) AS n_segs
        |  FROM documents)
        |SELECT t.doc_id, coalesce(clean_text, '') AS clean_text,
        |  n_segs - coalesce(n_kept, 0) AS n_removed
        |FROM tot t LEFT JOIN kept USING (doc_id) ORDER BY doc_id""".stripMargin,

    "dedup_substring_scrub" ->
      """WITH tk AS (
        |  SELECT doc_id, list_filter(string_split(text, ' '), x -> len(x) > 0) AS tkl
        |  FROM documents),
        |g0 AS (SELECT doc_id, tkl, unnest(range(len(tkl) - 4)) AS i
        |       FROM tk WHERE len(tkl) >= 5),
        |grams AS (SELECT doc_id, CAST(i AS BIGINT) AS i,
        |  array_to_string(list_slice(tkl, CAST(i AS INT) + 1, CAST(i AS INT) + 5), ' ') AS g
        |  FROM g0),
        |dup AS (SELECT g FROM (
        |  SELECT g, min(doc_id) AS mn, max(doc_id) AS mx FROM grams GROUP BY 1)
        |  WHERE mn <> mx),
        |dg AS (SELECT doc_id, i FROM grams JOIN dup USING (g)),
        |cov AS (SELECT DISTINCT doc_id, i + d AS idx
        |        FROM dg, (SELECT unnest(range(5)) AS d) x),
        |toks AS (SELECT doc_id, CAST(generate_subscripts(tkl, 1) - 1 AS BIGINT) AS idx,
        |         unnest(tkl) AS w FROM tk),
        |kept AS (SELECT t.doc_id, t.idx, t.w FROM toks t
        |  LEFT JOIN cov c ON t.doc_id = c.doc_id AND t.idx = c.idx
        |  WHERE c.idx IS NULL),
        |agg AS (SELECT doc_id, string_agg(w, ' ' ORDER BY idx) AS clean_text,
        |        count(*) AS n_kept FROM kept GROUP BY 1)
        |SELECT d.doc_id, COALESCE(a.clean_text, '') AS clean_text,
        |  CAST(len(list_filter(string_split(d.text, ' '), x -> len(x) > 0))
        |       - COALESCE(a.n_kept, 0) AS BIGINT) AS n_removed
        |FROM documents d LEFT JOIN agg a USING (doc_id) ORDER BY doc_id""".stripMargin,

    "dedup_embed_cosine" ->
      """WITH n AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb,
        |         sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[]))) AS nrm
        |  FROM embeddings)
        |SELECT * FROM (
        |  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
        |    round(list_dot_product(a.emb, b.emb) / (a.nrm * b.nrm), 4) AS cos_sim
        |  FROM n a JOIN n b ON a.vec_id < b.vec_id)
        |WHERE cos_sim >= 0.45 ORDER BY vec_a, vec_b""".stripMargin,

    "dedup_semantic" ->
      """WITH n AS (
        |  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS emb,
        |         sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[]))) AS nrm
        |  FROM embeddings),
        |dropped AS (
        |  SELECT DISTINCT b.vec_id
        |  FROM n a JOIN n b ON a.label = b.label AND a.vec_id < b.vec_id
        |  WHERE round(list_dot_product(a.emb, b.emb) / (a.nrm * b.nrm), 4) >= 0.3)
        |SELECT vec_id, label FROM n
        |WHERE vec_id NOT IN (SELECT vec_id FROM dropped)
        |ORDER BY vec_id""".stripMargin,

    // the streamed PQ index at probe-all/rerank-all dials IS the exact
    // brute top-10 (the pinned degenerate identity), so the brute SQL
    // gates codebook persistence, per-batch encode, batch-keyed layout,
    // union read, ADC and rerank in one hash
    "stream_pq_index_refresh" -> BruteTopkOracleSql,

    // same identity gates the day-N codebook retrain migration: the
    // post-swap CURRENT index probed at probe-all/rerank-all must be
    // the exact brute top-10 — retrained sidecar, full re-encode and
    // pointer swap all sit under the one hash
    "sim_pq_index_retrain" -> BruteTopkOracleSql,

    // streamed-lifecycle PQ compaction: the accrued batch-keyed codes
    // minus the takedown slice, probed at probe-all/rerank-all, is the
    // exact brute top-10 over the SURVIVORS — the candidate set is
    // filtered, the query vector is read from the unfiltered corpus
    // exactly as the Spark probe does
    "stream_pq_index_compact" -> BruteTopkSurvivorsOracleSql,

    "sim_topk_brute" -> BruteTopkOracleSql,

    "dedup_semantic_kmeans_exact" -> QuantKmeansOracleSql,

    // derived-k twin: recursive-CTE seeding to the corpus-derived k,
    // k-agnostic Lloyd rounds + keep-set verbatim — flips the learned
    // k ∝ n entry from rows-only to hash-green
    "dedup_semantic_kmeans" -> QuantKmeansDerivedOracleSql,

    "sim_pq_exact" -> PqExactOracleSql,

    "sim_ivf_exact" -> IvfExactOracleSql,

    "sim_mmr_pq" -> MmrPqOracleSql,

    "sim_mmr_diversify" -> MmrOracleSql,

    "sim_range_search" ->
      """WITH n AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb,
        |         sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[]))) AS nrm
        |  FROM embeddings)
        |SELECT a.vec_id AS q_id, b.vec_id AS vec_id,
        |  round(list_dot_product(a.emb, b.emb) / (a.nrm * b.nrm), 4) AS cos_sim
        |FROM n a JOIN n b ON a.vec_id % 10 = 3 AND a.vec_id <> b.vec_id
        |WHERE round(list_dot_product(a.emb, b.emb) / (a.nrm * b.nrm), 4) >= 0.35
        |ORDER BY q_id, vec_id""".stripMargin,

    "sim_ann_filtered" ->
      """WITH n AS (
        |  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS emb,
        |         sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[]))) AS nrm
        |  FROM embeddings),
        |q AS (SELECT vec_id AS q_id, label AS q_label, emb AS q_emb, nrm AS q_nrm
        |      FROM n WHERE vec_id % 50 = 7),
        |rk AS (
        |  SELECT q.q_id, n.vec_id,
        |    round(list_dot_product(n.emb, q.q_emb) / (n.nrm * q.q_nrm), 6) AS cos_sim,
        |    row_number() OVER (PARTITION BY q.q_id
        |      ORDER BY round(list_dot_product(n.emb, q.q_emb) / (n.nrm * q.q_nrm), 6) DESC, n.vec_id) AS rank
        |  FROM q JOIN n ON n.label = q.q_label AND n.vec_id <> q.q_id)
        |SELECT q_id, CAST(rank AS BIGINT) AS rank, vec_id, cos_sim
        |FROM rk WHERE rank <= 5 ORDER BY q_id, rank""".stripMargin,

    // geometry is CORPUS-DERIVED exactly as Similarity.annGeometry does
    // it — g replays bits = clamp(2, 24, ⌊log₂(n/64)⌋) via the integer
    // bit-length of n//64 (length(bin(m)) - 1 ≡ 63 - nlz(m)) and
    // tables = max(2, 32/bits) — so ONE SQL string gates every SF
    "sim_ann_lsh" ->
      """WITH g AS (
        |  SELECT bits, CAST(GREATEST(2, 32 // bits) AS INT) AS tables FROM (
        |    SELECT CAST(GREATEST(2, LEAST(24,
        |      length(bin(GREATEST(1, (SELECT count(*) FROM embeddings) // 64))) - 1)) AS INT) AS bits)),
        |n AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb,
        |         sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[]))) AS nrm
        |  FROM embeddings),
        |bt AS (SELECT vec_id, emb, nrm, g.bits, g.tables,
        |  list_transform(range(g.tables * g.bits), p ->
        |    CASE WHEN list_dot_product(emb, list_transform(range(64), j ->
        |      (CAST(('0x' || substr(md5(CAST(p AS VARCHAR) || '_' || CAST(j AS VARCHAR)), 1, 15)) AS BIGINT) % 2000)
        |        / 1000.0 - 1.0)) >= 0 THEN 1 ELSE 0 END) AS bitv
        |  FROM n, g),
        |bk AS (SELECT vec_id, emb, nrm, tables,
        |  list_transform(range(tables), t ->
        |    list_sum(list_transform(range(bits), i ->
        |      bitv[CAST(t * bits + i AS INT) + 1] * (CAST(1 AS BIGINT) << CAST(i AS INT))))) AS buckets
        |  FROM bt),
        |tabs AS (SELECT vec_id, emb, nrm, t, buckets[CAST(t AS INT) + 1] AS bucket
        |  FROM (SELECT vec_id, emb, nrm, buckets, unnest(range(tables)) AS t FROM bk)),
        |q AS (SELECT t AS q_t, bucket AS q_bucket, emb AS q_emb, nrm AS q_nrm
        |      FROM tabs WHERE vec_id = 0)
        |SELECT DISTINCT vec_id, round(list_dot_product(emb, q_emb) / (nrm * q_nrm), 6) AS cos_sim
        |FROM tabs JOIN q ON t = q_t AND bucket = q_bucket
        |WHERE vec_id <> 0
        |ORDER BY cos_sim DESC, vec_id LIMIT 10""".stripMargin,

    "corpus_clean" ->
      """WITH tk0 AS (
        |  SELECT doc_id, text, list_filter(string_split(lower(text), ' '), x -> len(x) > 0) AS tkl
        |  FROM documents),
        |q AS (SELECT doc_id, text FROM (
        |    SELECT doc_id, text,
        |      CAST(len(tkl) AS BIGINT) AS n_tokens,
        |      round(CAST(list_sum(list_transform(tkl, x -> len(x))) AS DOUBLE) / len(tkl), 4) AS mean_tok_len,
        |      round(CAST(len(regexp_extract_all(text, '[.!?,;:]')) AS DOUBLE) / len(text), 4) AS punct_ratio
        |    FROM tk0)
        |  WHERE n_tokens >= 10 AND mean_tok_len >= 2.0 AND mean_tok_len <= 15.0 AND punct_ratio <= 0.2),
        |ek AS (SELECT min(doc_id) AS doc_id FROM q GROUP BY md5(text)),
        |base AS (SELECT q.doc_id, q.text FROM q JOIN ek ON q.doc_id = ek.doc_id),
        |tk AS (SELECT doc_id, list_filter(string_split(text, ' '), x -> len(x) > 0) AS tk FROM base),
        |pos AS (SELECT doc_id, tk, unnest(range(len(tk) - 2)) AS i FROM tk WHERE len(tk) >= 3),
        |sh AS (SELECT DISTINCT doc_id, tk[i+1] || ' ' || tk[i+2] || ' ' || tk[i+3] AS shingle FROM pos),
        |perms AS (SELECT doc_id, shingle, unnest(range(8)) AS perm FROM sh),
        |sig AS (SELECT doc_id, perm, min(substr(md5(CAST(perm // 4 AS VARCHAR) || '|' || shingle), (perm % 4) * 8 + 1, 8)) AS mh
        |        FROM perms GROUP BY 1, 2),
        |bands AS (SELECT doc_id, perm // 2 AS band,
        |  md5(string_agg(CAST(perm AS VARCHAR) || ':' || mh, '|'
        |      ORDER BY CAST(perm AS VARCHAR) || ':' || mh)) AS band_hash
        |  FROM sig GROUP BY 1, 2),
        |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        |  FROM bands a JOIN bands b
        |  ON a.band = b.band AND a.band_hash = b.band_hash AND a.doc_id < b.doc_id),
        |shh AS (SELECT DISTINCT doc_id,
        |  ('0x' || substr(md5(shingle), 1, 15))::BIGINT AS shv FROM sh),
        |cnt AS (SELECT doc_id, count(*) AS n_sh FROM shh GROUP BY 1),
        |inter AS (SELECT doc_a, doc_b, count(*) AS n_inter
        |  FROM cand JOIN shh sa ON doc_a = sa.doc_id
        |  JOIN shh sb ON doc_b = sb.doc_id AND sa.shv = sb.shv
        |  GROUP BY 1, 2),
        |pairs AS (SELECT doc_a, doc_b FROM (
        |  SELECT doc_a, doc_b,
        |    round(CAST(n_inter AS DOUBLE) / (ca.n_sh + cb.n_sh - n_inter), 4) AS jaccard
        |  FROM inter JOIN cnt ca ON doc_a = ca.doc_id JOIN cnt cb ON doc_b = cb.doc_id)
        |  WHERE jaccard >= 0.5),
        |dropped AS (SELECT DISTINCT doc_b AS doc_id FROM pairs)
        |SELECT doc_id FROM base
        |WHERE doc_id NOT IN (SELECT doc_id FROM dropped)
        |ORDER BY doc_id""".stripMargin,

    // the DICOM funnel's composition on the documents table: normalize
    // (text_normalize's canonical form, 'g' flag — DuckDB replaces
    // first-match by default), exact dedup by first-doc-per-norm-hash,
    // MinHash near-dup over the exact survivors on the NORMALIZED text
    // (the dedup_minhash_lsh chain verbatim, drop-the-later-doc rule),
    // quality on the normalized text (token list ≡ text_quality's
    // lower(text) tokens; char denominators normalized on both engines)
    "corpus_funnel_accounting" ->
      """WITH n AS (
        |  SELECT doc_id, trim(regexp_replace(lower(text), ' +', ' ', 'g')) AS text,
        |         md5(trim(regexp_replace(lower(text), ' +', ' ', 'g'))) AS norm_md5
        |  FROM documents),
        |d AS (SELECT doc_id, text, norm_md5,
        |  CAST(CASE WHEN row_number() OVER (PARTITION BY norm_md5 ORDER BY doc_id) > 1
        |       THEN 1 ELSE 0 END AS BIGINT) AS is_dup FROM n),
        |base AS (SELECT doc_id, text FROM d WHERE is_dup = 0),
        |tk AS (SELECT doc_id, list_filter(string_split(text, ' '), x -> len(x) > 0) AS tk FROM base),
        |pos AS (SELECT doc_id, tk, unnest(range(len(tk) - 2)) AS i FROM tk WHERE len(tk) >= 3),
        |sh AS (SELECT DISTINCT doc_id, tk[i+1] || ' ' || tk[i+2] || ' ' || tk[i+3] AS shingle FROM pos),
        |perms AS (SELECT doc_id, shingle, unnest(range(8)) AS perm FROM sh),
        |sig AS (SELECT doc_id, perm, min(substr(md5(CAST(perm // 4 AS VARCHAR) || '|' || shingle), (perm % 4) * 8 + 1, 8)) AS mh
        |        FROM perms GROUP BY 1, 2),
        |bands AS (SELECT doc_id, perm // 2 AS band,
        |  md5(string_agg(CAST(perm AS VARCHAR) || ':' || mh, '|'
        |      ORDER BY CAST(perm AS VARCHAR) || ':' || mh)) AS band_hash
        |  FROM sig GROUP BY 1, 2),
        |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        |  FROM bands a JOIN bands b
        |  ON a.band = b.band AND a.band_hash = b.band_hash AND a.doc_id < b.doc_id),
        |shh AS (SELECT DISTINCT doc_id,
        |  ('0x' || substr(md5(shingle), 1, 15))::BIGINT AS shv FROM sh),
        |cnt AS (SELECT doc_id, count(*) AS n_sh FROM shh GROUP BY 1),
        |inter AS (SELECT doc_a, doc_b, count(*) AS n_inter
        |  FROM cand JOIN shh sa ON doc_a = sa.doc_id
        |  JOIN shh sb ON doc_b = sb.doc_id AND sa.shv = sb.shv
        |  GROUP BY 1, 2),
        |pairs AS (SELECT doc_a, doc_b FROM (
        |  SELECT doc_a, doc_b,
        |    round(CAST(n_inter AS DOUBLE) / (ca.n_sh + cb.n_sh - n_inter), 4) AS jaccard
        |  FROM inter JOIN cnt ca ON doc_a = ca.doc_id JOIN cnt cb ON doc_b = cb.doc_id)
        |  WHERE jaccard >= 0.5),
        |dropped AS (SELECT DISTINCT doc_b AS doc_id FROM pairs),
        |q AS (SELECT doc_id, CAST(len(tkl) AS BIGINT) AS n_tokens,
        |  round(CAST(list_sum(list_transform(tkl, x -> len(x))) AS DOUBLE) / nullif(len(tkl), 0), 4) AS mean_tok_len,
        |  round(CAST(len(regexp_extract_all(text, '[.!?,;:]')) AS DOUBLE) / nullif(len(text), 0), 4) AS punct_ratio
        |  FROM (SELECT doc_id, text, list_filter(string_split(text, ' '), x -> len(x) > 0) AS tkl FROM d))
        |SELECT d.doc_id, d.norm_md5, d.is_dup,
        |  CAST(CASE WHEN d.is_dup = 0 AND dr.doc_id IS NOT NULL THEN 1 ELSE 0 END AS BIGINT) AS is_neardup,
        |  q.n_tokens, q.mean_tok_len, q.punct_ratio,
        |  CAST(CASE WHEN q.n_tokens >= 10 AND q.mean_tok_len >= 2.0 AND q.mean_tok_len <= 15.0
        |       AND q.punct_ratio <= 0.2 THEN 1 ELSE 0 END AS BIGINT) AS quality_keep,
        |  CAST(CASE WHEN d.is_dup = 0 AND dr.doc_id IS NULL AND q.n_tokens >= 10
        |       AND q.mean_tok_len >= 2.0 AND q.mean_tok_len <= 15.0 AND q.punct_ratio <= 0.2
        |       THEN 1 ELSE 0 END AS BIGINT) AS curated
        |FROM d LEFT JOIN dropped dr ON d.doc_id = dr.doc_id
        |JOIN q ON d.doc_id = q.doc_id
        |ORDER BY d.doc_id""".stripMargin,

    // the LAW the DICOM delta twins pin, cross-engine: the FULL
    // arrival-ordered funnel accounting (arrival 0 = standing docs,
    // 1 = the doc_id % 10 = 7 delta batch; dedup window and pair-drop
    // rule both order by (arrival, doc_id)) restricted to the delta
    // docs — the incremental Spark side (hash semi-join +
    // incrementalPairs under the bloom prune) must reproduce it by the
    // batch-vs-index equivalence the dedup_incremental oracle already
    // certifies for raw pairs, here certified for the composed
    // attrition accounting
    "corpus_funnel_accounting_delta" ->
      """WITH n AS (
        |  SELECT doc_id, CAST(doc_id % 10 = 7 AS INT) AS arrival,
        |         trim(regexp_replace(lower(text), ' +', ' ', 'g')) AS text,
        |         md5(trim(regexp_replace(lower(text), ' +', ' ', 'g'))) AS norm_md5
        |  FROM documents),
        |d AS (SELECT doc_id, arrival, text, norm_md5,
        |  CAST(CASE WHEN row_number() OVER (PARTITION BY norm_md5 ORDER BY arrival, doc_id) > 1
        |       THEN 1 ELSE 0 END AS BIGINT) AS is_dup FROM n),
        |base AS (SELECT doc_id, arrival, text FROM d WHERE is_dup = 0),
        |tk AS (SELECT doc_id, list_filter(string_split(text, ' '), x -> len(x) > 0) AS tk FROM base),
        |pos AS (SELECT doc_id, tk, unnest(range(len(tk) - 2)) AS i FROM tk WHERE len(tk) >= 3),
        |sh AS (SELECT DISTINCT doc_id, tk[i+1] || ' ' || tk[i+2] || ' ' || tk[i+3] AS shingle FROM pos),
        |perms AS (SELECT doc_id, shingle, unnest(range(8)) AS perm FROM sh),
        |sig AS (SELECT doc_id, perm, min(substr(md5(CAST(perm // 4 AS VARCHAR) || '|' || shingle), (perm % 4) * 8 + 1, 8)) AS mh
        |        FROM perms GROUP BY 1, 2),
        |bands AS (SELECT doc_id, perm // 2 AS band,
        |  md5(string_agg(CAST(perm AS VARCHAR) || ':' || mh, '|'
        |      ORDER BY CAST(perm AS VARCHAR) || ':' || mh)) AS band_hash
        |  FROM sig GROUP BY 1, 2),
        |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        |  FROM bands a JOIN bands b
        |  ON a.band = b.band AND a.band_hash = b.band_hash AND a.doc_id < b.doc_id),
        |shh AS (SELECT DISTINCT doc_id,
        |  ('0x' || substr(md5(shingle), 1, 15))::BIGINT AS shv FROM sh),
        |cnt AS (SELECT doc_id, count(*) AS n_sh FROM shh GROUP BY 1),
        |inter AS (SELECT doc_a, doc_b, count(*) AS n_inter
        |  FROM cand JOIN shh sa ON doc_a = sa.doc_id
        |  JOIN shh sb ON doc_b = sb.doc_id AND sa.shv = sb.shv
        |  GROUP BY 1, 2),
        |pairs AS (SELECT doc_a, doc_b FROM (
        |  SELECT doc_a, doc_b,
        |    round(CAST(n_inter AS DOUBLE) / (ca.n_sh + cb.n_sh - n_inter), 4) AS jaccard
        |  FROM inter JOIN cnt ca ON doc_a = ca.doc_id JOIN cnt cb ON doc_b = cb.doc_id)
        |  WHERE jaccard >= 0.5),
        |dropped AS (SELECT DISTINCT
        |  CASE WHEN ba.arrival > bb.arrival THEN doc_a ELSE doc_b END AS doc_id
        |  FROM pairs JOIN base ba ON doc_a = ba.doc_id
        |  JOIN base bb ON doc_b = bb.doc_id),
        |q AS (SELECT doc_id, CAST(len(tkl) AS BIGINT) AS n_tokens,
        |  round(CAST(list_sum(list_transform(tkl, x -> len(x))) AS DOUBLE) / nullif(len(tkl), 0), 4) AS mean_tok_len,
        |  round(CAST(len(regexp_extract_all(text, '[.!?,;:]')) AS DOUBLE) / nullif(len(text), 0), 4) AS punct_ratio
        |  FROM (SELECT doc_id, text, list_filter(string_split(text, ' '), x -> len(x) > 0) AS tkl FROM d))
        |SELECT d.doc_id, d.norm_md5, d.is_dup,
        |  CAST(CASE WHEN d.is_dup = 0 AND dr.doc_id IS NOT NULL THEN 1 ELSE 0 END AS BIGINT) AS is_neardup,
        |  q.n_tokens, q.mean_tok_len, q.punct_ratio,
        |  CAST(CASE WHEN q.n_tokens >= 10 AND q.mean_tok_len >= 2.0 AND q.mean_tok_len <= 15.0
        |       AND q.punct_ratio <= 0.2 THEN 1 ELSE 0 END AS BIGINT) AS quality_keep,
        |  CAST(CASE WHEN d.is_dup = 0 AND dr.doc_id IS NULL AND q.n_tokens >= 10
        |       AND q.mean_tok_len >= 2.0 AND q.mean_tok_len <= 15.0 AND q.punct_ratio <= 0.2
        |       THEN 1 ELSE 0 END AS BIGINT) AS curated
        |FROM d LEFT JOIN dropped dr ON d.doc_id = dr.doc_id
        |JOIN q ON d.doc_id = q.doc_id
        |WHERE d.arrival = 1
        |ORDER BY d.doc_id""".stripMargin,

    "corpus_split" ->
      """WITH b AS (SELECT doc_id,
        |  ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 100 AS bucket
        |  FROM documents)
        |SELECT doc_id, bucket,
        |  CASE WHEN bucket < 90 THEN 'train'
        |       WHEN bucket < 95 THEN 'val'
        |       ELSE 'test' END AS split
        |FROM b ORDER BY doc_id""".stripMargin,

    // log-weights quantize to integer nano-units (floor(w·1e9 + 0.5))
    // and per-doc scores are EXACT integer sums, so the rank key is
    // order-free on both engines; the naive global rank here certifies
    // the engine's histogram-refined distributed top-k
    "corpus_dsir" ->
      """WITH tk0 AS (
        |  SELECT doc_id, lang, list_filter(string_split(lower(text), ' '), x -> len(x) > 0) AS tkl
        |  FROM documents),
        |tok AS (SELECT doc_id, lang,
        |  ('0x' || substr(md5(unnest(tkl)), 1, 15))::BIGINT % 512 AS bkt FROM tk0),
        |cnt AS (SELECT doc_id, lang, bkt, count(*) AS n FROM tok GROUP BY 1, 2, 3),
        |tgt AS (SELECT bkt, sum(n) AS ct FROM cnt WHERE lang = 'en' GROUP BY 1),
        |raw AS (SELECT bkt, sum(n) AS cr FROM cnt GROUP BY 1),
        |tots AS (SELECT (SELECT CAST(sum(ct) AS DOUBLE) FROM tgt) AS nt,
        |                (SELECT CAST(sum(cr) AS DOUBLE) FROM raw) AS nr),
        |lw AS (SELECT raw.bkt,
        |  CAST(floor((ln((COALESCE(tgt.ct, 0) + 1) / (nt + 512)) - ln((raw.cr + 1) / (nr + 512))) * 1e9 + 0.5) AS BIGINT) AS wq
        |  FROM raw LEFT JOIN tgt USING (bkt), tots),
        |wt AS (SELECT doc_id, CAST(sum(n) AS BIGINT) AS n_tokens,
        |        CAST(sum(n * wq) AS BIGINT) AS sq FROM cnt JOIN lw USING (bkt) GROUP BY 1),
        |rk AS (SELECT doc_id, n_tokens, sq,
        |  row_number() OVER (ORDER BY sq DESC, doc_id) AS rnk,
        |  (SELECT count(*) FROM wt) AS nd FROM wt)
        |SELECT doc_id, n_tokens, round(CAST(sq AS DOUBLE) / 1e9, 4) AS dsir_logratio,
        |  CAST(CASE WHEN rnk <= nd // 5 THEN 1 ELSE 0 END AS INT) AS keep
        |FROM rk ORDER BY doc_id""".stripMargin,

    "corpus_length_buckets" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    CAST(len(list_filter(string_split(text, ' '), x -> len(x) > 0)) AS BIGINT) AS n_tok
        |  FROM documents),
        |o AS (SELECT doc_id, n_tok,
        |  row_number() OVER (ORDER BY n_tok, doc_id) - 1 AS rn FROM t)
        |SELECT rn // 32 AS batch_id, count(*) AS n_docs, max(n_tok) AS max_tok,
        |  CAST(sum(n_tok) AS BIGINT) AS sum_tok,
        |  CASE WHEN max(n_tok) = 0 THEN 0.0 ELSE
        |    round(1 - CAST(sum(n_tok) AS DOUBLE) / (count(*) * max(n_tok)), 4)
        |  END AS pad_frac
        |FROM o GROUP BY 1 ORDER BY 1""".stripMargin,

    // the oracle replays the full train+score NB pipeline: weak labels
    // by integer cross-multiplication, add-one-smoothed conditional
    // counts on the even-doc_id half, per-word weights and the prior
    // quantized to integer nano-units, exact integer log-odds sums
    // LEFT joins end-to-end (out-of-vocab tokens contribute 0, an
    // all-OOV/empty doc scores exactly the prior) so the batch contract
    // is the streaming scorer's, just with the uncapped weight relation
    "corpus_quality_classifier" -> (NbTrainCtes + """,
        |wt AS (SELECT c.doc_id, CAST(sum(c.n * COALESCE(w.wq, 0)) AS BIGINT) AS sw
        |       FROM cnt c LEFT JOIN lw w USING (w) GROUP BY 1)
        |SELECT l.doc_id, CAST(l.y AS INT) AS y_weak,
        |  round(CAST(p.pq + COALESCE(wt.sw, 0) AS DOUBLE) / 1e9, 4) AS nb_logodds,
        |  CAST(CASE WHEN p.pq + COALESCE(wt.sw, 0) > 0 THEN 1 ELSE 0 END AS INT) AS pred,
        |  CAST(l.doc_id % 2 = 0 AS INT) AS in_train
        |FROM lab l LEFT JOIN wt USING (doc_id), pri p ORDER BY l.doc_id""".stripMargin),

    // the streaming scorer reads the PERSISTED capped model; the oracle
    // retrains from the corpus and replays the cap (|wq| desc, word — a
    // total order), so one hash gates persisted-model ≡ in-query-model
    // AND the stateless stream arithmetic; docs with no model token
    // score exactly the prior (LEFT JOIN + COALESCE 0)
    // the day-2 count-append lifecycle shares the stream scorer's
    // oracle VERBATIM: a model derived from merged persisted counts
    // must be bit-identical to the full retrain the SQL performs —
    // append ≡ rebuild for a learned model's sufficient statistics
    "corpus_nb_day2" -> NbScoreOracleSql,

    // continuous count-accrual over arbitrary micro-batch boundaries:
    // sufficient statistics sum, so the same full-retrain SQL gates it
    "stream_corpus_nb_refresh" -> NbScoreOracleSql,

    // stream-maintained index ≡ built-from-scratch: the post-drain
    // phrase probe over the unioned per-batch posting files must match
    // text_search's full-corpus SQL byte for byte
    "stream_text_index_refresh" ->
      """WITH tk AS (
        |  SELECT doc_id, list_filter(string_split(lower(text), ' '), x -> len(x) > 0) AS t
        |  FROM documents),
        |m AS (SELECT doc_id, unnest(range(len(t) - 1)) AS i, t FROM tk WHERE len(t) >= 2),
        |hit AS (SELECT doc_id, CAST(i AS BIGINT) AS pos FROM m
        |        WHERE t[i+1] = 'agg' AND t[i+2] = 'join')
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_matches, min(pos) AS first_pos
        |FROM hit GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "stream_corpus_nb_score" -> NbScoreOracleSql,

    // the composed pipeline's oracle replays all three stages in one
    // SQL chain — gate predicates, NB train/cap/score through the SAME
    // capped model the persisted artifact carries, then the band CTEs
    // over the SURVIVORS only (the stateful store sees only funnel
    // output); kept = doc owns all its buckets (no smaller survivor
    // shares one) — so one hash gates each stage AND the composition
    "stream_corpus_pipeline" -> (NbTrainCtes + """,
        |cap AS (SELECT w, wq FROM lw ORDER BY abs(wq) DESC, w LIMIT 4096),
        |wt AS (SELECT c.doc_id, CAST(sum(c.n * w.wq) AS BIGINT) AS sw
        |       FROM cnt c JOIN cap w USING (w) GROUP BY 1),
        |gq AS (SELECT doc_id, text, list_filter(string_split(lower(text), ' '), x -> len(x) > 0) AS gtk
        |       FROM documents),
        |gm AS (SELECT doc_id,
        |  CAST(len(gtk) AS BIGINT) AS n_tokens,
        |  round(CAST(list_sum(list_transform(gtk, x -> len(x))) AS DOUBLE) / len(gtk), 4) AS mean_tok_len,
        |  round(CAST(len(regexp_extract_all(text, '[.!?,;:]')) AS DOUBLE) / len(text), 4) AS punct_ratio,
        |  CAST(len(list_filter(gtk, x -> x IN ('the','and','of','to','in','a','is'))) AS BIGINT) AS n_en,
        |  CAST(len(list_filter(gtk, x -> x IN ('el','la','de','que','y','en','un'))) AS BIGINT) AS n_es,
        |  CAST(len(list_filter(gtk, x -> x IN ('der','die','und','ist','das','nicht','ein'))) AS BIGINT) AS n_de
        |  FROM gq),
        |gl AS (SELECT doc_id, n_tokens, mean_tok_len, punct_ratio,
        |  CASE WHEN n_en + n_es + n_de = 0 THEN 'und'
        |       WHEN n_en >= n_es AND n_en >= n_de THEN 'en'
        |       WHEN n_es >= n_de THEN 'es' ELSE 'de' END AS pred_lang
        |  FROM gm),
        |keepq AS (SELECT gl.doc_id, CAST(p.pq + COALESCE(wt.sw, 0) AS BIGINT) AS score_q
        |  FROM gl LEFT JOIN wt USING (doc_id), pri p
        |  WHERE gl.n_tokens >= 10 AND gl.mean_tok_len >= 2.0 AND gl.mean_tok_len <= 15.0
        |    AND gl.punct_ratio <= 0.2 AND gl.pred_lang = 'en'
        |    AND p.pq + COALESCE(wt.sw, 0) > 0),
        |btk AS (SELECT d.doc_id, list_filter(string_split(d.text, ' '), x -> len(x) > 0) AS tk
        |        FROM documents d JOIN keepq USING (doc_id)),
        |bpos AS (SELECT doc_id, tk, unnest(range(len(tk) - 2)) AS i FROM btk WHERE len(tk) >= 3),
        |bsh AS (SELECT DISTINCT doc_id, tk[i+1] || ' ' || tk[i+2] || ' ' || tk[i+3] AS shingle FROM bpos),
        |bperms AS (SELECT doc_id, shingle, unnest(range(8)) AS perm FROM bsh),
        |bsig AS (SELECT doc_id, perm, min(substr(md5(CAST(perm // 4 AS VARCHAR) || '|' || shingle), (perm % 4) * 8 + 1, 8)) AS mh
        |        FROM bperms GROUP BY 1, 2),
        |bands AS (SELECT doc_id, perm // 2 AS band,
        |  md5(string_agg(CAST(perm AS VARCHAR) || ':' || mh, '|'
        |      ORDER BY CAST(perm AS VARCHAR) || ':' || mh)) AS band_hash
        |  FROM bsig GROUP BY 1, 2),
        |own AS (SELECT b.doc_id, min(a.doc_id) AS canon
        |  FROM bands b JOIN bands a
        |    ON a.band = b.band AND a.band_hash = b.band_hash AND a.doc_id <= b.doc_id
        |  GROUP BY 1)
        |SELECT k.doc_id, k.score_q
        |FROM keepq k JOIN own o USING (doc_id)
        |WHERE o.canon = k.doc_id
        |ORDER BY k.doc_id""".stripMargin),

    "corpus_shard" ->
      """WITH h AS (SELECT doc_id,
        |  ('0x' || substr(md5('sh:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 16 AS shard,
        |  ('0x' || substr(md5('ord:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT AS h
        |  FROM documents)
        |SELECT doc_id, shard,
        |  CAST(row_number() OVER (PARTITION BY shard ORDER BY h, doc_id) - 1 AS BIGINT) AS pos
        |FROM h ORDER BY shard, pos""".stripMargin,

    // the oracle states the naive single-window global rank; the engine
    // computes it distributed (range exchange + zipWithIndex) — equality
    // pins the contiguous-position machinery against the definition
    "corpus_shuffle" ->
      """WITH h AS (SELECT doc_id,
        |  ('0x' || substr(md5('42:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT AS h
        |  FROM documents)
        |SELECT doc_id, CAST(row_number() OVER (ORDER BY h, doc_id) - 1 AS BIGINT) AS pos
        |FROM h ORDER BY pos""".stripMargin,

    "corpus_interleave" ->
      """WITH h AS (SELECT doc_id, source,
        |  ('0x' || substr(md5('il:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT AS h
        |  FROM documents),
        |r AS (SELECT doc_id, source,
        |  CAST(row_number() OVER (PARTITION BY source ORDER BY h, doc_id) - 1 AS BIGINT) AS j
        |  FROM h),
        |c AS (SELECT source, CAST(count(*) AS BIGINT) AS n_src FROM r GROUP BY source)
        |SELECT doc_id, source, j,
        |  CAST(j * 2 + 1 AS DOUBLE) / CAST(n_src * 2 AS DOUBLE) AS skey
        |FROM r JOIN c USING (source) ORDER BY skey, source, doc_id""".stripMargin,

    "corpus_epochs" ->
      """WITH d AS (SELECT doc_id, source,
        |  CAST(substr(source, 4) AS INT) % 4 AS m FROM documents),
        |c AS (SELECT doc_id, source,
        |  1 + m // 2 + CASE WHEN
        |    ('0x' || substr(md5('ep:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 1000000
        |      < (m % 2) * 500000 THEN 1 ELSE 0 END AS n
        |  FROM d)
        |SELECT doc_id, source, CAST(unnest(range(1, n + 1)) AS BIGINT) AS copy_idx
        |FROM c ORDER BY doc_id, copy_idx""".stripMargin,

    // the TTL twin shares the NoTimeout filter's oracle verbatim: the
    // derived horizon outlives the corpus, so nothing expires mid-drain
    "stream_editdup_ttl" -> EditDupFilterOracleSql,

    "corpus_mix" ->
      """WITH d AS (SELECT doc_id, source,
        |  CAST(substr(source, 4) AS INT) % 4 AS m,
        |  ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':' || source), 1, 15))::BIGINT % 10000 AS h
        |  FROM documents)
        |SELECT doc_id, source,
        |  CASE WHEN m = 0 THEN 1.0 WHEN m = 1 THEN 0.5
        |       WHEN m = 2 THEN 0.25 ELSE 0.1 END AS w
        |FROM d
        |WHERE h < (CASE WHEN m = 0 THEN 1.0 WHEN m = 1 THEN 0.5
        |                WHEN m = 2 THEN 0.25 ELSE 0.1 END) * 10000
        |ORDER BY doc_id""".stripMargin,

    "corpus_mix_temperature" ->
      """WITH l AS (SELECT lang, count(*) AS n_l FROM documents GROUP BY 1),
        |tot AS (SELECT CAST(sum(n_l) AS DOUBLE) AS n,
        |        CAST(count(*) AS DOUBLE) AS n_lang FROM l),
        |rates AS (SELECT lang, least(1.0, sqrt(n / (n_lang * n_l))) AS r
        |          FROM l, tot)
        |SELECT doc_id, lang, round(r, 6) AS rate
        |FROM documents JOIN rates USING (lang)
        |WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':' || lang), 1, 15))::BIGINT
        |      % 1000000 < CAST(r * 1000000.0 AS BIGINT)
        |ORDER BY doc_id""".stripMargin,

    "corpus_sample_strat" ->
      """SELECT doc_id, lang, source FROM documents
        |WHERE ('0x' || substr(md5(lang || ':' || source || ':' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 10 = 0
        |ORDER BY doc_id""".stripMargin,

    // The octave CASE chain and the iterated-sqrt chain are generated by
    // the SAME Scala helpers the Spark plan parses (Curation.octaveSql /
    // sqrtChainSql) — only the 52-bit md5 fold is spelled per-engine.
    "corpus_sample_weighted" -> {
      val u = "(('0x' || substr(md5('ws:' || CAST(doc_id AS VARCHAR)), 1, 13))::BIGINT + 1) / 4503599627370496.0"
      s"""WITH keyed AS (SELECT lang, doc_id, n_chars,
         |  ${Curation.sqrtChainSql(Curation.octaveSql("n_chars"), s"($u)")} AS skey
         |  FROM documents),
         |ranked AS (SELECT lang, doc_id, n_chars,
         |  CAST(row_number() OVER (PARTITION BY lang ORDER BY skey DESC, doc_id) AS BIGINT) AS rk
         |  FROM keyed)
         |SELECT lang, rk, doc_id, n_chars FROM ranked
         |WHERE rk <= 20 ORDER BY lang, rk""".stripMargin
    },

    "cdc_merge" -> CdcMergeOracleSql,
    // the stream maintains ONE state row per key via an associative+
    // commutative latest-wins fold, so any micro-batch interleaving
    // lands on the batch answer — shares the batch oracle verbatim
    "stream_cdc_latest" -> CdcMergeOracleSql,

    // the oracle is the FULL RECOMPUTE over the whole table — passing
    // means the split state⊕delta plan reconstructs it bit-for-bit
    "mv_incremental" ->
      """SELECT l_returnflag, l_linestatus,
        |  count(*) AS n_rows,
        |  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
        |  CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))
        |    AS BIGINT) AS sum_price_cents,
        |  min(epoch_ns(l_shipdate) // 86400000000000) AS min_ship_day,
        |  max(epoch_ns(l_shipdate) // 86400000000000) AS max_ship_day,
        |  CAST(sum(CAST(l_quantity AS BIGINT)) AS DOUBLE) / count(*)
        |    AS avg_qty
        |FROM lineitem
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    // shares cdc_merge's changelog derivation verbatim; the window total
    // order (seq, op, price, qty) is the same one latest-wins uses, so
    // the two operators provably agree on "latest" (Scd2Spec pins
    // is_current=1 ≡ the cdc_merge snapshot)
    "cdc_scd2" ->
      """WITH u AS (
        |  SELECT o_orderkey AS key, CAST(-1 AS BIGINT) AS seq, 'I' AS op,
        |         round(o_totalprice, 2) AS price, CAST(NULL AS DOUBLE) AS qty
        |  FROM orders WHERE o_orderkey % 4 != 0
        |  UNION ALL
        |  SELECT l_orderkey, l_linenumber,
        |    CASE WHEN l_returnflag = 'R' THEN 'D' ELSE 'U' END,
        |    floor(l_extendedprice * (1.0 - l_discount) * 100 + 0.5) / 100,
        |    l_quantity
        |  FROM lineitem),
        |v AS (
        |  SELECT key, op, price, qty,
        |    CAST(row_number() OVER (PARTITION BY key
        |      ORDER BY seq, op DESC, price DESC, qty DESC) - 1 AS BIGINT)
        |      AS ver
        |  FROM u),
        |w AS (SELECT *, lead(ver) OVER (PARTITION BY key ORDER BY ver)
        |        AS valid_to_ver FROM v)
        |SELECT key, ver, op, price, qty, valid_to_ver,
        |  CAST(valid_to_ver IS NULL AS BIGINT) AS is_current
        |FROM w WHERE op != 'D' ORDER BY key, ver""".stripMargin,

    // the fill copies doubles (no arithmetic), so IGNORE NULLS last_value
    // is hash-exact against Spark's last(ignoreNulls) running window
    "events_gapfill" ->
      """WITH e AS (SELECT user_id, event_id, value, epoch_ns(ts) AS ts_ns,
        |            epoch_ns(ts) // 3600000000000 AS hb FROM events),
        |obs AS (SELECT user_id, hb, value FROM (
        |   SELECT *, row_number() OVER (PARTITION BY user_id, hb
        |     ORDER BY ts_ns DESC, event_id DESC) AS rn FROM e) WHERE rn = 1),
        |span AS (SELECT user_id, min(hb) AS lo, max(hb) AS hi
        |         FROM e GROUP BY 1),
        |grid AS (SELECT user_id, unnest(range(lo, hi + 1)) AS hb FROM span),
        |j AS (SELECT g.user_id, g.hb, o.value FROM grid g
        |      LEFT JOIN obs o ON g.user_id = o.user_id AND g.hb = o.hb)
        |SELECT user_id, hb * 3600 AS win_start,
        |  last_value(value IGNORE NULLS) OVER (PARTITION BY user_id
        |    ORDER BY hb ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |    AS value,
        |  CAST(value IS NOT NULL AS BIGINT) AS observed
        |FROM j ORDER BY user_id, win_start""".stripMargin,

    // numeric columns profile through their canonical string form on
    // BOTH engines (bigint -> decimal digits, identical), so min/max
    // being lexicographic is a shared convention, not drift
    "table_profile" ->
      """WITH stacked AS (
        |  SELECT 'doc_id' AS col_name, CAST(doc_id AS VARCHAR) AS value FROM documents
        |  UNION ALL SELECT 'text', text FROM documents
        |  UNION ALL SELECT 'lang', lang FROM documents
        |  UNION ALL SELECT 'source', source FROM documents
        |  UNION ALL SELECT 'n_chars', CAST(n_chars AS VARCHAR) FROM documents),
        |pv AS (SELECT col_name, value, count(*) AS n
        |       FROM stacked GROUP BY 1, 2),
        |stats AS (SELECT col_name,
        |    CAST(sum(CASE WHEN value IS NULL THEN n ELSE 0 END) AS BIGINT)
        |      AS n_nulls,
        |    CAST(count(CASE WHEN value IS NOT NULL THEN 1 END) AS BIGINT)
        |      AS n_distinct,
        |    min(value) AS min_value, max(value) AS max_value
        |  FROM pv GROUP BY 1),
        |md AS (SELECT col_name, value AS top_value,
        |         CAST(n AS BIGINT) AS top_count FROM (
        |    SELECT *, row_number() OVER (PARTITION BY col_name
        |      ORDER BY n DESC, value) AS rk FROM pv WHERE value IS NOT NULL)
        |  WHERE rk = 1)
        |SELECT col_name, n_nulls, n_distinct, min_value, max_value,
        |       top_value, top_count
        |FROM stats LEFT JOIN md USING (col_name) ORDER BY col_name""".stripMargin,

    "events_funnel" ->
      """WITH e AS (SELECT user_id, event_type, epoch_ns(ts) AS ts_ns FROM events),
        |w1 AS (SELECT *, min(CASE WHEN event_type = 'view' THEN ts_ns END)
        |         OVER (PARTITION BY user_id) AS v_ns FROM e),
        |w2 AS (SELECT *, min(CASE WHEN event_type = 'click' AND ts_ns > v_ns
        |         AND ts_ns - v_ns <= 604800000000000 THEN ts_ns END)
        |         OVER (PARTITION BY user_id) AS c_ns FROM w1),
        |w3 AS (SELECT *, min(CASE WHEN event_type = 'purchase' AND ts_ns > c_ns
        |         AND ts_ns - v_ns <= 604800000000000 THEN ts_ns END)
        |         OVER (PARTITION BY user_id) AS p_ns FROM w2)
        |SELECT user_id, min(v_ns) AS view_ns, min(c_ns) AS click_ns,
        |  min(p_ns) AS purchase_ns,
        |  CAST(CASE WHEN min(p_ns) IS NOT NULL THEN 3
        |       WHEN min(c_ns) IS NOT NULL THEN 2
        |       WHEN min(v_ns) IS NOT NULL THEN 1 ELSE 0 END AS BIGINT) AS funnel_step
        |FROM w3 GROUP BY user_id ORDER BY user_id""".stripMargin,

    // the emission cutoff mirrors Spark's final watermark exactly:
    // ms-truncated max event time minus the 1 h delay; windows whose
    // end exceeds it are withheld (append semantics), a tail the batch
    // grouping would emit — so a leak here is a hash mismatch
    "events_rolling" ->
      """WITH e AS (SELECT event_id, user_id, epoch_ns(ts) AS ts_ns,
        |  CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents FROM events)
        |SELECT event_id, user_id, ts_ns,
        |  count(*) OVER w AS n_24h,
        |  CAST(coalesce(sum(cents) OVER w, 0) AS BIGINT) AS cents_24h
        |FROM e
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts_ns
        |  RANGE BETWEEN 86400000000000 PRECEDING AND 1 PRECEDING)
        |ORDER BY event_id""".stripMargin,

    "events_retention" ->
      """WITH e AS (SELECT user_id,
        |    epoch_ns(ts) // 604800000000000 AS wk FROM events),
        |cohort AS (SELECT user_id, min(wk) AS cohort_wk FROM e GROUP BY 1)
        |SELECT cohort_wk, wk - cohort_wk AS week_offset,
        |  CAST(count(DISTINCT e.user_id) AS BIGINT) AS n_users
        |FROM e JOIN cohort USING (user_id)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "events_outliers" ->
      """WITH v AS (SELECT event_type, event_id, value FROM events),
        |st AS (SELECT event_type, count(*) AS n,
        |         list(value ORDER BY value) AS vals FROM v GROUP BY 1),
        |med AS (SELECT event_type,
        |         vals[CAST((n - 1) // 2 AS INT) + 1] AS med FROM st),
        |ad AS (SELECT v.event_type, event_id, value, med,
        |         abs(value - med) AS ad FROM v JOIN med USING (event_type)),
        |st2 AS (SELECT event_type, count(*) AS n,
        |         list(ad ORDER BY ad) AS ads FROM ad GROUP BY 1),
        |mad AS (SELECT event_type,
        |         ads[CAST((n - 1) // 2 AS INT) + 1] AS mad FROM st2)
        |SELECT event_id, a.event_type, value, a.med, m.mad
        |FROM ad a JOIN mad m USING (event_type)
        |WHERE a.ad > 3 * m.mad
        |ORDER BY event_id""".stripMargin,

    "events_transitions" ->
      """WITH e AS (SELECT user_id, event_type, epoch_ns(ts) AS ts_ns, event_id
        |  FROM events),
        |nx AS (SELECT event_type,
        |  lead(event_type) OVER (PARTITION BY user_id ORDER BY ts_ns, event_id)
        |    AS next_type FROM e),
        |cnt AS (SELECT event_type, next_type, count(*) AS n
        |  FROM nx WHERE next_type IS NOT NULL GROUP BY 1, 2)
        |SELECT event_type, next_type, n,
        |  round(CAST(n AS DOUBLE) / sum(n) OVER (PARTITION BY event_type), 4)
        |    AS p
        |FROM cnt ORDER BY event_type, next_type""".stripMargin,

    "events_twap" ->
      """WITH e AS (SELECT user_id, epoch_ns(ts) AS ts_ns, event_id,
        |  CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents FROM events),
        |d AS (SELECT user_id, cents,
        |  (lead(ts_ns) OVER (PARTITION BY user_id ORDER BY ts_ns, event_id)
        |    - ts_ns) // 1000000000 AS dt_s FROM e),
        |agg AS (SELECT user_id, count(*) AS n_intervals,
        |  CAST(sum(dt_s) AS BIGINT) AS total_seconds,
        |  CAST(sum(cents * dt_s) AS BIGINT) AS cent_seconds
        |  FROM d WHERE dt_s IS NOT NULL GROUP BY 1)
        |SELECT user_id, n_intervals, total_seconds,
        |  round(CAST(cent_seconds AS DOUBLE) / total_seconds / 100.0, 4)
        |    AS twap
        |FROM agg WHERE total_seconds > 0 ORDER BY user_id""".stripMargin,

    "events_cumulative_users" ->
      """WITH fu AS (SELECT user_id,
        |  min(epoch_ns(ts)) // 86400000000000 AS day FROM events GROUP BY 1),
        |nd AS (SELECT day, count(*) AS new_users FROM fu GROUP BY 1)
        |SELECT day, new_users,
        |  CAST(sum(new_users) OVER (ORDER BY day) AS BIGINT) AS cum_users
        |FROM nd ORDER BY day""".stripMargin,

    "events_rfm" ->
      """WITH e AS (SELECT user_id, epoch_ns(ts) AS ts_ns,
        |  CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents FROM events),
        |mx AS (SELECT max(ts_ns) AS m FROM e),
        |pu AS (SELECT user_id,
        |  CAST(((SELECT m FROM mx) - max(ts_ns)) // 1000000000 AS BIGINT)
        |    AS recency_s,
        |  count(*) AS frequency,
        |  CAST(sum(cents) AS BIGINT) AS monetary_cents
        |  FROM e GROUP BY 1)
        |SELECT user_id, recency_s, frequency, monetary_cents,
        |  CAST(ntile(5) OVER (ORDER BY recency_s, user_id) AS BIGINT)
        |    AS r_bucket,
        |  CAST(ntile(5) OVER (ORDER BY frequency DESC, user_id) AS BIGINT)
        |    AS f_bucket,
        |  CAST(ntile(5) OVER (ORDER BY monetary_cents DESC, user_id) AS BIGINT)
        |    AS m_bucket
        |FROM pu ORDER BY user_id""".stripMargin,

    "events_attribution" ->
      """WITH e AS (SELECT user_id, epoch_ns(ts) AS ts_ns, event_id, event_type,
        |  CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents FROM events),
        |a AS (SELECT event_type, cents,
        |  last_value(CASE WHEN event_type <> 'purchase' THEN event_type END IGNORE NULLS)
        |    OVER (PARTITION BY user_id ORDER BY ts_ns, event_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS channel
        |  FROM e)
        |SELECT COALESCE(channel, '(direct)') AS channel,
        |  count(*) AS n_conversions,
        |  round(CAST(sum(cents) AS DOUBLE) / 100.0, 2) AS revenue
        |FROM a WHERE event_type = 'purchase'
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "events_active_time" ->
      """WITH e AS (SELECT user_id, epoch_ns(ts) AS ts_ns, event_id,
        |  epoch_ns(ts) + 1800000000000 AS end_ns FROM events),
        |b AS (SELECT user_id, ts_ns, end_ns, event_id,
        |  CASE WHEN max(end_ns) OVER (PARTITION BY user_id
        |      ORDER BY ts_ns, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
        |    OR ts_ns > max(end_ns) OVER (PARTITION BY user_id
        |      ORDER BY ts_ns, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |  THEN 1 ELSE 0 END AS brk FROM e),
        |bi AS (SELECT user_id, ts_ns, end_ns,
        |  sum(brk) OVER (PARTITION BY user_id ORDER BY ts_ns, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS burst
        |  FROM b),
        |spans AS (SELECT user_id, burst, min(ts_ns) AS b_start,
        |  max(end_ns) AS b_end FROM bi GROUP BY 1, 2)
        |SELECT user_id, count(*) AS n_bursts,
        |  CAST(sum(b_end - b_start) // 1000000000 AS BIGINT)
        |    AS active_seconds
        |FROM spans GROUP BY 1 ORDER BY user_id""".stripMargin,

    "stream_quantiles" ->
      """WITH e AS (SELECT epoch_ns(ts) AS ts_ns, value FROM events),
        |m AS (SELECT (max(ts_ns) // 1000000) - 3600000 AS wm_ms FROM e),
        |g AS (SELECT ts_ns // 3600000000000 AS hb, count(*) AS n,
        |        list(value ORDER BY value) AS vals
        |      FROM e GROUP BY 1)
        |SELECT hb * 3600 AS win_start, CAST(n AS BIGINT) AS n,
        |  vals[CAST(floor(0.5 * (n - 1)) AS INT) + 1] AS p50,
        |  vals[CAST(floor(0.95 * (n - 1)) AS INT) + 1] AS p95,
        |  vals[CAST(floor(0.99 * (n - 1)) AS INT) + 1] AS p99
        |FROM g, m
        |WHERE (hb + 1) * 3600000 <= wm_ms
        |ORDER BY win_start""".stripMargin,

    "text_inverted_index" ->
      """WITH inst AS (SELECT doc_id,
        |  unnest(list_filter(string_split(lower(text), ' '), x -> len(x) > 0)) AS word
        |  FROM documents),
        |dt AS (SELECT doc_id, word, count(*) AS tf FROM inst GROUP BY 1, 2),
        |stats AS (SELECT word, CAST(count(*) AS BIGINT) AS df,
        |  CAST(sum(tf) AS BIGINT) AS tf_total FROM dt GROUP BY 1),
        |top AS (SELECT word,
        |  string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id) AS postings
        |  FROM (SELECT word, doc_id,
        |          row_number() OVER (PARTITION BY word ORDER BY doc_id) AS rk
        |        FROM dt)
        |  WHERE rk <= 20 GROUP BY word)
        |SELECT word, df, tf_total, postings
        |FROM stats JOIN top USING (word) ORDER BY word""".stripMargin,

    // 5 unrolled fixed-point iterations — the SAME integer recurrence the
    // Spark loop runs (see Graph.pagerank on why floats can't hash-gate
    // an iterative Σ). Generated, not hand-copied.
    "graph_pagerank" -> PagerankOracleSql,

    "graph_ppr" -> PprOracleSql,

    // plain u<v edges here vs degree-oriented edges in the plan: any
    // total order enumerates each triangle exactly once, so the sets
    // (and per-node counts) are identical — orientation is cost-only
    "graph_triangles" ->
      """WITH pairs AS (
        |  SELECT a.l_partkey AS u, b.l_partkey AS v
        |  FROM lineitem a JOIN lineitem b
        |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        |  GROUP BY 1, 2 HAVING count(*) >= 2),
        |t AS (SELECT e1.u AS a, e1.v AS b, e2.v AS c
        |      FROM pairs e1 JOIN pairs e2 ON e1.v = e2.u
        |      JOIN pairs e3 ON e3.u = e1.u AND e3.v = e2.v)
        |SELECT part_id, count(*) AS n_triangles FROM (
        |  SELECT a AS part_id FROM t
        |  UNION ALL SELECT b FROM t
        |  UNION ALL SELECT c FROM t)
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "graph_lpa" -> LpaOracleSql,

    "graph_kcore" -> KcoreOracleSql,

    "graph_bfs" -> BfsOracleSql,

    "graph_node_sim" ->
      """WITH pairs AS (SELECT a.l_partkey AS u, b.l_partkey AS v
        |  FROM lineitem a JOIN lineitem b
        |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        |  GROUP BY 1, 2 HAVING count(*) >= 2),
        |und AS (SELECT u AS node, v AS nbr FROM pairs
        |        UNION ALL SELECT v, u FROM pairs),
        |deg AS (SELECT node, count(*) AS deg FROM und GROUP BY 1),
        |cn AS (SELECT e.u, e.v, count(*) AS n_common
        |  FROM pairs e
        |  JOIN und a ON a.node = e.u
        |  JOIN und b ON b.node = e.v AND b.nbr = a.nbr
        |  GROUP BY 1, 2)
        |SELECT e.u, e.v, COALESCE(n_common, 0) AS n_common,
        |  round(CAST(COALESCE(n_common, 0) AS DOUBLE) /
        |    (du.deg + dv.deg - COALESCE(n_common, 0)), 4) AS jaccard
        |FROM pairs e
        |LEFT JOIN cn ON cn.u = e.u AND cn.v = e.v
        |JOIN deg du ON du.node = e.u
        |JOIN deg dv ON dv.node = e.v
        |ORDER BY e.u, e.v""".stripMargin,

    // the naive O(n²) dominance anti-join the distributed sweep avoids;
    // comparisons only, no arithmetic → exact on doubles
    "q36_skyline" ->
      """SELECT p_partkey, p_retailprice, CAST(p_size AS INT) AS p_size
        |FROM part a
        |WHERE NOT EXISTS (SELECT 1 FROM part b
        |  WHERE b.p_retailprice <= a.p_retailprice
        |    AND b.p_size >= a.p_size
        |    AND (b.p_retailprice < a.p_retailprice OR b.p_size > a.p_size))
        |ORDER BY p_partkey""".stripMargin,

    "table_diff" ->
      """WITH va AS (SELECT o_orderkey, o_totalprice, o_orderstatus
        |  FROM orders WHERE o_orderkey % 5 <> 4),
        |vb AS (SELECT o_orderkey,
        |  CASE WHEN o_orderkey % 3 = 0 THEN o_totalprice + 1.0
        |       ELSE o_totalprice END AS o_totalprice, o_orderstatus
        |  FROM orders WHERE o_orderkey % 5 <> 0)
        |SELECT COALESCE(va.o_orderkey, vb.o_orderkey) AS o_orderkey,
        |  CASE WHEN va.o_orderkey IS NULL THEN 'added'
        |       WHEN vb.o_orderkey IS NULL THEN 'removed'
        |       ELSE 'updated' END AS change_type,
        |  va.o_totalprice AS old_price, vb.o_totalprice AS new_price
        |FROM va FULL JOIN vb ON va.o_orderkey = vb.o_orderkey
        |WHERE va.o_orderkey IS NULL OR vb.o_orderkey IS NULL
        |   OR va.o_totalprice <> vb.o_totalprice
        |   OR va.o_orderstatus <> vb.o_orderstatus
        |ORDER BY o_orderkey""".stripMargin,

    // z-interleave + min-max normalization generated by the same
    // Maintenance builders the Spark plan parses — only the shift and
    // integer-divide spellings differ
    "layout_zorder" -> {
      import graft.operators.Maintenance.{normSql, zValueSql, ZBits}
      val idiv = (a: String, b: String) => s"($a // $b)"
      val z = zValueSql("xn", "yn", ZBits, (e, i) => s"($e >> $i)")
      s"""WITH b AS (SELECT min(l_orderkey) AS lo_ok, max(l_orderkey) AS hi_ok,
         |  min(l_partkey) AS lo_pk, max(l_partkey) AS hi_pk FROM lineitem),
         |nk AS (SELECT l_orderkey, l_partkey,
         |  ${normSql("l_orderkey", "lo_ok", "hi_ok", idiv)} AS xn,
         |  ${normSql("l_partkey", "lo_pk", "hi_pk", idiv)} AS yn
         |  FROM lineitem, b)
         |SELECT $z // ${1L << (2 * ZBits - 6)} AS zcell,
         |  count(*) AS n_rows,
         |  min(l_orderkey) AS min_ok, max(l_orderkey) AS max_ok,
         |  min(l_partkey) AS min_pk, max(l_partkey) AS max_pk
         |FROM nk GROUP BY 1 ORDER BY zcell""".stripMargin
    },

    "corpus_group_cap" ->
      """SELECT doc_id, lang, source, rk FROM (
        |  SELECT doc_id, lang, source,
        |    CAST(row_number() OVER (PARTITION BY lang, source
        |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS BIGINT) AS rk
        |  FROM documents)
        |WHERE rk <= 5 ORDER BY lang, source, rk""".stripMargin,

    "corpus_pack" ->
      """WITH t AS (
        |  SELECT doc_id, doc_id % 16 AS shard,
        |    CAST(len(list_filter(string_split(text, ' '), x -> len(x) > 0)) AS BIGINT) AS n_tok
        |  FROM documents),
        |c AS (SELECT doc_id, shard, n_tok,
        |  COALESCE(SUM(n_tok) OVER (PARTITION BY shard ORDER BY doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
        |  FROM t)
        |SELECT doc_id, shard, n_tok,
        |  CAST(cum_before // 2048 AS BIGINT) AS chunk_id,
        |  CAST(cum_before % 2048 AS BIGINT) AS chunk_offset
        |FROM c ORDER BY doc_id""".stripMargin,

    "corpus_contamination" ->
      """WITH g0 AS (SELECT doc_id, text, unnest(range(len(text) - 7)) AS i
        |            FROM documents WHERE len(text) >= 8),
        |grams AS (SELECT DISTINCT doc_id, substr(text, CAST(i AS INT) + 1, 8) AS gram FROM g0),
        |gn AS (SELECT doc_id, count(*) AS n FROM grams GROUP BY 1),
        |bench AS (SELECT grams.doc_id AS bench_doc, gram, n AS bench_n
        |          FROM grams JOIN gn USING (doc_id) WHERE grams.doc_id % 199 = 0),
        |corpus AS (SELECT doc_id, gram FROM grams WHERE doc_id % 199 <> 0)
        |SELECT c.doc_id, b.bench_doc, CAST(count(*) AS BIGINT) AS n_shared,
        |       round(count(*) * 1.0 / bench_n, 4) AS bench_frac
        |FROM corpus c JOIN bench b USING (gram)
        |GROUP BY c.doc_id, b.bench_doc, bench_n
        |HAVING round(count(*) * 1.0 / bench_n, 4) >= 0.25
        |ORDER BY c.doc_id, b.bench_doc""".stripMargin,

    // the semantic twin: exact nearest-train per eval vector. The Spark
    // side's argmax key is the 4-dp-quantized integer (cos, -train_id)
    // struct; round-then-divide reproduces the identical double here.
    "corpus_contamination_semantic" ->
      """WITH n AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb,
        |         sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[]))) AS nrm
        |  FROM embeddings),
        |ev AS (SELECT * FROM n WHERE vec_id % 20 = 0),
        |tr AS (SELECT * FROM n WHERE vec_id % 20 <> 0),
        |sc AS (SELECT e.vec_id AS eval_id, t.vec_id AS train_id,
        |         round(list_dot_product(e.emb, t.emb) / (e.nrm * t.nrm), 4) AS cos_sim
        |       FROM ev e JOIN tr t ON true),
        |rk AS (SELECT *, row_number() OVER (PARTITION BY eval_id ORDER BY cos_sim DESC, train_id) AS rn FROM sc)
        |SELECT eval_id, train_id, cos_sim,
        |  CAST(CASE WHEN cos_sim >= 0.42 THEN 1 ELSE 0 END AS BIGINT) AS contaminated
        |FROM rk WHERE rn = 1 ORDER BY eval_id""".stripMargin,

    "dedup_embed_lsh" ->
      """WITH n AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb,
        |         sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[]))) AS nrm
        |  FROM embeddings),
        |bt AS (SELECT vec_id, emb, nrm,
        |  list_transform(range(24), p ->
        |    CASE WHEN list_dot_product(emb, list_transform(range(64), j ->
        |      (CAST(('0x' || substr(md5(CAST(p AS VARCHAR) || '_' || CAST(j AS VARCHAR)), 1, 15)) AS BIGINT) % 2000)
        |        / 1000.0 - 1.0)) >= 0 THEN 1 ELSE 0 END) AS bits
        |  FROM n),
        |bk AS (SELECT vec_id, emb, nrm,
        |  list_transform(range(4), t ->
        |    bits[CAST(t*6 AS INT) + 1] + bits[CAST(t*6 AS INT) + 2] * 2 + bits[CAST(t*6 AS INT) + 3] * 4 +
        |    bits[CAST(t*6 AS INT) + 4] * 8 + bits[CAST(t*6 AS INT) + 5] * 16 + bits[CAST(t*6 AS INT) + 6] * 32) AS buckets
        |  FROM bt),
        |tabs AS (SELECT vec_id, emb, nrm, t, buckets[t + 1] AS bucket
        |  FROM (SELECT vec_id, emb, nrm, buckets, unnest(range(4)) AS t FROM bk))
        |SELECT * FROM (
        |  SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b,
        |    round(list_dot_product(a.emb, b.emb) / (a.nrm * b.nrm), 4) AS cos_sim
        |  FROM tabs a JOIN tabs b
        |  ON a.t = b.t AND a.bucket = b.bucket AND a.vec_id < b.vec_id)
        |WHERE cos_sim >= 0.4 ORDER BY vec_a, vec_b""".stripMargin,

    // CTE replay of the whole fixed-point PCA training — see PcaOracleSql
    "sim_pca_project" -> PcaOracleSql,

    // the naive quadratic definition of the gram matrix — equality with
    // Spark's one-pass fixed-state partial aggregation is the gate.
    // Sums of double products round at 6 decimals, ~7 orders above the
    // partial-order fp noise on these O(10) entries
    "sim_gram_matrix" ->
      """WITH a AS (
        |  SELECT row_number() OVER () AS rid,
        |    generate_subscripts(embedding, 1) AS i,
        |    CAST(unnest(embedding) AS DOUBLE) AS v
        |  FROM embeddings)
        |SELECT CAST(a.i AS BIGINT) AS i, CAST(b.i AS BIGINT) AS j,
        |  round(sum(a.v * b.v), 6) AS s
        |FROM a JOIN a b USING (rid) WHERE a.i <= b.i
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "sim_knn_join" ->
      """WITH n AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb,
        |         sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[]))) AS nrm
        |  FROM embeddings),
        |bt AS (SELECT vec_id, emb, nrm,
        |  list_transform(range(24), p ->
        |    CASE WHEN list_dot_product(emb, list_transform(range(64), j ->
        |      (CAST(('0x' || substr(md5(CAST(p AS VARCHAR) || '_' || CAST(j AS VARCHAR)), 1, 15)) AS BIGINT) % 2000)
        |        / 1000.0 - 1.0)) >= 0 THEN 1 ELSE 0 END) AS bits
        |  FROM n),
        |bk AS (SELECT vec_id, emb, nrm,
        |  list_transform(range(4), t ->
        |    bits[CAST(t*6 AS INT) + 1] + bits[CAST(t*6 AS INT) + 2] * 2 + bits[CAST(t*6 AS INT) + 3] * 4 +
        |    bits[CAST(t*6 AS INT) + 4] * 8 + bits[CAST(t*6 AS INT) + 5] * 16 + bits[CAST(t*6 AS INT) + 6] * 32) AS buckets
        |  FROM bt),
        |tabs AS (SELECT vec_id, emb, nrm, t, buckets[t + 1] AS bucket
        |  FROM (SELECT vec_id, emb, nrm, buckets, unnest(range(4)) AS t FROM bk)),
        |cand AS (SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b,
        |    round(list_dot_product(a.emb, b.emb) / (a.nrm * b.nrm), 4) AS cos_sim
        |  FROM tabs a JOIN tabs b
        |  ON a.t = b.t AND a.bucket = b.bucket AND a.vec_id < b.vec_id),
        |sym AS (SELECT vec_a AS vec_id, vec_b AS neighbor, cos_sim FROM cand
        |  UNION ALL SELECT vec_b, vec_a, cos_sim FROM cand),
        |rk AS (SELECT vec_id, neighbor, cos_sim,
        |  row_number() OVER (PARTITION BY vec_id ORDER BY cos_sim DESC, neighbor) AS rank
        |  FROM sym)
        |SELECT vec_id, neighbor, cos_sim, CAST(rank AS BIGINT) AS rank
        |FROM rk WHERE rank <= 3 ORDER BY vec_id, rank""".stripMargin,

    // replays Similarity.autoNprobe's integer rule
    // min(k, max(8, ceil(4·rerank / max(1, n div k)))) at the trainer
    // geometry (k = 10 coarse lists) and the documented default rerank
    // (200) — ceil via (a + b - 1) // b, all BIGINT, so the gate is
    // value-identical at every SF and every simulated decade
    "sim_auto_nprobe_dial" ->
      """WITH base AS (SELECT CAST(count(*) AS BIGINT) AS n0 FROM embeddings),
        |d AS (SELECT CAST(UNNEST(range(0, 21)) AS INT) AS decade),
        |g AS (SELECT d.decade, (base.n0 * (CAST(1 AS BIGINT) << d.decade)) AS n
        |      FROM d, base),
        |a AS (SELECT decade, n,
        |        GREATEST(CAST(1 AS BIGINT), n // 10) AS avg_list FROM g),
        |r AS (SELECT decade, n, avg_list,
        |        CAST(LEAST(10, GREATEST(8,
        |          (4 * 200 + avg_list - 1) // avg_list)) AS INT) AS nprobe
        |      FROM a)
        |SELECT decade, n, avg_list, nprobe,
        |       CAST(nprobe AS BIGINT) * avg_list AS probed_vectors
        |FROM r ORDER BY decade""".stripMargin,

    "sim_ivf_topk" ->
      """WITH e AS (
        |  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS emb,
        |         sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[]))) AS nrm
        |  FROM embeddings),
        |p AS (SELECT label, emb, unnest(range(len(emb))) AS dim FROM e),
        |bydim AS (SELECT label, dim, round(avg(emb[CAST(dim AS INT) + 1]), 8) AS m
        |          FROM p GROUP BY 1, 2),
        |cent AS (SELECT label, list(m ORDER BY dim) AS cvec FROM bydim GROUP BY label),
        |cn AS (SELECT label, cvec, sqrt(list_dot_product(cvec, cvec)) AS cnorm FROM cent),
        |q AS (SELECT emb AS q_emb, nrm AS q_nrm FROM e WHERE vec_id = 0),
        |best AS (SELECT label AS best_label
        |  FROM cn, q
        |  ORDER BY round(list_dot_product(cvec, q_emb) / (cnorm * q_nrm), 6) DESC, label
        |  LIMIT 1)
        |SELECT vec_id, round(list_dot_product(emb, q_emb) / (nrm * q_nrm), 6) AS cos_sim
        |FROM e, q, best WHERE e.label = best.best_label AND vec_id <> 0
        |ORDER BY cos_sim DESC, vec_id LIMIT 10""".stripMargin,

    "sim_ivf_probe2" ->
      """WITH e AS (
        |  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS emb,
        |         sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[]))) AS nrm
        |  FROM embeddings),
        |p AS (SELECT label, emb, unnest(range(len(emb))) AS dim FROM e),
        |bydim AS (SELECT label, dim, round(avg(emb[CAST(dim AS INT) + 1]), 8) AS m
        |          FROM p GROUP BY 1, 2),
        |cent AS (SELECT label, list(m ORDER BY dim) AS cvec FROM bydim GROUP BY label),
        |cn AS (SELECT label, cvec, sqrt(list_dot_product(cvec, cvec)) AS cnorm FROM cent),
        |q AS (SELECT emb AS q_emb, nrm AS q_nrm FROM e WHERE vec_id = 0),
        |best AS (SELECT label AS best_label
        |  FROM cn, q
        |  ORDER BY round(list_dot_product(cvec, q_emb) / (cnorm * q_nrm), 6) DESC, label
        |  LIMIT 2)
        |SELECT vec_id, round(list_dot_product(emb, q_emb) / (nrm * q_nrm), 6) AS cos_sim
        |FROM e, q WHERE e.label IN (SELECT best_label FROM best) AND vec_id <> 0
        |ORDER BY cos_sim DESC, vec_id LIMIT 10""".stripMargin,

    "sim_label_centroids" ->
      """WITH e AS (SELECT label, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
        |p AS (SELECT label, emb, unnest(range(len(emb))) AS dim FROM e),
        |bydim AS (SELECT label, dim, round(avg(emb[CAST(dim AS INT) + 1]), 8) AS m
        |          FROM p GROUP BY 1, 2)
        |SELECT label, round(sqrt(sum(m * m)), 4) AS centroid_norm, count(*) AS n_dims
        |FROM bydim GROUP BY label ORDER BY label""".stripMargin,

    // the UDAF twin rounds per-dim means to the same 8-decimal grain, so
    // it must hash-match the explode-form oracle exactly
    "sim_centroids_udaf" ->
      """WITH e AS (SELECT label, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
        |p AS (SELECT label, emb, unnest(range(len(emb))) AS dim FROM e),
        |bydim AS (SELECT label, dim, round(avg(emb[CAST(dim AS INT) + 1]), 8) AS m
        |          FROM p GROUP BY 1, 2)
        |SELECT label, round(sqrt(sum(m * m)), 4) AS centroid_norm, count(*) AS n_dims
        |FROM bydim GROUP BY label ORDER BY label""".stripMargin,

    // the streaming gate is stateless, so its closed form IS the batch
    // filter: text_quality's thresholds + text_langid's argmax, fused
    "stream_corpus_quality_gate" ->
      """WITH tk AS (
        |  SELECT doc_id, text, list_filter(string_split(lower(text), ' '), x -> len(x) > 0) AS tk
        |  FROM documents),
        |g AS (SELECT doc_id,
        |  CAST(len(tk) AS BIGINT) AS n_tokens,
        |  round(CAST(list_sum(list_transform(tk, x -> len(x))) AS DOUBLE) / len(tk), 4) AS mean_tok_len,
        |  round(CAST(len(regexp_extract_all(text, '[.!?,;:]')) AS DOUBLE) / len(text), 4) AS punct_ratio,
        |  CAST(len(list_filter(tk, x -> x IN ('the','and','of','to','in','a','is'))) AS BIGINT) AS n_en,
        |  CAST(len(list_filter(tk, x -> x IN ('el','la','de','que','y','en','un'))) AS BIGINT) AS n_es,
        |  CAST(len(list_filter(tk, x -> x IN ('der','die','und','ist','das','nicht','ein'))) AS BIGINT) AS n_de
        |  FROM tk),
        |l AS (SELECT doc_id, n_tokens, mean_tok_len, punct_ratio,
        |  CASE WHEN n_en + n_es + n_de = 0 THEN 'und'
        |       WHEN n_en >= n_es AND n_en >= n_de THEN 'en'
        |       WHEN n_es >= n_de THEN 'es' ELSE 'de' END AS pred_lang
        |  FROM g)
        |SELECT doc_id, n_tokens, mean_tok_len, punct_ratio, pred_lang
        |FROM l
        |WHERE n_tokens >= 10 AND mean_tok_len >= 2.0 AND mean_tok_len <= 15.0
        |  AND punct_ratio <= 0.2 AND pred_lang = 'en'
        |ORDER BY doc_id""".stripMargin,

    "text_langid" ->
      """WITH tk AS (
        |  SELECT doc_id, list_filter(string_split(lower(text), ' '), x -> len(x) > 0) AS tk
        |  FROM documents),
        |c AS (SELECT doc_id,
        |  CAST(len(list_filter(tk, x -> x IN ('the','and','of','to','in','a','is'))) AS BIGINT) AS n_en,
        |  CAST(len(list_filter(tk, x -> x IN ('el','la','de','que','y','en','un'))) AS BIGINT) AS n_es,
        |  CAST(len(list_filter(tk, x -> x IN ('der','die','und','ist','das','nicht','ein'))) AS BIGINT) AS n_de
        |  FROM tk)
        |SELECT doc_id, n_en, n_es, n_de,
        |  CASE WHEN n_en + n_es + n_de = 0 THEN 'und'
        |       WHEN n_en >= n_es AND n_en >= n_de THEN 'en'
        |       WHEN n_es >= n_de THEN 'es' ELSE 'de' END AS pred_lang
        |FROM c ORDER BY doc_id""".stripMargin,

    "text_quality" ->
      """WITH tk AS (
        |  SELECT doc_id, text, list_filter(string_split(lower(text), ' '), x -> len(x) > 0) AS tk
        |  FROM documents),
        |q AS (SELECT doc_id,
        |  CAST(len(text) AS BIGINT) AS n_chars,
        |  CAST(len(tk) AS BIGINT) AS n_tokens,
        |  round(CAST(list_sum(list_transform(tk, x -> len(x))) AS DOUBLE) / len(tk), 4) AS mean_tok_len,
        |  round(CAST(len(regexp_extract_all(text, '[.!?,;:]')) AS DOUBLE) / len(text), 4) AS punct_ratio,
        |  round(CAST(len(regexp_extract_all(text, '[a-zA-Z]')) AS DOUBLE) / len(text), 4) AS alpha_ratio,
        |  round(CAST(len(list_filter(tk, x -> x IN ('the','and','of','to','in','a','is'))) AS DOUBLE) / len(tk), 4) AS stopword_ratio
        |  FROM tk)
        |SELECT doc_id, n_chars, n_tokens, mean_tok_len, punct_ratio, alpha_ratio, stopword_ratio,
        |  CAST(CASE WHEN n_tokens >= 10 AND mean_tok_len >= 2.0 AND mean_tok_len <= 15.0
        |            AND punct_ratio <= 0.2 THEN 1 ELSE 0 END AS BIGINT) AS keep
        |FROM q ORDER BY doc_id""".stripMargin,

    "text_scrub" ->
      """SELECT doc_id,
        |CAST(len(regexp_extract_all(text, '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}')) AS BIGINT) AS n_emails,
        |CAST(len(regexp_extract_all(text, '[0-9]{6,}')) AS BIGINT) AS n_long_nums,
        |md5(regexp_replace(regexp_replace(text, '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}', '<EMAIL>', 'g'),
        |    '[0-9]{6,}', '<NUM>', 'g')) AS scrubbed_md5
        |FROM documents ORDER BY doc_id""".stripMargin,

    "text_normalize" ->
      """SELECT doc_id,
        |md5(trim(regexp_replace(lower(text), ' +', ' ', 'g'))) AS norm_md5,
        |CAST(trim(regexp_replace(lower(text), ' +', ' ', 'g')) <> text AS BIGINT) AS changed,
        |CAST(len(trim(regexp_replace(lower(text), ' +', ' ', 'g'))) AS BIGINT) AS n_chars_norm
        |FROM documents ORDER BY doc_id""".stripMargin,

    "text_chunk" ->
      """WITH toks AS (
        |  SELECT doc_id, list_filter(string_split(text, ' '), x -> len(x) > 0) AS t FROM documents),
        |c AS (
        |  SELECT doc_id, t, len(t) AS n,
        |    CASE WHEN len(t) <= 64 THEN 1 ELSE 1 + (len(t) - 17) // 48 END AS n_chunks
        |  FROM toks)
        |SELECT doc_id, CAST(i AS BIGINT) AS chunk_id, CAST(i * 48 AS BIGINT) AS start_tok,
        |  CAST(least(64, n - i * 48) AS BIGINT) AS chunk_len,
        |  array_to_string(t[CAST(i * 48 + 1 AS INT):CAST(i * 48 + 64 AS INT)], ' ') AS chunk_text
        |FROM c, unnest(range(n_chunks)) AS u(i)
        |ORDER BY doc_id, chunk_id""".stripMargin,

    "text_search" ->
      """WITH tk AS (
        |  SELECT doc_id, list_filter(string_split(lower(text), ' '), x -> len(x) > 0) AS t
        |  FROM documents),
        |m AS (SELECT doc_id, unnest(range(len(t) - 1)) AS i, t FROM tk WHERE len(t) >= 2),
        |hit AS (SELECT doc_id, CAST(i AS BIGINT) AS pos FROM m
        |        WHERE t[i+1] = 'agg' AND t[i+2] = 'join')
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_matches, min(pos) AS first_pos
        |FROM hit GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // same full-corpus SQL as text_search: the day-2 unioned index
    // (standing day-1 postings + the batch's appended files) must
    // return byte-identical matches to a from-scratch index
    "text_search_day2" ->
      """WITH tk AS (
        |  SELECT doc_id, list_filter(string_split(lower(text), ' '), x -> len(x) > 0) AS t
        |  FROM documents),
        |m AS (SELECT doc_id, unnest(range(len(t) - 1)) AS i, t FROM tk WHERE len(t) >= 2),
        |hit AS (SELECT doc_id, CAST(i AS BIGINT) AS pos FROM m
        |        WHERE t[i+1] = 'agg' AND t[i+2] = 'join')
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_matches, min(pos) AS first_pos
        |FROM hit GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // the phrase SQL over the survivor universe (docs not in the
    // retired ≡ 5 mod 17 takedown slice): one hash certifies that a
    // retired doc can never match (its postings are gone from the
    // compacted index) and that survivors are byte-identical to a
    // fresh index of the survivor corpus — compaction ≡ rebuild
    "text_search_compact" -> CompactPhraseOracleSql,

    // the streamed lifecycle shares the survivor oracle VERBATIM: N
    // per-micro-batch posting dirs + a takedown, folded by the same
    // union compaction, must answer identically to a fresh survivor
    // index — stream-accrued ≡ batch-built ≡ rebuild in one hash
    "stream_text_index_compact" -> CompactPhraseOracleSql,

    "text_search_bm25" -> Bm25OracleSql,

    // same full-corpus SQL: the day-2 unioned index + sidecar must
    // reproduce the corpus-derived ranking byte-for-byte
    "text_search_bm25_day2" -> Bm25OracleSql,

    // survivor-universe BM25: after the takedown compaction the sidecar
    // carries survivor stats, so the index-derived ranking must equal a
    // full BM25 over documents minus the retired slice
    "text_search_bm25_compact" -> bm25OracleSql(" WHERE doc_id % 17 <> 5"),

    "text_search_hybrid" ->
      """WITH tok AS (
        |  SELECT doc_id, w FROM documents,
        |    UNNEST(str_split(lower(text), ' ')) AS t(w) WHERE length(w) > 0),
        |dt AS (SELECT doc_id, w AS word, CAST(count(*) AS BIGINT) AS tf FROM tok GROUP BY 1, 2),
        |dl AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS dl FROM dt GROUP BY 1),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
        |               CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl FROM dl),
        |q AS (SELECT unnest(['dup', 'merge']) AS word),
        |df AS (SELECT word, CAST(count(*) AS BIGINT) AS df FROM dt JOIN q USING (word) GROUP BY 1),
        |contrib AS (
        |  SELECT dt.doc_id,
        |    CAST(round(1e6 * ln(1 + (tot.n_docs - df.df + 0.5) / (df.df + 0.5))
        |      * (dt.tf * 2.2) / (dt.tf + 1.2 * (0.25 + 0.75 * dl.dl / tot.avgdl))) AS BIGINT) AS wq
        |  FROM dt JOIN q USING (word) JOIN df USING (word)
        |  JOIN dl USING (doc_id) CROSS JOIN tot),
        |lexsc AS (SELECT doc_id, CAST(sum(wq) AS BIGINT) AS score_q FROM contrib GROUP BY 1),
        |lex AS (SELECT doc_id,
        |          CAST(row_number() OVER (ORDER BY score_q DESC, doc_id) AS BIGINT) AS rank_lex
        |        FROM (SELECT * FROM lexsc ORDER BY score_q DESC, doc_id LIMIT 100)),
        |nv AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb,
        |         sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[]))) AS nrm
        |       FROM embeddings),
        |qv AS (SELECT emb AS q_emb, nrm AS q_nrm FROM nv WHERE vec_id = 0),
        |vecsc AS (SELECT vec_id AS doc_id,
        |            round(list_dot_product(emb, q_emb) / (nrm * q_nrm), 6) AS cos_sim
        |          FROM nv, qv WHERE vec_id <> 0),
        |vec AS (SELECT doc_id,
        |          CAST(row_number() OVER (ORDER BY cos_sim DESC, doc_id) AS BIGINT) AS rank_vec
        |        FROM (SELECT * FROM vecsc ORDER BY cos_sim DESC, doc_id LIMIT 100)),
        |fused AS (
        |  SELECT COALESCE(lex.doc_id, vec.doc_id) AS doc_id,
        |    CAST(COALESCE(1000000 // (60 + rank_lex), 0)
        |       + COALESCE(1000000 // (60 + rank_vec), 0) AS BIGINT) AS rrf,
        |    COALESCE(rank_lex, CAST(0 AS BIGINT)) AS rank_lex,
        |    COALESCE(rank_vec, CAST(0 AS BIGINT)) AS rank_vec
        |  FROM lex FULL OUTER JOIN vec ON lex.doc_id = vec.doc_id),
        |topn AS (SELECT * FROM fused ORDER BY rrf DESC, doc_id LIMIT 20)
        |SELECT CAST(row_number() OVER (ORDER BY rrf DESC, doc_id) AS BIGINT) AS rank,
        |       doc_id, rank_lex, rank_vec, rrf
        |FROM topn ORDER BY rank""".stripMargin,

    "text_search_hybrid_pq" -> HybridPqOracleSql,

    "text_quality_regression" ->
      """SELECT source,
        |  CAST(count(*) AS BIGINT) AS n_docs,
        |  round(regr_slope(len(list_filter(string_split(text, ' '), x -> len(x) > 0)), n_chars), 6) AS slope,
        |  round(regr_intercept(len(list_filter(string_split(text, ' '), x -> len(x) > 0)), n_chars), 6) AS intercept,
        |  round(regr_r2(len(list_filter(string_split(text, ' '), x -> len(x) > 0)), n_chars), 6) AS r2
        |FROM documents GROUP BY source ORDER BY source""".stripMargin,

    "text_tokens" ->
      """SELECT doc_id,
        |CAST(len(list_filter(string_split(text, ' '), x -> len(x) > 0)) AS BIGINT) AS n_ws_tokens,
        |CAST(len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]')) AS BIGINT) AS n_bpe_tokens,
        |CAST(len(text) - len(replace(text, ' ', '')) + 1 AS BIGINT) AS n_fields
        |FROM documents ORDER BY doc_id""".stripMargin,

    "text_fingerprint" ->
      """WITH g0 AS (SELECT doc_id, text, unnest(range(len(text) - 7)) AS i
        |            FROM documents WHERE len(text) >= 8),
        |g AS (SELECT doc_id, md5(substr(text, CAST(i AS INT) + 1, 8)) AS g FROM g0)
        |SELECT doc_id, min(g) AS fingerprint, count(*) AS n_grams
        |FROM g GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "text_heavy_hitters" -> HeavyHittersOracleSql,

    // the 8 learn rounds unrolled as generated CTEs: DuckDB replays
    // train AND encode, so the encode half is value-hash-gated even
    // though each round's merge is a data-dependent argmax
    "text_bpe_encode" -> graft.operators.Bpe.encodeOracleSql(),
    "text_bpe_learn" -> graft.operators.Bpe.learnOracleSql(),
    // the streaming twin is exact on this corpus (no shard ever trims:
    // vocabulary ≪ m), so the finite drain shares the oracle verbatim
    "stream_heavy_hitters" -> HeavyHittersOracleSql,

    "text_tfidf_topk" ->
      """WITH tok AS (
        |  SELECT doc_id, unnest(list_filter(string_split(lower(text), ' '), x -> len(x) > 0)) AS word
        |  FROM documents),
        |tf AS (SELECT doc_id, word, count(*) AS tf FROM tok GROUP BY 1, 2),
        |dfx AS (SELECT word, count(*) AS df FROM tf GROUP BY 1),
        |nd AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs FROM documents),
        |ranked AS (SELECT doc_id, word, tf, df,
        |  row_number() OVER (PARTITION BY doc_id ORDER BY tf DESC, df ASC, word ASC) AS rank
        |  FROM tf JOIN dfx USING (word))
        |SELECT doc_id, CAST(rank AS BIGINT) AS rank, word AS term, tf, df,
        |  round(tf * ln(n_docs / df), 4) AS tfidf
        |FROM ranked, nd WHERE rank <= 3 ORDER BY doc_id, rank""".stripMargin,

    "text_surprisal" ->
      """WITH tok AS (
        |  SELECT doc_id, unnest(list_filter(string_split(lower(text), ' '), x -> len(x) > 0)) AS word
        |  FROM documents),
        |cnt AS (SELECT word, count(*) AS c FROM tok GROUP BY 1),
        |tot AS (SELECT CAST(sum(c) AS DOUBLE) AS t FROM cnt)
        |SELECT doc_id, count(*) AS n_tokens, round(avg(ln(t / c)), 4) AS surprisal
        |FROM tok JOIN cnt USING (word), tot
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "text_lm_score" ->
      """WITH tk0 AS (
        |  SELECT doc_id, lang, list_filter(string_split(lower(text), ' '), x -> len(x) > 0) AS tkl
        |  FROM documents),
        |bg AS (
        |  SELECT doc_id, lang,
        |    unnest(list_transform(range(1, len(tkl)), i -> tkl[i] || ' ' || tkl[i+1])) AS bigram
        |  FROM tk0 WHERE len(tkl) >= 2),
        |cb AS (SELECT bigram, count(*) AS cb FROM bg WHERE lang = 'en' GROUP BY 1),
        |c1 AS (SELECT string_split(bigram, ' ')[1] AS w1, CAST(sum(cb) AS BIGINT) AS c1
        |       FROM cb GROUP BY 1),
        |v AS (SELECT CAST(count(DISTINCT w) AS DOUBLE) AS v FROM
        |       (SELECT unnest(tkl) AS w FROM tk0 WHERE lang = 'en')),
        |dbg AS (SELECT doc_id, bigram, string_split(bigram, ' ')[1] AS w1, count(*) AS n
        |        FROM bg GROUP BY 1, 2, 3)
        |SELECT d.doc_id, CAST(sum(d.n) AS BIGINT) AS n_bigrams,
        |  round(sum(d.n * ln((COALESCE(cb.cb, 0) + 1) / (COALESCE(c1.c1, 0) + v.v))) / sum(d.n), 4) AS lm_logprob
        |FROM dbg d LEFT JOIN cb ON d.bigram = cb.bigram
        |           LEFT JOIN c1 ON d.w1 = c1.w1, v
        |GROUP BY d.doc_id ORDER BY d.doc_id""".stripMargin,

    "corpus_quality_funnel" ->
      """WITH tk0 AS (
        |  SELECT doc_id, text, list_filter(string_split(lower(text), ' '), x -> len(x) > 0) AS tkl
        |  FROM documents),
        |stats AS (SELECT doc_id,
        |  CAST(len(tkl) AS BIGINT) AS n_tokens,
        |  round(CAST(list_sum(list_transform(tkl, x -> len(x))) AS DOUBLE) / len(tkl), 4) AS mean_tok_len,
        |  round(CAST(len(regexp_extract_all(text, '[.!?,;:]')) AS DOUBLE) / len(text), 4) AS punct_ratio,
        |  round(CAST(len(regexp_extract_all(text, '[a-zA-Z]')) AS DOUBLE) / len(text), 4) AS alpha_ratio,
        |  CAST(len(regexp_extract_all(text, '[0-9]{6,}')) AS BIGINT) AS n_long_nums
        |  FROM tk0),
        |ff AS (SELECT doc_id,
        |  CASE WHEN n_tokens < 10 THEN 1
        |       WHEN mean_tok_len < 2.0 OR mean_tok_len > 15.0 THEN 2
        |       WHEN punct_ratio > 0.2 THEN 3
        |       WHEN alpha_ratio < 0.5 THEN 4
        |       WHEN n_long_nums > 0 THEN 5
        |       ELSE 0 END AS ff FROM stats),
        |stages(stage, rule) AS (VALUES (1, 'min_tokens'), (2, 'tok_len'),
        |  (3, 'punct_ratio'), (4, 'alpha_ratio'), (5, 'digit_runs')),
        |fc AS (SELECT stage, rule, COALESCE(f.n, 0) AS n_fail
        |  FROM stages LEFT JOIN (SELECT ff, count(*) AS n FROM ff GROUP BY 1) f
        |  ON f.ff = stages.stage),
        |run AS (SELECT stage, rule, n_fail,
        |  (SELECT count(*) FROM ff) - COALESCE(sum(n_fail) OVER (ORDER BY stage
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS n_in
        |  FROM fc)
        |SELECT CAST(stage AS BIGINT) AS stage, rule,
        |  CAST(n_in AS BIGINT) AS n_in, CAST(n_fail AS BIGINT) AS n_fail,
        |  CAST(n_in - n_fail AS BIGINT) AS n_out
        |FROM run ORDER BY stage""".stripMargin,

    "stream_events_window" ->
      """SELECT (epoch_ns(ts) // 300000000000) * 300 AS bucket,
        |event_type, count(*) AS n_events, round(sum(value), 2) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY bucket, event_type""".stripMargin,

    "stream_sessionize" -> SessionizeOracleSql,
    // built-in session_window machinery, gated at ITS OWN grain: the
    // engine computes on µs event times (the finest Spark timestamp),
    // so the oracle compares µs-truncated gaps — q15's ns-grain SQL
    // would silently diverge on a sub-µs-grain ts generation (an event
    // pair 1800000000500 ns apart is a new session at ns grain but
    // one merged window at µs grain). Same numbers on µs-grain data.
    "stream_session_window" ->
      """WITH x AS (
        |  SELECT user_id, epoch_us(ts) AS eus,
        |    lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY epoch_us(ts)) AS prev
        |  FROM events)
        |SELECT user_id,
        |  CAST(sum(CASE WHEN prev IS NULL OR eus - prev > 1800000000 THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions,
        |  count(*) AS n_events
        |FROM x GROUP BY user_id ORDER BY user_id""".stripMargin,

    "text_repetition" ->
      """WITH tk AS (
        |  SELECT doc_id, list_filter(string_split(lower(text), ' '), x -> len(x) > 0) AS t
        |  FROM documents),
        |b AS (
        |  SELECT doc_id, len(t) AS n_tokens, len(list_distinct(t)) AS n_distinct,
        |         list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i + 1]) AS bg
        |  FROM tk),
        |e AS (SELECT doc_id, n_tokens, n_distinct, unnest(bg) AS g FROM b),
        |cnt AS (SELECT doc_id, n_tokens, n_distinct, g, count(*) AS c
        |        FROM e GROUP BY 1, 2, 3, 4),
        |agg AS (SELECT doc_id, n_tokens, n_distinct,
        |               max(c) AS top_c, CAST(sum(c) AS BIGINT) AS n_bg,
        |               count(*) AS n_distinct_bg
        |        FROM cnt GROUP BY 1, 2, 3),
        |q AS (
        |  SELECT b.doc_id, CAST(b.n_tokens AS BIGINT) AS n_tokens,
        |         CASE WHEN b.n_tokens > 0
        |           THEN round(1.0 - CAST(b.n_distinct AS DOUBLE) / b.n_tokens, 4)
        |           ELSE 0.0 END AS dup_word_frac,
        |         CASE WHEN coalesce(a.n_bg, 0) > 0
        |           THEN round(CAST(a.top_c AS DOUBLE) / a.n_bg, 4)
        |           ELSE 0.0 END AS top_bigram_frac,
        |         CASE WHEN coalesce(a.n_bg, 0) > 0
        |           THEN round(1.0 - CAST(a.n_distinct_bg AS DOUBLE) / a.n_bg, 4)
        |           ELSE 0.0 END AS dup_bigram_frac
        |  FROM b LEFT JOIN agg a USING (doc_id))
        |SELECT doc_id, n_tokens, dup_word_frac, top_bigram_frac, dup_bigram_frac,
        |  CAST(CASE WHEN dup_word_frac <= 0.40 AND top_bigram_frac <= 0.20
        |       THEN 1 ELSE 0 END AS BIGINT) AS keep
        |FROM q ORDER BY doc_id""".stripMargin,

    "stream_stream_join" ->
      s"""WITH $ErrClickCtes
        |SELECT e.event_id, count(*) AS n_prior_clicks
        |FROM e JOIN c ON $ErrClickCond
        |GROUP BY 1 ORDER BY event_id""".stripMargin,

    // the state-closure rule in closed form: matches emit freely; an
    // unmatched error emits (n = 0) iff the final watermark
    // (min of both sides' ms-truncated max event time − 1 h) has
    // passed its event time, proving no qualifying click can arrive
    "stream_stream_outer" ->
      s"""WITH $ErrClickCtes,
        |wm AS (SELECT least((SELECT max(ts_ns) // 1000000 FROM e),
        |                    (SELECT max(ts_ns) // 1000000 FROM c))
        |         - 3600000 AS wm_ms),
        |m AS (SELECT e.event_id, count(*) AS n_prior_clicks
        |  FROM e JOIN c ON $ErrClickCond
        |  GROUP BY 1)
        |SELECT event_id, n_prior_clicks FROM m
        |UNION ALL
        |SELECT e.event_id, CAST(0 AS BIGINT) AS n_prior_clicks
        |FROM e
        |WHERE e.event_id NOT IN (SELECT event_id FROM m)
        |  -- closure compares at MICROSECOND grain: the watermark value is
        |  -- ms-floored, but Spark evicts against the full-us event time,
        |  -- so a row sub-ms above the watermark is withheld — an
        |  -- ms-truncated comparison here would over-emit exactly there
        |  AND e.ts_ns // 1000 <= (SELECT wm_ms FROM wm) * 1000
        |ORDER BY event_id""".stripMargin,

    "stream_static_join" ->
      """SELECT c.c_mktsegment, count(*) AS n_purchases,
        |       round(sum(e.value), 2) AS sum_value
        |FROM events e JOIN customer c ON e.user_id = c.c_custkey
        |WHERE e.event_type = 'purchase'
        |GROUP BY 1 ORDER BY c_mktsegment""".stripMargin,

    "stream_dedup" ->
      """SELECT DISTINCT md5(text) AS text_hash
        |FROM documents ORDER BY text_hash""".stripMargin,

    "stream_dedup_watermarked" ->
      """SELECT DISTINCT user_id, event_type
        |FROM events ORDER BY user_id, event_type""".stripMargin,

    // single-batch drain ⇒ first-owner-wins == "min lower id sharing any
    // LSH band bucket" — the same band CTEs as the batch minhash oracle
    "stream_neardup_filter" -> NearDupStreamOracleSql,
    "stream_neardup_indexed" -> IndexedNearDupOracleSql,
    // single-batch drain closed form: owner = bucket min per (t, bucket)
    // over the SAME hyperplane family as sim_ann_lsh; a member reports
    // the owner iff exact cosine ≥ 0.3 — the verify gate is load-bearing
    // (collision-only semantics would emit ~4× the corpus and hash-fail)
    "stream_embed_neardup" ->
      """WITH n AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb,
        |         sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[]))) AS nrm
        |  FROM embeddings),
        |bt AS (SELECT vec_id, emb, nrm,
        |  list_transform(range(24), p ->
        |    CASE WHEN list_dot_product(emb, list_transform(range(64), j ->
        |      (CAST(('0x' || substr(md5(CAST(p AS VARCHAR) || '_' || CAST(j AS VARCHAR)), 1, 15)) AS BIGINT) % 2000)
        |        / 1000.0 - 1.0)) >= 0 THEN 1 ELSE 0 END) AS bits
        |  FROM n),
        |bk AS (SELECT vec_id,
        |  list_transform(range(4), t ->
        |    bits[CAST(t*6 AS INT) + 1] + bits[CAST(t*6 AS INT) + 2] * 2 + bits[CAST(t*6 AS INT) + 3] * 4 +
        |    bits[CAST(t*6 AS INT) + 4] * 8 + bits[CAST(t*6 AS INT) + 5] * 16 + bits[CAST(t*6 AS INT) + 6] * 32) AS buckets
        |  FROM bt),
        |tabs AS (SELECT vec_id, t, buckets[t + 1] AS bucket
        |  FROM (SELECT vec_id, buckets, unnest(range(4)) AS t FROM bk)),
        |own AS (SELECT t, bucket, min(vec_id) AS owner FROM tabs GROUP BY 1, 2),
        |hits AS (SELECT b.vec_id AS vec_id, o.owner AS owner
        |  FROM tabs b JOIN own o ON b.t = o.t AND b.bucket = o.bucket AND o.owner < b.vec_id
        |  JOIN n a ON a.vec_id = o.owner JOIN n v ON v.vec_id = b.vec_id
        |  WHERE round(list_dot_product(v.emb, a.emb) / (v.nrm * a.nrm), 4) >= 0.3)
        |SELECT vec_id, min(owner) AS near_dup_of
        |FROM hits GROUP BY 1 ORDER BY vec_id""".stripMargin,

    // the online owner-check contract stated verbatim: owner(sig) =
    // min id carrying sig; dup_of = min owner within distance <= 1
    "stream_editdup_filter" -> EditDupFilterOracleSql,

    // identical statement: the TTL drain's horizon exceeds the corpus
    // event-time span, so nothing expires in the finite gate drain
    "stream_neardup_ttl" -> NearDupStreamOracleSql,

    // mid-corpus horizon: expiry fires mid-drain; the oracle states the
    // state machine's closed form under the 8-batch replay geometry
    "stream_neardup_ttl_expiry" -> NearDupTtlExpiryOracleSql,

    "dicom_parse_da_fn" ->
      """SELECT o_orderkey,
        |strftime(CAST(strptime(strftime(o_orderdate, '%Y%m%d'), '%Y%m%d') AS DATE), '%Y-%m-%d') AS parsed_date
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "dicom_parse_pn_fn" ->
      """SELECT c_custkey,
        |string_split(c_name || '^' || c_mktsegment, '^')[1] AS family_name,
        |string_split(c_name || '^' || c_mktsegment, '^')[2] AS given_name
        |FROM customer ORDER BY c_custkey""".stripMargin,
  )
}
