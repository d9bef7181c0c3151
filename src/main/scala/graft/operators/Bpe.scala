package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** One word of the BPE working set: its current symbol sequence and its
  * corpus frequency. Top-level so the product encoder derives. */
case class BpeWord(syms: Seq[String], freq: Long)

/** Distributed BYTE-PAIR-ENCODING vocabulary learning — the tokenizer-
  * training step of an LLM data pipeline (Sennrich et al. 2016, the
  * algorithm behind GPT/Llama-style tokenizers).
  *
  * The scale insight every production BPE trainer uses: training runs on
  * the WORD-FREQUENCY DICTIONARY, not the corpus. The corpus is touched
  * exactly once (one groupBy to count words); every merge round after
  * that operates on vocab-sized data (distinct words ≪ corpus tokens),
  * so 100 TB of text costs one aggregation plus K rounds over a relation
  * that fits in a few executors.
  *
  * Per round: count adjacent symbol pairs (flatMap over sliding windows,
  * weighted by word freq — a partial-aggregated vocab-sized shuffle),
  * pick the argmax pair under the deterministic (freq desc, pair asc)
  * tie rule, and apply the merge with one narrow left-to-right scan per
  * word (non-overlapping, leftmost-first — the standard greedy). The
  * single `limit(1).collect()` per round moves ONE row to the driver:
  * that row (the chosen merge) is genuinely global control flow, the
  * same shape as [[Similarity]]'s k-row k-means reduce. Each round's
  * working set is persisted and the previous round's released, so
  * lineage stays one round deep.
  *
  * Not SQL-expressible (the round-k tokenization depends on all k-1
  * prior data-dependent argmaxes), so the queries entry is rows-only;
  * BpeSpec pins exact parity against an independent single-threaded
  * reference implementation plus the monotone-frequency invariant. */
object Bpe {

  /** End-of-word sentinel — lets merges learn word-final units ("ing</w>")
    * distinct from word-internal ones, as in the original algorithm. */
  val Eow = "</w>"

  private[graft] def mergeOnce(syms: Seq[String], a: String,
                               b: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
        out += (a + b); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.toSeq
  }

  /** The word-frequency dictionary: the one corpus-sized pass. */
  private def wordFreq(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    s.read.parquet(s"$dir/documents.parquet")
      .select(explode(expr(
        "filter(split(lower(text), ' '), x -> length(x) > 0)")).as("word"))
      .groupBy($"word").agg(count(lit(1)).as("freq"))
  }

  /** Learn `k` merges; returns (rank, left, right, pair_freq) — the
    * ordered merge table that IS a BPE tokenizer's vocabulary. */
  def learn(s: SparkSession, dir: String, k: Int = 8): DataFrame = {
    import s.implicits._
    var words: Dataset[BpeWord] = wordFreq(s, dir).as[(String, Long)]
      .map { case (w, f) => BpeWord(w.map(_.toString) :+ Eow, f) }
      .persist()
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    try {
      var rank = 1
      var exhausted = false
      while (rank <= k && !exhausted) {
        val best = words
          .flatMap(w => w.syms.sliding(2).collect {
            case Seq(a, b) => (a, b, w.freq)
          })
          .toDF("a", "b", "f")
          .groupBy($"a", $"b").agg(sum($"f").as("cnt"))
          .orderBy($"cnt".desc, $"a", $"b")
          .limit(1)
          .as[(String, String, Long)]
          .collect()
        best.headOption match {
          case None => exhausted = true
          case Some((a, b, cnt)) =>
            merges += ((rank, a, b, cnt))
            val next = words.map(w => BpeWord(mergeOnce(w.syms, a, b), w.freq))
              .persist()
            next.count() // materialize before dropping the parent
            words.unpersist(false)
            words = next
            rank += 1
        }
      }
    } finally words.unpersist(false)
    s.createDataFrame(merges.toSeq)
      .toDF("rank", "left", "right", "pair_freq")
      .withColumn("rank", col("rank").cast("long"))
      .orderBy("rank")
  }

  /** ENCODE with a learned merge table — the serving half of the
    * tokenizer, and the pipeline's per-document token accounting
    * (sequence-length budgeting, packing inputs, cost estimates).
    *
    * The dictionary trick again, in reverse: the merge table (k rows)
    * ships in the encoder closure, each DISTINCT word is encoded ONCE
    * (fold the merges in rank order, each a leftmost-first scan — the
    * exact [[mergeOnce]] the trainer applied, so train→encode is
    * self-consistent by construction), and the corpus only pays a
    * word-level join against that vocab-sized dictionary. Per-doc
    * output is integer-only (word and BPE-token counts): no float ever
    * crosses engines, and the doc rollup partial-aggregates.
    *
    * Rows-only like [[learn]] (the merge table is k data-dependent
    * argmaxes — no SQL oracle can express round k); BpeSpec pins exact
    * parity of the whole train→encode path against the independent
    * single-threaded reference on crafted docs, plus the token-count
    * bounds (n_words ≤ n_tokens ≤ chars + words). */
  def encode(s: SparkSession, dir: String, k: Int = 8): DataFrame = {
    import s.implicits._
    val merges = learn(s, dir, k)
      .select($"left", $"right").as[(String, String)].collect()

    val dict = wordFreq(s, dir).as[(String, Long)]
      .map { case (w, _) =>
        val syms = merges.foldLeft(w.map(_.toString) :+ Eow: Seq[String]) {
          case (ss, (a, b)) => mergeOnce(ss, a, b)
        }
        (w, syms.length.toLong)
      }
      .toDF("word", "n_sym")

    // (doc, word) pre-agg BEFORE the dictionary join: the partial agg
    // collapses repeated words map-side, so the join and both exchanges
    // carry per-doc DISTINCT words, never raw token volume
    s.read.parquet(s"$dir/documents.parquet")
      .select($"doc_id", explode(expr(
        "filter(split(lower(text), ' '), x -> length(x) > 0)")).as("word"))
      .groupBy($"doc_id", $"word").agg(count(lit(1)).as("n"))
      .join(dict, Seq("word"))
      .groupBy($"doc_id")
      .agg(sum($"n").as("n_words"),
           sum($"n" * $"n_sym").as("n_tokens"))
      .orderBy($"doc_id")
  }
}
