package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Non-parquet corpus ingestion — the JSONL and CSV readers a real
  * pipeline meets before anything is columnar (crawl dumps, vendor
  * drops, export files). Each round-trip query stages the documents
  * table in the text format ONCE (marker-gated, under scratch), reads
  * it back through the engine's own reader with an EXPLICIT schema —
  * schema inference is a full extra pass over 100 TB and is never used
  * here — and projects a digest the DuckDB oracle recomputes from the
  * parquet table. Hash equality gates the whole encode→escape→decode
  * path cross-engine: a broken quote rule or a lossy numeric round-trip
  * flips `text_md5` or `n_chars` immediately.
  *
  * Scale shape: the stage is one write job (32-way), the read is a
  * narrow scan with the same split-by-file parallelism as any text
  * source; no shuffle until the oracle-stability sort. */
object DocumentSources {

  private def docsSchema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("doc_id", org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("text", org.apache.spark.sql.types.StringType),
    org.apache.spark.sql.types.StructField("lang", org.apache.spark.sql.types.StringType),
    org.apache.spark.sql.types.StructField("source", org.apache.spark.sql.types.StringType),
    org.apache.spark.sql.types.StructField("n_chars", org.apache.spark.sql.types.LongType)))

  /** Stage `documents.parquet` under scratch in `fmt`, once per
    * (scratch, sf, fmt) — the marker carries the sf dir so two scale
    * factors can't silently share a staged copy. */
  private def stage(s: SparkSession, dir: String, fmt: String): String = {
    val key = java.lang.Long.toHexString(
      scala.util.hashing.MurmurHash3.stringHash(dir).toLong & 0xffffffffL)
    val out = graft.util.Fs.scratchDir(s, s"docsrc_${fmt}_$key")
    val marker = out.resolve("_STAGED_OK")
    if (!java.nio.file.Files.exists(marker)) {
      val w = s.read.parquet(s"$dir/documents.parquet")
        .select("doc_id", "text", "lang", "source", "n_chars")
        .write.mode("overwrite")
      (fmt match {
        case "json" => w
        // the CSV WRITER trims unquoted whitespace by default
        // (ignore*WhiteSpace default TRUE on write, false on read) —
        // a silently lossy default a faithful round-trip must disable
        case "csv" => w.option("header", "true")
          .option("ignoreLeadingWhiteSpace", "false")
          .option("ignoreTrailingWhiteSpace", "false")
      }).format(fmt).save(out.resolve("data").toString)
      java.nio.file.Files.write(marker, dir.getBytes("UTF-8"))
    }
    out.resolve("data").toString
  }

  private def digest(df: DataFrame): DataFrame =
    df.select(col("doc_id"), col("lang"), col("source"), col("n_chars"),
        md5(col("text")).as("text_md5"))
      .orderBy(col("doc_id"))

  /** JSONL round-trip: parquet → JSON lines → explicit-schema read →
    * digest. Gates JSON string escaping and long round-tripping. */
  def jsonlRoundtrip(s: SparkSession, dir: String): DataFrame =
    digest(s.read.schema(docsSchema).json(stage(s, dir, "json")))

  /** CSV round-trip: parquet → quoted CSV with header →
    * explicit-schema read → digest. Gates the quote/escape rules. */
  def csvRoundtrip(s: SparkSession, dir: String): DataFrame =
    digest(s.read.schema(docsSchema).option("header", "true")
      .csv(stage(s, dir, "csv")))
}
