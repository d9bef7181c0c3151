package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming-semantics queries (SURVEY.md §2.5): the event-per-object
  * ingest as a checkpointed Structured Streaming run over a scratch copy
  * of the reference fixtures. Deterministic → rows-only driver check. */
object StreamQueries {

  /** Drain an AvailableNow binaryFile stream of (2 loose + 1 zip) fixture
    * objects through the SAME extraction as the batch path; return
    * per-source-object image counts read back from the partitioned sink. */
  def streamIngest(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val base = java.nio.file.Paths.get("/root/repo/target/dicomq")
    java.nio.file.Files.createDirectories(base)
    val out = java.nio.file.Files.createTempDirectory(base, "stream").toAbsolutePath.toString
    val in = s"$out/in"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(in))
    Seq("example-0", "example-6", "example.zip").foreach { f =>
      java.nio.file.Files.copy(
        java.nio.file.Paths.get(s"${DicomQueries.Fixtures}/$f"),
        java.nio.file.Paths.get(s"$in/$f"))
    }
    val q = graft.streaming.DicomStream.start(
      s, in, s"$out/data", s"$out/errors", s"$out/ckpt")
    q.awaitTermination()
    s.read.parquet(s"$out/data")
      .groupBy(element_at(split($"source_s3_key", "/"), -1).as("source_key"))
      .agg(count(lit(1)).as("n_images"))
      .orderBy($"source_key")
  }
}
