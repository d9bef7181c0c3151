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

  /** Event-time tumbling aggregation as a STREAMING query: the events
    * table drained through `readStream` (AvailableNow) into a complete-
    * mode in-memory sink. Must produce exactly the batch `q14` result —
    * and shares its DuckDB oracle, so the streaming engine itself is
    * correctness-gated. Exact integer ns bucket math as in q14. */
  def streamEventsWindow(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val base = java.nio.file.Paths.get("/root/repo/target/dicomq")
    java.nio.file.Files.createDirectories(base)
    val in = java.nio.file.Files.createTempDirectory(base, "events").toAbsolutePath
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/events.parquet"),
      in.resolve("events.parquet"))
    val schema = s.read.parquet(s"$dir/events.parquet").schema
    val name = "stream_win_" + java.lang.Long.toHexString(
      java.util.concurrent.ThreadLocalRandom.current().nextLong()).take(8)
    val q = s.readStream.schema(schema).parquet(in.toString)
      .groupBy((expr("ts div 300000000000") * 300).as("bucket"), $"event_type")
      .agg(count(lit(1)).as("n_events"), round(sum($"value"), 2).as("sum_value"))
      .writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(name)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    s.table(name).orderBy($"bucket", $"event_type")
  }
}
