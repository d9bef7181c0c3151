package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.pipeline.DicomPipeline

/** Event-driven ingest parity (SURVEY.md §2.5): the reference's "stream"
  * is one Lambda invocation per S3 `ObjectCreated` event
  * (`src/app.py:97-108`) — exactly Structured Streaming's file-source
  * semantics. `readStream.format("binaryFile")` discovers new objects;
  * `foreachBatch` runs the SAME extraction the batch job uses; the
  * checkpointed source log gives exactly-once file processing — a
  * deliberate improvement over the reference, which reprocesses
  * re-uploaded objects (no idempotency check, SURVEY §2.5).
  */
object DicomStream {

  /** Start the ingest stream. `Trigger.AvailableNow` drains everything
    * currently in `inputPath` then stops — per-object isolation like the
    * reference is available via `maxFilesPerTrigger=1`. */
  def start(spark: SparkSession, inputPath: String, outPath: String,
            errorPath: String, checkpoint: String,
            availableNow: Boolean = true,
            maxFilesPerTrigger: Option[Int] = None): StreamingQuery = {
    import org.apache.spark.sql.types._
    // streaming sources require an explicit schema; binaryFile's is fixed
    val binSchema = StructType(Seq(
      StructField("path", StringType), StructField("modificationTime", TimestampType),
      StructField("length", LongType), StructField("content", BinaryType)))
    var reader = spark.readStream.format("binaryFile").schema(binSchema)
    maxFilesPerTrigger.foreach(n => reader = reader.option("maxFilesPerTrigger", n))
    val bin = reader.load(inputPath).select("path", "content")
    var writer = bin.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val ex = DicomPipeline.extractFromBinary(batch, "local", "local")
        val df = DicomPipeline.toDataFrame(batch.sparkSession, ex.rows)
        if (df.columns.nonEmpty && !df.isEmpty)
          df.write.mode("append")
            .partitionBy(graft.dicom.Flatten.PartitionColSnake)
            .option("compression", "snappy")
            .parquet(outPath)
        val errDf = batch.sparkSession.createDataFrame(ex.errors)
        if (!errDf.isEmpty) errDf.write.mode("append").parquet(errorPath)
        ()
      }
    if (availableNow) writer = writer.trigger(Trigger.AvailableNow())
    writer.start()
  }
}
