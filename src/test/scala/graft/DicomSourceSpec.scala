package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession

/** DataSource V2 `format("dicom")`: schema inference, reading, column
  * pruning pushdown, permissive error handling. */
class DicomSourceSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("dicom-source-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val fixtures = "/root/reference/sample_dcm"

  private lazy val df = spark.read.format("dicom").load(fixtures)

  test("short name registration + schema inference") {
    val cols = df.columns.toSet
    assert(cols.contains("modality"))
    assert(cols.contains("study_date"))
    assert(cols.contains("source_s3_archive_path"))
    assert(!cols.contains("accession_number")) // empty everywhere → absent
    import org.apache.spark.sql.types._
    assert(df.schema("study_date").dataType == DateType)
    assert(df.schema("image_type").dataType == ArrayType(StringType))
  }

  test("reads all 10 images; bad objects skipped permissively") {
    assert(df.count() == 10)
    assert(df.select("modality").distinct().collect().map(_.getString(0)).toSeq == Seq("OT"))
  }

  test("required-column pushdown reaches the scan") {
    val pruned = df.select("modality", "patient_sex")
    val scan = pruned.queryExecution.executedPlan.collectLeaves().head.toString
    assert(scan.contains("DicomScan"))
    assert(scan.contains("columns=[modality,patient_sex]") ||
           scan.contains("modality"))
    assert(pruned.count() == 10)
  }

  test("SQL over the source via temp view") {
    df.createOrReplaceTempView("dicom_src")
    val n = spark.sql(
      "SELECT count(*) FROM dicom_src WHERE patient_sex = 'F'").head.getLong(0)
    assert(n > 0 && n < 10)
  }

  test("file packing bounds partitions by cumulative size") {
    import graft.sources.DicomSourceUtil.packPartitions
    val files = (0 until 10).map(i => (s"f$i", 100L))
    // 250-byte cap → 2 files per partition
    val packed = packPartitions(files, 250L)
    assert(packed.length == 5)
    assert(packed.forall(_.length == 2))
    assert(packed.flatten.sorted == files.map(_._1).sorted)
    // a file larger than the cap still gets its own partition
    val withBig = packPartitions(Seq(("big", 1000L), ("s1", 10L), ("s2", 10L)), 100L)
    assert(withBig.exists(_ == Seq("big")))
    assert(withBig.flatten.length == 3)
    // empty files cost a slot, never loop forever
    assert(packPartitions(Seq(("e1", 0L), ("e2", 0L)), 1L).flatten.length == 2)
  }

  test("small read uses few partitions, not one per file") {
    assert(df.rdd.getNumPartitions <= 2) // 6 files, ~5 MB total, 128 MB cap
  }

  test("multi-path load reads all paths (paths JSON option)") {
    val two = spark.read.format("dicom")
      .load(s"$fixtures/example-0", s"$fixtures/example-6")
    assert(two.count() == 2)
  }

  test("failOnError surfaces parse failures") {
    val strict = spark.read.format("dicom")
      .option("failOnError", "true").load(fixtures)
    val e = intercept[Exception] { strict.count() }
    def chain(t: Throwable): Seq[String] =
      if (t == null) Nil else t.getMessage +: chain(t.getCause)
    assert(chain(e).exists(m => m != null && m.contains("DICM")))
  }

  test("recursive listing: nested dirs match the pipeline's extraction") {
    import java.nio.file.{Files, Paths}
    val tmp = Files.createTempDirectory("dicom-nested")
    Files.createDirectories(tmp.resolve("a/b"))
    Files.copy(Paths.get(s"$fixtures/example-0"), tmp.resolve("a/example-0"))
    Files.copy(Paths.get(s"$fixtures/example-6"), tmp.resolve("a/b/example-6"))
    val v2 = spark.read.format("dicom").load(tmp.toString)
    val pipeRows = graft.pipeline.DicomPipeline
      .extract(spark, tmp.toString).rows.count()
    assert(v2.count() == pipeRows)
    assert(v2.count() == 2)
  }

  test("pruned read skips conversion of unreferenced corrupt columns") {
    import java.nio.file.Files
    import org.apache.spark.sql.types._
    val tmp = Files.createTempDirectory("dicom-pruned")
    Files.write(tmp.resolve("corrupt.dcm"), DicomWriter.file(Seq(
      DicomWriter.strElement(0x0008, 0x0060, "CS", "CT"),       // Modality
      DicomWriter.strElement(0x0008, 0x0021, "DA", "NOTADATE")  // SeriesDate: unparsable
    )))
    val schema = StructType(Seq(
      StructField("modality", StringType), StructField("series_date", DateType)))
    val strict = spark.read.format("dicom").schema(schema)
      .option("failOnError", "true").load(tmp.toString)
    // referencing the corrupt column converts it → the image fails
    intercept[Exception] { strict.select("series_date").collect() }
    // pruning it away means its converter NEVER runs → the read succeeds
    assert(strict.select("modality").collect().map(_.getString(0)).toSeq == Seq("CT"))
  }

  test("schema inference: distributed full pass matches driver sample; sample is bounded") {
    import graft.sources.DicomSourceUtil
    val conf = spark.sparkContext.hadoopConfiguration
    val sampled = DicomSourceUtil.inferSchema(Seq(fixtures), conf)
    val full = DicomSourceUtil.inferSchema(Seq(fixtures), conf, distributed = true)
    assert(sampled == full) // fixture set fits in one sample window
    val one = DicomSourceUtil.inferSchema(Seq(fixtures), conf, sampleFiles = 1)
    assert(one.fieldNames.nonEmpty)
    assert(one.fieldNames.toSet.subsetOf(sampled.fieldNames.toSet))
    // the option path end-to-end
    val dfFull = spark.read.format("dicom")
      .option("inferMode", "full").load(fixtures)
    assert(dfFull.count() == 10)
  }

  test("inferMode=full without an active session fails fast, never silent sample") {
    import graft.sources.DicomSourceUtil
    val conf = spark.sparkContext.hadoopConfiguration
    val prev = org.apache.spark.sql.SparkSession.getActiveSession
    org.apache.spark.sql.SparkSession.clearActiveSession()
    try {
      val e = intercept[IllegalStateException] {
        DicomSourceUtil.inferSchema(Seq(fixtures), conf, distributed = true)
      }
      assert(e.getMessage.contains("inferMode=full"))
    } finally prev.foreach(org.apache.spark.sql.SparkSession.setActiveSession)
  }
}
