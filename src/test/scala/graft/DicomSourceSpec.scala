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
}
