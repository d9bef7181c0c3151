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
