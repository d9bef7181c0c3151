package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession

/** CI-sized pins for the two extraction-path scale defects the r5
  * rehearsal found and fixed (r5 verdict #6) — they previously held by
  * code shape alone:
  *
  *  1. driver listing must stay on the plain-status walk
  *     (`listStatusIterator`): the located variant forks `ls -ld` per
  *     file on the local filesystem (~4 ms/fork → 37 s at 9.5k objects,
  *     ~12 h at 10M). Pinned as a source-shape guard — a timing assert
  *     would be flaky, and the defect IS the API choice.
  *  2. the dynamic partition write must not explode into
  *     files-per-(task × date): a ~500-object run (enough write tasks to
  *     cross the rebalance threshold) must land EXACTLY one file per
  *     study_date partition.
  */
class ExtractionScaleSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[8]")
    .appName("extraction-scale-spec")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("listRoutes keeps the fork-free status walk") {
    val src = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("src/main/scala/graft/pipeline/DicomPipeline.scala")),
      "UTF-8")
    // walkFiles is the shared walk (listRoutes and manifestOf both ride it)
    val walk = src.substring(src.indexOf("def walkFiles"),
      src.indexOf("def maxInlineBytes"))
      .linesIterator.map(_.replaceFirst("//.*$", "")) // the Scaladoc/comments
      .mkString("\n")                                 // NAME the banned API
    assert(walk.contains("listStatusIterator"),
      "listRoutes no longer uses the plain status walk")
    Seq("listFiles(", "listLocatedStatus", "LocatedFileStatus").foreach { bad =>
      assert(!walk.contains(bad),
        s"listRoutes reintroduced the forking located-status API: $bad")
    }
  }

  private def dcm(i: Int): Array[Byte] = DicomWriter.file(Seq(
    DicomWriter.strElement(0x0008, 0x0020, "DA", f"202403${i % 12 + 1}%02d"),
    DicomWriter.strElement(0x0008, 0x0060, "CS", "CT"),
    DicomWriter.strElement(0x0020, 0x000d, "UI", s"1.2.3.$i"),
    DicomWriter.strElement(0x0020, 0x0013, "IS", i.toString)))

  test("500-object write lands one file per study_date partition") {
    val scratch = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("target"), "exscale")
    val input = scratch.resolve("in"); val out = scratch.resolve("out")
    java.nio.file.Files.createDirectories(input)
    try {
      (0 until 480).foreach { i =>
        java.nio.file.Files.write(input.resolve(f"obj-$i%04d.dcm"), dcm(i))
      }
      (0 until 20).foreach { z =>
        val bo = new java.io.ByteArrayOutputStream()
        val zo = new java.util.zip.ZipOutputStream(bo)
        (0 until 3).foreach { j =>
          zo.putNextEntry(new java.util.zip.ZipEntry(s"m$j.dcm"))
          zo.write(dcm(480 + z * 3 + j)); zo.closeEntry()
        }
        zo.close()
        java.nio.file.Files.write(input.resolve(f"arch-$z%03d.zip"), bo.toByteArray)
      }
      val (_, errDf) = graft.pipeline.DicomPipeline.run(
        spark, input.toString, out.toString, bucket = "spec", region = "local")
      assert(errDf.isEmpty)
      assert(spark.read.parquet(out.toString).count() == 540)
      import scala.jdk.CollectionConverters._
      val partitions = java.nio.file.Files.list(out).iterator().asScala
        .count(_.getFileName.toString.startsWith("study_date="))
      val files = java.nio.file.Files.walk(out).iterator().asScala
        .count(_.toString.endsWith(".parquet"))
      assert(partitions == 12, s"expected 12 date partitions, got $partitions")
      assert(files == partitions,
        s"small-file explosion returned: $files files across $partitions partitions")
    } finally graft.util.Fs.deleteRecursively(scratch)
  }
}
