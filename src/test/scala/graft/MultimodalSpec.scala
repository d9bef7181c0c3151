package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import graft.operators.Multimodal

/** Multimodal binary-column operators over the reference fixtures:
  * real DICOM header decode, stub geometry for non-DICOM, frame-sample
  * explode shape, pseudo-embedding compatibility with the ANN path. */
class MultimodalSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("multimodal-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val fixtures = "/root/reference/sample_dcm"

  test("media type sniffed from magic bytes, not extension") {
    val types = Multimodal.loadAssets(spark, fixtures)
      .select("path", "media_type").collect()
      .map(r => (r.getString(0).split('/').last, r.getString(1))).toMap
    assert(types("example-0") == "application/dicom")
    assert(types("example.zip") == "application/zip")
    assert(types("example.tar") == "application/gzip") // .tar is really gz!
    assert(types("example.tar.bz2") == "application/x-bzip2")
  }

  test("DICOM decode reads true header geometry") {
    val d = Multimodal.decodeMeta(spark, fixtures).collect()
      .map(r => r.getAs[String]("path") -> r).toMap
    val ex0 = d("example-0")
    assert(ex0.getAs[String]("decoder") == "dicom-header")
    assert(ex0.getAs[Int]("width") == 985)
    assert(ex0.getAs[Int]("height") == 979)
    assert(ex0.getAs[Int]("channels") == 3)
    assert(ex0.getAs[Int]("bits") == 8)
    // archives get deterministic stub geometry
    assert(d("example.zip").getAs[String]("decoder") == "stub")
    assert(d("example.zip").getAs[Int]("width") >= 64)
  }

  test("resize scales to max side while keeping aspect") {
    val r = Multimodal.resizeMeta(spark, fixtures, maxSide = 256).collect()
      .map(x => x.getAs[String]("path") -> x).toMap
    val ex0 = r("example-0")
    assert(ex0.getAs[Int]("out_width") == 256) // width 985 is the long side
    assert(ex0.getAs[Int]("out_height") == 255)
  }

  test("frame sampling explodes deterministic (frame, offset) rows") {
    val f = Multimodal.frameSample(spark, fixtures, step = 5)
    val rows = f.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Int]("frame_idx") % 5 == 0))
    assert(rows.forall(_.getAs[Long]("byte_offset") >= 0))
  }

  test("pseudo-embeddings are unit-norm 64-dim float arrays") {
    val e = Multimodal.pseudoEmbed(spark, fixtures).collect()
    assert(e.length == 6) // 7 fixtures − empty DICOMDIR (no scan split)
    val vec = e.head.getAs[scala.collection.Seq[Float]]("embedding")
    assert(vec.length == 64)
    val norm = math.sqrt(vec.map(v => v.toDouble * v).sum)
    assert(math.abs(norm - 1.0) < 1e-4)
  }
}
