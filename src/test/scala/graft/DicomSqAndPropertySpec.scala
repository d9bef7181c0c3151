package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.dicom._
import graft.dicom.VrConvert._

/** SQ sequence semantics (T3) + ScalaCheck round-trip properties over
  * generated DICOM byte streams (SURVEY.md §5.2 property-based plan).
  * Generators are sampled with fixed seeds (no scalatestplus bridge in
  * the offline dependency set). */
class DicomSqAndPropertySpec extends AnyFunSuite {

  /** Deterministically sample `n` values from a generator. */
  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))

  private def flatten(bytes: Array[Byte]): Map[String, DicomValue] = {
    val parsed = DicomParser.parse(bytes)
    Flatten.flatten(parsed, "b", "r", "k", "a")
  }

  test("SQ one-level flatten merges items, later items win (T3)") {
    val item1 = DicomWriter.strElement(0x0008, 0x1150, "UI", "1.2.840.10008.5.1.4.1.1.7") ++
                DicomWriter.strElement(0x0008, 0x0060, "CS", "OT")
    val item2 = DicomWriter.strElement(0x0008, 0x0060, "CS", "MR")
    val sq = DicomWriter.sqElement(0x0008, 0x1140, Seq(item1, item2))
    val f = flatten(DicomWriter.file(Seq(
      DicomWriter.strElement(0x0008, 0x0020, "DA", "19990101"), sq)))
    val m = f("ReferencedImageSequence").asInstanceOf[DMap].m
    assert(m("ReferencedSOPClassUID") == "1.2.840.10008.5.1.4.1.1.7")
    assert(m("Modality") == "MR") // item2 overrides item1
  }

  test("SQ with an empty item data set converts to null (tags.py:151-152)") {
    val item1 = DicomWriter.strElement(0x0008, 0x0060, "CS", "OT")
    val sq = DicomWriter.sqElement(0x0008, 0x1140, Seq(item1, Array.emptyByteArray))
    val parsed = DicomParser.parse(DicomWriter.file(Seq(sq)))
    val e = parsed.elements.find(_.keyword == "ReferencedImageSequence").get
    assert(VrConvert.convert(e, parsed.charset) == DNull)
  }

  test("undefined-length SQ parses identically to defined-length") {
    // hand-build: SQ with undefined length, one item with undefined length
    val inner = DicomWriter.strElement(0x0008, 0x0060, "CS", "CT")
    val bb = java.nio.ByteBuffer.allocate(inner.length + 40)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putShort(0x0008).putShort(0x1140.toShort)
      .put('S'.toByte).put('Q'.toByte).putShort(0).putInt(0xffffffff) // undefined SQ
    bb.putShort(0xfffe.toShort).putShort(0xe000.toShort).putInt(0xffffffff) // undefined item
    bb.put(inner)
    bb.putShort(0xfffe.toShort).putShort(0xe00d.toShort).putInt(0) // item delimiter
    bb.putShort(0xfffe.toShort).putShort(0xe0dd.toShort).putInt(0) // seq delimiter
    val f = flatten(DicomWriter.file(Seq(
      java.util.Arrays.copyOf(bb.array(), bb.position()))))
    assert(f("ReferencedImageSequence").asInstanceOf[DMap].m("Modality") == "CT")
  }

  // ——— property-based round-trip ———

  private val strTags = Seq(
    (0x0008, 0x0060, "CS", "Modality"),
    (0x0010, 0x0020, "LO", "PatientID"),
    (0x0020, 0x0010, "SH", "StudyID"),
    (0x0020, 0x0013, "IS", "InstanceNumber"),
    (0x0008, 0x0030, "TM", "StudyTime"))

  private val genValue: Gen[String] =
    Gen.chooseNum(0, 12).flatMap(n => Gen.stringOfN(n, Gen.alphaNumChar))

  private val genElems: Gen[(List[String], Boolean)] = for {
    values <- Gen.listOfN(strTags.length, genValue)
    withPrivate <- Gen.oneOf(true, false)
  } yield (values, withPrivate)

  test("property: every non-empty generated keyword appears; empties and private tags never do") {
    samples(genElems, 60).foreach { case (values, withPrivate) =>
      val paired = strTags.zip(values)
      val encoded = paired.map { case ((g, e, vr, _), v) =>
        DicomWriter.strElement(g, e, vr, v)
      } ++ (if (withPrivate)
        Seq(DicomWriter.strElement(0x0009, 0x0010, "LO", "private!")) else Nil)
      val f = flatten(DicomWriter.file(encoded))
      paired.foreach { case ((_, _, _, kw), v) =>
        if (v.trim.nonEmpty) assert(f(kw) == DStr(v))
        else assert(!f.contains(kw), s"$kw should be skipped for value '$v'")
      }
      // private tags never surface; partition default always present
      assert(!f.keys.exists(_.contains("private")))
      assert(f.contains("StudyDate"))
      assert(f("SOURCE_S3_KEY") == DStr("k"))
    }
  }

  test("property: multi-valued CS round-trips as list") {
    samples(Gen.nonEmptyListOf(Gen.stringOfN(4, Gen.alphaUpperChar)), 40).foreach { vals =>
      val f = flatten(DicomWriter.file(Seq(
        DicomWriter.strElement(0x0008, 0x0008, "CS", vals.mkString("\\")))))
      assert(f("ImageType") == DStrList(vals))
    }
  }

  test("property: US values render as strings (quirk)") {
    samples(Gen.chooseNum(0, 65535), 40).foreach { v =>
      val f = flatten(DicomWriter.file(Seq(DicomWriter.usElement(0x0028, 0x0010, v))))
      assert(f("Rows") == DStr(v.toString))
    }
  }
}
