package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.dicom._
import graft.dicom.VrConvert._

/** Transfer-syntax and charset coverage: implicit VR LE (dictionary-
  * driven VRs), deflated explicit LE, and SpecificCharacterSet decoding. */
class TransferSyntaxSpec extends AnyFunSuite {

  private def flatten(bytes: Array[Byte]): Map[String, DicomValue] =
    Flatten.flatten(DicomParser.parse(bytes), "b", "r", "k", "a")

  test("implicit VR little-endian: VRs resolved from the dictionary") {
    val f = flatten(DicomWriter.file(Seq(
      DicomWriter.implicitStr(0x0008, 0x0020, "19990101"),         // DA
      DicomWriter.implicitStr(0x0008, 0x0060, "MR"),               // CS
      DicomWriter.implicitStr(0x0008, 0x0008, "ORIGINAL\\PRIMARY"), // CS VM>1
      DicomWriter.implicitStr(0x0010, 0x0010, "Fam^Giv")),          // PN
      transferSyntax = "1.2.840.10008.1.2"))
    assert(f("Modality") == DStr("MR"))
    assert(f("StudyDate") ==
      DDate(java.time.LocalDate.parse("1999-01-01").toEpochDay))
    assert(f("ImageType") == DStrList(Seq("ORIGINAL", "PRIMARY")))
    assert(f("PatientName").asInstanceOf[DPersonName].c.take(2) == Seq("Fam", "Giv"))
  }

  test("implicit VR: unknown even-group tag gets UN, no keyword, skipped") {
    val f = flatten(DicomWriter.file(Seq(
      DicomWriter.implicitStr(0x0008, 0x0060, "CT"),
      DicomWriter.implicitStr(0x7777, 0x0002, "mystery")), // even group, not in dict
      transferSyntax = "1.2.840.10008.1.2"))
    assert(f("Modality") == DStr("CT"))
    assert(!f.values.exists {
      case DStr(s) => s == "mystery"
      case _ => false
    })
  }

  test("implicit VR undefined-length SQ (the common real-world encoding)") {
    val item1 = DicomWriter.implicitStr(0x0008, 0x1150, "1.2.840.10008.5.1.4.1.1.7") ++
                DicomWriter.implicitStr(0x0008, 0x0060, "OT")
    val item2 = DicomWriter.implicitStr(0x0008, 0x0060, "MR")
    val sq = DicomWriter.implicitSqUndefined(0x0008, 0x1140, Seq(item1, item2))
    val f = flatten(DicomWriter.file(Seq(
      DicomWriter.implicitStr(0x0008, 0x0020, "19990101"), sq),
      transferSyntax = "1.2.840.10008.1.2"))
    val m = f("ReferencedImageSequence").asInstanceOf[DMap].m
    assert(m("ReferencedSOPClassUID") == "1.2.840.10008.5.1.4.1.1.7")
    assert(m("Modality") == "MR")
  }

  test("deflated explicit VR LE inflates and parses") {
    // build body (explicit LE elements), deflate raw, wrap with meta
    val body = DicomWriter.strElement(0x0008, 0x0060, "CS", "US") ++
               DicomWriter.strElement(0x0008, 0x0020, "DA", "19870403")
    val deflater = new java.util.zip.Deflater(java.util.zip.Deflater.DEFAULT_COMPRESSION, true)
    deflater.setInput(body); deflater.finish()
    val buf = new Array[Byte](body.length * 2 + 64)
    val n = deflater.deflate(buf)
    val out = new java.io.ByteArrayOutputStream()
    out.write(new Array[Byte](128)); out.write("DICM".getBytes)
    val ts = DicomWriter.strElement(0x0002, 0x0010, "UI", "1.2.840.10008.1.2.1.99")
    val gl = java.nio.ByteBuffer.allocate(4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).putInt(ts.length).array()
    out.write(DicomWriter.element(0x0002, 0x0000, "UL", gl))
    out.write(ts); out.write(buf, 0, n)
    val f = flatten(out.toByteArray)
    assert(f("Modality") == DStr("US"))
    assert(f("StudyDate") ==
      DDate(java.time.LocalDate.parse("1987-04-03").toEpochDay))
  }

  test("explicit VR big-endian: numeric values decode correctly (byte-swap)") {
    // hand-encode a BE data set: tags, lengths, and US value all big-endian
    def beStr(g: Int, e: Int, vr: String, v: String): Array[Byte] = {
      val padded = if (v.length % 2 == 0) v else v + " "
      val b = java.nio.ByteBuffer.allocate(8 + padded.length)
        .order(java.nio.ByteOrder.BIG_ENDIAN)
      b.putShort(g.toShort).putShort(e.toShort)
      b.put(vr.charAt(0).toByte).put(vr.charAt(1).toByte)
      b.putShort(padded.length.toShort).put(padded.getBytes("UTF-8"))
      b.array()
    }
    def beUs(g: Int, e: Int, v: Int): Array[Byte] = {
      val b = java.nio.ByteBuffer.allocate(10).order(java.nio.ByteOrder.BIG_ENDIAN)
      b.putShort(g.toShort).putShort(e.toShort)
      b.put('U'.toByte).put('S'.toByte).putShort(2).putShort(v.toShort)
      b.array()
    }
    val out = new java.io.ByteArrayOutputStream()
    out.write(new Array[Byte](128)); out.write("DICM".getBytes)
    val ts = DicomWriter.strElement(0x0002, 0x0010, "UI", "1.2.840.10008.1.2.2")
    val gl = java.nio.ByteBuffer.allocate(4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).putInt(ts.length).array()
    out.write(DicomWriter.element(0x0002, 0x0000, "UL", gl)) // meta stays LE
    out.write(ts)
    out.write(beUs(0x0028, 0x0010, 512))       // Rows = 512
    out.write(beStr(0x0008 << 0, 0x0060, "CS", "CT"))
    // note: elements must be tag-ascending for realism but parser is lenient
    val f = flatten(out.toByteArray)
    assert(f("Rows") == DStr("512"), "BE US must not byte-swap to 2")
    assert(f("Modality") == DStr("CT"))
  }

  test("SpecificCharacterSet ISO_IR 100 decodes Latin-1 names") {
    val latin1Name = "Müller^José".getBytes("ISO-8859-1")
    val f = flatten(DicomWriter.file(Seq(
      DicomWriter.strElement(0x0008, 0x0005, "CS", "ISO_IR 100"),
      DicomWriter.element(0x0010, 0x0010, "PN", latin1Name))))
    val pn = f("PatientName").asInstanceOf[DPersonName]
    assert(pn.c.head == "Müller")
    assert(pn.c(1) == "José")
  }

  test("UTF-8 (ISO_IR 192) round-trips multibyte values") {
    val f = flatten(DicomWriter.file(Seq(
      DicomWriter.strElement(0x0008, 0x0005, "CS", "ISO_IR 192"),
      DicomWriter.strElement(0x0020, 0x4000, "LT", "コメント ünïcode"))))
    assert(f("ImageComments") == DStr("コメント ünïcode"))
  }
}
