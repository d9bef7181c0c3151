package graft

import org.scalatest.funsuite.AnyFunSuite
import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets.UTF_8
import graft.dicom.DicomParser.DicomElement
import graft.dicom.VrConvert
import graft.dicom.VrConvert._

/** One test per effective row of the VR dispatch table (SURVEY.md §1.3,
  * `tags.py:210-255` with duplicate-key overrides applied). Elements are
  * crafted directly; `convert` is the unit under test. */
class VrDispatchSpec extends AnyFunSuite {

  private def conv(e: DicomElement): DicomValue = VrConvert.convert(e, UTF_8)
  private def strE(g: Int, el: Int, vr: String, v: String) =
    DicomElement(g, el, vr, v.getBytes(UTF_8))

  // — string VRs routed to rep_string (max VM 1 → scalar string) —
  test("AE/AS/CS/DS/IS/LO/LT/SH/ST/UC/UI/UR/UT → string") {
    assert(conv(strE(0x0010, 0x1010, "AS", "038Y")) == DStr("038Y"))         // AS
    assert(conv(strE(0x0008, 0x0060, "CS", "OT")) == DStr("OT"))             // CS
    assert(conv(strE(0x0018, 0x0050, "DS", "1.5")) == DStr("1.5"))           // DS raw
    assert(conv(strE(0x0020, 0x0013, "IS", "7")) == DStr("7"))               // IS raw
    assert(conv(strE(0x0010, 0x0020, "LO", "ID1")) == DStr("ID1"))           // LO
    assert(conv(strE(0x0020, 0x4000, "LT", "comment")) == DStr("comment"))   // LT
    assert(conv(strE(0x0020, 0x0010, "SH", "1")) == DStr("1"))               // SH
    assert(conv(strE(0x0008, 0x0081, "ST", "addr")) == DStr("addr"))         // ST
    assert(conv(strE(0x0008, 0x0018, "UI", "1.2.3")) == DStr("1.2.3"))       // UI
  }

  test("TM → string (convert_TM: no TIME type)") {
    assert(conv(strE(0x0008, 0x0030, "TM", "120000")) == DStr("120000"))
    assert(conv(strE(0x0008, 0x0030, "TM", "120000.123456")) == DStr("120000.123456"))
  }

  test("DT → raw string (convert_DT: timestamp parsing is TODO'd out)") {
    assert(conv(strE(0x0008, 0x002a, "DT", "20210101120000.000000")) ==
      DStr("20210101120000.000000"))
  }

  test("DA VM=1 → date; multi-valued DA tag → list of dates") {
    assert(conv(strE(0x0008, 0x0020, "DA", "19990101")) ==
      DDate(java.time.LocalDate.parse("1999-01-01").toEpochDay))
  }

  test("DA with invalid text raises (convert_DA strptime failure → DLQ)") {
    intercept[Exception] { conv(strE(0x0008, 0x0020, "DA", "19991301")) }
  }

  test("US → string (override; not integer)") {
    val b = ByteBuffer.allocate(2).order(ByteOrder.LITTLE_ENDIAN).putShort(979).array()
    assert(conv(DicomElement(0x0028, 0x0010, "US", b)) == DStr("979"))
  }

  test("SS → string (override; signed decode)") {
    val b = ByteBuffer.allocate(2).order(ByteOrder.LITTLE_ENDIAN).putShort(-5).array()
    assert(conv(DicomElement(0x0028, 0x0106, "SS", b)) == DStr("-5"))
  }

  test("UL → string via return_integer→rep_string (unsigned decode)") {
    val b = ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN).putInt(-1).array()
    // 0xFFFFFFFF as unsigned = 4294967295
    assert(conv(DicomElement(0x0002, 0x0000, "UL", b)) == DStr("4294967295"))
  }

  test("SL → string via return_integer→rep_string (signed)") {
    val b = ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN).putInt(-42).array()
    assert(conv(DicomElement(0x0018, 0x1151, "SL", b)) == DStr("-42"))
  }

  test("FL → string via return_float→rep_string (Python float render)") {
    val b = ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN).putFloat(1.0f).array()
    assert(conv(DicomElement(0x0018, 0x0060, "FL", b)) == DStr("1.0"))
  }

  test("FD → string (rep_string row)") {
    val b = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN).putDouble(2.5).array()
    assert(conv(DicomElement(0x0018, 0x0060, "FD", b)) == DStr("2.5"))
  }

  test("AT → '(gggg, eeee)' tag rendering (BaseTag str analog)") {
    // (0020,9165) DimensionIndexPointer is VM 1 in PS3.6 — a VM 1-n AT
    // tag like (0028,0009) FrameIncrementPointer would (correctly)
    // list-wrap under the full dictionary's validate_vm semantics
    val b = ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN)
      .putShort(0x0008.toShort).putShort(0x0060.toShort).array()
    assert(conv(DicomElement(0x0020, 0x9165, "AT", b)) == DStr("(0008, 0060)"))
  }

  test("OB/OW/UN → bounded hex string (rep_string on bytes analog)") {
    val v = conv(DicomElement(0x0008, 0x0000, "OB", Array[Byte](0x00, 0x01)))
    assert(v == DStr("0001"))
  }

  test("PN empty → all-empty struct is SKIPPED upstream; non-empty parses") {
    val e = strE(0x0010, 0x0010, "PN", "")
    assert(VrConvert.isEmptyValue(e, UTF_8))
    assert(conv(strE(0x0010, 0x0010, "PN", "A^B")) ==
      DPersonName(Seq("A", "B", "", "", "", "", "")))
  }

  test("multi-valued PN tag → list of structs") {
    conv(strE(0x0008, 0x1070, "PN", "X^Y\\Z")) match {
      case DPersonNameList(xs) =>
        assert(xs.length == 2)
        assert(xs.head.take(2) == Seq("X", "Y"))
        assert(xs(1).head == "Z")
      case other => fail(s"expected DPersonNameList, got $other")
    }
  }

  test("multi-valued string tag via dict VM — single value still wraps") {
    assert(conv(strE(0x0028, 0x1050, "DS", "40")) == DStrList(Seq("40")))     // WindowCenter VM 1-n
    assert(conv(strE(0x0028, 0x1050, "DS", "40\\80")) == DStrList(Seq("40", "80")))
  }

  test("unknown VR → UnknownVrException (effective hard failure)") {
    intercept[UnknownVrException] { conv(strE(0x0008, 0x0060, "QQ", "x")) }
  }

  test("SV/UV 64-bit decode") {
    val sv = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN).putLong(-9L).array()
    assert(conv(DicomElement(0x0008, 0x0000, "SV", sv)) == DStr("-9"))
    val uv = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN).putLong(-1L).array()
    assert(conv(DicomElement(0x0008, 0x0000, "UV", uv)) == DStr("18446744073709551615"))
  }
}
