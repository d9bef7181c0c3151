package graft.dicom

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.Charset
import java.time.LocalDate
import java.time.format.DateTimeFormatter

/** VR-keyed element→value conversion, reproducing the reference's
  * EFFECTIVE dispatch semantics (`src/utils/tags.py:210-255` with the
  * duplicate-key overrides applied — see SURVEY.md §1.3):
  *
  *  - US / SS / OW / OB → string (the later dict literals override the
  *    `return_integer` entries; `tags.py:246-254`);
  *  - `return_integer` survives only for AT / SL / UL — and for non-empty
  *    values it STILL returns `rep_string(...)` (`tags.py:165`), i.e. a
  *    string; same for `return_float` (FL, `tags.py:182`). Since empty
  *    elements are skipped upstream (`src/dicomwrapper.py:42`), the
  *    int(0)/float(0) empty paths are dead code — everything lands as
  *    string / list-of-string;
  *  - DA → date (or list of dates when max VM > 1), parsed `%Y%m%d`
  *    (`tags.py:18-35`);
  *  - DT / TM → string (`tags.py:51-53,189-207`);
  *  - PN → 7-component struct, list-of-structs when VM > 1
  *    (`tags.py:56-93`);
  *  - SQ → one-level-flattened map (later items win per keyword), `null`
  *    when any item is an empty data set (`tags.py:144-159`);
  *  - multi-valuedness is decided by the STATIC dictionary max VM, not the
  *    observed value (`validate_vm`, `tags.py:115-141`): max VM > 1 wraps
  *    scalars into 1-element lists;
  *  - unknown VR → hard failure (`tags.py:255` returns an f-string that
  *    the caller then calls → TypeError; we raise a typed error).
  */
object VrConvert {

  sealed trait DicomValue extends Serializable
  final case class DStr(s: String) extends DicomValue
  final case class DStrList(xs: Seq[String]) extends DicomValue
  final case class DDate(epochDay: Long) extends DicomValue
  final case class DDateList(xs: Seq[Long]) extends DicomValue
  /** 7 components: FamilyName, GivenName, Ideographic, MiddleName,
    * NamePrefix, NameSuffix, Phonetic (`tags.py:56-65` field order). */
  final case class DPersonName(c: Seq[String]) extends DicomValue
  final case class DPersonNameList(xs: Seq[Seq[String]]) extends DicomValue
  final case class DMap(m: Map[String, String]) extends DicomValue
  case object DNull extends DicomValue

  final class UnknownVrException(vr: String)
    extends RuntimeException(s"Invalid VR $vr tag")

  private val stringVRs = Set("AE", "AS", "CS", "DS", "DT", "IS", "LO", "LT",
    "SH", "ST", "TM", "UC", "UI", "UR", "UT", "PN", "DA")
  private val da = DateTimeFormatter.ofPattern("yyyyMMdd")

  import DicomParser.DicomElement

  /** Raw per-component string values of an element (decoded, split on the
    * DICOM `\` multi-value separator, padding stripped). Numeric/binary
    * VRs are rendered the way Python's `str()` renders the pydicom value. */
  def rawStrings(e: DicomElement, cs: Charset): Seq[String] = e.vr match {
    case v if stringVRs.contains(v) =>
      val whole = new String(e.bytes, cs)
        .reverse.dropWhile(c => c == ' ' || c == 0).reverse
      if (whole.isEmpty) Nil else whole.split("\\\\", -1).toSeq
    case "US" => shorts(e.bytes, signed = false).map(_.toString)
    case "SS" => shorts(e.bytes, signed = true).map(_.toString)
    case "UL" => ints(e.bytes).map(v => (v & 0xffffffffL).toString)
    case "SL" => ints(e.bytes).map(_.toString)
    case "FL" => floats(e.bytes).map(v => pyFloat(v.toDouble))
    case "FD" => doubles(e.bytes).map(pyFloat)
    case "SV" => longs(e.bytes).map(_.toString)
    case "UV" => longs(e.bytes).map(v => java.lang.Long.toUnsignedString(v))
    case "AT" => // (group LE 16-bit, element LE 16-bit) pairs; pydicom
      // renders BaseTag as "(gggg, eeee)"
      shorts(e.bytes, signed = false).grouped(2).collect {
        case Seq(g, el) => f"($g%04x, $el%04x)"
      }.toSeq
    case "OB" | "OW" | "OF" | "OD" | "OL" | "OV" | "UN" =>
      // rep_string(str(bytes)) analog; hex render, bounded for sanity
      if (e.bytes.isEmpty) Nil
      else Seq(e.bytes.take(64).map(b => f"$b%02x").mkString)
    case other => throw new UnknownVrException(other)
  }

  private def shorts(b: Array[Byte], signed: Boolean): Seq[Int] = {
    val bb = ByteBuffer.wrap(b).order(ByteOrder.LITTLE_ENDIAN)
    Seq.fill(b.length / 2)(if (signed) bb.getShort.toInt else bb.getShort & 0xffff)
  }
  private def ints(b: Array[Byte]): Seq[Int] = {
    val bb = ByteBuffer.wrap(b).order(ByteOrder.LITTLE_ENDIAN)
    Seq.fill(b.length / 4)(bb.getInt)
  }
  private def longs(b: Array[Byte]): Seq[Long] = {
    val bb = ByteBuffer.wrap(b).order(ByteOrder.LITTLE_ENDIAN)
    Seq.fill(b.length / 8)(bb.getLong)
  }
  private def floats(b: Array[Byte]): Seq[Float] = {
    val bb = ByteBuffer.wrap(b).order(ByteOrder.LITTLE_ENDIAN)
    Seq.fill(b.length / 4)(bb.getFloat)
  }
  private def doubles(b: Array[Byte]): Seq[Double] = {
    val bb = ByteBuffer.wrap(b).order(ByteOrder.LITTLE_ENDIAN)
    Seq.fill(b.length / 8)(bb.getDouble)
  }

  /** Python `str(float)`-style rendering for FL/FD (approximate: integral
    * values get a trailing `.0`; exotic exponents may differ — not present
    * in any reference fixture). */
  private def pyFloat(d: Double): String =
    if (d == d.toLong.toDouble && math.abs(d) < 1e16) s"${d.toLong}.0"
    else d.toString.replace("E", "e")

  /** An element is "empty" (skipped at flatten, `src/dicomwrapper.py:42`)
    * when it has no bytes/items or only padding. */
  def isEmptyValue(e: DicomElement, cs: Charset): Boolean =
    e.vr match {
      case "SQ" => e.items.isEmpty
      case _ if e.bytes.isEmpty => true
      case v if stringVRs.contains(v) => rawStrings(e, cs).forall(_.isEmpty)
      case _ => false
    }

  /** `validate_vm` analog: max VM from the static dictionary decides
    * scalar vs list; scalars wrap into 1-element lists when max VM > 1.
    * Multiple observed values under a max-VM-1 tag render like Python's
    * `str(list)` ("['a', 'b']") — the `str(obj.value)` path. */
  private def vmNormalize(e: DicomElement, values: Seq[String]): Either[String, Seq[String]] = {
    val vmMax = Tags.lookup(e.group, e.elem).map(_.vmMax).getOrElse(1)
    if (vmMax > 1) Right(values)
    else if (values.lengthCompare(1) <= 0) Left(values.headOption.getOrElse(""))
    else Left(values.map(v => s"'$v'").mkString("[", ", ", "]"))
  }

  /** Split a PN component group set: "family^given^middle^prefix^suffix"
    * with `=`-separated alphabetic/ideographic/phonetic groups → the
    * reference's 7 fields. */
  def personName(v: String): Seq[String] = {
    val groups = v.split("=", -1)
    val alpha = groups.headOption.getOrElse("")
    val comps = alpha.split("\\^", -1).padTo(5, "")
    Seq(comps(0), comps(1), groups.lift(1).getOrElse(""),
        comps(2), comps(3), comps(4), groups.lift(2).getOrElse(""))
  }

  /** Full conversion of one element (assumed non-empty, keyword known). */
  def convert(e: DicomElement, cs: Charset): DicomValue = e.vr match {
    case "DA" =>
      val vals = rawStrings(e, cs)
      vmNormalize(e, vals) match {
        case Right(xs) => DDateList(xs.map(parseDa))
        case Left(s)   => DDate(parseDa(s))
      }
    case "PN" =>
      val vals = rawStrings(e, cs)
      vmNormalize(e, vals) match {
        case Right(xs) => DPersonNameList(xs.map(personName))
        case Left(s)   => DPersonName(personName(s))
      }
    case "SQ" =>
      var m = Map.empty[String, String]
      var nulled = false
      e.items.foreach { item =>
        if (item.isEmpty) nulled = true
        else item.foreach { i =>
          val kw = i.keyword
          if (kw.nonEmpty)
            m += kw -> stringify(convert(i, cs))
        }
      }
      if (nulled) DNull else DMap(m)
    case _ =>
      val vals = rawStrings(e, cs)
      vmNormalize(e, vals) match {
        case Right(xs) => DStrList(xs)
        case Left(s)   => DStr(s)
      }
  }

  private def parseDa(s: String): Long =
    LocalDate.parse(s.trim, da).toEpochDay

  /** Deterministic string rendering for values nested inside SQ maps. */
  def stringify(v: DicomValue): String = v match {
    case DStr(s)       => s
    case DStrList(xs)  => xs.map(x => s"'$x'").mkString("[", ", ", "]")
    case DDate(d)      => LocalDate.ofEpochDay(d).toString
    case DDateList(xs) => xs.map(LocalDate.ofEpochDay(_).toString).mkString("[", ", ", "]")
    case DPersonName(c) => c.mkString("^")
    case DPersonNameList(xs) => xs.map(_.mkString("^")).mkString("[", ", ", "]")
    case DMap(m)       => m.toSeq.sortBy(_._1).map { case (k, x) => s"$k: $x" }.mkString("{", ", ", "}")
    case DNull         => ""
  }
}
