package graft.dicom

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.Charset

/** Binary DICOM (PS3.10 file / PS3.5 data-set) parser.
  *
  * Scope mirrors the reference's `pydicom.dcmread(stop_before_pixels=True)`
  * + `remove_private_tags()` usage (`src/app.py:75-76`):
  *  - 128-byte preamble + `DICM` magic required (no-force dcmread
  *    semantics: anything else raises → error sink);
  *  - file-meta group (0002) is always explicit-VR little-endian; the
  *    transfer syntax it declares drives the main data set (implicit LE,
  *    explicit LE, explicit BE, deflated explicit LE supported);
  *  - parsing STOPS at pixel data (7FE0,0008/0009/0010) — the scan never
  *    materializes pixels (column pruning at the source);
  *  - odd-group (private) elements are dropped during the scan;
  *  - SQ sequences (defined and undefined length) parse recursively.
  *
  * Pure Scala; no Spark imports — unit-testable without a session.
  */
object DicomParser {

  final case class DicomElement(
      group: Int,
      elem: Int,
      vr: String,
      /** raw value bytes (empty for SQ) */
      bytes: Array[Byte],
      /** SQ item data sets */
      items: Seq[Seq[DicomElement]] = Nil) {
    def tagKey: Int = Tags.key(group, elem)
    def keyword: String = Tags.lookup(group, elem).map(_.keyword).getOrElse("")
    def isEmpty: Boolean = bytes.isEmpty && items.isEmpty
  }

  final case class DicomFile(
      meta: Seq[DicomElement],
      elements: Seq[DicomElement],
      transferSyntax: String,
      charset: Charset,
      /** raw (7FE0,0010) value bytes — populated only by
        * `parse(bytes, readPixels = true)`. For NATIVE (uncompressed)
        * transfer syntaxes this is the raster (big-endian OW values
        * arrive byte-swapped to LE like every other numeric element).
        * For ENCAPSULATED pixel data (undefined length = a compressed
        * codec stream) it is the concatenated fragment bytes after the
        * basic offset table, with [[pixelsEncapsulated]] = true — the
        * single-frame case that covers the JPEG-family syntaxes. */
      pixels: Option[Array[Byte]] = None,
      pixelsEncapsulated: Boolean = false,
      /** byte length of each encapsulated fragment, in stream order —
        * the boundaries the concatenation in [[pixels]] loses. RLE
        * encodes one FRAME per fragment (PS3.5 A.4.2), so these are the
        * frame boundaries a multi-frame decode needs. Empty for native
        * pixel data. */
      pixelFragmentLengths: Seq[Int] = Nil)

  final class InvalidDicomException(msg: String) extends RuntimeException(msg)

  private val ExplicitLE = "1.2.840.10008.1.2.1"
  private val ImplicitLE = "1.2.840.10008.1.2"
  private val ExplicitBE = "1.2.840.10008.1.2.2"
  private val DeflatedLE = "1.2.840.10008.1.2.1.99"

  /** VRs using the 4-byte length form (2 reserved bytes after the VR). */
  private val longFormVRs = Set("OB", "OW", "OF", "OD", "OL", "OV", "SQ",
                                "UC", "UR", "UT", "UN", "SV", "UV")

  private val pixelDataTags = Set(Tags.key(0x7fe0, 0x0008),
    Tags.key(0x7fe0, 0x0009), Tags.key(0x7fe0, 0x0010))

  /** DICM magic check: bytes 128..132 == "DICM"
    * (`src/utils/utils.py:51-58` semantics). */
  def isDicom(bytes: Array[Byte]): Boolean =
    bytes.length >= 132 &&
      bytes(128) == 'D' && bytes(129) == 'I' && bytes(130) == 'C' && bytes(131) == 'M'

  def parse(bytes: Array[Byte]): DicomFile = parse(bytes, readPixels = false)

  /** Full parse with OPT-IN pixel-data read: the default scan stops
    * before (7FE0,0010) — source-level column pruning, the reference's
    * `stop_before_pixels=True` contract — but a multimodal decode pass
    * genuinely needs the raster. `readPixels = true` additionally reads
    * the pixel element's raw bytes: for native transfer syntaxes
    * (implicit/explicit-VR LE, explicit BE, deflated LE, all
    * defined-length) that is the raster; for ENCAPSULATED (compressed)
    * pixel data it is the concatenated fragment bytes with
    * `pixelsEncapsulated = true` and per-fragment lengths in
    * `pixelFragmentLengths` — codec bytes, NOT a raster; never feed them
    * to raster math without checking the flag. */
  def parse(bytes: Array[Byte], readPixels: Boolean): DicomFile = {
    if (!isDicom(bytes))
      throw new InvalidDicomException(
        "File is missing DICOM File Meta Information header or the 'DICM' prefix is missing from the header")
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    buf.position(132)

    // --- file meta: always explicit VR LE; bounded by (0002,0000) UL ---
    val meta = Vector.newBuilder[DicomElement]
    var transferSyntax = ExplicitLE
    var metaEnd = -1L
    var done = false
    while (!done && buf.remaining() >= 8) {
      if (metaEnd >= 0 && buf.position() >= metaEnd) done = true
      else {
        val mark = buf.position()
        val group = buf.getShort() & 0xffff
        if (group != 0x0002) { buf.position(mark); done = true }
        else {
          val elem = buf.getShort() & 0xffff
          val e = readExplicitElement(buf, group, elem, implicitVR = false, bigEndian = false)
          meta += e
          if (elem == 0x0000 && e.bytes.length >= 4)
            metaEnd = buf.position().toLong +
              (ByteBuffer.wrap(e.bytes).order(ByteOrder.LITTLE_ENDIAN).getInt() & 0xffffffffL)
          if (elem == 0x0010)
            transferSyntax = asciiTrim(e.bytes)
        }
      }
    }

    // --- main data set ---
    val (dataBuf, implicitVR, bigEndian) = transferSyntax match {
      case ImplicitLE => (buf, true, false)
      case ExplicitBE =>
        (buf.order(ByteOrder.BIG_ENDIAN), false, true)
      case DeflatedLE =>
        val inflater = new java.util.zip.Inflater(true)
        inflater.setInput(bytes, buf.position(), bytes.length - buf.position())
        val out = new java.io.ByteArrayOutputStream()
        val chunk = new Array[Byte](65536)
        while (!inflater.finished() && !inflater.needsInput()) {
          val n = inflater.inflate(chunk)
          if (n > 0) out.write(chunk, 0, n)
        }
        (ByteBuffer.wrap(out.toByteArray).order(ByteOrder.LITTLE_ENDIAN), false, false)
      case _ => (buf, false, false) // explicit LE (default) and private syntaxes
    }

    val elems = parseDataSet(dataBuf, implicitVR, bigEndian, stopAtPixels = true)
    // a partial element header at EOF is a truncated file, not clean EOF
    // (pixel-data stops leave >= 8 bytes; clean EOF leaves exactly 0)
    if (dataBuf.remaining() > 0 && dataBuf.remaining() < 8)
      throw new InvalidDicomException(
        s"Truncated element header: ${dataBuf.remaining()} trailing bytes at offset ${dataBuf.position()}")
    val charset = elems.find(_.tagKey == Tags.key(0x0008, 0x0005))
      .map(e => charsetFor(asciiTrim(e.bytes))).getOrElse(Charset.forName("UTF-8"))
    // the data-set scan stopped AT the pixel tag (buffer parked on its
    // header); read it through the normal element machinery so length
    // validation and BE→LE swapping apply to the raster like any value
    val (pixels, encapsulated, fragLens) =
      if (!readPixels || dataBuf.remaining() < 8) (None, false, Nil)
      else {
        val mark = dataBuf.position()
        val g = dataBuf.getShort() & 0xffff
        val e = dataBuf.getShort() & 0xffff
        if (g == 0x7fe0 && e == 0x0010) {
          // peek the length WITHOUT consuming the element: undefined
          // length means an encapsulated fragment stream (compressed
          // codec bytes), which the ordinary element readers cannot
          // represent — defined length re-reads through them so length
          // validation and BE→LE swapping apply to the raster as usual
          val undefinedLen = {
            val peek = dataBuf.duplicate().order(dataBuf.order())
            val len: Long =
              if (implicitVR) peek.getInt() & 0xffffffffL
              else {
                val vr = new String(Array(peek.get(), peek.get()).map(_.toChar))
                if (longFormVRs.contains(vr)) { peek.getShort(); peek.getInt() & 0xffffffffL }
                else peek.getShort() & 0xffffL
              }
            len == 0xffffffffL
          }
          if (undefinedLen) {
            // skip the header the peek measured
            if (implicitVR) dataBuf.getInt()
            else { dataBuf.get(); dataBuf.get(); dataBuf.getShort(); dataBuf.getInt() }
            readFragments(dataBuf) match {
              case Some((bytes, lens)) => (Some(bytes), true, lens)
              case None => (None, true, Nil)
            }
          } else {
            val el =
              if (implicitVR) readImplicitElement(dataBuf, g, e, bigEndian)
              else readExplicitElement(dataBuf, g, e, implicitVR = false, bigEndian)
            (if (el.bytes.nonEmpty) Some(el.bytes) else None, false, Nil)
          }
        } else { dataBuf.position(mark); (None, false, Nil) }
      }
    DicomFile(meta.result(), elems, transferSyntax, charset, pixels, encapsulated,
      fragLens)
  }

  /** Parse data-set elements until EOF, pixel data, or a delimiter tag.
    * Odd-group (private) elements are consumed but not emitted. */
  private def parseDataSet(buf: ByteBuffer, implicitVR: Boolean, bigEndian: Boolean,
                           stopAtPixels: Boolean, insideItem: Boolean = false): Vector[DicomElement] = {
    val out = Vector.newBuilder[DicomElement]
    var done = false
    while (!done && buf.remaining() >= 8) {
      val mark = buf.position()
      val group = buf.getShort() & 0xffff
      val elem = buf.getShort() & 0xffff
      val tagKey = Tags.key(group, elem)
      if (group == 0xfffe && (elem == 0xe00d || elem == 0xe0dd)) {
        buf.getInt() // zero length of the delimiter
        if (insideItem) done = true
        else () // stray delimiter at top level: skip
      } else if (stopAtPixels && pixelDataTags.contains(tagKey)) {
        buf.position(mark)
        done = true
      } else {
        val e =
          if (implicitVR) readImplicitElement(buf, group, elem, bigEndian)
          else readExplicitElement(buf, group, elem, implicitVR = false, bigEndian)
        if (group % 2 == 0) out += e // drop private (odd-group) tags
      }
    }
    out.result()
  }

  private def readExplicitElement(buf: ByteBuffer, group: Int, elem: Int,
                                  implicitVR: Boolean, bigEndian: Boolean): DicomElement = {
    val vr = new String(Array(buf.get(), buf.get()).map(_.toChar))
    val len: Long =
      if (longFormVRs.contains(vr)) { buf.getShort(); buf.getInt() & 0xffffffffL }
      else buf.getShort() & 0xffffL
    readValue(buf, group, elem, vr, len, implicitVR = false, bigEndian)
  }

  private def readImplicitElement(buf: ByteBuffer, group: Int, elem: Int,
                                  bigEndian: Boolean): DicomElement = {
    val len = buf.getInt() & 0xffffffffL
    val vr = Tags.lookup(group, elem).map(_.vr).getOrElse("UN")
    readValue(buf, group, elem, vr, len, implicitVR = true, bigEndian)
  }

  private def readValue(buf: ByteBuffer, group: Int, elem: Int, vr: String,
                        len: Long, implicitVR: Boolean, bigEndian: Boolean): DicomElement = {
    val undefined = len == 0xffffffffL
    if (vr == "SQ" || (undefined && vr == "UN")) {
      val items = readSequenceItems(buf, len, implicitVR, bigEndian)
      DicomElement(group, elem, "SQ", Array.emptyByteArray, items)
    } else if (undefined) {
      // undefined-length non-SQ (encapsulated pixel data shape): skip items
      val items = readSequenceItems(buf, len, implicitVR, bigEndian)
      DicomElement(group, elem, vr, Array.emptyByteArray, Nil)
    } else {
      if (len > buf.remaining())
        throw new InvalidDicomException(
          s"Element (${f"$group%04x"},${f"$elem%04x"}) length $len exceeds remaining ${buf.remaining()} bytes")
      val v = new Array[Byte](len.toInt)
      buf.get(v)
      // normalize to little-endian at parse time so stored value bytes are
      // endianness-free: explicit-BE numeric values are byte-swapped here
      // (string VRs are byte-order independent)
      if (bigEndian) swapToLE(vr, v)
      DicomElement(group, elem, vr, v)
    }
  }

  /** Fixed-width numeric element widths by VR (bytes per value). */
  private val vrWidth: Map[String, Int] = Map(
    "US" -> 2, "SS" -> 2, "OW" -> 2, "AT" -> 2, // AT = two 16-bit halves
    "UL" -> 4, "SL" -> 4, "FL" -> 4, "OF" -> 4, "OL" -> 4,
    "FD" -> 8, "OD" -> 8, "SV" -> 8, "UV" -> 8, "OV" -> 8)

  /** In-place byte swap of big-endian numeric values to little-endian. */
  private def swapToLE(vr: String, v: Array[Byte]): Unit =
    vrWidth.get(vr).foreach { w =>
      var off = 0
      while (off + w <= v.length) {
        var i = 0
        while (i < w / 2) {
          val t = v(off + i); v(off + i) = v(off + w - 1 - i); v(off + w - 1 - i) = t
          i += 1
        }
        off += w
      }
    }

  /** Encapsulated pixel-data fragment stream: a basic-offset-table item
    * first, then one compressed fragment per item, terminated by
    * (FFFE,E0DD). Returns the concatenated fragment bytes (BOT dropped)
    * plus each fragment's byte length — the boundaries a multi-frame
    * decode needs (RLE: one frame per fragment, PS3.5 A.4.2). */
  private def readFragments(buf: ByteBuffer): Option[(Array[Byte], Seq[Int])] = {
    val out = new java.io.ByteArrayOutputStream()
    val lens = Seq.newBuilder[Int]
    var first = true
    var done = false
    while (!done && buf.remaining() >= 8) {
      val g = buf.getShort() & 0xffff
      val e = buf.getShort() & 0xffff
      val len = buf.getInt() & 0xffffffffL
      if (g == 0xfffe && e == 0xe0dd) done = true
      else if (g == 0xfffe && e == 0xe000) {
        if (len > buf.remaining())
          throw new InvalidDicomException(
            s"Pixel fragment length $len exceeds remaining ${buf.remaining()} bytes")
        val v = new Array[Byte](len.toInt)
        buf.get(v)
        if (first) first = false // basic offset table, not pixel bytes
        else { out.write(v); lens += v.length }
      } else
        throw new InvalidDicomException(
          s"Unexpected tag (${f"$g%04x"},${f"$e%04x"}) in pixel fragment stream")
    }
    if (out.size() > 0) Some((out.toByteArray, lens.result())) else None
  }

  /** Read SQ items: (FFFE,E000)* terminated by defined length or
    * (FFFE,E0DD). Each item is a nested data set. */
  private def readSequenceItems(buf: ByteBuffer, seqLen: Long,
                                implicitVR: Boolean, bigEndian: Boolean): Seq[Seq[DicomElement]] = {
    val items = Vector.newBuilder[Seq[DicomElement]]
    val undefined = seqLen == 0xffffffffL
    val end = if (undefined) Long.MaxValue else buf.position() + seqLen
    var done = false
    while (!done && buf.remaining() >= 8 && buf.position() < end) {
      val group = buf.getShort() & 0xffff
      val elem = buf.getShort() & 0xffff
      val itemLen = buf.getInt() & 0xffffffffL
      if (group == 0xfffe && elem == 0xe0dd) done = true
      else if (group == 0xfffe && elem == 0xe000) {
        if (itemLen == 0xffffffffL) {
          items += parseDataSet(buf, implicitVR, bigEndian, stopAtPixels = false, insideItem = true)
        } else {
          val itemEnd = buf.position() + itemLen
          val slice = buf.duplicate().order(buf.order())
          slice.limit(itemEnd.toInt)
          items += parseDataSet(slice, implicitVR, bigEndian, stopAtPixels = false, insideItem = true)
          buf.position(itemEnd.toInt)
        }
      } else {
        throw new InvalidDicomException(
          s"Unexpected tag (${f"$group%04x"},${f"$elem%04x"}) inside sequence")
      }
    }
    items.result()
  }

  private[dicom] def asciiTrim(bytes: Array[Byte]): String =
    new String(bytes, Charset.forName("ISO-8859-1"))
      .reverse.dropWhile(c => c == ' ' || c == 0).reverse

  /** DICOM Specific Character Set → JVM charset (common defined terms). */
  def charsetFor(term: String): Charset = term.trim match {
    case "ISO_IR 192" => Charset.forName("UTF-8")
    case "ISO_IR 100" => Charset.forName("ISO-8859-1")
    case "ISO_IR 101" => Charset.forName("ISO-8859-2")
    case "ISO_IR 144" => Charset.forName("ISO-8859-5")
    case "ISO_IR 126" => Charset.forName("ISO-8859-7")
    case ""           => Charset.forName("US-ASCII")
    case _            => Charset.forName("UTF-8")
  }
}
