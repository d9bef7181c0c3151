package graft.ingest

import java.io.{ByteArrayInputStream, InputStream}
import org.apache.commons.compress.archivers.tar.{TarArchiveEntry, TarArchiveInputStream}
import org.apache.commons.compress.compressors.bzip2.BZip2CompressorInputStream
import org.apache.commons.compress.compressors.gzip.GzipCompressorInputStream
import org.apache.commons.compress.compressors.xz.XZCompressorInputStream
import graft.dicom.DicomParser

/** Extension routing + archive expansion, reproducing
  * `s3wrapper.eval_ext/set_file_ext/get` (`src/s3wrapper.py:38-44,76-127`)
  * and the member filters in `src/utils/utils.py:6-58`:
  *
  *  - extension = `os.path.splitext` of the key; empty or ≥10 chars →
  *    default `.dcm`;
  *  - `.json/.txt/.csv` → ignored ("No file found" success, no error);
  *  - `.dcm` → single member, FIRST 10,000,001 BYTES ONLY (the ranged-GET
  *    cap, `src/s3wrapper.py:55-63`; `Range: bytes=0-10000000` is
  *    inclusive);
  *  - `.zip` → entries that are files, don't contain "DICOMDIR"
  *    (case-insensitive), and carry the DICM magic at offset 128;
  *  - `.tar/.gz/.bz2/.xz` → same filters; compression is detected from
  *    MAGIC BYTES (like `tarfile.open('r')`), so a mislabeled extension
  *    still expands;
  *  - anything else → error ("<ext> file extension not supported").
  */
object Archives {

  val IgnoreExts: Set[String] = Set(".json", ".txt", ".csv")
  val DcmRangeBytes: Int = 10000001
  val DefaultExt = ".dcm"

  sealed trait Expansion
  /** Ignored extension — "No file found" success. */
  case object Ignored extends Expansion
  /** (archive member name or basename) → bytes. */
  final case class Entries(entries: Seq[(String, Array[Byte])]) extends Expansion

  final class UnsupportedExtensionException(ext: String)
    extends RuntimeException(s"$ext file extension not supported")
  final class InvalidArchiveException(msg: String) extends RuntimeException(msg)

  /** `os.path.splitext`-equivalent extension of the key's basename
    * (leading-dot-only names have no extension). */
  def splitExt(key: String): String = {
    val base = key.substring(key.lastIndexOf('/') + 1)
    val idx = base.lastIndexOf('.')
    if (idx <= 0) "" else base.substring(idx)
  }

  /** `set_file_ext` rule: non-empty and < 10 chars → lowered ext, else
    * the default `.dcm`. */
  def evalExt(key: String): String = {
    val ext = splitExt(key)
    if (ext.nonEmpty && ext.length < 10) ext.toLowerCase else DefaultExt
  }

  private def basename(key: String): String =
    key.substring(key.lastIndexOf('/') + 1)

  def expand(key: String, content: Array[Byte]): Expansion = {
    val ext = evalExt(key)
    if (IgnoreExts.contains(ext)) Ignored
    else ext match {
      case ".dcm" =>
        Entries(Seq(basename(key) -> content.take(DcmRangeBytes)))
      case ".zip" => expandZip(key, content)
      case ".tar" | ".gz" | ".bz2" | ".xz" => expandTar(key, content)
      case other => throw new UnsupportedExtensionException(other)
    }
  }

  /** Streamed expansion for the oversized-object route (the reference's
    * size-based compute router, `src/app.py:118-181`, re-expressed as a
    * scan strategy): IDENTICAL member semantics to [[expand]] — the
    * byte-array forms below delegate here, so the two routes cannot
    * drift — but the archive itself is never materialized; peak memory
    * is the largest KEPT MEMBER, not the container. A 50 GB tar.gz of
    * scans expands entry-by-entry off the storage stream. Loose `.dcm`
    * never reaches this (the router gives it the ranged header read,
    * the reference's own `.dcm` bypass). */
  def expandStream(key: String, in0: InputStream): Expansion = {
    val ext = evalExt(key)
    if (IgnoreExts.contains(ext)) { in0.close(); Ignored }
    else ext match {
      case ".zip" => expandZipStream(key, in0)
      case ".tar" | ".gz" | ".bz2" | ".xz" => expandTarStream(key, in0)
      case other => in0.close(); throw new UnsupportedExtensionException(other)
    }
  }

  /** Fold an archive's kept members ONE AT A TIME off the storage
    * stream: each member's bytes go through `f` as soon as they are
    * read, and the expander keeps NO reference to a delivered member —
    * so peak task memory is the CURRENT member plus whatever `f`
    * retains (for the extraction flatMap that is the parsed metadata
    * row: pixel bytes are dropped at parse). This is the holder of the
    * oversized route's memory contract ("never the container, never
    * the member sum"), pinned by StreamedExpansionSpec's
    * weak-reference GC test. Member semantics (filter, order, error
    * taxonomy) are [[expandStream]]'s — both delegate to the same
    * per-member visitors, so the buffering and streaming forms cannot
    * drift. Ignored extensions yield no members; loose `.dcm` never
    * reaches this (the size router gives it the ranged header read). */
  def mapMembersStream[A](key: String, in0: InputStream)(
      f: (String, Array[Byte]) => A): Seq[A] = {
    val ext = evalExt(key)
    if (IgnoreExts.contains(ext)) { in0.close(); Nil }
    else {
      val out = Vector.newBuilder[A]
      val g = (name: String, bytes: Array[Byte]) => { out += f(name, bytes); () }
      ext match {
        case ".zip" => visitZipStream(key, in0)(g)
        case ".tar" | ".gz" | ".bz2" | ".xz" => visitTarStream(key, in0)(g)
        case other => in0.close(); throw new UnsupportedExtensionException(other)
      }
      out.result()
    }
  }

  /** First `n` bytes without consuming them (mark/reset). */
  private def sniff(in: java.io.BufferedInputStream, n: Int): Array[Byte] = {
    in.mark(n)
    val b = new Array[Byte](n)
    var off = 0
    var r = in.read(b, off, n - off)
    while (r > 0) {
      off += r
      r = if (off < n) in.read(b, off, n - off) else -1
    }
    in.reset()
    java.util.Arrays.copyOf(b, off)
  }

  /** Archive member filter (`src/utils/utils.py:6-48`): regular files
    * only, no "DICOMDIR" in the name, DICM magic present. */
  private def keepMember(name: String, bytes: Array[Byte]): Boolean =
    !name.toUpperCase.contains("DICOMDIR") && DicomParser.isDicom(bytes)

  private def expandZip(key: String, content: Array[Byte]): Entries =
    expandZipStream(key, new ByteArrayInputStream(content))

  private def expandZipStream(key: String, in0: InputStream): Entries = {
    val out = Vector.newBuilder[(String, Array[Byte])]
    visitZipStream(key, in0)((n, b) => out += n -> b)
    Entries(out.result())
  }

  private def visitZipStream(key: String, in0: InputStream)(
      f: (String, Array[Byte]) => Unit): Unit = {
    val in = new java.io.BufferedInputStream(in0)
    // sniff can throw on a broken storage stream: close + map to the
    // expand-stage taxonomy, never leak the FS handle
    val magic =
      try sniff(in, 4)
      catch {
        case e: java.io.IOException =>
          in.close()
          throw new InvalidArchiveException(s"Invalid ZipFile $key: ${e.getMessage}")
      }
    if (magic.length < 4 || magic(0) != 'P' || magic(1) != 'K') {
      in.close()
      throw new InvalidArchiveException(s"Invalid ZipFile $key")
    }
    val zin = new java.util.zip.ZipInputStream(in)
    try {
      var entry = zin.getNextEntry
      while (entry != null) {
        if (!entry.isDirectory) {
          val bytes = readAll(zin)
          if (keepMember(entry.getName, bytes)) f(entry.getName, bytes)
        }
        entry = zin.getNextEntry
      }
    } catch {
      case e: java.io.IOException => // ZipException included: corrupt past magic
        throw new InvalidArchiveException(s"Invalid ZipFile $key: ${e.getMessage}")
    } finally zin.close()
  }

  /** tar / tar.gz / tar.bz2 / tar.xz — compression chosen by magic bytes
    * (tarfile.open('r') auto-detect semantics). */
  private def expandTar(key: String, content: Array[Byte]): Entries =
    expandTarStream(key, new ByteArrayInputStream(content))

  private def expandTarStream(key: String, in0: InputStream): Entries = {
    val out = Vector.newBuilder[(String, Array[Byte])]
    visitTarStream(key, in0)((n, b) => out += n -> b)
    Entries(out.result())
  }

  private def visitTarStream(key: String, in0: InputStream)(
      f: (String, Array[Byte]) => Unit): Unit = {
    val raw = new java.io.BufferedInputStream(in0)
    // sniff AND the decompressor constructors eagerly read the stream
    // and can throw on corrupt bytes — close + map to the expand-stage
    // taxonomy (not a leaked FS handle surfacing as stage=transform)
    val tin =
      try {
        val magic = sniff(raw, 6)
        val decompressed: InputStream =
          if (magic.length >= 2 && (magic(0) & 0xff) == 0x1f && (magic(1) & 0xff) == 0x8b)
            new GzipCompressorInputStream(raw, true)
          else if (magic.length >= 3 && magic(0) == 'B' && magic(1) == 'Z' && magic(2) == 'h')
            new BZip2CompressorInputStream(raw, true)
          else if (magic.length >= 6 && (magic(0) & 0xff) == 0xfd && magic(1) == '7' &&
                   magic(2) == 'z' && magic(3) == 'X' && magic(4) == 'Z' && magic(5) == 0)
            new XZCompressorInputStream(raw)
          else raw
        new TarArchiveInputStream(decompressed)
      } catch {
        case e: java.io.IOException =>
          raw.close()
          throw new InvalidArchiveException(s"Invalid TarFile $key: ${e.getMessage}")
      }
    try {
      var entry: TarArchiveEntry = tin.getNextEntry
      if (entry == null)
        throw new InvalidArchiveException(s"Invalid TarFile $key")
      while (entry != null) {
        if (entry.isFile) {
          val bytes = readAll(tin)
          if (keepMember(entry.getName, bytes)) f(entry.getName, bytes)
        }
        entry = tin.getNextEntry
      }
    } catch {
      case e: java.io.IOException =>
        throw new InvalidArchiveException(s"Invalid TarFile $key: ${e.getMessage}")
    } finally tin.close()
  }

  private def readAll(in: InputStream): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](65536)
    var n = in.read(buf)
    while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
    out.toByteArray
  }
}
