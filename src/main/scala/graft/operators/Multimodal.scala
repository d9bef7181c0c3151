package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.dicom.{DicomParser, Tags}

/** Multimodal columns for the training-data pipeline: image/audio/video
  * as opaque `binary` columns with typed metadata, plus decode /
  * feature-extract / resize / frame-sample operators.
  *
  * The Spark-side plumbing — schemas, batched per-partition execution
  * (the JVM analog of `mapInPandas` batch shape), partitioning, operator
  * signatures — is real and tested. The PIXEL-level decode is a
  * deterministic STUB (this container has no imaging libraries): for
  * DICOM inputs the "decode" reads true header geometry (Rows/Columns/
  * BitsAllocated/SamplesPerPixel — a genuine metadata decode); for other
  * binaries it derives deterministic fake geometry from the content
  * digest. Swap [[decodeOne]]'s stub branch for a real codec when one is
  * available.
  *
  * Scale design: every operator is a narrow per-partition pass over the
  * asset table (no shuffle); frame sampling is the explode/UDTF shape;
  * pseudo-embeddings feed straight into [[Similarity]]'s ANN path, making
  * the full multimodal → embed → index pipeline runnable end-to-end.
  */
object Multimodal {

  final case class AssetMeta(
      path: String, length: Long, media_type: String, digest: String)

  final case class DecodedAsset(
      path: String, media_type: String, width: Int, height: Int,
      channels: Int, bits: Int, n_frames: Int, decoder: String)

  /** Load a directory of binaries as the asset table: opaque content +
    * typed metadata (media type sniffed from magic bytes, not extension). */
  def loadAssets(s: SparkSession, dir: String): DataFrame = {
    s.read.format("binaryFile").load(dir)
      .select(col("path"), col("length"), col("content"))
      .withColumn("media_type", mediaTypeUdf(col("content")))
      .withColumn("digest", md5(col("content")))
  }

  private val mediaTypeUdf = udf { content: Array[Byte] =>
    if (content == null) "empty"
    else if (DicomParser.isDicom(content)) "application/dicom"
    else if (content.length >= 2 && content(0) == 'P' && content(1) == 'K') "application/zip"
    else if (content.length >= 2 && (content(0) & 0xff) == 0x1f && (content(1) & 0xff) == 0x8b) "application/gzip"
    else if (content.length >= 3 && content(0) == 'B' && content(1) == 'Z' && content(2) == 'h') "application/x-bzip2"
    else if (content.isEmpty) "empty"
    else "application/octet-stream"
  }

  /** Decode ONE asset's geometry. DICOM branch is a true header decode;
    * everything else is the deterministic stub (md5-derived). */
  def decodeOne(path: String, mediaType: String, content: Array[Byte]): DecodedAsset = {
    def short(kw: String, parsed: DicomParser.DicomFile): Int =
      parsed.elements.find(_.keyword == kw)
        .flatMap(e => graft.dicom.VrConvert.rawStrings(e, parsed.charset).headOption)
        .flatMap(v => scala.util.Try(v.toInt).toOption).getOrElse(0)
    if (mediaType == "application/dicom") {
      val parsed = DicomParser.parse(content)
      DecodedAsset(path, mediaType,
        width = short("Columns", parsed), height = short("Rows", parsed),
        channels = math.max(1, short("SamplesPerPixel", parsed)),
        bits = math.max(8, short("BitsAllocated", parsed)),
        n_frames = math.max(1, short("NumberOfFrames", parsed)),
        decoder = "dicom-header")
    } else {
      // STUB: deterministic fake geometry from the content digest
      val d = java.security.MessageDigest.getInstance("MD5").digest(content)
      def b(i: Int): Int = d(i) & 0xff
      DecodedAsset(path, mediaType,
        width = 64 + (b(0) << 4), height = 64 + (b(1) << 4),
        channels = 1 + b(2) % 3, bits = 8 << (b(3) % 2),
        n_frames = 1 + b(4) % 30, decoder = "stub")
    }
  }

  /** Batched decode: one pass per partition over (path, media_type,
    * content) — the mapInPandas-shaped operator. */
  def decodeMeta(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    loadAssets(s, dir)
      .select($"path", $"media_type", $"content").as[(String, String, Array[Byte])]
      .mapPartitions(_.map { case (p, m, c) => decodeOne(p, m, c) })
      .toDF()
      .withColumn("path", element_at(split($"path", "/"), -1))
      .orderBy($"path")
  }

  /** Resize (metadata transform; pixel resample stubbed): scales geometry
    * to fit `maxSide`, carrying the estimated output byte count. */
  def resizeMeta(s: SparkSession, dir: String, maxSide: Int = 256): DataFrame = {
    import s.implicits._
    decodeMeta(s, dir)
      .withColumn("scale",
        when(greatest($"width", $"height") <= maxSide, lit(1.0))
          .otherwise(lit(maxSide.toDouble) / greatest($"width", $"height")))
      .withColumn("out_width", ceil($"width" * $"scale").cast("int"))
      .withColumn("out_height", ceil($"height" * $"scale").cast("int"))
      .withColumn("est_bytes",
        ($"out_width" * $"out_height" * $"channels" * ($"bits" / 8)).cast("long"))
      .select($"path", $"width", $"height", $"out_width", $"out_height", $"est_bytes")
      .orderBy($"path")
  }

  /** Frame sampling (video-shaped UDTF): every `step`-th frame index with
    * its byte offset into the (conceptual) frame buffer. */
  def frameSample(s: SparkSession, dir: String, step: Int = 5): DataFrame = {
    import s.implicits._
    decodeMeta(s, dir)
      .withColumn("frame_idx",
        explode(sequence(lit(0), $"n_frames" - 1, lit(step))))
      .withColumn("byte_offset",
        $"frame_idx".cast("long") * $"width" * $"height" * $"channels" * ($"bits" / 8).cast("long"))
      .select($"path", $"frame_idx", $"byte_offset")
      .orderBy($"path", $"frame_idx")
  }

  /** Feature-extract stub: deterministic 64-dim pseudo-embedding from the
    * content digest (md5-seeded, unit-normalized) — schema-compatible
    * with the real `embeddings` table so the ANN path composes. */
  def pseudoEmbed(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    loadAssets(s, dir)
      .select($"path", $"digest").as[(String, String)]
      .mapPartitions(_.map { case (p, digest) =>
        val vec = Array.tabulate(64) { j =>
          val h = java.security.MessageDigest.getInstance("MD5")
            .digest(s"$digest:$j".getBytes("UTF-8"))
          (((h(0) & 0xff) << 8 | (h(1) & 0xff)).toFloat / 65535f) - 0.5f
        }
        val nrm = math.sqrt(vec.map(v => v.toDouble * v).sum).toFloat
        (p, vec.map(_ / nrm))
      })
      .toDF("path", "embedding")
      .withColumn("path", element_at(split($"path", "/"), -1))
      .orderBy($"path")
  }

  /** [[pseudoEmbed]] with the raw `array<float>` serialized for external
    * harnesses: a rounded L2 norm plus a JSON dump of the rounded vector.
    * (Raw arrays are unhashable in pandas-based row checks; the JSON form
    * is deterministic and sortable.) Compose with [[Similarity]] via
    * [[pseudoEmbed]] directly — this variant is the reporting surface. */
  def pseudoEmbedFlat(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    pseudoEmbed(s, dir)
      .select($"path",
        round(sqrt(aggregate($"embedding", lit(0.0d),
          (acc, v) => acc + v.cast("double") * v.cast("double"))), 6).as("norm"),
        to_json(transform($"embedding",
          v => round(v.cast("double"), 6))).as("embedding_json"))
      .orderBy($"path")
  }
}
