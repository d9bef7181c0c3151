package graft.sources

import java.util.{Map => JMap}
import scala.jdk.CollectionConverters._
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import graft.dicom.{Flatten, Tags, VrConvert}
import graft.ingest.Archives
import graft.pipeline.DicomPipeline

/** DataSource V2: `spark.read.format("dicom").load(dir)`.
  *
  * The ergonomic face of the engine (SURVEY.md §7.3 "optional
  * DataSource V2 FileFormat"): recursive listing (any-depth keys, same as
  * the batch pipeline), schema inferred from a bounded file sample (or
  * distributed over executors — never a full driver-side corpus parse),
  * size-packed input partitions, and REQUIRED-COLUMN PUSHDOWN: a
  * `SELECT modality FROM ...` only *converts* the requested tags (the
  * binary scan still walks element headers — bounded by the
  * stop-at-pixel-data rule — but skips value conversion and row
  * materialization for unreferenced columns; see
  * [[graft.dicom.Flatten.flatten]]'s `keep`).
  *
  * Read options:
  *  - `failOnError` (default false): unparsable objects are skipped,
  *    matching a read-surface's permissive mode (the ETL pipeline keeps
  *    its error side-channel semantics);
  *  - `inferSampleFiles` (default 64): schema-inference sample bound;
  *  - `inferMode` (`sample` | `full`): `full` distributes full-corpus
  *    inference over executors;
  *  - `maxPartitionBytes` (default 128 MB): input-partition packing bound.
  */
class DicomDataSource extends TableProvider with DataSourceRegister {

  override def shortName(): String = "dicom"
  override def supportsExternalMetadata(): Boolean = true

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    DicomSourceUtil.inferSchema(
      DicomSourceUtil.pathsOf(options.get("path"), options.get("paths")),
      DicomSourceUtil.sessionConf(),
      sampleFiles = options.getInt("inferSampleFiles",
        DicomSourceUtil.DefaultInferSampleFiles),
      distributed = "full".equalsIgnoreCase(options.getOrDefault("inferMode", "sample")))

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: JMap[String, String]): Table =
    new DicomTable(schema,
      DicomSourceUtil.pathsOf(properties.get("path"), properties.get("paths")))
}

/** Minimal serializable Hadoop-Configuration carrier (the Spark-internal
  * SerializableConfiguration is private[spark]). */
class SerializableHadoopConf(@transient var value: Configuration)
    extends Serializable {
  private def writeObject(out: java.io.ObjectOutputStream): Unit = {
    out.defaultWriteObject()
    value.write(out)
  }
  private def readObject(in: java.io.ObjectInputStream): Unit = {
    in.defaultReadObject()
    value = new Configuration(false)
    value.readFields(in)
  }
}

object DicomSourceUtil {

  /** Resolve the load path(s): Spark passes a single path as `path` and
    * multiple paths as a JSON-array string under `paths`. */
  def pathsOf(path: String, paths: String): Seq[String] = {
    val multi: Seq[String] = Option(paths).toSeq.flatMap { j =>
      val t = j.trim
      if (t.startsWith("["))
        new com.fasterxml.jackson.databind.ObjectMapper()
          .readValue(t, classOf[Array[String]]).toSeq
      else Seq(t)
    }
    val all = (Option(path).toSeq ++ multi).distinct
    if (all.isEmpty)
      throw new IllegalArgumentException("dicom source requires a path")
    all
  }

  /** The active session's Hadoop configuration (driver side). */
  def sessionConf(): Configuration =
    SparkSession.getActiveSession
      .map(_.sparkContext.hadoopConfiguration)
      .getOrElse(new Configuration())

  /** All regular files under each path (RECURSIVE for a dir — the same
    * any-depth key semantics as the batch pipeline's
    * `recursiveFileLookup=true`; the reference processes whatever key an
    * event names regardless of prefix depth), with sizes. Empty files are
    * kept — they surface as skipped / failing objects exactly like the
    * pipeline. */
  def listFilesWithSize(paths: Seq[String], conf: Configuration): Seq[(String, Long)] =
    paths.flatMap { path =>
      val p = new Path(path)
      val fs = p.getFileSystem(conf)
      if (!fs.exists(p)) Nil
      else if (fs.getFileStatus(p).isFile)
        Seq(p.toString -> fs.getFileStatus(p).getLen)
      else {
        val it = fs.listFiles(p, true)
        val out = Seq.newBuilder[(String, Long)]
        while (it.hasNext) {
          val s = it.next()
          if (s.isFile) out += s.getPath.toString -> s.getLen
        }
        out.result()
      }
    }

  def listFiles(paths: Seq[String], conf: Configuration): Seq[String] =
    listFilesWithSize(paths, conf).map(_._1)

  /** Pack files into partitions by cumulative size (FilePartition-style
    * bin packing): one-task-per-file melts the scheduler at millions of
    * objects; one giant task starves parallelism. Files are sorted
    * largest-first and greedily assigned under `maxBytes` (with at least
    * one file per partition). */
  def packPartitions(files: Seq[(String, Long)],
                     maxBytes: Long): Seq[Seq[String]] = {
    val out = Vector.newBuilder[Seq[String]]
    var current = Vector.empty[String]
    var bytes = 0L
    files.sortBy(-_._2).foreach { case (f, len) =>
      val cost = math.max(len, 1L) // empty files still cost a slot
      if (current.nonEmpty && bytes + cost > maxBytes) {
        out += current; current = Vector.empty; bytes = 0L
      }
      current :+= f; bytes += cost
    }
    if (current.nonEmpty) out += current
    out.result()
  }

  /** Read a file, optionally bounded to `cap` bytes (cap < 0 = whole
    * file). The bounded form is the REAL ranged read of the reference's
    * `Range: bytes=0-10000000` GET (`src/s3wrapper.py:53-63`) — for
    * loose `.dcm` objects only the header region ever leaves storage. */
  def readBytes(path: String, conf: Configuration, cap: Long = -1L): Array[Byte] = {
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    val in = fs.open(p)
    try {
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](1 << 16)
      var remaining = if (cap < 0) Long.MaxValue else cap
      var n = in.read(buf, 0, math.min(buf.length.toLong, remaining).toInt)
      while (n >= 0 && remaining > 0) {
        out.write(buf, 0, n)
        remaining -= n
        n = if (remaining > 0)
          in.read(buf, 0, math.min(buf.length.toLong, remaining).toInt)
        else -1
      }
      out.toByteArray
    } finally in.close()
  }

  /** Byte cap for one object: loose `.dcm` routes read header-only. */
  def capFor(path: String): Long =
    if (Archives.evalExt(path) == ".dcm") Archives.DcmRangeBytes.toLong else -1L

  /** Rows of one source object (empty for ignored/failing objects).
    * `keep` = required-keyword set for pruned conversion (None = all). */
  def rowsOf(path: String, conf: Configuration, failOnError: Boolean,
             keep: Option[Set[String]] = None): Seq[Map[String, VrConvert.DicomValue]] =
    DicomPipeline.processObject("dicom-source", "local", path,
      readBytes(path, conf, capFor(path)), keep) match {
      case Right(rs) => rs.map(_.values)
      case Left(e) =>
        if (failOnError) throw new RuntimeException(s"${e.stage}: ${e.error}")
        else Nil
    }

  /** Default file-sample size for schema inference. */
  val DefaultInferSampleFiles = 64

  /** Schema inference: union of observed keywords, typed by the static
    * dictionary, snake_cased, sorted.
    *
    * Scale design: the driver NEVER parses the whole corpus. The default
    * infers from a bounded sample (`inferSampleFiles`, first N by path
    * order — deterministic); `inferMode=full` distributes full-corpus
    * inference over executors (one flatMap over the file list, collecting
    * only the observed KEYWORD set — bounded by the ~130-entry static
    * dictionary, never row data). A user schema (`.schema(...)`) skips
    * inference entirely and is the recommended path for repeated reads. */
  def inferSchema(paths: Seq[String], conf: Configuration,
                  sampleFiles: Int = DefaultInferSampleFiles,
                  distributed: Boolean = false): StructType = {
    val files = listFiles(paths, conf)
    // An explicit full-corpus request must not silently degrade to the
    // bounded sample: without an active session the distributed pass
    // cannot run, and a partial schema would look complete.
    if (distributed && SparkSession.getActiveSession.isEmpty)
      throw new IllegalStateException(
        "dicom inferMode=full requires an active SparkSession (the " +
        "full-corpus pass runs on executors); start a session or drop " +
        "to the bounded-sample default")
    val keys: Seq[String] =
      if (distributed && SparkSession.getActiveSession.isDefined) {
        val sc = SparkSession.active.sparkContext
        val sconf = new SerializableHadoopConf(conf)
        val parts = math.max(1, math.min(files.size, sc.defaultParallelism * 4))
        sc.parallelize(files, parts)
          .flatMap(f => rowsOf(f, sconf.value, failOnError = false)
            .iterator.flatMap(_.collect {
              case (k, v) if v != VrConvert.DNull => k
            }).toSet)
          .distinct().collect().toSeq
      } else {
        // The bound counts PRODUCTIVE files (≥1 row): a corpus whose first
        // N paths are non-DICOM clutter (READMEs, empty DICOMDIRs) must
        // not infer an empty schema. A hard cap on files *examined* keeps
        // the driver bounded even if nothing parses.
        val want = math.max(1, sampleFiles)
        val examineCap = math.max(want * 16, 512)
        val keySet = scala.collection.mutable.SortedSet.empty[String]
        var productive = 0
        var examined = 0
        val it = files.sorted.iterator
        while (productive < want && examined < examineCap && it.hasNext) {
          val rs = rowsOf(it.next(), conf, failOnError = false)
          examined += 1
          if (rs.nonEmpty) productive += 1
          rs.foreach(_.foreach { case (k, v) =>
            if (v != VrConvert.DNull) keySet += k
          })
        }
        keySet.toSeq
      }
    StructType(keys
      .map(kw => kw -> Tags.snakeCase(kw)).sortBy(_._2)
      .map { case (kw, col) =>
        StructField(col, DicomPipeline.sparkTypeFor(kw), nullable = true)
      })
  }

  /** snake_case column name → original keyword (inverse of the sanitize
    * rename, resolved against the static dictionary + lineage names). */
  def keywordFor(col: String): String = {
    val lineage = Seq(Flatten.LineageBucket, Flatten.LineageRegion,
      Flatten.LineageKey, Flatten.LineageArchivePath)
    lineage.find(l => Tags.snakeCase(l) == col)
      .orElse(Tags.byKeyword.keys.find(k => Tags.snakeCase(k) == col))
      .getOrElse(Tags.camelCase(col))
  }

  def toCatalyst(v: VrConvert.DicomValue, dt: DataType): Any = (v, dt) match {
    case (VrConvert.DStr(s), StringType) => UTF8String.fromString(s)
    case (VrConvert.DStrList(xs), ArrayType(StringType, _)) =>
      new GenericArrayData(xs.map(UTF8String.fromString).toArray[Any])
    case (VrConvert.DDate(d), DateType) => d.toInt
    case (VrConvert.DDateList(xs), ArrayType(DateType, _)) =>
      new GenericArrayData(xs.map(_.toInt).toArray[Any])
    case (VrConvert.DPersonName(c), _: StructType) =>
      InternalRow.fromSeq(c.map(UTF8String.fromString))
    case (VrConvert.DPersonNameList(xs), ArrayType(_: StructType, _)) =>
      new GenericArrayData(xs.map(c => InternalRow.fromSeq(c.map(UTF8String.fromString))).toArray[Any])
    case (VrConvert.DMap(m), _: MapType) =>
      val ks = m.keys.toSeq.sorted
      ArrayBasedMapData(
        ks.map(UTF8String.fromString).toArray[Any],
        ks.map(k => UTF8String.fromString(m(k))).toArray[Any])
    case (VrConvert.DNull, _) => null
    case (other, t) => // defensive: stringify on type drift
      if (t == StringType) UTF8String.fromString(VrConvert.stringify(other)) else null
  }
}

class DicomTable(schema: StructType, paths: Seq[String]) extends Table with SupportsRead {
  override def name(): String = s"dicom:${paths.mkString(",")}"
  override def schema(): StructType = schema
  override def capabilities(): java.util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new DicomScanBuilder(schema, paths,
      options.getBoolean("failOnError", false),
      options.getLong("maxPartitionBytes", 128L * 1024 * 1024))
}

class DicomScanBuilder(full: StructType, paths: Seq[String],
                       failOnError: Boolean, maxPartitionBytes: Long)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = full
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def build(): Scan =
    new DicomScan(required, paths, failOnError, maxPartitionBytes)
}

case class DicomInputPartition(files: Seq[String]) extends InputPartition

class DicomScan(required: StructType, paths: Seq[String],
                failOnError: Boolean, maxPartitionBytes: Long)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"DicomScan(path=${paths.mkString(",")}, columns=[${required.fieldNames.mkString(",")}])"
  override def planInputPartitions(): Array[InputPartition] = {
    val files = DicomSourceUtil.listFilesWithSize(paths, DicomSourceUtil.sessionConf())
    DicomSourceUtil.packPartitions(files, maxPartitionBytes)
      .map(DicomInputPartition.apply).toArray
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new DicomReaderFactory(required, failOnError,
      new SerializableHadoopConf(DicomSourceUtil.sessionConf()))
}

class DicomReaderFactory(required: StructType, failOnError: Boolean,
                         conf: SerializableHadoopConf)
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new DicomPartitionReader(p.asInstanceOf[DicomInputPartition].files,
      required, failOnError, conf)
}

class DicomPartitionReader(files: Seq[String], required: StructType,
                           failOnError: Boolean, conf: SerializableHadoopConf)
    extends PartitionReader[InternalRow] {

  // (source keyword, spark type) in output order
  private val cols: Array[(String, DataType)] =
    required.fields.map(f => (DicomSourceUtil.keywordFor(f.name), f.dataType))

  // pruned conversion: only the required keywords are VR-converted
  private val keep: Set[String] = cols.map(_._1).toSet

  private lazy val iter: Iterator[InternalRow] =
    files.iterator.flatMap { file =>
      DicomSourceUtil.rowsOf(file, conf.value, failOnError, Some(keep))
        .iterator.map { m =>
          InternalRow.fromSeq(scala.collection.immutable.ArraySeq.unsafeWrapArray(
            cols.map { case (kw, dt) =>
              m.get(kw).map(DicomSourceUtil.toCatalyst(_, dt)).orNull
            }))
        }
    }

  private var current: InternalRow = _
  override def next(): Boolean = { if (iter.hasNext) { current = iter.next(); true } else false }
  override def get(): InternalRow = current
  override def close(): Unit = ()
}
