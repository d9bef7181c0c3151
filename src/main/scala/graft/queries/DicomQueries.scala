package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.dicom.VrConvert
import graft.pipeline.{Catalog, DicomPipeline}

/** SparkEntry-facing DICOM queries. The pipeline operators (SURVEY.md
  * §2.1-2.3) are not expressible as DuckDB SQL over the sf tables, so
  * these run the engine over the reference fixture set
  * (/root/reference/sample_dcm, read-only, fully deterministic content)
  * and return stable, ordered results — the driver records rows-only
  * checks. The two `*_fn` queries re-expose VR converters as SQL scalar
  * functions (T1) applied to the sf tables, so they DO carry oracles.
  */
object DicomQueries {

  val Fixtures = "/root/reference/sample_dcm"

  private def scratch(s: SparkSession): String = {
    val base = graft.util.Fs.scratchDir(s, "dicomq")
    java.nio.file.Files.createTempDirectory(base, "run").toAbsolutePath.toString
  }

  /** Full extraction (route→expand→parse→flatten→finalize) over all 7
    * fixture objects: 10 images, deterministic projection. */
  def extractFlat(s: SparkSession, dir: String): DataFrame = {
    val df = DicomPipeline.toDataFrame(s,
      DicomPipeline.extract(s, Fixtures, "ref-bucket", "ref-region").rows)
    flatProjection(s, df)
  }

  /** The manifest-driven twin of [[extractFlat]]: identical extraction,
    * but routed through [[DicomPipeline.extractFromManifest]] — the
    * driver's only input is a (path, length) inventory, never a listing.
    * Must return byte-for-byte what the listed route returns (ManifestSpec
    * pins the full rows+errors equality; this entry keeps the driver's
    * rows check on the path every round). */
  def manifestExtract(s: SparkSession, dir: String): DataFrame = {
    val manifest = DicomPipeline.manifestOf(s, Fixtures)
    val df = DicomPipeline.toDataFrame(s,
      DicomPipeline.extractFromManifest(s, manifest, "ref-bucket", "ref-region").rows)
    flatProjection(s, df)
  }

  /** Day-2 incremental extraction: yesterday's processed log covers the
    * fixture corpus EXCEPT a deterministic "arrived today" subset (path
    * hash mod 3 == 0) plus one object whose recorded length drifted (a
    * changed object re-extracts). The gated result is the flat
    * projection of extracting ONLY [[DicomPipeline.manifestDelta]]'s
    * output — ManifestSpec pins byte-parity with directly extracting
    * just the delta objects, and the rehearsal pins cost ∝ delta. */
  def manifestDelta(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.{abs, col, hash, pmod}
    val manifest = DicomPipeline.manifestOf(s, Fixtures)
    val newToday = pmod(abs(hash(col("path"))), lit(3)) === 0
    val processed = manifest.filter(!newToday)
      // one "changed" object: the log remembers a different length, so
      // the anti-join re-admits it even though the path matched
      .withColumn("length",
        when(col("path").endsWith("example-6"), col("length") + 1L)
          .otherwise(col("length")))
    val delta = DicomPipeline.manifestDelta(manifest, processed)
    val df = DicomPipeline.toDataFrame(s,
      DicomPipeline.extractFromManifest(s, delta, "ref-bucket", "ref-region").rows)
    flatProjection(s, df)
  }

  private def flatProjection(s: SparkSession, df: DataFrame): DataFrame = {
    import s.implicits._
    df.select(
        element_at(split($"source_s3_key", "/"), -1).as("source_key"),
        $"source_s3_archive_path".as("archive_path"),
        $"modality", $"conversion_type", $"patient_id", $"patient_sex",
        date_format($"study_date", "yyyy-MM-dd").as("study_date"),
        $"series_number", $"rows", $"columns",
        $"photometric_interpretation", $"sopinstance_uid",
        // Array-typed tags serialized to JSON strings: keeps the driver's
        // pandas-based rows check sortable (raw arrays are unhashable there)
        // while preserving the full multi-valued content.
        to_json($"image_type").as("image_type"),
        to_json($"pixel_spacing").as("pixel_spacing"),
        $"patient_name.family_name".as("patient_family_name"))
      .orderBy($"source_key", $"archive_path")
  }

  /** DLQ-analog error channel: the empty DICOMDIR fixture must fail at
    * the parse stage (README.md:116 end-to-end expectation). */
  def errors(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ex = DicomPipeline.extract(s, Fixtures, "ref-bucket", "ref-region")
    s.createDataFrame(ex.errors)
      .select(element_at(split($"source_s3_key", "/"), -1).as("source_key"),
              $"stage", $"error")
      .orderBy($"source_key")
  }

  /** E3 path: partitioned write → catalog registration → MSCK → pruned
    * SQL aggregation by partition.
    *
    * Catalog reuse (`spark.graft.dicom.catalogReuse`, default true): a
    * warehouse's catalog entry is a STANDING object — the table is
    * created once and each pipeline run refreshes its data, it is not
    * re-DDL'd per batch. With reuse on, the entry writes to a stable
    * per-process location (cleared first, so every run still pays the
    * full extraction + partitioned write) and registers the table on
    * first use only; later calls in the process skip
    * CREATE/DROP/MSCK — the ~1 s/pass DDL constant the r6 bench notes
    * measured. The partition SET is deterministic (fixture study
    * dates), so the standing registration stays valid across data
    * refreshes — exactly when MSCK re-repair would be a no-op. `false`
    * restores the fresh-random-table-per-call path (the A/B arm). */
  def partitionedSql(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val reuse = s.conf.get("spark.graft.dicom.catalogReuse", "true").toBoolean
    val (out, table) =
      // per-process standing location: two JVMs on one checkout (bench
      // alongside tests) must not race on deleteRecursively + rewrite
      // of a shared data dir one of them is querying
      if (reuse) (graft.util.Fs.scratchDir(s, "dicomq")
          .resolve(s"std-${ProcessHandle.current.pid}").toString,
        "dicom_metadata_std")
      else (scratch(s), "dicom_metadata_" + java.lang.Long.toHexString(
        java.util.concurrent.ThreadLocalRandom.current().nextLong()).take(8))
    if (reuse) { // refresh-in-place: the write below appends to empty
      graft.util.Fs.deleteRecursively(java.nio.file.Paths.get(s"$out/data"))
      graft.util.Fs.deleteRecursively(java.nio.file.Paths.get(s"$out/errors"))
    }
    DicomPipeline.run(s, Fixtures, s"$out/data", Some(s"$out/errors"),
      "ref-bucket", "ref-region")
    if (!reuse || !s.catalog.tableExists(s"dicom_db.$table"))
      Catalog.registerTable(s, s"$out/data", "dicom_db", table)
    else
      // data was refreshed in place under the standing registration:
      // drop the cached file listing (lazy re-list on next query) —
      // the cheap production refresh, vs re-running DROP/CREATE/MSCK
      s.sql(s"REFRESH TABLE dicom_db.$table")
    s.sql(
      s"""SELECT date_format(study_date, 'yyyy-MM-dd') AS study_date,
         |       count(*) AS n_images,
         |       count(DISTINCT sopinstance_uid) AS n_instances
         |FROM dicom_db.$table
         |GROUP BY study_date ORDER BY study_date""".stripMargin)
  }

  /** Crawler analog: two batches with divergent schemas → merged column
    * inventory (schema evolution made visible). */
  def crawlSchema(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val out = scratch(s)
    DicomPipeline.run(s, s"$Fixtures/example-0", s"$out/data")
    DicomPipeline.run(s, s"$Fixtures/example.zip", s"$out/data")
    val merged = Catalog.crawl(s, s"$out/data",
      table = "dicom_crawl_" + java.lang.Long.toHexString(
        java.util.concurrent.ThreadLocalRandom.current().nextLong()).take(8))
    merged.schema.fields.map(f => (f.name, f.dataType.simpleString))
      .toSeq.toDF("column_name", "column_type")
      .orderBy($"column_name")
  }

  /** DataSource V2 surface: `spark.read.format("dicom")` with projection
    * pushdown, queried through SQL. */
  def sourceSql(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    s.read.format("dicom").load(Fixtures)
      .createOrReplaceTempView("dicom_source_v2")
    s.sql(
      """SELECT source_s3_archive_path AS archive_path, modality, patient_sex,
        |       date_format(study_date, 'yyyy-MM-dd') AS study_date
        |FROM dicom_source_v2
        |ORDER BY archive_path""".stripMargin)
  }

  /** Register a session UDF once — same existence guard as
    * [[graft.functions.VectorExpressions.register]], so per-query calls
    * don't spam "replaced a previously registered function" WARNs. */
  private def registerOnce(
      s: SparkSession, name: String,
      u: org.apache.spark.sql.expressions.UserDefinedFunction): Unit = {
    val ident = org.apache.spark.sql.catalyst.FunctionIdentifier(name)
    if (!s.sessionState.functionRegistry.functionExists(ident))
      s.udf.register(name, u)
  }

  private val parseDaUdf = udf { s: String =>
    if (s == null || s.isEmpty)
      java.sql.Date.valueOf("1900-01-01") // convert_DA empty path (tags.py:32)
    else java.sql.Date.valueOf(
      java.time.LocalDate.parse(s, java.time.format.DateTimeFormatter.ofPattern("yyyyMMdd")))
  }

  private val parsePnUdf = udf { s: String =>
    val c = VrConvert.personName(if (s == null) "" else s)
    (c(0), c(1)) // (FamilyName, GivenName)
  }

  /** VR converter re-exposed as a SQL scalar function (T1): DICOM DA
    * string → DATE, round-tripped over orders. Oracle-checked. */
  def parseDaFn(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    registerOnce(s, "dicom_parse_da", parseDaUdf)
    s.read.parquet(s"$dir/orders.parquet")
      .select($"o_orderkey",
        date_format(
          call_udf("dicom_parse_da", date_format($"o_orderdate", "yyyyMMdd")),
          "yyyy-MM-dd").as("parsed_date"))
      .orderBy($"o_orderkey")
  }

  /** DICOM → CORPUS COMPOSITION — the end-to-end story the north star
    * describes (binary ingest → curated training data), joining the
    * repo's two halves in one entry: the full extraction pipeline
    * (route→expand→parse→flatten, [[extractFlat]]'s projection) feeds
    * its STRING metadata through the curation funnel — normalize →
    * exact dedup → quality gate — stage for stage the expressions the
    * gated corpus entries ship (`text_normalize`'s canonical form,
    * `dedup_exact`'s first-per-hash canonical rule, `text_quality`'s
    * C4-style keep rule), so the composition inherits their oracle-
    * certified semantics on a relation those oracles cannot reach (the
    * source is binary fixture bytes → rows-only by the same
    * justification as every dicom_* entry). Output is attrition-
    * accounted, one row PER DOCUMENT with its stage outcomes (`is_dup`,
    * `quality_keep`, final `curated`), not just the survivor set — the
    * corpus-card shape [[graft.operators.Curation.qualityFunnel]]
    * reports in aggregate.
    *
    * Scale shape: extraction is the pipeline's own per-object work, the
    * doc relation is a narrow projection of it, normalize/quality are
    * per-row expressions, and dedup is one exchange on the norm-hash —
    * at 100 TB this is extract + one shuffle, the same plan
    * `dedup_exact` runs on the documents table. */
  def corpusFunnel(s: SparkSession, dir: String): DataFrame =
    funnelOf(s, extractFlat(s, dir))

  /** [[corpusFunnel]]'s stages over a RAW extraction relation (the
    * streamed sink's schema — [[graft.pipeline.DicomPipeline.toDataFrame]]
    * output): apply the flat projection, then the same funnel. Lets the
    * streaming twin (`stream_dicom_corpus_funnel`) share every stage
    * expression verbatim. */
  private[graft] def funnelFromRaw(s: SparkSession, raw: DataFrame): DataFrame =
    funnelOf(s, flatProjection(s, raw))

  private def funnelOf(s: SparkSession, flat: DataFrame): DataFrame = {
    import s.implicits._
    val doc = flat.select($"source_key", $"archive_path",
      concat_ws(" ", $"modality", $"conversion_type", $"patient_id",
        $"patient_sex", $"study_date", $"photometric_interpretation",
        $"patient_family_name", $"image_type", $"pixel_spacing",
        $"sopinstance_uid").as("text"))
    // stage 1 — normalize (text_normalize's canonical form verbatim):
    // lowercase, collapse whitespace runs, trim
    val norm = trim(regexp_replace(lower($"text"), " +", " "))
    val keyed = doc.select($"source_key", $"archive_path",
      norm.as("text"), md5(norm).as("norm_md5"))
    // stage 2 — exact dedup on the normalized hash (dedup_exact's
    // canonical rule): the first doc per hash in deterministic order
    // survives, later copies flag is_dup
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"norm_md5").orderBy($"source_key", $"archive_path")
    val deduped = keyed
      .withColumn("is_dup", (row_number().over(w) > 1).cast("long"))
    // stage 3 — quality gate (text_quality's composite keep rule
    // verbatim: token floor, sane mean token length, low punctuation)
    deduped
      .withColumn("tk",
        expr("filter(split(lower(text), ' '), x -> length(x) > 0)"))
      .select(
        $"source_key", $"archive_path", $"norm_md5", $"is_dup",
        size($"tk").cast("long").as("n_tokens"),
        round(expr("aggregate(tk, cast(0 as double), (s, x) -> s + length(x)) / size(tk)"), 4)
          .as("mean_tok_len"),
        round(size(regexp_extract_all($"text", lit("[.!?,;:]"), lit(0))).cast("double") /
          length($"text"), 4).as("punct_ratio"))
      .withColumn("quality_keep",
        when($"n_tokens" >= 10 && $"mean_tok_len" >= 2.0 &&
          $"mean_tok_len" <= 15.0 && $"punct_ratio" <= 0.2, 1L).otherwise(0L))
      .withColumn("curated",
        (($"is_dup" === 0) && ($"quality_keep" === 1)).cast("long"))
      .orderBy($"source_key", $"archive_path")
  }

  /** PN component split as a SQL scalar function over synthetic PN
    * strings built from customer rows. Oracle-checked. */
  def parsePnFn(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    registerOnce(s, "dicom_parse_pn", parsePnUdf)
    s.read.parquet(s"$dir/customer.parquet")
      .select($"c_custkey",
        call_udf("dicom_parse_pn",
          concat($"c_name", lit("^"), $"c_mktsegment")).as("pn"))
      .select($"c_custkey",
        $"pn._1".as("family_name"), $"pn._2".as("given_name"))
      .orderBy($"c_custkey")
  }
}
