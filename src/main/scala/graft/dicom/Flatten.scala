package graft.dicom

import java.time.LocalDate

/** Image → wide-row flatten, reproducing `dcmfile.transform`
  * (`src/dicomwrapper.py:36-64`):
  *  - every main data-set element with a known keyword and a non-empty
  *    value is converted (VR dispatch) and keyed by keyword;
  *  - elements with no keyword (unregistered tags) are skipped;
  *  - a conversion failure anywhere fails the whole image (the reference
  *    re-raises out of the element loop → the object lands in the DLQ);
  *  - four lineage keys are injected (`src/dicomwrapper.py:53-56`);
  *  - if the partition tag (snake→CamelCase, `study_date` → `StudyDate`)
  *    is absent the constant date 1979-01-01 is imputed
  *    (`src/dicomwrapper.py:58-62`). NOTE: SURVEY.md §1.1 flags a
  *    1979-vs-1900 discrepancy; the 1900-01-01 paths (README.md:5,
  *    `tags.py:32`) are DEAD CODE in the reference — empty-valued DA
  *    elements are skipped before `convert_DA` can default them — so the
  *    only live default is 1979-01-01, which we reproduce.
  */
object Flatten {

  val PartitionColSnake = "study_date"
  val PartitionColCamel: String = Tags.camelCase(PartitionColSnake) // StudyDate
  val DefaultPartitionDate: Long = LocalDate.parse("1979-01-01").toEpochDay

  val LineageBucket = "SOURCE_S3_BUCKET"
  val LineageRegion = "SOURCE_S3_REGION"
  val LineageKey = "SOURCE_S3_KEY"
  val LineageArchivePath = "SOURCE_S3_ARCHIVE_PATH"

  import VrConvert._

  /** One parsed image → keyword-keyed row.
    *
    * `keep = Some(set)` restricts VALUE CONVERSION to the named keywords
    * (the V2 source's column pruning — a `SELECT modality` converts one
    * tag, not ~130). The element walk itself is unchanged (bounded by the
    * stop-at-pixel-data rule). Pruning also narrows failure scope: a
    * corrupt value in a column the query never references cannot fail the
    * image — the same semantics as a columnar format's pruned read. The
    * ETL pipeline always passes `None` (full conversion, reference
    * fail-the-object semantics preserved). */
  def flatten(file: DicomParser.DicomFile,
              bucket: String, region: String, key: String,
              archivePath: String,
              keep: Option[Set[String]] = None): Map[String, DicomValue] = {
    var m = Map.empty[String, DicomValue]
    file.elements.foreach { e =>
      val kw = e.keyword
      if (kw.nonEmpty && keep.forall(_.contains(kw)) &&
          !VrConvert.isEmptyValue(e, file.charset))
        m += kw -> VrConvert.convert(e, file.charset)
    }
    m += LineageBucket -> DStr(bucket)
    m += LineageRegion -> DStr(region)
    m += LineageKey -> DStr(key)
    m += LineageArchivePath -> DStr(archivePath)
    if (!m.contains(PartitionColCamel))
      m += PartitionColCamel -> DDate(DefaultPartitionDate)
    m
  }
}
