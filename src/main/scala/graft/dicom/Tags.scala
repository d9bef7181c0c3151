package graft.dicom

/** Static DICOM tag dictionary: keyword, VR, and max value-multiplicity.
  *
  * The reference derives array-ness from pydicom's data dictionary —
  * `validate_vm` looks up max VM and returns a list whenever max VM > 1
  * (`src/utils/tags.py:115-141`). We compile the same rule into a static
  * table (standard DICOM part 6 data; public knowledge). Tags absent from
  * this dictionary have no keyword → they are skipped at flatten time,
  * exactly like pydicom-unknown tags in the reference
  * (`src/dicomwrapper.py:42-47`).
  *
  * `vmMax` is `Int.MaxValue` for "n" multiplicities.
  */
object Tags {

  final case class TagInfo(keyword: String, vr: String, vmMax: Int)

  private val N = Int.MaxValue

  @inline def key(group: Int, elem: Int): Int = (group << 16) | (elem & 0xffff)

  /** Bulk PS3.6 dictionary, generated from the public DICOM standard
    * Part 6 into `resources/graft/dicom/ps36_tags.txt` (one line per
    * element: `TAG KEYWORD VR VMMAX`). The reference resolves ANY
    * standard keyword through pydicom's full data dictionary
    * (`src/utils/tags.py:115-141`, `src/dicomwrapper.py:39-47`); a
    * curated-only table made uncommon-but-standard tags (RT,
    * ophthalmology, SR, print, waveform groups) silently vanish from
    * the output schema. Loaded once at class init (~3k entries, a few
    * ms); [[curated]] entries override on conflict so the quirk-pinned
    * subset can never drift under a regenerated resource. */
  private def loadPs36(): Map[Int, TagInfo] = {
    val in = getClass.getResourceAsStream("/graft/dicom/ps36_tags.txt")
    require(in != null, "graft/dicom/ps36_tags.txt missing from classpath")
    val src = scala.io.Source.fromInputStream(in, "UTF-8")
    try {
      src.getLines()
        .map(_.trim)
        .filter(l => l.nonEmpty && !l.startsWith("#"))
        .map { l =>
          val parts = l.split(" ")
          require(parts.length == 4, s"malformed ps36_tags.txt line: $l")
          val vmMax = if (parts(3) == "n") N else parts(3).toInt
          java.lang.Long.parseLong(parts(0), 16).toInt ->
            TagInfo(parts(1), parts(2), vmMax)
        }
        .toMap
    } finally src.close()
  }

  /** Curated subset with quirk pins (golden-tested); wins over the bulk
    * resource on conflict. Standard data elements (DICOM PS3.6). */
  private val curated: Map[Int, TagInfo] = Map(
    // file meta (group 0002)
    key(0x0002, 0x0000) -> TagInfo("FileMetaInformationGroupLength", "UL", 1),
    key(0x0002, 0x0001) -> TagInfo("FileMetaInformationVersion", "OB", 1),
    key(0x0002, 0x0002) -> TagInfo("MediaStorageSOPClassUID", "UI", 1),
    key(0x0002, 0x0003) -> TagInfo("MediaStorageSOPInstanceUID", "UI", 1),
    key(0x0002, 0x0010) -> TagInfo("TransferSyntaxUID", "UI", 1),
    key(0x0002, 0x0012) -> TagInfo("ImplementationClassUID", "UI", 1),
    key(0x0002, 0x0013) -> TagInfo("ImplementationVersionName", "SH", 1),
    // group 0008
    key(0x0008, 0x0005) -> TagInfo("SpecificCharacterSet", "CS", N),
    key(0x0008, 0x0008) -> TagInfo("ImageType", "CS", N),
    key(0x0008, 0x0012) -> TagInfo("InstanceCreationDate", "DA", 1),
    key(0x0008, 0x0013) -> TagInfo("InstanceCreationTime", "TM", 1),
    key(0x0008, 0x0014) -> TagInfo("InstanceCreatorUID", "UI", 1),
    key(0x0008, 0x0016) -> TagInfo("SOPClassUID", "UI", 1),
    key(0x0008, 0x0018) -> TagInfo("SOPInstanceUID", "UI", 1),
    key(0x0008, 0x0020) -> TagInfo("StudyDate", "DA", 1),
    key(0x0008, 0x0021) -> TagInfo("SeriesDate", "DA", 1),
    key(0x0008, 0x0022) -> TagInfo("AcquisitionDate", "DA", 1),
    key(0x0008, 0x0023) -> TagInfo("ContentDate", "DA", 1),
    key(0x0008, 0x002a) -> TagInfo("AcquisitionDateTime", "DT", 1),
    key(0x0008, 0x0030) -> TagInfo("StudyTime", "TM", 1),
    key(0x0008, 0x0031) -> TagInfo("SeriesTime", "TM", 1),
    key(0x0008, 0x0032) -> TagInfo("AcquisitionTime", "TM", 1),
    key(0x0008, 0x0033) -> TagInfo("ContentTime", "TM", 1),
    key(0x0008, 0x0050) -> TagInfo("AccessionNumber", "SH", 1),
    key(0x0008, 0x0060) -> TagInfo("Modality", "CS", 1),
    key(0x0008, 0x0064) -> TagInfo("ConversionType", "CS", 1),
    key(0x0008, 0x0070) -> TagInfo("Manufacturer", "LO", 1),
    key(0x0008, 0x0080) -> TagInfo("InstitutionName", "LO", 1),
    key(0x0008, 0x0081) -> TagInfo("InstitutionAddress", "ST", 1),
    key(0x0008, 0x0090) -> TagInfo("ReferringPhysicianName", "PN", 1),
    key(0x0008, 0x1010) -> TagInfo("StationName", "SH", 1),
    key(0x0008, 0x1030) -> TagInfo("StudyDescription", "LO", 1),
    key(0x0008, 0x103e) -> TagInfo("SeriesDescription", "LO", 1),
    key(0x0008, 0x1040) -> TagInfo("InstitutionalDepartmentName", "LO", 1),
    key(0x0008, 0x1048) -> TagInfo("PhysiciansOfRecord", "PN", N),
    key(0x0008, 0x1050) -> TagInfo("PerformingPhysicianName", "PN", N),
    key(0x0008, 0x1060) -> TagInfo("NameOfPhysiciansReadingStudy", "PN", N),
    key(0x0008, 0x1070) -> TagInfo("OperatorsName", "PN", N),
    key(0x0008, 0x1090) -> TagInfo("ManufacturerModelName", "LO", 1),
    key(0x0008, 0x1110) -> TagInfo("ReferencedStudySequence", "SQ", 1),
    key(0x0008, 0x1140) -> TagInfo("ReferencedImageSequence", "SQ", 1),
    key(0x0008, 0x1150) -> TagInfo("ReferencedSOPClassUID", "UI", 1),
    key(0x0008, 0x1155) -> TagInfo("ReferencedSOPInstanceUID", "UI", 1),
    key(0x0008, 0x2111) -> TagInfo("DerivationDescription", "ST", 1),
    // group 0010
    key(0x0010, 0x0010) -> TagInfo("PatientName", "PN", 1),
    key(0x0010, 0x0020) -> TagInfo("PatientID", "LO", 1),
    key(0x0010, 0x0021) -> TagInfo("IssuerOfPatientID", "LO", 1),
    key(0x0010, 0x0030) -> TagInfo("PatientBirthDate", "DA", 1),
    key(0x0010, 0x0032) -> TagInfo("PatientBirthTime", "TM", 1),
    key(0x0010, 0x0040) -> TagInfo("PatientSex", "CS", 1),
    key(0x0010, 0x1000) -> TagInfo("OtherPatientIDs", "LO", N),
    key(0x0010, 0x1001) -> TagInfo("OtherPatientNames", "PN", N),
    key(0x0010, 0x1010) -> TagInfo("PatientAge", "AS", 1),
    key(0x0010, 0x1020) -> TagInfo("PatientSize", "DS", 1),
    key(0x0010, 0x1030) -> TagInfo("PatientWeight", "DS", 1),
    key(0x0010, 0x2160) -> TagInfo("EthnicGroup", "SH", 1),
    key(0x0010, 0x21b0) -> TagInfo("AdditionalPatientHistory", "LT", 1),
    key(0x0010, 0x4000) -> TagInfo("PatientComments", "LT", 1),
    // group 0018
    key(0x0018, 0x0015) -> TagInfo("BodyPartExamined", "CS", 1),
    key(0x0018, 0x0020) -> TagInfo("ScanningSequence", "CS", N),
    key(0x0018, 0x0021) -> TagInfo("SequenceVariant", "CS", N),
    key(0x0018, 0x0022) -> TagInfo("ScanOptions", "CS", N),
    key(0x0018, 0x0023) -> TagInfo("MRAcquisitionType", "CS", 1),
    key(0x0018, 0x0050) -> TagInfo("SliceThickness", "DS", 1),
    key(0x0018, 0x0060) -> TagInfo("KVP", "DS", 1),
    key(0x0018, 0x0088) -> TagInfo("SpacingBetweenSlices", "DS", 1),
    key(0x0018, 0x1000) -> TagInfo("DeviceSerialNumber", "LO", 1),
    key(0x0018, 0x1020) -> TagInfo("SoftwareVersions", "LO", N),
    key(0x0018, 0x1030) -> TagInfo("ProtocolName", "LO", 1),
    key(0x0018, 0x1151) -> TagInfo("XRayTubeCurrent", "IS", 1),
    key(0x0018, 0x5100) -> TagInfo("PatientPosition", "CS", 1),
    // group 0020
    key(0x0020, 0x000d) -> TagInfo("StudyInstanceUID", "UI", 1),
    key(0x0020, 0x000e) -> TagInfo("SeriesInstanceUID", "UI", 1),
    key(0x0020, 0x0010) -> TagInfo("StudyID", "SH", 1),
    key(0x0020, 0x0011) -> TagInfo("SeriesNumber", "IS", 1),
    key(0x0020, 0x0012) -> TagInfo("AcquisitionNumber", "IS", 1),
    key(0x0020, 0x0013) -> TagInfo("InstanceNumber", "IS", 1),
    key(0x0020, 0x0020) -> TagInfo("PatientOrientation", "CS", 2),
    key(0x0020, 0x0032) -> TagInfo("ImagePositionPatient", "DS", 3),
    key(0x0020, 0x0037) -> TagInfo("ImageOrientationPatient", "DS", 6),
    key(0x0020, 0x0052) -> TagInfo("FrameOfReferenceUID", "UI", 1),
    key(0x0020, 0x0060) -> TagInfo("Laterality", "CS", 1),
    key(0x0020, 0x1041) -> TagInfo("SliceLocation", "DS", 1),
    key(0x0020, 0x4000) -> TagInfo("ImageComments", "LT", 1),
    // group 0028
    key(0x0028, 0x0002) -> TagInfo("SamplesPerPixel", "US", 1),
    key(0x0028, 0x0004) -> TagInfo("PhotometricInterpretation", "CS", 1),
    key(0x0028, 0x0006) -> TagInfo("PlanarConfiguration", "US", 1),
    key(0x0028, 0x0008) -> TagInfo("NumberOfFrames", "IS", 1),
    key(0x0028, 0x0010) -> TagInfo("Rows", "US", 1),
    key(0x0028, 0x0011) -> TagInfo("Columns", "US", 1),
    key(0x0028, 0x0030) -> TagInfo("PixelSpacing", "DS", 2),
    key(0x0028, 0x0100) -> TagInfo("BitsAllocated", "US", 1),
    key(0x0028, 0x0101) -> TagInfo("BitsStored", "US", 1),
    key(0x0028, 0x0102) -> TagInfo("HighBit", "US", 1),
    key(0x0028, 0x0103) -> TagInfo("PixelRepresentation", "US", 1),
    key(0x0028, 0x0106) -> TagInfo("SmallestImagePixelValue", "US", 1),
    key(0x0028, 0x0107) -> TagInfo("LargestImagePixelValue", "US", 1),
    key(0x0028, 0x1050) -> TagInfo("WindowCenter", "DS", N),
    key(0x0028, 0x1051) -> TagInfo("WindowWidth", "DS", N),
    key(0x0028, 0x1052) -> TagInfo("RescaleIntercept", "DS", 1),
    key(0x0028, 0x1053) -> TagInfo("RescaleSlope", "DS", 1),
    key(0x0028, 0x2110) -> TagInfo("LossyImageCompression", "CS", 1),
    // group 0008 (additional SOP-common / acquisition context)
    key(0x0008, 0x0000) -> TagInfo("", "UL", 1), // group length, keyword-less
    key(0x0008, 0x0052) -> TagInfo("QueryRetrieveLevel", "CS", 1),
    key(0x0008, 0x0061) -> TagInfo("ModalitiesInStudy", "CS", N),
    key(0x0008, 0x0068) -> TagInfo("PresentationIntentType", "CS", 1),
    key(0x0008, 0x0201) -> TagInfo("TimezoneOffsetFromUTC", "SH", 1),
    key(0x0008, 0x1032) -> TagInfo("ProcedureCodeSequence", "SQ", 1),
    key(0x0008, 0x1111) -> TagInfo("ReferencedPerformedProcedureStepSequence", "SQ", 1),
    key(0x0008, 0x1120) -> TagInfo("ReferencedPatientSequence", "SQ", 1),
    key(0x0008, 0x2112) -> TagInfo("SourceImageSequence", "SQ", 1),
    key(0x0008, 0x0100) -> TagInfo("CodeValue", "SH", 1),
    key(0x0008, 0x0102) -> TagInfo("CodingSchemeDesignator", "SH", 1),
    key(0x0008, 0x0104) -> TagInfo("CodeMeaning", "LO", 1),
    // group 0018 (CT/MR/US acquisition)
    key(0x0018, 0x0010) -> TagInfo("ContrastBolusAgent", "LO", 1),
    key(0x0018, 0x0024) -> TagInfo("SequenceName", "SH", 1),
    key(0x0018, 0x0025) -> TagInfo("AngioFlag", "CS", 1),
    key(0x0018, 0x0080) -> TagInfo("RepetitionTime", "DS", 1),
    key(0x0018, 0x0081) -> TagInfo("EchoTime", "DS", 1),
    key(0x0018, 0x0082) -> TagInfo("InversionTime", "DS", 1),
    key(0x0018, 0x0083) -> TagInfo("NumberOfAverages", "DS", 1),
    key(0x0018, 0x0084) -> TagInfo("ImagingFrequency", "DS", 1),
    key(0x0018, 0x0085) -> TagInfo("ImagedNucleus", "SH", 1),
    key(0x0018, 0x0086) -> TagInfo("EchoNumbers", "IS", N),
    key(0x0018, 0x0087) -> TagInfo("MagneticFieldStrength", "DS", 1),
    key(0x0018, 0x0091) -> TagInfo("EchoTrainLength", "IS", 1),
    key(0x0018, 0x0095) -> TagInfo("PixelBandwidth", "DS", 1),
    key(0x0018, 0x1100) -> TagInfo("ReconstructionDiameter", "DS", 1),
    key(0x0018, 0x1110) -> TagInfo("DistanceSourceToDetector", "DS", 1),
    key(0x0018, 0x1111) -> TagInfo("DistanceSourceToPatient", "DS", 1),
    key(0x0018, 0x1120) -> TagInfo("GantryDetectorTilt", "DS", 1),
    key(0x0018, 0x1130) -> TagInfo("TableHeight", "DS", 1),
    key(0x0018, 0x1140) -> TagInfo("RotationDirection", "CS", 1),
    key(0x0018, 0x1150) -> TagInfo("ExposureTime", "IS", 1),
    key(0x0018, 0x1152) -> TagInfo("Exposure", "IS", 1),
    key(0x0018, 0x1160) -> TagInfo("FilterType", "SH", 1),
    key(0x0018, 0x1170) -> TagInfo("GeneratorPower", "IS", 1),
    key(0x0018, 0x1190) -> TagInfo("FocalSpots", "DS", N),
    key(0x0018, 0x1200) -> TagInfo("DateOfLastCalibration", "DA", N),
    key(0x0018, 0x1201) -> TagInfo("TimeOfLastCalibration", "TM", N),
    key(0x0018, 0x1210) -> TagInfo("ConvolutionKernel", "SH", N),
    key(0x0018, 0x1310) -> TagInfo("AcquisitionMatrix", "US", 4),
    key(0x0018, 0x1312) -> TagInfo("InPlanePhaseEncodingDirection", "CS", 1),
    key(0x0018, 0x1314) -> TagInfo("FlipAngle", "DS", 1),
    key(0x0018, 0x1315) -> TagInfo("VariableFlipAngleFlag", "CS", 1),
    key(0x0018, 0x1316) -> TagInfo("SAR", "DS", 1),
    key(0x0018, 0x5101) -> TagInfo("ViewPosition", "CS", 1),
    // group 0020 (additional image-plane / relationship)
    key(0x0020, 0x0062) -> TagInfo("ImageLaterality", "CS", 1),
    key(0x0020, 0x0100) -> TagInfo("TemporalPositionIdentifier", "IS", 1),
    key(0x0020, 0x0105) -> TagInfo("NumberOfTemporalPositions", "IS", 1),
    key(0x0020, 0x1002) -> TagInfo("ImagesInAcquisition", "IS", 1),
    key(0x0020, 0x1040) -> TagInfo("PositionReferenceIndicator", "LO", 1),
    // group 0028 (additional image pixel / VOI LUT)
    key(0x0028, 0x0034) -> TagInfo("PixelAspectRatio", "IS", 2),
    key(0x0028, 0x0120) -> TagInfo("PixelPaddingValue", "US", 1),
    key(0x0028, 0x0301) -> TagInfo("BurnedInAnnotation", "CS", 1),
    key(0x0028, 0x1054) -> TagInfo("RescaleType", "LO", 1),
    key(0x0028, 0x1055) -> TagInfo("WindowCenterWidthExplanation", "LO", N),
    key(0x0028, 0x2112) -> TagInfo("LossyImageCompressionRatio", "DS", N),
    key(0x0028, 0x2114) -> TagInfo("LossyImageCompressionMethod", "CS", N),
    // group 0032 / 0040 (study/procedure)
    key(0x0032, 0x000a) -> TagInfo("StudyStatusID", "CS", 1),
    key(0x0032, 0x1032) -> TagInfo("RequestingPhysician", "PN", 1),
    key(0x0032, 0x1033) -> TagInfo("RequestingService", "LO", 1),
    key(0x0032, 0x1060) -> TagInfo("RequestedProcedureDescription", "LO", 1),
    key(0x0040, 0x0241) -> TagInfo("PerformedStationAETitle", "AE", 1),
    key(0x0040, 0x0244) -> TagInfo("PerformedProcedureStepStartDate", "DA", 1),
    key(0x0040, 0x0245) -> TagInfo("PerformedProcedureStepStartTime", "TM", 1),
    key(0x0040, 0x0250) -> TagInfo("PerformedProcedureStepEndDate", "DA", 1),
    key(0x0040, 0x0251) -> TagInfo("PerformedProcedureStepEndTime", "TM", 1),
    key(0x0040, 0x0253) -> TagInfo("PerformedProcedureStepID", "SH", 1),
    key(0x0040, 0x0254) -> TagInfo("PerformedProcedureStepDescription", "LO", 1),
    key(0x0040, 0x0260) -> TagInfo("PerformedProtocolCodeSequence", "SQ", 1),
    key(0x0040, 0x0275) -> TagInfo("RequestAttributesSequence", "SQ", 1),
    key(0x0040, 0x1001) -> TagInfo("RequestedProcedureID", "SH", 1),
    key(0x0040, 0xa124) -> TagInfo("UID", "UI", 1),
    // group 0054 (PET / NM)
    key(0x0054, 0x0081) -> TagInfo("NumberOfSlices", "US", 1),
    key(0x0054, 0x1000) -> TagInfo("SeriesType", "CS", 2),
    key(0x0054, 0x1001) -> TagInfo("Units", "CS", 1),
    // pixel data (stop markers; never materialized)
    key(0x7fe0, 0x0008) -> TagInfo("FloatPixelData", "OF", 1),
    key(0x7fe0, 0x0009) -> TagInfo("DoubleFloatPixelData", "OD", 1),
    key(0x7fe0, 0x0010) -> TagInfo("PixelData", "OW", 1),
  )

  /** (group, element) → TagInfo: the full PS3.6 table with curated
    * quirk-pinned entries layered on top. */
  val dict: Map[Int, TagInfo] = loadPs36() ++ curated

  /** keyword → TagInfo (for typing collected column sets). Keywords are
    * unique in PS3.6 (the generator enforces it); the keyword-less
    * group-length entry maps under "" and is never a column. */
  val byKeyword: Map[String, TagInfo] =
    dict.values.map(t => t.keyword -> t).toMap

  def lookup(group: Int, elem: Int): Option[TagInfo] = dict.get(key(group, elem))

  /** CamelCase keyword → snake_case column name, reproducing the
    * wrangler `sanitize_columns=True` rename the reference relies on
    * (`src/app.py:50`): an underscore is inserted before an uppercase
    * letter only when the previous character is a lowercase letter or a
    * digit, then everything is lowercased. SOPClassUID → sopclass_uid,
    * PatientBirthDate → patient_birth_date, SOURCE_S3_BUCKET →
    * source_s3_bucket (pinned by FIXTURES.md §1). */
  def snakeCase(name: String): String = {
    val sb = new StringBuilder
    var prev: Char = 0
    name.foreach { c =>
      if (c.isUpper && (prev.isLower || prev.isDigit)) sb.append('_')
      sb.append(c.toLower)
      prev = c
    }
    sb.toString
  }

  /** snake_case → CamelCase, reproducing `dcmfile.convert_cc`
    * (`src/dicomwrapper.py:69-73`): split on '_', capitalize each part.
    * study_date → StudyDate. */
  def camelCase(name: String): String =
    name.split("_").map(_.capitalize).mkString
}
