package graft

import org.apache.spark.sql.SparkSession

/** EXTRACTION DECADE — the extraction tier at the sf10 convention
  * (VERDICT r12 #5): ~10× ExtractionRehearsal's corpus through the
  * MANIFEST entry point (the 10M+-object route — the driver never
  * lists; the inventory is produced by the generator itself, which is
  * exactly how object-store inventories exist in production), answering
  * three questions with recorded numbers:
  *
  *  1. per-object extraction cost FLAT in object count — the same run
  *     measures a 1/10th subset and the full decade corpus and compares
  *     sec/object (JIT warmed before both);
  *  2. driver memory O(1) in object count — the manifest route's only
  *     driver-side materialization is two scalar aggregates sizing the
  *     task layout (`DicomPipeline.extractFromManifest`), so used heap
  *     after the decade extraction must not scale with the corpus:
  *     recorded before/after, gated against a fixed budget far below
  *     what any per-object driver state would cost (120k objects × even
  *     100 bytes of driver state would blow it);
  *  3. day-2 delta cost ∝ delta at the decade — the discriminating gate
  *     is CORPUS-SIZE INVARIANCE (the synthetic per-object cost is so
  *     low that a fixed ~2 s job constant dominates any ratio gate):
  *     the same ~1k-object delta extracted against the full manifest
  *     and against a 10× smaller one must cost the same, because the
  *     anti-join is metadata-only and only object work scales.
  *
  * Test scope because fixture generation rides [[DicomWriter]].
  * Run: SPARK_GRAFT_CPUS=32 sbt "Test/runMain graft.ExtractionDecade"
  * Output: one JSON line + target/sf10_rehearsal_extract.json
  * (the extraction tier's section at the decade, next to
  * target/sf10_rehearsal.json's dedup/retrieval sections). */
object ExtractionDecade {

  private val Modalities = Array("CT", "MR", "US", "CR", "DX")

  private def dcmBytes(i: Int): Array[Byte] = {
    val w = 32; val h = 24
    val px = Array.tabulate(w * h)(j => ((i * 31 + j * 7) % 251).toByte)
    DicomWriter.file(Seq(
      DicomWriter.strElement(0x0008, 0x0020, "DA", f"202402${i % 28 + 1}%02d"),
      DicomWriter.strElement(0x0008, 0x0060, "CS", Modalities(i % Modalities.length)),
      DicomWriter.strElement(0x0010, 0x0010, "PN", s"Family$i^Given$i"),
      DicomWriter.strElement(0x0010, 0x0020, "LO", f"P$i%06d"),
      DicomWriter.strElement(0x0020, 0x000d, "UI", s"1.2.3.$i"),
      DicomWriter.usElement(0x0028, 0x0002, 1),
      DicomWriter.usElement(0x0028, 0x0010, h),
      DicomWriter.usElement(0x0028, 0x0011, w),
      DicomWriter.usElement(0x0028, 0x0100, 8),
      DicomWriter.element(0x7fe0, 0x0010, "OB", px)))
  }

  private def usedHeapMB(): Double = {
    System.gc(); Thread.sleep(200); System.gc()
    val rt = Runtime.getRuntime
    (rt.totalMemory() - rt.freeMemory()) / 1048576.0
  }

  def main(args: Array[String]): Unit = {
    val nLoose = sys.env.getOrElse("SPARK_GRAFT_DECADE_LOOSE", "100000").toInt
    val nZips = sys.env.getOrElse("SPARK_GRAFT_DECADE_ZIPS", "5000").toInt
    val perZip = 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val scratch = graft.util.Fs.scratchDir(spark, "extraction_decade")
    val input = scratch.resolve("input")
    graft.util.Fs.deleteRecursively(input)
    java.nio.file.Files.createDirectories(input)

    // --- generate corpus + its inventory IN ONE PASS (no listing ever:
    // the writer knows every path and length, like a store inventory) ---
    System.err.println(s"[decade] generating $nLoose loose + $nZips zips ...")
    val tGen0 = System.nanoTime()
    val inventory = new java.util.concurrent.ConcurrentLinkedQueue[(String, Long)]()
    val pool = java.util.concurrent.Executors.newFixedThreadPool(16)
    try {
      val tasks = new java.util.ArrayList[java.util.concurrent.Callable[Unit]]()
      (0 until nLoose).foreach { i =>
        tasks.add(() => {
          val bytes = dcmBytes(i)
          val p = input.resolve(f"loose-$i%06d.dcm")
          java.nio.file.Files.write(p, bytes)
          inventory.add((p.toUri.toString.stripSuffix("/"), bytes.length.toLong))
          ()
        })
      }
      (0 until nZips).foreach { z =>
        tasks.add(() => {
          val bo = new java.io.ByteArrayOutputStream()
          val zo = new java.util.zip.ZipOutputStream(bo)
          (0 until perZip).foreach { j =>
            zo.putNextEntry(new java.util.zip.ZipEntry(f"member-$j.dcm"))
            zo.write(dcmBytes(nLoose + z * perZip + j))
            zo.closeEntry()
          }
          zo.close()
          val p = input.resolve(f"archive-$z%05d.zip")
          java.nio.file.Files.write(p, bo.toByteArray)
          inventory.add((p.toUri.toString.stripSuffix("/"), bo.size().toLong))
          ()
        })
      }
      pool.invokeAll(tasks).forEach(_.get())
    } finally pool.shutdown()
    val genSec = (System.nanoTime() - tGen0) / 1e9
    import scala.jdk.CollectionConverters._
    val invRows = inventory.asScala.toSeq
    val nObjects = invRows.size
    val nImages = nLoose + nZips * perZip
    require(nObjects == nLoose + nZips, s"inventory incomplete: $nObjects")
    val manifestPq = scratch.resolve("manifest").toString
    invRows.toDF("path", "length").repartition(4)
      .write.mode("overwrite").parquet(manifestPq)
    System.err.println(f"[decade] generated $nObjects objects in $genSec%.1f s")

    def fmt(d: Double) = "%.3f".formatLocal(java.util.Locale.ROOT, d)
    val manifest = spark.read.parquet(manifestPq)

    def extractCount(m: org.apache.spark.sql.DataFrame): Long =
      graft.pipeline.DicomPipeline.extractFromManifest(
        spark, m, "decade", "local").rows.count()

    // JIT warm-up on a sliver, then the 1/10 subset, then the decade —
    // per-object flatness is subset-vs-decade on equal-warmth code
    import org.apache.spark.sql.functions.{abs, col, hash, lit, pmod}
    extractCount(manifest.filter(pmod(abs(hash(col("path"))), lit(100)) === 7))
    val subsetSel = pmod(abs(hash(col("path"))), lit(10)) === 3
    val nSubset = manifest.filter(subsetSel).count()
    val tSub0 = System.nanoTime()
    val subImages = extractCount(manifest.filter(subsetSel))
    val subSec = (System.nanoTime() - tSub0) / 1e9

    val heapBeforeMB = usedHeapMB()
    val tFull0 = System.nanoTime()
    val fullImages = extractCount(manifest)
    val fullSec = (System.nanoTime() - tFull0) / 1e9
    val heapAfterMB = usedHeapMB()
    require(fullImages == nImages,
      s"decade manifest extraction parity broke: $fullImages/$nImages images")

    val subPerObjMs = subSec * 1000 / nSubset
    val fullPerObjMs = fullSec * 1000 / nObjects
    System.err.println(
      f"[decade] subset  $nSubset%7d objects  ${fmt(subSec)}s  (${fmt(subPerObjMs)} ms/obj)")
    System.err.println(
      f"[decade] decade  $nObjects%7d objects  ${fmt(fullSec)}s  (${fmt(fullPerObjMs)} ms/obj, " +
        f"${fmt(nObjects / fullSec)} obj/s, ${fmt(nImages / fullSec)} img/s)")
    System.err.println(
      f"[decade] driver heap ${fmt(heapBeforeMB)} -> ${fmt(heapAfterMB)} MB")
    require(fullPerObjMs < 2.0 * subPerObjMs,
      f"per-object cost not flat: $subPerObjMs%.3f ms/obj at 1/10 vs " +
        f"$fullPerObjMs%.3f ms/obj at the decade")
    // O(1)-in-objects driver: allow a fixed budget (GC slack + plan
    // state), far below any per-object accumulation signature
    require(heapAfterMB - heapBeforeMB < 512,
      f"driver heap grew ${heapAfterMB - heapBeforeMB}%.0f MB over the decade extraction")

    // --- day-2 delta at the decade: ~1% new objects. The synthetic
    // objects are so cheap (0.03 ms/obj above) that a fixed per-run job
    // constant (~2 s of scheduling + the metadata anti-join) dominates
    // ANY ratio against the 3-4 s full extraction — so the gate that
    // actually discriminates O(delta) from O(corpus) is CORPUS-SIZE
    // INVARIANCE: extracting the SAME ~1k-object delta against the full
    // 105k-row manifest and against a 10× smaller one must cost the
    // same (the anti-join is metadata-only; only object work scales).
    val isDelta = pmod(abs(hash(col("path"))), lit(100)) === 0
    val nDelta = manifest.filter(isDelta).count()
    def timeDelta(corpus: org.apache.spark.sql.DataFrame): (Long, Double) = {
      val processed = corpus.filter(!isDelta)
      val t0 = System.nanoTime()
      val imgs = extractCount(
        graft.pipeline.DicomPipeline.manifestDelta(corpus, processed))
      (imgs, (System.nanoTime() - t0) / 1e9)
    }
    val (deltaImages, deltaSec) = timeDelta(manifest)
    val smallCorpus = manifest.filter(subsetSel || isDelta)
    val nSmall = smallCorpus.count()
    val (deltaImagesSmall, deltaSecSmall) = timeDelta(smallCorpus)
    System.err.println(
      f"[decade] delta   $nDelta%7d objects  vs $nObjects%7d-manifest ${fmt(deltaSec)}s, " +
        f"vs $nSmall%7d-manifest ${fmt(deltaSecSmall)}s " +
        f"(${fmt(deltaSec * 1000 / nDelta)} ms/obj incl. anti-join)")
    require(deltaImages > 0 && deltaImages == deltaImagesSmall &&
      nDelta < nObjects / 50,
      s"delta construction drifted: $nDelta of $nObjects, " +
        s"$deltaImages vs $deltaImagesSmall images")
    // corpus-size invariance: a 10× manifest may only move the delta run
    // by noise (0.5× + 1 s grace), never by anything corpus-shaped
    require(deltaSec < 1.5 * deltaSecSmall + 1.0,
      f"delta cost scaled with the corpus, not the delta: " +
        f"$deltaSec%.2f s vs $deltaSecSmall%.2f s on a 10x smaller manifest")
    // NO delta-vs-full ratio gate on purpose: at 0.02-0.03 ms/obj the
    // whole 105k-object extraction costs ~2 s — the same order as one
    // run's fixed job constant — so delta/full ratios measure scheduling
    // constants, not scaling. The invariance gate above plus the
    // per-object flatness gate carry the scale claim; real corpora pay
    // real per-object costs and the constant vanishes into them.

    val json =
      s"""{"metric":"sf10_rehearsal_extract","extract10":{""" +
      s""""objects":$nObjects,"images":$nImages,"gen_sec":${fmt(genSec)},""" +
      s""""subset_objects":$nSubset,"subset_sec":${fmt(subSec)},""" +
      s""""subset_ms_per_obj":${fmt(subPerObjMs)},""" +
      s""""decade_sec":${fmt(fullSec)},"decade_ms_per_obj":${fmt(fullPerObjMs)},""" +
      s""""objects_per_sec":${fmt(nObjects / fullSec)},""" +
      s""""images_per_sec":${fmt(nImages / fullSec)},""" +
      s""""driver_heap_before_mb":${fmt(heapBeforeMB)},""" +
      s""""driver_heap_after_mb":${fmt(heapAfterMB)},""" +
      s""""delta_objects":$nDelta,"delta_images":$deltaImages,""" +
      s""""delta_sec":${fmt(deltaSec)},""" +
      s""""delta_sec_vs_small_manifest":${fmt(deltaSecSmall)},""" +
      s""""small_manifest_objects":$nSmall}}"""
    println(json)
    val outPath = java.nio.file.Paths.get("target", "sf10_rehearsal_extract.json")
    java.nio.file.Files.createDirectories(outPath.getParent)
    java.nio.file.Files.write(outPath,
      (json + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    graft.util.Fs.deleteRecursively(input)
    spark.stop()
  }
}
