package graft.util

import java.nio.file.{Files, Path}

/** Tiny filesystem helpers shared by the scratch-managing code paths
  * (streaming drains, fixture staging, tests). */
object Fs {

  /** Engine scratch root: `spark.graft.scratchDir` (default `target/`,
    * resolved against the working directory) — no baked-in checkout
    * location, so the engine runs from any deployment path. */
  def scratchDir(s: org.apache.spark.sql.SparkSession, sub: String): Path = {
    val base = java.nio.file.Paths.get(
      s.conf.get("spark.graft.scratchDir", "target")).toAbsolutePath.resolve(sub)
    Files.createDirectories(base)
    base
  }

  /** Delete `p` and everything under it; no-op when absent. */
  def deleteRecursively(p: Path): Unit =
    if (Files.exists(p))
      Files.walk(p)
        .sorted(java.util.Comparator.reverseOrder[Path]())
        .forEach(f => Files.deleteIfExists(f))
}
