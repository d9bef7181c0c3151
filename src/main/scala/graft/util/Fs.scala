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

  // ONE JVM-wide shutdown hook sweeping every registered scratch path —
  // a long-lived process touching many corpus dirs accumulates paths in
  // this set, not hooks in the runtime (each registered hook is a whole
  // unstarted Thread held for the life of the JVM).
  private lazy val sweepOnExit = {
    val set = java.util.concurrent.ConcurrentHashMap.newKeySet[Path]()
    sys.addShutdownHook(set.forEach(p => deleteRecursively(p)))
    set
  }

  /** Register `p` for recursive deletion at JVM shutdown. */
  def deleteOnExit(p: Path): Unit = sweepOnExit.add(p)
}
