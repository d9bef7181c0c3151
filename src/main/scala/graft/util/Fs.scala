package graft.util

import java.nio.file.{Files, Path}

/** Tiny filesystem helpers shared by the scratch-managing code paths
  * (streaming drains, fixture staging, tests). */
object Fs {

  /** Delete `p` and everything under it; no-op when absent. */
  def deleteRecursively(p: Path): Unit =
    if (Files.exists(p))
      Files.walk(p)
        .sorted(java.util.Comparator.reverseOrder[Path]())
        .forEach(f => Files.deleteIfExists(f))
}
