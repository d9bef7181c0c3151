package graft.util

import org.apache.spark.sql.SparkSession

/** Measurement helpers shared by the scale rehearsals
  * ([[graft.ScaleRehearsal]], [[graft.Sf10Rehearsal]]) — extracted so
  * the sf10 decade measures its tiers with the same listener mechanics
  * as the sf1 run. */
object Metrics {

  /** (result, input bytes read, shuffle bytes written) over the block —
    * shuffle write is the axis the index-side bloom runtime filter
    * moves: pruned index rows never reach the candidate exchange. */
  def bytesReadDuring[A](spark: SparkSession)(f: => A): (A, Long, Long) = {
    val acc = new java.util.concurrent.atomic.AtomicLong(0L)
    val shuf = new java.util.concurrent.atomic.AtomicLong(0L)
    val events = new java.util.concurrent.atomic.AtomicLong(0L)
    val l = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val m = te.taskMetrics
        if (m != null) {
          acc.addAndGet(m.inputMetrics.bytesRead)
          shuf.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        }
        events.incrementAndGet()
      }
    }
    spark.sparkContext.addSparkListener(l)
    try {
      val r = f
      // the listener bus is async — poll until the EVENT COUNT
      // stabilizes. Input bytes alone would be the wrong sentinel:
      // shuffle-writing reduce-stage tasks read no file input, so
      // their late events move only `shuf` and a bytes-based loop
      // could exit while they are still queued, under-reporting the
      // shuffle column the bloom A/B is built from
      var prev = -1L; var cur = events.get(); var spins = 0
      while (prev != cur && spins < 40) {
        Thread.sleep(250); prev = cur; cur = events.get(); spins += 1
      }
      (r, acc.get(), shuf.get())
    } finally spark.sparkContext.removeSparkListener(l)
  }

  /** Total regular-file bytes under `p` (0 when absent). */
  def diskBytes(p: String): Long = {
    val root = java.nio.file.Paths.get(p)
    if (!java.nio.file.Files.exists(root)) 0L
    else {
      val w = java.nio.file.Files.walk(root)
      try {
        var sum = 0L
        val it = w.iterator()
        while (it.hasNext) {
          val f = it.next()
          if (java.nio.file.Files.isRegularFile(f)) sum += java.nio.file.Files.size(f)
        }
        sum
      } finally w.close()
    }
  }
}
