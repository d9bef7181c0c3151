package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** TEMPORARY r17 diagnostic — phase-level wall-clock decomposition of the
  * expensive queries (guide §1: measure first), mirroring the operators'
  * internal pipelines step by step so each stage's cost is attributable.
  * Not a declared query; removed (or kept as a dev tool) at round close.
  * Usage: runMain graft.Probe [sfDir] [probe ...]
  */
object Probe {
  private def t[A](name: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[probe] $name%-40s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
    r
  }

  /** Per-stage task-metric rollup printed after each phase. */
  private class StageStats extends org.apache.spark.scheduler.SparkListener {
    case class S(var name: String = "", var tasks: Int = 0, var run: Long = 0,
                 var gc: Long = 0, var swBytes: Long = 0, var swTime: Long = 0,
                 var srBytes: Long = 0, var fetchWait: Long = 0,
                 var spillMem: Long = 0, var spillDisk: Long = 0,
                 var cpu: Long = 0, var deser: Long = 0, var resSer: Long = 0)
    val stages = new java.util.concurrent.ConcurrentHashMap[Int, S]()
    override def onStageSubmitted(e: org.apache.spark.scheduler.SparkListenerStageSubmitted): Unit = {
      val s = stages.computeIfAbsent(e.stageInfo.stageId, _ => S())
      s.name = e.stageInfo.name.takeWhile(_ != '\n').take(60)
    }
    override def onTaskEnd(e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
      val m = e.taskMetrics
      if (m != null) {
        val s = stages.computeIfAbsent(e.stageId, _ => S())
        s.tasks += 1; s.run += m.executorRunTime; s.gc += m.jvmGCTime
        s.cpu += m.executorCpuTime / 1000000
        s.deser += m.executorDeserializeTime; s.resSer += m.resultSerializationTime
        s.swBytes += m.shuffleWriteMetrics.bytesWritten
        s.swTime += m.shuffleWriteMetrics.writeTime / 1000000
        s.srBytes += m.shuffleReadMetrics.totalBytesRead
        s.fetchWait += m.shuffleReadMetrics.fetchWaitTime
        s.spillMem += m.memoryBytesSpilled; s.spillDisk += m.diskBytesSpilled
      }
    }
    def dumpAndReset(): Unit = {
      import scala.jdk.CollectionConverters._
      val snap = stages.asScala.toSeq.sortBy(_._1)
      stages.clear()
      snap.foreach { case (id, s) =>
        println(f"[stage] $id%4d ${s.name}%-60s tasks=${s.tasks}%3d run=${s.run}%6d cpu=${s.cpu}%6d gc=${s.gc}%5d swMB=${s.swBytes / 1048576}%5d swT=${s.swTime}%5d srMB=${s.srBytes / 1048576}%5d fw=${s.fetchWait}%5d spillMB=${(s.spillMem + s.spillDisk) / 1048576}%6d")
      }
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val which = if (args.length > 1) args.tail.toSet else Set("containment")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.streaming.forceDeleteTempCheckpointLocation", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    // warm-up
    spark.read.parquet(s"$sfDir/lineitem.parquet")
      .groupBy("l_returnflag").count().collect()

    graft.functions.VectorExpressions.register(spark)

    def h60(e: String): String =
      s"cast(conv(substring(md5($e), 1, 15), 16, 10) as bigint)"
    def docs: DataFrame = spark.read.parquet(s"$sfDir/documents.parquet")

    val stats = new StageStats
    if (which("stages")) spark.sparkContext.addSparkListener(stats)

    if (which("containment") || which("jaccard")) {
      for (pass <- 1 to (if (which("stages")) 1 else 3)) {
        println(s"--- pass $pass ---")
        // P1: word-set relation materialization (mirrors hashedWordSets+ckpt)
        val wsets = docs
          .repartition(spark.sparkContext.defaultParallelism)
          .select($"doc_id",
            expr("array_sort(array_distinct(transform(" +
                 "filter(split(text, ' '), x -> length(x) > 0), " +
                 s"x -> ${h60("x")})))").as("w_set"))
          .filter(size($"w_set") >= 1)
          .withColumn("n_w", size($"w_set").cast("long"))
        val d = t("P1 word-set ckpt+count") {
          val ck = wsets.localCheckpoint(); ck.count(); broadcast(ck)
        }
        // P2: ranked tokens ckpt
        val byTok = org.apache.spark.sql.expressions.Window.partitionBy($"w")
        val byDoc = org.apache.spark.sql.expressions.Window.partitionBy($"doc_id")
          .orderBy($"df", $"w")
        val rankedDf = d.select($"doc_id", $"n_w", explode($"w_set").as("w"))
          .withColumn("df", count(lit(1)).over(byTok))
          .withColumn("rk", row_number().over(byDoc))
          .select($"doc_id", $"n_w", $"w", $"rk")
        val ranked = t("P2 ranked ckpt+count") {
          val ck = rankedDf.localCheckpoint(); ck.count(); broadcast(ck)
        }
        if (which("containment")) {
          val prefixes = ranked.filter($"rk" <= expr("n_w - (n_w * 9 + 9) div 10 + 1"))
          val cand = prefixes.as("pa").join(ranked.as("pb"),
              $"pa.w" === $"pb.w" && $"pa.doc_id" =!= $"pb.doc_id" &&
              $"pa.n_w" < $"pb.n_w" &&
              lit(10) * (lit(1) + least($"pa.n_w" - $"pa.rk",
                                        $"pb.n_w" - $"pb.rk")) >=
                lit(9) * $"pa.n_w")
            .select($"pa.doc_id".as("doc_a"), $"pb.doc_id".as("doc_b"))
          t("P3a cand rows (no distinct) count")(cand.count())
          if (which("stages")) stats.dumpAndReset()
          val candD = cand.distinct()
          t("P3b cand distinct count")(candD.count())
          if (which("stages")) stats.dumpAndReset()
          t("P3c exchange only (repartition cols)") {
            cand.repartition($"doc_a", $"doc_b").write.format("noop")
              .mode("overwrite").save()
          }
          if (which("stages")) stats.dumpAndReset()
          t("P3d distinct, AQE off") {
            spark.conf.set("spark.sql.adaptive.enabled", "false")
            try cand.distinct().count()
            finally spark.conf.set("spark.sql.adaptive.enabled", "true")
          }
          t("P3e distinct, shuffle.partitions=256") {
            spark.conf.set("spark.sql.shuffle.partitions", "256")
            try cand.distinct().count()
            finally spark.conf.set("spark.sql.shuffle.partitions", cpus)
          }
          t("P3f distinct, shuffle.partitions=8") {
            spark.conf.set("spark.sql.shuffle.partitions", "8")
            try cand.distinct().count()
            finally spark.conf.set("spark.sql.shuffle.partitions", cpus)
          }
          val ver = candD
            .join(d.as("ca"), $"doc_a" === $"ca.doc_id")
            .join(d.as("cb"), $"doc_b" === $"cb.doc_id")
            .select($"doc_a", $"doc_b",
              call_function("graft_sorted_inter", $"ca.w_set", $"cb.w_set")
                .cast("long").as("n_inter"),
              $"ca.n_w".as("n_a"))
            .filter(lit(10) * $"n_inter" >= lit(9) * $"n_a")
            .select($"doc_a", $"doc_b", $"n_inter",
              round($"n_inter".cast("double") / $"n_a", 4).as("containment"))
          t("P4 verify (no orderBy) count")(ver.count())
          t("P5 verify + orderBy count")(ver.orderBy($"doc_a", $"doc_b").count())
          t("P6 full Dedup.containment count") {
            SparkEntry.queries("dedup_containment")(spark, sfDir).count()
          }
        }
        if (which("jaccard")) {
          t("P6 full Dedup.jaccardPrefix count") {
            SparkEntry.queries("dedup_jaccard_prefix")(spark, sfDir).count()
          }
        }
        spark.catalog.clearCache()
        graft.operators.Dedup.unpersistIntermediates(spark)
        System.gc()
      }
    }

    if (which("textidx")) {
      for (pass <- 1 to 3) {
        println(s"--- pass $pass ---")
        t("full stream_text_index_refresh") {
          SparkEntry.queries("stream_text_index_refresh")(spark, sfDir).count()
        }
        t("full stream_text_index_compact") {
          SparkEntry.queries("stream_text_index_compact")(spark, sfDir).count()
        }
        spark.catalog.clearCache()
        graft.operators.Dedup.unpersistIntermediates(spark)
        System.gc()
      }
    }

    // generic: q:<queryName> runs that SparkEntry query (with stage stats
    // when "stages" is also passed)
    which.filter(_.startsWith("q:")).map(_.drop(2)).foreach { name =>
      for (pass <- 1 to (if (which("stages")) 2 else 3)) {
        t(s"[$pass] full $name") {
          val df = SparkEntry.queries(name)(spark, sfDir)
          if (Set("dedup_substring_scrub", "text_scrub", "text_normalize")(name))
            df.write.format("noop").mode("overwrite").save()
          else df.count()
        }
        if (which("stages")) stats.dumpAndReset()
        spark.catalog.clearCache()
        graft.operators.Dedup.unpersistIntermediates(spark)
        System.gc()
      }
    }

    if (which("bpe")) {
      for (pass <- 1 to 3) {
        println(s"--- pass $pass ---")
        t("bpe learn only") {
          graft.operators.Bpe.learn(spark, sfDir).count()
        }
        t("full text_bpe_encode") {
          SparkEntry.queries("text_bpe_encode")(spark, sfDir).count()
        }
        spark.catalog.clearCache()
        graft.operators.Dedup.unpersistIntermediates(spark)
        System.gc()
      }
    }

    spark.stop()
  }
}
