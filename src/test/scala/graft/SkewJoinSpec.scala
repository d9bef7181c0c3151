package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession

/** AQE skew-join handling: a hot join key concentrates one shuffle
  * partition; adaptive execution must split it (skew=true in the final
  * plan) rather than serializing the stage on one reducer — the runtime
  * answer to skew at 100 TB (complementing the manual salting in q19). */
class SkewJoinSpec extends AnyFunSuite {

  // getOrCreate may return a session shared with other suites — set the
  // skew-specific knobs at RUNTIME and restore them, so suite order
  // doesn't leak configuration
  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("skew-spec")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val tuned = Map(
    "spark.sql.adaptive.enabled" -> "true",
    "spark.sql.adaptive.skewJoin.enabled" -> "true",
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "64KB",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "64KB",
    "spark.sql.autoBroadcastJoinThreshold" -> "-1",
    "spark.sql.shuffle.partitions" -> "8")

  private def withTunedConf[A](body: => A): A = {
    val saved = tuned.keys.map(k => k -> spark.conf.getOption(k)).toMap
    tuned.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("hot key triggers AQE skew split; result stays correct") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    withTunedConf {
    // 300k rows, 80% on key 0 → one hot shuffle partition
    val left = spark.range(300000)
      .select((when($"id" % 5 =!= 0, lit(0L)).otherwise($"id" % 100)).as("k"),
              $"id".as("payload"))
    val right = spark.range(100).select($"id".as("k"), ($"id" * 2).as("v"))
    val joined = left.join(right, "k")
    // execute THIS physical plan (count() would build a different one and
    // leave joined's AdaptiveSparkPlan un-finalized)
    val qe = joined.queryExecution
    assert(qe.toRdd.count() == 300000L)
    val plan = qe.executedPlan.toString
    assert(plan.contains("skew=true"),
      s"expected AQE to mark the skewed join:\n${plan.take(2000)}")
    // correctness under the split: 80% hot (id%5!=0) + ids divisible by
    // 100 (which all satisfy id%5==0 and map to key 0) = 243000
    val hot = joined.filter($"k" === 0).count()
    assert(hot == 243000L)
    }
  }
}
