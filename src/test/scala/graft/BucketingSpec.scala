package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import graft.operators.Bucketing

/** Bucketed co-located join: both sides pre-bucketed on the join key →
  * the sort-merge join must run with NO shuffle exchange under the join
  * (the one aggregation exchange afterwards is expected). */
class BucketingSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("bucketing-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** Force the SMJ path at runtime (session may be shared across suites;
    * builder configs would be silently ignored) and restore after. */
  private def withNoBroadcast[A](body: => A): A = {
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val saved = spark.conf.getOption(key)
    spark.conf.set(key, "-1")
    try body
    finally saved.fold(spark.conf.unset(key))(spark.conf.set(key, _))
  }

  test("bucketed join has no exchange below the join; result is correct") {
    // plan resolution AND collection must run under the tuned conf —
    // queryExecution is lazy, so everything stays inside the wrapper
    val (plan, got) = withNoBroadcast {
      val df = Bucketing.bucketedOrdersJoin(spark, "/root/testdata/sf0.001")
      (df.queryExecution.executedPlan.toString, df.collect().toSeq)
    }
    val joinIdx = plan.indexOf("SortMergeJoin")
    assert(joinIdx >= 0, s"expected a sort-merge join:\n$plan")
    // no Exchange may appear AFTER the join operator in the plan tree dump
    // (children are printed below their parent)
    val belowJoin = plan.substring(joinIdx)
    assert(!belowJoin.contains("Exchange"),
      s"join inputs must be co-located (bucketed), no shuffle:\n$plan")
    // correctness: matches a plain (shuffled) join of the raw parquet
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    val o = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val expect = li.join(o, $"l_orderkey" === $"o_orderkey")
      .groupBy($"o_orderstatus")
      .agg(count(lit(1)).as("n_lines"), round(sum($"l_extendedprice"), 2).as("sum_price"))
      .orderBy($"o_orderstatus")
      .collect().toSeq
    assert(got == expect)
  }
}
