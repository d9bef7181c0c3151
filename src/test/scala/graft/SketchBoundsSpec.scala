package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.queries.Relational

/** Turns the rows-only `q20_sketches` entry into a CHECKED contract:
  * the approximate answers must sit within the published error bounds of
  * their exact twins (which ARE oracle-gated, via q11/q18).
  *
  *  - `approx_count_distinct` is HyperLogLog++ with default relative
  *    standard deviation 0.05; a 3σ band (15% relative error) holds with
  *    probability ≈ 0.997, and on this DETERMINISTIC dataset the observed
  *    error is fixed — the assertion can never flake, only catch a
  *    regression in the sketch plumbing.
  *  - `percentile_approx(…, accuracy = 1000)` (Greenwald–Khanna style
  *    KLL in Spark) guarantees RANK error ≤ 1/accuracy: the returned
  *    value must lie between the exact quantiles at ranks 0.5 ± 1/1000.
  */
class SketchBoundsSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("sketch-bounds-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.001"

  test("q20 approx sketches sit within published error bounds of exact twins") {
    import spark.implicits._
    val rows = Relational.q20Sketches(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val approx = r.getAs[Long]("approx_parts").toDouble
      val exact = r.getAs[Long]("exact_parts").toDouble
      val relErr = math.abs(approx - exact) / exact
      info(f"HLL flag=${r.getAs[String]("l_returnflag")}: approx=$approx%.0f exact=$exact%.0f relErr=$relErr%.4f")
      assert(relErr <= 0.15, // 3 × default rsd 0.05
        s"HLL estimate $approx vs exact $exact: relative error $relErr exceeds 3σ bound 0.15")
    }
    // rank-error bound for the approximate median, per return flag
    val eps = 1.0 / 1000 // percentile_approx accuracy used by q20
    val exactBounds = spark.read.parquet(s"$sf/lineitem.parquet")
      .groupBy($"l_returnflag")
      .agg(
        expr(s"percentile(l_quantity, ${0.5 - eps})").as("lo"),
        expr(s"percentile(l_quantity, ${0.5 + eps})").as("hi"))
      .collect()
      .map(r => r.getAs[String]("l_returnflag") ->
        (r.getAs[Double]("lo"), r.getAs[Double]("hi"))).toMap
    rows.foreach { r =>
      val flag = r.getAs[String]("l_returnflag")
      val p50 = r.getAs[Double]("approx_p50")
      val (lo, hi) = exactBounds(flag)
      assert(p50 >= lo && p50 <= hi,
        s"approx p50 $p50 for flag=$flag outside exact rank band [$lo, $hi]")
    }
  }

  test("q33 merged HLL sketches estimate within bounds of the exact distinct count") {
    import spark.implicits._
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val merged = Relational.q33SketchUnion(spark, sf).collect()
      .map(r => r.getAs[String]("event_type") ->
        (r.getAs[Long]("n_days"), r.getAs[Long]("approx_users"))).toMap
    assert(merged.nonEmpty)
    // exact distinct users per event type, computed independently
    val exact = spark.read.parquet(s"$sf/events.parquet")
      .groupBy($"event_type")
      .agg(countDistinct($"user_id").as("exact_users"))
      .collect()
      .map(r => r.getAs[String]("event_type") -> r.getAs[Long]("exact_users")).toMap
    assert(merged.keySet == exact.keySet)
    merged.foreach { case (et, (nDays, approx)) =>
      assert(nDays > 1, s"merge must actually union multiple daily partials (got $nDays)")
      val ex = exact(et).toDouble
      val relErr = math.abs(approx - ex) / ex
      info(f"HLL-union $et: days=$nDays approx=$approx exact=${exact(et)} relErr=$relErr%.4f")
      // default lgConfigK=12 → rse ≈ 1.04/√2¹² ≈ 0.016; 3σ ≈ 0.05
      assert(relErr <= 0.05,
        s"merged HLL estimate $approx vs exact $ex: relative error $relErr exceeds 3σ bound")
    }
  }
}
