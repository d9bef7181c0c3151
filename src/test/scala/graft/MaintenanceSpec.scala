package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.{Curation, Maintenance}
import graft.queries.Relational

/** The round's maintenance/analytics additions: CDC latest-wins merge,
  * the ordered-step funnel, and the octave-weighted reservoir sample.
  * The DuckDB oracle pins exact values; these pin the SEMANTIC branches
  * (each merge action reachable, delete-of-absent a no-op, funnel step
  * ordering strict, weighting actually biases the sample) and the
  * determinism contracts that must survive refactors. */
class MaintenanceSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("maintenance-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.001"

  test("cdc_merge: every action reachable; deletes drop; delete-of-absent is a no-op") {
    val rows = Maintenance.cdcMerge(spark, sf).collect()
    val byAction = rows.groupBy(_.getAs[String]("action"))
      .view.mapValues(_.length).toMap
    assert(byAction.keySet == Set("keep", "update", "insert"))
    assert(byAction.values.forall(_ > 0))
    // no key appears twice (latest-wins resolved to one op per key)
    val keys = rows.map(_.getAs[Long]("key"))
    assert(keys.distinct.length == keys.length)
    // kept rows carry no qty (no changelog touched them)
    assert(rows.filter(_.getAs[String]("action") == "keep")
      .forall(_.isNullAt(3)))
    // inserts are exactly changelog-only keys (key % 4 == 0 side)
    assert(rows.filter(_.getAs[String]("action") == "insert")
      .forall(_.getAs[Long]("key") % 4 == 0))
    // deletes really fire: some base keys must be absent from the output
    import spark.implicits._
    val baseKeys = spark.read.parquet(s"$sf/orders.parquet")
      .filter($"o_orderkey" % 4 =!= 0)
      .select($"o_orderkey").as[Long].collect().toSet
    assert((baseKeys -- keys.toSet).nonEmpty)
  }

  test("cdc_merge: re-run is bit-deterministic despite duplicate seq values") {
    val a = Maintenance.cdcMerge(spark, sf).collect().toSeq
    val b = Maintenance.cdcMerge(spark, sf).collect().toSeq
    assert(a == b)
  }

  test("events_funnel: steps are strictly ordered and within the horizon") {
    val rows = Relational.eventsFunnel(spark, sf).collect()
    assert(rows.nonEmpty)
    val horizon = 7L * 24 * 3600 * 1000000000L
    rows.foreach { r =>
      val v = Option(r.getAs[java.lang.Long]("view_ns")).map(_.toLong)
      val c = Option(r.getAs[java.lang.Long]("click_ns")).map(_.toLong)
      val p = Option(r.getAs[java.lang.Long]("purchase_ns")).map(_.toLong)
      val step = r.getAs[Long]("funnel_step")
      // a later step implies all earlier ones, strictly increasing
      (v, c, p) match {
        case (Some(vv), Some(cc), Some(pp)) =>
          assert(vv < cc && cc < pp && pp - vv >= 0)
        case (Some(vv), Some(cc), None) => assert(vv < cc)
        case (None, Some(_), _) | (None, _, Some(_)) | (Some(_), None, Some(_)) =>
          fail(s"gap in funnel chain: $r")
        case _ => ()
      }
      c.foreach(cc => assert(cc - v.get <= horizon))
      p.foreach(pp => assert(pp - v.get <= horizon))
      assert(step == Seq(v, c, p).count(_.isDefined))
    }
  }

  test("corpus_sample_weighted: length-weighting overrepresents long docs") {
    import spark.implicits._
    val sample = Curation.sampleWeighted(spark, sf)
    val sampleMean = sample.agg(avg($"n_chars")).as[Double].head()
    val corpusMean = spark.read.parquet(s"$sf/documents.parquet")
      .agg(avg($"n_chars")).as[Double].head()
    // E-S with w ∝ length pulls the sampled mean above the corpus mean;
    // octave quantization keeps the pull, just coarser
    assert(sampleMean > corpusMean,
      s"weighted sample mean $sampleMean ≤ corpus mean $corpusMean")
    // exactly top-20 per stratum, ranks contiguous from 1
    val perLang = sample.groupBy($"lang").agg(count(lit(1)).as("n"),
      max($"rk").as("mx"), min($"rk").as("mn")).collect()
    perLang.foreach { r =>
      assert(r.getAs[Long]("n") == r.getAs[Long]("mx"))
      assert(r.getAs[Long]("mn") == 1L)
    }
  }

  test("corpus_sample_weighted: selection is invariant under repartitioning") {
    val a = Curation.sampleWeighted(spark, sf).collect().toSeq
    val b = Curation.sampleWeighted(spark, sf).collect().toSeq
    assert(a == b)
  }

  test("octave/sqrt-chain helpers: clamped octave and exact sqrt towers") {
    import spark.implicits._
    val df = Seq(1L, 31L, 32L, 63L, 64L, 255L, 4095L, 4096L, 100000L)
      .toDF("n")
      .selectExpr(s"n", s"${Curation.octaveSql("n")} AS k")
    val got = df.collect().map(r => r.getAs[Long]("n") -> r.getAs[Int]("k")).toMap
    assert(got(1L) == 5 && got(31L) == 5)      // clamp low
    assert(got(32L) == 5 && got(63L) == 5)
    assert(got(64L) == 6 && got(255L) == 7)
    assert(got(4095L) == 11 && got(4096L) == 12)
    assert(got(100000L) == 12)                 // clamp high
    // the sqrt tower really is u^(1/2^k)
    val key = Seq((0.25, 5)).toDF("u", "k")
      .selectExpr(Curation.sqrtChainSql("k", "u") + " AS s")
      .collect().head.getDouble(0)
    assert(math.abs(key - math.pow(0.25, 1.0 / 32)) < 1e-15)
  }
}
