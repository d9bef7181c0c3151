package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table utilities: pre-shuffle heavy fact tables ONCE on their
  * join key so every subsequent join/aggregation on that key runs with
  * ZERO exchange (SURVEY.md steering: "bucketing for co-located joins").
  *
  * At 100 TB the fact-to-fact join (e.g. lineitem ⋈ orders) is the
  * dominant shuffle; bucketing both sides by the key with the same
  * bucket count turns it into a local sort-merge per bucket. The write
  * pays the shuffle once; every downstream query skips it.
  */
object Bucketing {

  /** Write `df` as a bucketed, sorted managed table (idempotent — also
    * clears an orphaned managed-table location left by a crashed run,
    * which otherwise fails creation with LOCATION_ALREADY_EXISTS). */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    buckets: Int = 8): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val loc = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), table.toLowerCase)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    df.write
      .mode(SaveMode.Overwrite)
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)
  }

  /** Bucket lineitem + orders by order key and join them co-located:
    * the join plan must contain no shuffle exchange on either side. */
  def bucketedOrdersJoin(spark: SparkSession, dir: String,
                         buckets: Int = 8): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    writeBucketed(spark.read.parquet(s"$dir/lineitem.parquet"),
      "graft_lineitem_b", "l_orderkey", buckets)
    writeBucketed(spark.read.parquet(s"$dir/orders.parquet"),
      "graft_orders_b", "o_orderkey", buckets)
    spark.table("graft_lineitem_b")
      .join(spark.table("graft_orders_b"), $"l_orderkey" === $"o_orderkey")
      .groupBy($"o_orderstatus")
      .agg(count(lit(1)).as("n_lines"),
           round(sum($"l_extendedprice"), 2).as("sum_price"))
      .orderBy($"o_orderstatus")
  }
}
