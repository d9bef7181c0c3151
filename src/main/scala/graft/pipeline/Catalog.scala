package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Catalog registration + schema-evolution "crawler" analog.
  *
  * The reference registers `dicom_db.dicom_metadata` in Glue
  * (`deploy/serverless.yml:509-536`), exposes new partitions via
  * `MSCK REPAIR TABLE` (README.md:104-106), and evolves the schema with a
  * Glue crawler configured `CombineCompatibleSchemas`
  * (`deploy/serverless.yml:466-479`). Spark-native equivalents:
  * external parquet table + `MSCK REPAIR`, and a footer-merge
  * re-registration pass.
  */
object Catalog {

  /** Register the partitioned output as an external table and discover
    * its partitions (`MSCK REPAIR TABLE` is native Spark SQL). */
  def registerTable(spark: SparkSession, location: String,
                    db: String = "dicom_db", table: String = "dicom_metadata"): Unit = {
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $db")
    spark.sql(s"DROP TABLE IF EXISTS $db.$table")
    // Spark 4 requires an explicit column list to state PARTITIONED BY;
    // omitting the clause lets partitioning be inferred from the Hive
    // layout (study_date=... directories).
    spark.sql(
      s"""CREATE TABLE $db.$table
         |USING PARQUET
         |LOCATION '$location'""".stripMargin)
    spark.sql(s"MSCK REPAIR TABLE $db.$table")
  }

  /** Crawler analog: merge all parquet footers under `location`
    * (CombineCompatibleSchemas) and re-register the table with the
    * evolved schema. Returns the merged-schema DataFrame. */
  def crawl(spark: SparkSession, location: String,
            db: String = "dicom_db", table: String = "dicom_metadata"): DataFrame = {
    val merged = spark.read.option("mergeSchema", "true").parquet(location)
    registerTable(spark, location, db, table)
    merged
  }
}
