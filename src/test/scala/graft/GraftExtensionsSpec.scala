package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession

/** The extensions class must make the native functions available to a
  * pure-SQL session (no Scala register call), and coexist with the
  * programmatic `VectorExpressions.register` path. */
class GraftExtensionsSpec extends AnyFunSuite {

  test("spark.sql.extensions injects graft functions into a fresh session") {
    // extensions only apply at session CREATION — under `sbt test` all
    // suites share one JVM, so an active session from another suite must
    // be stopped or getOrCreate silently returns it without extensions
    SparkSession.getActiveSession.orElse(SparkSession.getDefaultSession)
      .foreach(_.stop())
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder()
      .master("local[2]")
      .appName("graft-extensions-spec")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      val dot = s.sql(
        "SELECT graft_dot(array(1.0f, 2.0f), array(3.0f, 4.0f)) AS d")
        .head().getDouble(0)
      assert(dot == 11.0)
      val grams = s.sql("SELECT graft_char_grams('abcd', 3) AS g")
        .head().getSeq[String](0)
      assert(grams == Seq("abc", "bcd"))
      assert(s.sql("SELECT graft_gram_min_md5('abcdefgh', 8) AS f")
        .head().getString(0).length == 32)
      // programmatic register stays idempotent alongside the injection
      graft.functions.VectorExpressions.register(s)
      assert(s.sql("SELECT graft_dot(array(1.0d), array(2.0d))")
        .head().getDouble(0) == 2.0)
    } finally {
      s.stop()
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
    }
  }
}
