package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Verifies the spark.sql.extensions entry point injects the native
  * functions into a freshly-built session (the deployment path). */
class GraftExtensionsSpec extends AnyFunSuite {

  test("graft.GraftExtensions injects graft_dot and graft_l2norm") {
    // spark.sql.extensions is a STATIC conf — it only takes effect on a fresh
    // SparkContext, so this spec owns the context lifecycle: stop whatever is
    // running, build with the extension, then tear down so later suites
    // rebuild clean.
    SparkSession.getActiveSession.orElse(SparkSession.getDefaultSession)
      .foreach(_.sparkContext.stop())
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-ext-test")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      val row = s.sql(
        "SELECT graft_dot(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)), " +
          "array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS d, " +
          "graft_l2norm(array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS n").collect()(0)
      assert(row.getDouble(0) == 11.0)
      assert(row.getDouble(1) == 5.0)
    } finally {
      s.sparkContext.stop()
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
    }
  }
}
