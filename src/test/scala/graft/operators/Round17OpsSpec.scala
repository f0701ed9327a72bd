package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Round-17 invariants — the probe-budget frontier instrument (the r16
  * verdict's item #1: measure log-law vs √cells vs constant-fraction
  * probe budgets before moving the law).
  *
  * The sweep knob (`spark.graft.ann.probeLaw`) must be invisible when
  * unset — the default branch IS the shipped law — and the driver-side
  * scalar mirrors RecallProbe uses to size its rank cap must agree with
  * the Column expressions the engine plans with, value by value, or the
  * sweep would label points with budgets the build didn't actually use.
  */
class Round17OpsSpec extends SparkSpec {

  private val laws = Seq("log", "sqrt:1", "sqrt:2", "sqrt:4", "frac:32", "frac:8")

  test("probe-law scalar mirror agrees with the Column law at every bit budget") {
    import spark.implicits._
    val bs = (0 to 16).toDF("b")
    laws.foreach { law =>
      spark.conf.set("spark.graft.ann.probeLaw", law)
      try {
        val got = bs.select(col("b"),
            LlmVector.nprobeCol(spark, col("b")).cast("int").as("np"))
          .collect().map(r => r.getInt(0) -> r.getInt(1)).toMap
        (0 to 16).foreach { b =>
          assert(got(b) === LlmVector.nprobeScalar(law, b),
            s"law $law at b=$b: Column ${got(b)} vs scalar ${LlmVector.nprobeScalar(law, b)}")
        }
      } finally spark.conf.unset("spark.graft.ann.probeLaw")
    }
  }

  test("unset law knob IS the shipped log law (the oracle-mirrored 3+2b)") {
    import spark.implicits._
    spark.conf.unset("spark.graft.ann.probeLaw")
    val got = (0 to 16).toDF("b")
      .select(col("b"), LlmVector.nprobeCol(spark, col("b")).cast("int").as("np"))
      .collect().map(r => r.getInt(0) -> r.getInt(1)).toMap
    (0 to 16).foreach(b => assert(got(b) === 3 + 2 * b,
      s"default law drifted at b=$b: ${got(b)} != ${3 + 2 * b}"))
  }

  test("bucket-bit scalar mirror agrees with the Column law across both regimes") {
    import spark.implicits._
    val ns = Seq(200L, 500L, 2000L, 20000L, 60000L, 131072L, 131073L,
      200000L, 600000L, 2097152L, 8388608L, 8600000000L, 1000000000000L)
    val got = ns.toDF("n")
      .select(col("n"), LlmVector.bucketBits(col("n")).as("b"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    ns.foreach { n =>
      assert(got(n) === LlmVector.bucketBitsScalar(n),
        s"bucketBits($n): Column ${got(n)} vs scalar ${LlmVector.bucketBitsScalar(n)}")
    }
  }

  test("an unknown probe law fails loudly, not as a silent fallback to log") {
    spark.conf.set("spark.graft.ann.probeLaw", "cubic:9")
    try intercept[IllegalArgumentException] {
      LlmVector.nprobeCol(spark, lit(4))
    } finally spark.conf.unset("spark.graft.ann.probeLaw")
  }
}
