package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Pins the `Tables.events` layout normalization across session configs.
  *
  * The accessor must yield identical `epoch_us` / `ts_ntz` no matter how the
  * session reads the TIMESTAMP(MICROS,false) column: natively as
  * `timestamp_ntz` (default, `inferTimestampNTZ.enabled=true`) or as LTZ
  * `timestamp` when that inference is disabled — the round-9 ADVICE noted the
  * LTZ read used to throw even though the file is the supported layout. The
  * nanos branch (pre-round-9 testdata) has no sample file left to read, so it
  * is covered by the derivation being integer `DIV`, not by a file here.
  */
class TablesSpec extends SparkSpec {

  private val ntzConf = "spark.sql.parquet.inferTimestampNTZ.enabled"

  test("events normalizes identically with timestamp-NTZ inference on and off") {
    val default = Tables.events(spark, sf001)
      .select("event_id", "epoch_us", "ts_ntz")
    assert(default.schema("epoch_us").dataType == LongType)
    assert(default.schema("ts_ntz").dataType == TimestampNTZType)
    val expected = default.orderBy("event_id").collect()
    assert(expected.nonEmpty)

    val prev = spark.conf.get(ntzConf)
    try {
      spark.conf.set(ntzConf, "false")
      // the branch under test must actually engage: the raw read now yields LTZ
      val rawTs = spark.read.parquet(s"$sf001/events.parquet").schema("ts").dataType
      assert(rawTs == TimestampType, s"conf did not flip the raw read (got $rawTs)")
      val ltz = Tables.events(spark, sf001)
        .select("event_id", "epoch_us", "ts_ntz")
      assert(ltz.schema("epoch_us").dataType == LongType)
      assert(ltz.schema("ts_ntz").dataType == TimestampNTZType)
      assert(ltz.orderBy("event_id").collect().sameElements(expected))
    } finally spark.conf.set(ntzConf, prev)
  }

  test("epoch_us is micro-exact against the raw stored micros") {
    // unix_micros over the default NTZ read, computed independently of the
    // accessor's derivation path, must equal the accessor's epoch_us
    val raw = spark.read.parquet(s"$sf001/events.parquet")
      .select(col("event_id"), expr(
        "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)").as("direct_us"))
    val viaAccessor = Tables.events(spark, sf001).select(col("event_id"), col("epoch_us"))
    val mismatches = viaAccessor.join(raw, "event_id")
      .filter(col("epoch_us") =!= col("direct_us")).count()
    assert(mismatches == 0L)
  }
}
