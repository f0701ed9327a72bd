package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Central table access for the engine.
  *
  * All queries read parquet through here so environment quirks are handled in
  * exactly one place. The driver harness constructs the SparkSession itself
  * (Verify.scala / Bench.scala) without any engine-specific confs, so any
  * runtime SQL conf the engine needs MUST be set here, lazily, per call.
  *
  * Scale note: each accessor returns a plain parquet-backed DataFrame leaf, so
  * Catalyst predicate pushdown / column pruning apply to whatever the caller
  * composes on top — nothing is cached or collected here.
  */
object Tables {

  /** Generic table reader: `$sfDir/$name.parquet`. */
  def t(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(spark: SparkSession, sfDir: String): DataFrame   = t(spark, sfDir, "region")
  def nation(spark: SparkSession, sfDir: String): DataFrame   = t(spark, sfDir, "nation")
  def customer(spark: SparkSession, sfDir: String): DataFrame = t(spark, sfDir, "customer")
  def supplier(spark: SparkSession, sfDir: String): DataFrame = t(spark, sfDir, "supplier")
  def part(spark: SparkSession, sfDir: String): DataFrame     = t(spark, sfDir, "part")
  def orders(spark: SparkSession, sfDir: String): DataFrame   = t(spark, sfDir, "orders")
  def lineitem(spark: SparkSession, sfDir: String): DataFrame = t(spark, sfDir, "lineitem")
  def documents(spark: SparkSession, sfDir: String): DataFrame  = t(spark, sfDir, "documents")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = t(spark, sfDir, "embeddings")

  /** events.parquet stores `ts` as parquet INT64 TIMESTAMP(NANOS,false), which
    * Spark's vectorized reader rejects at execution time unless
    * `spark.sql.legacy.parquet.nanosAsLong=true` (SURVEY.md §1.3 ⚠L1). With the
    * conf on, `ts` arrives as Long nanoseconds since epoch. We expose:
    *   - `epoch_us`: Long microseconds (integer `DIV 1000`, truncating — exactly
    *     what DuckDB's nanos→micros TIMESTAMP coercion does, so oracle
    *     comparisons on this column are bit-exact), and
    *   - `ts_ntz`: timestamp_ntz at micro precision (session tz is pinned UTC by
    *     the driver, so the TimestampType→NTZ cast is value-preserving).
    */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    t(spark, sfDir, "events")
      .withColumn("epoch_us", expr("ts DIV 1000"))
      .withColumn("ts_ntz", timestamp_micros(expr("ts DIV 1000")).cast("timestamp_ntz"))
  }
}
