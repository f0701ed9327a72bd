package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Projection / filter / predicate operators (SURVEY.md §2.2).
  *
  * Scale notes: all predicates are on raw columns (no UDF wrapping), so they
  * reach the parquet scan as PushedFilters and prune row groups at 100 TB.
  */
object Filters {

  /** Per-row revenue arithmetic, top 100 rows by key. */
  def projectArith(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_linenumber"),
        round(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * (lit(1.0) + col("l_tax")), 2).as("revenue"))
      .orderBy("l_orderkey", "l_linenumber", "revenue")
      .limit(100)

  /** Range + IN + BETWEEN predicates, all pushdown-eligible. */
  def filterRangeInLike(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .filter(col("l_shipdate") >= to_timestamp_ntz(lit("1996-01-01")) &&
        col("l_shipdate") < to_timestamp_ntz(lit("1997-01-01")) &&
        col("l_returnflag").isin("A", "R") &&
        col("l_quantity").between(10, 40))
      .select("l_orderkey", "l_linenumber", "l_shipdate", "l_returnflag", "l_quantity")
      .orderBy("l_orderkey", "l_linenumber", "l_shipdate", "l_returnflag", "l_quantity")

  /** LIKE, null-safe equality, CASE WHEN bucketing, coalesce. */
  def filterLikeNull(spark: SparkSession, sfDir: String): DataFrame =
    Tables.part(spark, sfDir)
      .filter(col("p_name").like("%ol%") || col("p_type").eqNullSafe("STANDARD BRUSHED"))
      .select(col("p_partkey"), coalesce(col("p_brand"), lit("none")).as("brand"),
        when(col("p_size") < 10, "small")
          .when(col("p_size") < 30, "mid")
          .otherwise("large").as("size_bucket"))
      .orderBy("p_partkey")

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "project_arith" -> projectArith,
    "filter_range_in_like" -> filterRangeInLike,
    "filter_like_null" -> filterLikeNull,
  )

  val oracles: Map[String, String] = Map(
    "project_arith" ->
      """SELECT l_orderkey, l_linenumber,
        |  round(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax), 2) AS revenue
        |FROM lineitem ORDER BY l_orderkey, l_linenumber, revenue LIMIT 100""".stripMargin,
    "filter_range_in_like" ->
      """SELECT l_orderkey, l_linenumber, l_shipdate, l_returnflag, l_quantity
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
        |  AND l_returnflag IN ('A', 'R') AND l_quantity BETWEEN 10 AND 40
        |ORDER BY l_orderkey, l_linenumber, l_shipdate, l_returnflag, l_quantity""".stripMargin,
    "filter_like_null" ->
      """SELECT p_partkey, coalesce(p_brand, 'none') AS brand,
        |  CASE WHEN p_size < 10 THEN 'small' WHEN p_size < 30 THEN 'mid' ELSE 'large' END AS size_bucket
        |FROM part
        |WHERE p_name LIKE '%ol%' OR p_type IS NOT DISTINCT FROM 'STANDARD BRUSHED'
        |ORDER BY p_partkey""".stripMargin,
  )
}
