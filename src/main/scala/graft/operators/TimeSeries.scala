package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Time-series utilities (finance staples): calendar gap-fill and
  * forward-fill.
  *
  * Scale notes: the calendar is generated from the data's own min/max (a
  * 2-row aggregate, then sequence+explode — thousands of rows, never
  * fact-sized); forward-fill is a running `last(ignoreNulls)` window
  * partitioned by key, so state is one value per partition.
  */
object TimeSeries {

  /** Daily revenue with missing calendar days filled as 0.0. */
  def tsGapfill(spark: SparkSession, sfDir: String): DataFrame = {
    val daily = Tables.orders(spark, sfDir)
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(round(sum("o_totalprice"), 2).as("rev"))
    val cal = daily.agg(min("day").as("lo"), max("day").as("hi"))
      .select(explode(sequence(col("lo"), col("hi"), expr("interval 1 day"))).as("day"))
    cal.join(daily, Seq("day"), "left")
      .select(col("day"), coalesce(col("rev"), lit(0.0)).as("rev"))
      .orderBy("day")
  }

  /** Forward-fill: per customer, carry the last non-null total price forward
    * over the order sequence (nulls injected deterministically). */
  def tsForwardFill(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.orders(spark, sfDir)
      .withColumn("tp_gappy",
        when(col("o_orderkey") % 7 === 0, lit(null)).otherwise(col("o_totalprice")))
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
        last(col("tp_gappy"), ignoreNulls = true).over(w).as("tp_filled"))
      .orderBy("o_custkey", "o_orderdate", "o_orderkey")
  }

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ts_gapfill" -> tsGapfill,
    "ts_forward_fill" -> tsForwardFill,
  )

  val oracles: Map[String, String] = Map(
    "ts_gapfill" ->
      """WITH daily AS (
        |  SELECT CAST(o_orderdate AS DATE) AS day,
        |    round(sum(o_totalprice), 2) AS rev
        |  FROM orders GROUP BY 1),
        |cal AS (
        |  SELECT CAST(unnest(generate_series(
        |    (SELECT min(day) FROM daily)::TIMESTAMP,
        |    (SELECT max(day) FROM daily)::TIMESTAMP,
        |    INTERVAL 1 DAY)) AS DATE) AS day)
        |SELECT cal.day, coalesce(daily.rev, 0.0) AS rev
        |FROM cal LEFT JOIN daily USING (day) ORDER BY day""".stripMargin,
    "ts_forward_fill" ->
      """SELECT o_custkey, o_orderkey, o_orderdate,
        |  last_value(CASE WHEN o_orderkey % 7 = 0 THEN NULL
        |                  ELSE o_totalprice END IGNORE NULLS)
        |    OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS tp_filled
        |FROM orders
        |ORDER BY o_custkey, o_orderdate, o_orderkey""".stripMargin,
  )
}
