package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Aggregation operators (SURVEY.md §2.4).
  *
  * Determinism conventions (SURVEY.md §1.3 ⚠L3), applied to every
  * oracle-checked query here and elsewhere:
  *   - every double aggregate is wrapped `round(_, 2)` (or 4 for averages) on
  *     BOTH the Spark and the DuckDB side — double sums are shuffle-order
  *     dependent at ~1e-9 relative, far below the rounding quantum;
  *   - a total-order `orderBy` on a unique key is the LAST transformation, so
  *     the driver's `coalesce(1)` write preserves a deterministic row order.
  *
  * Scale notes: every query below is a single hash-aggregate over the fact
  * table — partial (map-side) aggregation then a final agg after one shuffle
  * on the grouping keys. Group cardinalities are tiny (≤ thousands), so the
  * shuffle moves only partial aggregates, not rows; this holds at 100 TB as
  * long as grouping keys stay low-cardinality, and Spark spills the hash map
  * when they don't.
  */
object Aggregations {

  /** Flagship TPC-H-Q1-style pricing summary per (returnflag, linestatus). */
  def aggPricingSummary(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.lineitem(spark, sfDir)
    li.groupBy("l_returnflag", "l_linestatus")
      .agg(
        round(sum("l_quantity"), 2).as("sum_qty"),
        round(sum("l_extendedprice"), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("sum_disc_price"),
        round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * (lit(1.0) + col("l_tax"))), 2).as("sum_charge"),
        round(avg("l_quantity"), 4).as("avg_qty"),
        round(avg("l_extendedprice"), 4).as("avg_price"),
        round(avg("l_discount"), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "agg_pricing_summary" -> aggPricingSummary,
  )

  val oracles: Map[String, String] = Map(
    "agg_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  round(sum(l_extendedprice), 2) AS sum_base_price,
        |  round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS sum_disc_price,
        |  round(sum(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)), 2) AS sum_charge,
        |  round(avg(l_quantity), 4) AS avg_qty,
        |  round(avg(l_extendedprice), 4) AS avg_price,
        |  round(avg(l_discount), 4) AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
  )
}
