package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.operators._
import graft.functions.{ScalarFuncs, Udfs}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` holds one entry per implemented operator from SURVEY.md §2;
  * `oracleSql` the DuckDB-equivalent SQL for every oracle-checked entry.
  * Both are assembled from per-category objects under graft.operators /
  * graft.functions so each category stays reviewable in isolation.
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Aggregations.aggPricingSummary(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Scans.defs ++ Filters.defs ++ Joins.defs ++ Aggregations.defs ++
      Windows.defs ++ Sorts.defs ++ SetOps.defs ++ ScalarFuncs.defs ++
      EventTime.defs ++ LlmText.defs ++ LlmVector.defs ++ Udfs.defs ++
      Composite.defs

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Scans.oracles ++ Filters.oracles ++ Joins.oracles ++ Aggregations.oracles ++
      Windows.oracles ++ Sorts.oracles ++ SetOps.oracles ++ ScalarFuncs.oracles ++
      EventTime.oracles ++ LlmText.oracles ++ LlmVector.oracles ++ Udfs.oracles ++
      Composite.oracles
}
