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

  /** One entry per implemented operator from SURVEY.md §2.
    *
    * NOTE: the `source_*_roundtrip` / `source_partitioned_prune` entries are
    * side-effecting — BUILDING their DataFrame writes a sample under a
    * per-application temp root (cleaned up on JVM exit; see Scans.scala).
    * Anything that iterates `queries` purely to build plans still triggers
    * those writes. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Scans.defs ++ Filters.defs ++ Joins.defs ++ Aggregations.defs ++
      Windows.defs ++ Sorts.defs ++ SetOps.defs ++ ScalarFuncs.defs ++
      EventTime.defs ++ LlmText.defs ++ LlmVector.defs ++ Udfs.defs ++
      Composite.defs ++ TimeSeries.defs ++ Tpch.defs ++ Sinks.defs ++ Quality.defs ++
      Graph.defs

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    *
    * Each SQL is made self-contained by prefixing CTEs that bind every
    * referenced table name to `read_parquet('<t2 sfDir>/<table>.parquet')`:
    * the SQL then runs whether or not the harness pre-attaches same-named
    * views (a CTE shadows a view of the same name, reading identical data).
    * t2 runs at sf0.01 (TESTDATA.md); tools/preverify.py rewrites the path
    * when replaying at other scale factors. */
  def oracleSql: Map[String, String] = {
    val raw =
      Scans.oracles ++ Filters.oracles ++ Joins.oracles ++ Aggregations.oracles ++
        Windows.oracles ++ Sorts.oracles ++ SetOps.oracles ++ ScalarFuncs.oracles ++
        EventTime.oracles ++ LlmText.oracles ++ LlmVector.oracles ++ Udfs.oracles ++
        Composite.oracles ++ TimeSeries.oracles ++ Tpch.oracles ++ Sinks.oracles ++
        Quality.oracles ++ Graph.oracles
    raw.map { case (k, sql) => k -> selfContain(sql, "/root/testdata/sf0.01") }
  }

  private val tableNames = Seq("region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Prefix WITH-bindings for every table the SQL references (word-boundary
    * match); merges with an existing WITH clause. */
  private[graft] def selfContain(sql: String, sfDir: String): String = {
    val used = tableNames.filter(t => s"\\b$t\\b".r.findFirstIn(sql).isDefined)
    if (used.isEmpty) sql
    else {
      val ctes = used.map(t => s"$t AS (SELECT * FROM read_parquet('$sfDir/$t.parquet'))")
        .mkString(", ")
      val trimmed = sql.trim
      // RECURSIVE must stay the first word after WITH; the table-binding
      // CTEs themselves are non-recursive, which is fine under it
      if (trimmed.take(14).equalsIgnoreCase("WITH RECURSIVE"))
        s"WITH RECURSIVE $ctes, ${trimmed.drop(14).trim}"
      else if (trimmed.take(4).equalsIgnoreCase("WITH"))
        s"WITH $ctes, ${trimmed.drop(4).trim}"
      else
        s"WITH $ctes $trimmed"
    }
  }
}
