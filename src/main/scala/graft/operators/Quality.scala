package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Data-quality / dimension-history operators — the dbt-test and
  * slowly-changing-dimension layer every production warehouse runs nightly.
  *
  * Scale notes: each constraint is one aggregate or anti-join over its
  * table (anti joins co-partition on the key — the same shuffle the FK
  * lookup needs anyway); the result is one row per rule, so the union at
  * the end is trivially small. SCD2 history is two filtered projections of
  * ONE dimension scan unioned — no join, no shuffle until the output sort.
  */
object Quality {

  /** Constraint sweep: every rule evaluates to a violation count (0 = the
    * constraint holds). Rules cover the four families dbt-style suites run:
    * referential integrity (anti joins), uniqueness (grouped duplicate
    * count), nullability, and accepted ranges/outliers. Exact integer
    * counts — no rounding concerns. */
  def dqConstraints(spark: SparkSession, sfDir: String): DataFrame = {
    val o = Tables.orders(spark, sfDir)
    val li = Tables.lineitem(spark, sfDir)
    val c = Tables.customer(spark, sfDir)
    val ev = Tables.events(spark, sfDir)
    def rule(name: String, cnt: DataFrame): DataFrame =
      cnt.select(lit(name).as("rule"), col("n").cast("long").as("n_violations"))
    val checks = Seq(
      rule("orders_custkey_fk",
        o.join(c, o("o_custkey") === c("c_custkey"), "left_anti")
          .agg(count(lit(1)).as("n"))),
      rule("lineitem_orderkey_fk",
        li.join(o, li("l_orderkey") === o("o_orderkey"), "left_anti")
          .agg(count(lit(1)).as("n"))),
      rule("customer_custkey_unique",
        c.groupBy("c_custkey").agg(count(lit(1)).as("c"))
          .agg(coalesce(sum(when(col("c") > 1, col("c") - 1)), lit(0L)).as("n"))),
      rule("orders_totalprice_positive",
        o.agg(count_if(col("o_totalprice") <= 0).as("n"))),
      rule("lineitem_quantity_range",
        li.agg(count_if(col("l_quantity") < 1 || col("l_quantity") > 50).as("n"))),
      rule("events_value_outlier",
        ev.agg(count_if(col("value") > 400).as("n"))),
      rule("events_dup_user_type_minute",
        ev.withColumn("m", date_trunc("minute", col("ts_ntz")))
          .groupBy("user_id", "event_type", "m").agg(count(lit(1)).as("c"))
          .agg(coalesce(sum(when(col("c") > 1, col("c") - 1)), lit(0L)).as("n"))))
    checks.reduce(_.union(_)).orderBy("rule")
  }

  /** Fixed SCD2 effective date — inside every SF's order-date range. */
  private val Scd2Effective = "1998-01-01"

  /** SCD2 history build: the changeset reassigns the market segment of
    * customers with key ≡ 2 (mod 7) as of `Scd2Effective`. Changed keys
    * produce a CLOSED old version (valid_to = effective date) plus an open
    * new version; unchanged keys keep one open row. Both versions project
    * the SAME dimension scan — the whole history is filters + union, no
    * join — and the derivation is deterministic, so the DuckDB oracle
    * rebuilds it from scratch. */
  def scd2History(spark: SparkSession, sfDir: String): DataFrame = {
    val c = Tables.customer(spark, sfDir)
      .select("c_custkey", "c_name", "c_mktsegment")
    val changed = col("c_custkey") % 7 === 2
    val open = c
      .withColumn("c_mktsegment",
        when(changed, lit("REASSIGNED")).otherwise(col("c_mktsegment")))
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"),
        when(changed, to_date(lit(Scd2Effective)))
          .otherwise(to_date(lit("1992-01-01"))).as("valid_from"),
        lit(null).cast("date").as("valid_to"),
        lit(true).as("is_current"))
    val closed = c.filter(changed)
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"),
        to_date(lit("1992-01-01")).as("valid_from"),
        to_date(lit(Scd2Effective)).as("valid_to"),
        lit(false).as("is_current"))
    open.union(closed)
      .orderBy("c_custkey", "valid_from")
  }

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dq_constraints" -> dqConstraints,
    "scd2_history" -> scd2History,
  )

  val oracles: Map[String, String] = Map(
    "dq_constraints" ->
      """SELECT rule, n_violations FROM (
        |  SELECT 'orders_custkey_fk' AS rule, CAST(count(*) AS BIGINT) AS n_violations
        |  FROM orders WHERE o_custkey NOT IN (SELECT c_custkey FROM customer)
        |  UNION ALL
        |  SELECT 'lineitem_orderkey_fk', CAST(count(*) AS BIGINT)
        |  FROM lineitem WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders)
        |  UNION ALL
        |  SELECT 'customer_custkey_unique',
        |    CAST(coalesce(sum(CASE WHEN c > 1 THEN c - 1 END), 0) AS BIGINT)
        |  FROM (SELECT count(*) AS c FROM customer GROUP BY c_custkey)
        |  UNION ALL
        |  SELECT 'orders_totalprice_positive', CAST(count(*) AS BIGINT)
        |  FROM orders WHERE o_totalprice <= 0
        |  UNION ALL
        |  SELECT 'lineitem_quantity_range', CAST(count(*) AS BIGINT)
        |  FROM lineitem WHERE l_quantity < 1 OR l_quantity > 50
        |  UNION ALL
        |  SELECT 'events_value_outlier', CAST(count(*) AS BIGINT)
        |  FROM events WHERE value > 400
        |  UNION ALL
        |  SELECT 'events_dup_user_type_minute',
        |    CAST(coalesce(sum(CASE WHEN c > 1 THEN c - 1 END), 0) AS BIGINT)
        |  FROM (SELECT count(*) AS c FROM events
        |        GROUP BY user_id, event_type, date_trunc('minute', CAST(ts AS TIMESTAMP)))
        |) ORDER BY rule""".stripMargin,
    "scd2_history" ->
      """SELECT c_custkey, c_name,
        |  CASE WHEN c_custkey % 7 = 2 THEN 'REASSIGNED' ELSE c_mktsegment END AS c_mktsegment,
        |  CASE WHEN c_custkey % 7 = 2 THEN DATE '1998-01-01' ELSE DATE '1992-01-01' END AS valid_from,
        |  CAST(NULL AS DATE) AS valid_to,
        |  true AS is_current
        |FROM customer
        |UNION ALL
        |SELECT c_custkey, c_name, c_mktsegment,
        |  DATE '1992-01-01', DATE '1998-01-01', false
        |FROM customer WHERE c_custkey % 7 = 2
        |ORDER BY c_custkey, valid_from""".stripMargin,
  )
}
