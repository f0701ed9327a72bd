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

  /** The tables a constraint may check, bound once per sweep. */
  private[operators] final case class DqTables(orders: DataFrame, lineitem: DataFrame,
      customer: DataFrame, supplier: DataFrame, events: DataFrame)

  /** One constraint AS DATA: its name, the Spark-side violation counter
    * (must yield a single row with a long column `n`), and the DuckDB
    * oracle's equivalent one-row SELECT. Adding a rule is adding a row
    * here — both the operator's union and the oracle's UNION ALL are
    * generated from this table, so the two sides cannot drift. FK oracles
    * use NOT EXISTS (never NOT IN): NOT IN's three-valued logic reports 0
    * violations the moment the subquery contains a NULL key, silently
    * diverging from the anti-join the Spark side runs. */
  private[operators] final case class DqRule(name: String,
      oracleSelect: String, check: DqTables => DataFrame)

  /** Rules cover the four families dbt-style suites run: referential
    * integrity (anti joins), uniqueness (grouped duplicate count),
    * nullability, and accepted ranges/outliers. Exact integer counts — no
    * rounding concerns. */
  private[operators] val dqRules: Seq[DqRule] = Seq(
    DqRule("orders_custkey_fk",
      """SELECT 'orders_custkey_fk' AS rule, CAST(count(*) AS BIGINT) AS n_violations
        |  FROM orders o WHERE NOT EXISTS
        |    (SELECT 1 FROM customer WHERE c_custkey = o.o_custkey)""".stripMargin,
      t => t.orders.join(t.customer,
          t.orders("o_custkey") === t.customer("c_custkey"), "left_anti")
        .agg(count(lit(1)).as("n"))),
    DqRule("lineitem_orderkey_fk",
      """SELECT 'lineitem_orderkey_fk', CAST(count(*) AS BIGINT)
        |  FROM lineitem l WHERE NOT EXISTS
        |    (SELECT 1 FROM orders WHERE o_orderkey = l.l_orderkey)""".stripMargin,
      t => t.lineitem.join(t.orders,
          t.lineitem("l_orderkey") === t.orders("o_orderkey"), "left_anti")
        .agg(count(lit(1)).as("n"))),
    DqRule("lineitem_suppkey_fk",
      """SELECT 'lineitem_suppkey_fk', CAST(count(*) AS BIGINT)
        |  FROM lineitem l WHERE NOT EXISTS
        |    (SELECT 1 FROM supplier WHERE s_suppkey = l.l_suppkey)""".stripMargin,
      t => t.lineitem.join(t.supplier,
          t.lineitem("l_suppkey") === t.supplier("s_suppkey"), "left_anti")
        .agg(count(lit(1)).as("n"))),
    DqRule("customer_custkey_unique",
      """SELECT 'customer_custkey_unique',
        |    CAST(coalesce(sum(CASE WHEN c > 1 THEN c - 1 END), 0) AS BIGINT)
        |  FROM (SELECT count(*) AS c FROM customer GROUP BY c_custkey)""".stripMargin,
      t => t.customer.groupBy("c_custkey").agg(count(lit(1)).as("c"))
        .agg(coalesce(sum(when(col("c") > 1, col("c") - 1)), lit(0L)).as("n"))),
    DqRule("orders_totalprice_positive",
      """SELECT 'orders_totalprice_positive', CAST(count(*) AS BIGINT)
        |  FROM orders WHERE o_totalprice <= 0""".stripMargin,
      t => t.orders.agg(count_if(col("o_totalprice") <= 0).as("n"))),
    DqRule("lineitem_quantity_range",
      """SELECT 'lineitem_quantity_range', CAST(count(*) AS BIGINT)
        |  FROM lineitem WHERE l_quantity < 1 OR l_quantity > 50""".stripMargin,
      t => t.lineitem.agg(count_if(col("l_quantity") < 1 || col("l_quantity") > 50).as("n"))),
    DqRule("events_value_outlier",
      """SELECT 'events_value_outlier', CAST(count(*) AS BIGINT)
        |  FROM events WHERE value > 400""".stripMargin,
      t => t.events.agg(count_if(col("value") > 400).as("n"))),
    DqRule("events_dup_user_type_minute",
      """SELECT 'events_dup_user_type_minute',
        |    CAST(coalesce(sum(CASE WHEN c > 1 THEN c - 1 END), 0) AS BIGINT)
        |  FROM (SELECT count(*) AS c FROM events
        |        GROUP BY user_id, event_type, date_trunc('minute', CAST(ts AS TIMESTAMP)))""".stripMargin,
      t => t.events.withColumn("m", date_trunc("minute", col("ts_ntz")))
        .groupBy("user_id", "event_type", "m").agg(count(lit(1)).as("c"))
        .agg(coalesce(sum(when(col("c") > 1, col("c") - 1)), lit(0L)).as("n"))),
  )

  /** Constraint sweep: every rule in `dqRules` evaluates to a violation
    * count (0 = the constraint holds). */
  def dqConstraints(spark: SparkSession, sfDir: String): DataFrame = {
    val t = DqTables(Tables.orders(spark, sfDir), Tables.lineitem(spark, sfDir),
      Tables.customer(spark, sfDir), Tables.supplier(spark, sfDir),
      Tables.events(spark, sfDir))
    dqRules.map(r => r.check(t)
        .select(lit(r.name).as("rule"), col("n").cast("long").as("n_violations")))
      .reduce(_.union(_)).orderBy("rule")
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
    // generated from the SAME rule table the operator runs — the oracle
    // cannot drift from the Spark side when a rule is added or edited
    "dq_constraints" -> dqRules.map(_.oracleSelect)
      .mkString("SELECT rule, n_violations FROM (\n", "\n  UNION ALL\n", "\n) ORDER BY rule"),
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
