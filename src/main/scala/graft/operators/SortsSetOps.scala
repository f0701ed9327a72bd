package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Sorts / limits / top-k (SURVEY.md §2.6).
  *
  * Scale notes: `topk_global` compiles to TakeOrderedAndProjectExec — per-
  * partition top-k then a k-sized driver merge, never a full global sort.
  * Global sorts elsewhere are range-partitioned (sampling-based) so they
  * parallelize at scale.
  */
object Sorts {

  /** Multi-key sort with injected nulls ordered NULLS LAST. */
  def sortMultiNulls(spark: SparkSession, sfDir: String): DataFrame =
    Tables.orders(spark, sfDir)
      .select(col("o_orderkey"), col("o_orderstatus"),
        when(col("o_orderkey") % 97 === 0, lit(null)).otherwise(col("o_totalprice")).as("tp"))
      .orderBy(asc("o_orderstatus"), desc_nulls_last("tp"), asc("o_orderkey"))

  /** Global top-20 by price → TakeOrderedAndProjectExec (no full sort). */
  def topkGlobal(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .select("l_extendedprice", "l_orderkey", "l_linenumber")
      .orderBy(desc("l_extendedprice"), asc("l_orderkey"), asc("l_linenumber"))
      .limit(20)

  /** Pagination: page 3 of size 50 under a total order. */
  def limitOffset(spark: SparkSession, sfDir: String): DataFrame =
    Tables.orders(spark, sfDir)
      .select("o_orderkey", "o_custkey", "o_totalprice")
      .orderBy("o_orderkey")
      .offset(100).limit(50)

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sort_multi_nulls" -> sortMultiNulls,
    "topk_global" -> topkGlobal,
    "limit_offset" -> limitOffset,
  )

  val oracles: Map[String, String] = Map(
    "sort_multi_nulls" ->
      """SELECT o_orderkey, o_orderstatus,
        |  CASE WHEN o_orderkey % 97 = 0 THEN NULL ELSE o_totalprice END AS tp
        |FROM orders
        |ORDER BY o_orderstatus ASC, tp DESC NULLS LAST, o_orderkey ASC""".stripMargin,
    "topk_global" ->
      """SELECT l_extendedprice, l_orderkey, l_linenumber FROM lineitem
        |ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber LIMIT 20""".stripMargin,
    "limit_offset" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_orderkey LIMIT 50 OFFSET 100""".stripMargin,
  )
}

/** Set operations (SURVEY.md §2.7). Distinct variants shuffle on the full
  * row; ALL variants use Spark's replicated-row semantics (exceptAll /
  * intersectAll) — both map to single-shuffle plans. */
object SetOps {

  private def custkeysOfYear(spark: SparkSession, sfDir: String, y: Int): DataFrame =
    Tables.orders(spark, sfDir)
      .filter(year(col("o_orderdate")) === y)
      .select("o_custkey").distinct()

  /** UNION ALL of the 1995 and 1996 customer sets, with duplicate counting. */
  def setUnionAll(spark: SparkSession, sfDir: String): DataFrame =
    custkeysOfYear(spark, sfDir, 1995)
      .unionByName(custkeysOfYear(spark, sfDir, 1996))
      .groupBy("o_custkey").agg(count(lit(1)).as("appearances"))
      .orderBy("o_custkey")

  def setUnionDistinct(spark: SparkSession, sfDir: String): DataFrame =
    custkeysOfYear(spark, sfDir, 1995)
      .union(custkeysOfYear(spark, sfDir, 1996)).distinct()
      .orderBy("o_custkey")

  def setIntersect(spark: SparkSession, sfDir: String): DataFrame =
    custkeysOfYear(spark, sfDir, 1995)
      .intersect(custkeysOfYear(spark, sfDir, 1996))
      .orderBy("o_custkey")

  def setExcept(spark: SparkSession, sfDir: String): DataFrame =
    custkeysOfYear(spark, sfDir, 1995)
      .except(custkeysOfYear(spark, sfDir, 1996))
      .orderBy("o_custkey")

  private def flagsOfYear(spark: SparkSession, sfDir: String, y: Int): DataFrame =
    Tables.lineitem(spark, sfDir)
      .filter(year(col("l_shipdate")) === y)
      .select("l_returnflag")

  /** Multiset EXCEPT ALL on returnflag occurrences (1996 minus 1997),
    * summarized as per-flag surviving multiplicities. */
  def setExceptAll(spark: SparkSession, sfDir: String): DataFrame =
    flagsOfYear(spark, sfDir, 1996)
      .exceptAll(flagsOfYear(spark, sfDir, 1997))
      .groupBy("l_returnflag").agg(count(lit(1)).as("multiplicity"))
      .orderBy("l_returnflag")

  /** Multiset INTERSECT ALL on returnflag occurrences (1996 ∩ 1997). */
  def setIntersectAll(spark: SparkSession, sfDir: String): DataFrame =
    flagsOfYear(spark, sfDir, 1996)
      .intersectAll(flagsOfYear(spark, sfDir, 1997))
      .groupBy("l_returnflag").agg(count(lit(1)).as("multiplicity"))
      .orderBy("l_returnflag")

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "set_union_all" -> setUnionAll,
    "set_union_distinct" -> setUnionDistinct,
    "set_intersect" -> setIntersect,
    "set_except" -> setExcept,
    "set_except_all" -> setExceptAll,
    "set_intersect_all" -> setIntersectAll,
  )

  private val y95 = "SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1995"
  private val y96 = "SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1996"
  private val f96 = "SELECT l_returnflag FROM lineitem WHERE year(l_shipdate) = 1996"
  private val f97 = "SELECT l_returnflag FROM lineitem WHERE year(l_shipdate) = 1997"

  val oracles: Map[String, String] = Map(
    "set_union_all" ->
      s"""SELECT o_custkey, count(*) AS appearances
         |FROM (($y95) UNION ALL ($y96))
         |GROUP BY o_custkey ORDER BY o_custkey""".stripMargin,
    "set_union_distinct" ->
      s"($y95) UNION ($y96) ORDER BY o_custkey",
    "set_intersect" ->
      s"($y95) INTERSECT ($y96) ORDER BY o_custkey",
    "set_except" ->
      s"($y95) EXCEPT ($y96) ORDER BY o_custkey",
    "set_except_all" ->
      s"""SELECT l_returnflag, count(*) AS multiplicity
         |FROM (($f96) EXCEPT ALL ($f97))
         |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "set_intersect_all" ->
      s"""SELECT l_returnflag, count(*) AS multiplicity
         |FROM (($f96) INTERSECT ALL ($f97))
         |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
  )
}
