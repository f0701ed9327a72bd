package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class SkewSpec extends SparkSpec {

  test("salted join equals the plain join, row for row") {
    val fact = Tables.orders(spark, sf001).select("o_orderkey", "o_custkey", "o_totalprice")
    val dim = Tables.customer(spark, sf001)
      .select(col("c_custkey").as("o_custkey"), col("c_mktsegment"))
    val cols = Seq("o_orderkey", "o_custkey", "o_totalprice", "c_mktsegment")
    val plain = fact.join(dim, Seq("o_custkey"), "inner")
      .select(cols.map(col): _*).orderBy("o_orderkey").collect().map(_.toSeq).toSeq
    val salted = Skew.saltedJoin(fact, dim, "o_custkey", 8)
      .select(cols.map(col): _*).orderBy("o_orderkey").collect().map(_.toSeq).toSeq
    assert(salted == plain)
  }

  test("salted build side is replicated exactly salt times") {
    val dim = Tables.customer(spark, sf001).select(col("c_custkey").as("k"))
    val fact = Tables.orders(spark, sf001).select(col("o_custkey").as("k"), col("o_orderkey"))
    val out = Skew.saltedJoin(fact, dim, "k", 4)
    // every fact row still matches exactly one build replica
    assert(out.count() == fact.join(dim, Seq("k")).count())
  }
}
