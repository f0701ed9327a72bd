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

  test("AQE splits the skewed partition of a hot-key sort-merge join") {
    // Locks the declared automatic-skew story to a mechanical check, the way
    // PlanSpec locks broadcasts: craft a 95%-one-key join, lower the skew
    // thresholds to test scale, and assert OptimizeSkewedJoin actually
    // split the hot partition (the final adaptive SMJ is marked skew=true).
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.adaptive.enabled",
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold"
    ).map(k => k -> conf.getOption(k))
    try {
      conf.set("spark.sql.adaptive.enabled", "true")
      conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "32KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")
      // force the shuffle join AQE skew-handling applies to (not a broadcast)
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      val hot = spark.range(200000)
        .select(when(col("id") % 20 =!= 0, lit(0L)).otherwise(col("id") % 1000).as("k"),
          col("id").as("payload"))
      val dim = spark.range(1000).select(col("id").as("k"), (col("id") * 2).as("v"))
      val joined = hot.join(dim, "k")
      // collect() executes THIS DataFrame's queryExecution (count() would
      // build a different one), finalizing the adaptive plan we inspect
      assert(joined.collect().length === 200000, "unique-keyed build side: row-preserving join")
      val finalPlan = joined.queryExecution.executedPlan.toString
      assert(finalPlan.contains("skew=true") || finalPlan.contains("skewed"),
        s"OptimizeSkewedJoin did not split the hot partition:\n$finalPlan")
      // and the split is result-invariant for the salted fallback too
      val salted = Skew.saltedJoin(hot, dim, "k", 8)
      assert(salted.count() === 200000L, "salting under AQE skew-split stays row-preserving")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }
}
