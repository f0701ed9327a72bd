package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Bucketing: the pre-shuffle co-location story for repeated fact⋈fact joins
  * at 100 TB — write both sides bucketed on the join key once, and every
  * subsequent join skips its Exchange. */
class BucketingSpec extends SparkSpec {

  test("join of co-bucketed tables plans without a shuffle on the bucketed side") {
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    // the in-memory catalog is per-JVM but warehouse dirs persist on disk —
    // clear stale locations from previous runs
    for (t <- Seq("b_orders", "b_lineitem")) {
      val dir = new java.io.File(s"${spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:")}/$t")
      if (dir.exists()) {
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(): Unit
        }
        rm(dir)
      }
    }
    Tables.orders(spark, sf001)
      .write.mode("overwrite").bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("b_orders")
    Tables.lineitem(spark, sf001)
      .select(col("l_orderkey"), col("l_quantity"))
      .write.mode("overwrite").bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable("b_lineitem")

    // the sf0.001 tables are broadcast-sized; disable broadcast so the join
    // actually exercises the bucketed sort-merge path it would take at scale
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      bucketedJoinAssertions()
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
  }

  private def bucketedJoinAssertions(): Unit = {
    val joined = spark.table("b_lineitem")
      .join(spark.table("b_orders"), col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderstatus").agg(sum("l_quantity").as("q"))
    val plan = joined.queryExecution.executedPlan.toString

    // co-bucketed equi-join: no Exchange may appear below the join
    val joinIdx = plan.indexOf("SortMergeJoin")
    assert(joinIdx >= 0, s"expected a sort-merge join over bucketed tables:\n$plan")
    assert(!plan.substring(joinIdx).contains("Exchange"),
      s"bucketed join must not shuffle its inputs:\n$plan")

    // and the result is still correct
    val viaBuckets = joined.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val direct = Tables.lineitem(spark, sf001)
      .join(Tables.orders(spark, sf001), col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderstatus").agg(sum("l_quantity").as("q"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(viaBuckets.keySet == direct.keySet)
    viaBuckets.foreach { case (k, v) => assert(math.abs(v - direct(k)) < 1e-6) }
  }

  test("sink_bucketed_join plans its join without an Exchange below it") {
    // the declared operator (merge-hinted, so no broadcast threshold
    // tweak needed): its join subtree must read co-located buckets in
    // place — exchanges may appear only ABOVE the join (distinct-agg
    // expand, final sort)
    val df = Sinks.sinkBucketedJoin(spark, sf001)
    val plan = df.queryExecution.executedPlan.toString
    val joinIdx = plan.indexOf("SortMergeJoin")
    assert(joinIdx >= 0, s"expected a sort-merge join over bucketed tables:\n$plan")
    assert(!plan.substring(joinIdx).contains("Exchange"),
      s"bucketed join must not shuffle its inputs:\n$plan")

    // and its rows match the same join+agg over the raw parquet
    val direct = Tables.lineitem(spark, sf001)
      .join(Tables.orders(spark, sf001), col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderstatus", "l_linestatus")
      .agg(count(lit(1)).as("n_lines"),
        round(sum("l_quantity"), 2).as("sum_qty"),
        countDistinct("l_partkey").as("n_parts"))
      .orderBy("o_orderstatus", "l_linestatus")
    assert(df.collect().toSeq == direct.collect().toSeq)
  }
}
