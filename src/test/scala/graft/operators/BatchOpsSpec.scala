package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Coverage for the non-oracle-checkable batch rows (SURVEY.md §2.1, §2.4). */
class BatchOpsSpec extends SparkSpec {

  test("csv/json roundtrip preserves per-flag counts") {
    val out = Scans.sourceCsvRoundtrip(spark, sf001).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getLong(r.fieldIndex("csv_rows")) == r.getLong(r.fieldIndex("json_rows")),
        s"csv/json count mismatch for flag ${r.get(0)}")
    }
    val direct = Tables.lineitem(spark, sf001).filter(col("l_orderkey") < 1000)
      .groupBy("l_returnflag").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val viaCsv = out.map(r => r.getString(0) -> r.getLong(r.fieldIndex("csv_rows"))).toMap
    assert(viaCsv == direct, "roundtrip counts must equal direct parquet counts")
  }

  test("orc roundtrip preserves per-flag counts") {
    val orc = Scans.sourceOrcRoundtrip(spark, sf001).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val direct = Tables.lineitem(spark, sf001).filter(col("l_orderkey") < 1000)
      .groupBy("l_returnflag").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(orc == direct)
  }

  test("approx_count_distinct within 5% of exact") {
    val approx = Aggregations.aggApproxDistinct(spark, sf01).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = Tables.events(spark, sf01)
      .groupBy("event_type").agg(countDistinct("user_id").as("d")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (k, e) =>
      val a = approx(k)
      assert(math.abs(a - e).toDouble / e <= 0.05, s"$k: approx $a vs exact $e")
    }
  }

  test("approx_percentile within 2% of exact percentiles") {
    val approx = Aggregations.aggApproxPercentile(spark, sf01).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val exact = Aggregations.aggPercentileExact(spark, sf01).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    exact.foreach { case (k, (p50, p90)) =>
      val (a50, a90) = approx(k)
      assert(math.abs(a50 - p50) / p50 <= 0.02, s"$k p50: $a50 vs $p50")
      assert(math.abs(a90 - p90) / p90 <= 0.02, s"$k p90: $a90 vs $p90")
    }
  }

  test("flagship entry returns rows on sf0.001") {
    assert(graft.SparkEntry.entry(spark).count() > 0)
  }
}
