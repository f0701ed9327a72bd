package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._

/** Invariant checks for the second round-6 operator batch: bloom-prefilter
  * correctness + selectivity, split leak-freedom, resample monotonicity,
  * attribution window math, and the IVM merge's plan shape — properties
  * beyond (or orthogonal to) the DuckDB hash compare, asserted at a second
  * SF (sf0.001) like the rest of the spec suite. */
class Round6bOpsSpec extends SparkSpec {

  test("bloom prefilter keeps exactly the semi-join rows and actually prunes") {
    graft.functions.BloomExprs.register(spark)
    val urgent = Tables.orders(spark, sf001)
      .filter(col("o_orderpriority") === "1-URGENT").select("o_orderkey")
    val bf = urgent.stat.bloomFilter("o_orderkey", math.max(urgent.count(), 1L), 0.01)
    val bytes = { val b = new java.io.ByteArrayOutputStream(); bf.writeTo(b); b.toByteArray }
    val li = Tables.lineitem(spark, sf001)
    val nAll = li.count()
    val prefiltered = li.filter(
      call_function("graft_bloom_might_contain", lit(bytes), col("l_orderkey"))).count()
    val exact = li.join(urgent, col("l_orderkey") === col("o_orderkey"), "left_semi").count()
    // no false negatives: the prefilter may only ever KEEP extra rows
    assert(prefiltered >= exact, "bloom dropped true matches (false negative)")
    // at 1% fpp the overshoot is bounded: fp rows ≤ ~3·fpp·non-matches
    assert(prefiltered - exact <= (0.03 * (nAll - exact)).toLong + 1,
      s"bloom false-positive rate far above configured 1% ($prefiltered vs $exact of $nAll)")
    // and it genuinely prunes — urgent is 1 of 5 priorities, so ~80% drops
    assert(prefiltered < nAll * 2 / 3, "prefilter should prune the majority of the fact")
  }

  test("bloom probe expression codegens inside the scan stage (no UDF barrier)") {
    graft.functions.BloomExprs.register(spark)
    val plan = Joins.joinBloomPrefilter(spark, sf001).queryExecution
      .explainString(ExplainMode.fromString("formatted"))
    assert(plan.contains("graft_bloom_might_contain"), plan)
    assert(!plan.contains("BatchEvalPython") && !plan.contains("ScalaUDF"),
      s"bloom probe must be a native expression, not a UDF:\n$plan")
  }

  test("stratified split is exhaustive, disjoint, and content-keyed (no leakage)") {
    val docs = Tables.documents(spark, sf001)
      .withColumn("norm", lower(trim(col("text"))))
      .withColumn("subset",
        when(md5(col("norm")) < "cc", lit("train"))
          .when(md5(col("norm")) < "e6", lit("val"))
          .otherwise(lit("test")))
    // identical normalized text can never straddle subsets
    assert(docs.groupBy("norm").agg(countDistinct("subset").as("k"))
      .filter(col("k") > 1).count() === 0, "duplicate text split across subsets")
    // the three subsets partition the corpus
    val sizes = docs.groupBy("subset").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sizes.values.sum === docs.count())
    assert(sizes.keySet.subsetOf(Set("train", "val", "test")))
    assert(sizes.getOrElse("train", 0L) > sizes.getOrElse("val", 0L),
      "train must dominate at ~80/10/10")
  }

  test("domain resample keeps at most n_before per domain and respects the rate") {
    val out = LlmText.llmDomainResample(spark, sf001).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (nBefore, rate, nKept) = (r.getLong(2), r.getDouble(3), r.getLong(4))
      assert(nKept <= nBefore, s"kept more than existed: $r")
      assert(rate > 0.0 && rate <= 1.0, s"keep_rate out of range: $r")
      if (rate == 1.0) assert(nKept === nBefore, s"rate 1.0 must keep everything: $r")
    }
  }

  test("attribution credits only clicks inside the 6h lookback") {
    val ev = Tables.events(spark, sf001)
      .filter(col("event_type").isin("click", "purchase"))
    val out = EventTime.evtAttribution(spark, sf001)
    val nPurch = ev.filter(col("event_type") === "purchase").count()
    val rows = out.collect()
    assert(rows.map(_.getLong(1)).sum === nPurch, "every purchase lands in exactly one bucket")
    // hour buckets are 0..23; the null bucket collects unattributed
    rows.filter(!_.isNullAt(0)).foreach { r =>
      assert(r.getLong(0) >= 0 && r.getLong(0) <= 23, s"bad hour bucket: $r")
    }
  }

  test("compacted sorted layout measurably skips row groups for key-range scans") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    Sinks.sinkCompaction(spark, sf001).collect(): Unit
    val tmp = s"${Scans.tmpRoot(spark)}/compact_lineitem"
    val all = spark.read.parquet(tmp)
    val total = all.count()
    // a predicate inside the FIRST file's key range: disjoint per-file
    // ranges + parquet footer min/max should let the reader skip the rest
    val loKey = all.agg(min("l_orderkey")).collect()(0).getLong(0)
    val narrow = spark.read.parquet(tmp).filter(col("l_orderkey") <= loKey + 10)
    narrow.collect(): Unit
    val plan = narrow.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val scan = plan.collect { case s: FileSourceScanExec => s }.head
    assert(scan.metadata.getOrElse("PushedFilters", "[]") != "[]",
      "key filter did not reach the parquet scan")
    val scanned = scan.metrics("numOutputRows").value
    // 4 balanced range-partitioned files ⇒ the narrow scan must touch ~1 of
    // them; 40% leaves slack for range-sampling imbalance
    assert(scanned <= (total * 0.4).toLong,
      s"scan emitted $scanned of $total rows — row-group skipping not effective")
  }

  test("incremental agg merge joins view⋈deltas, never re-aggregating the base twice") {
    val plan = Aggregations.aggIncremental(spark, sf001).queryExecution
      .explainString(ExplainMode.fromString("formatted"))
    assert(plan.contains("FullOuter"), s"IVM merge must be a full-outer join:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"IVM merge degenerated to a cross product:\n$plan")
  }
}
