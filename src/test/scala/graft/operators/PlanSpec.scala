package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._

/** Physical-plan assertions (SURVEY.md §4): these lock in the *scale*
  * properties — pushdown, pruning, broadcast, top-k fusion, partial
  * aggregation — so a refactor that silently deoptimizes a plan fails CI,
  * not the 100 TB run. */
class PlanSpec extends SparkSpec {

  private def formatted(df: DataFrame): String =
    df.queryExecution.explainString(ExplainMode.fromString("formatted"))

  test("scan_pruned reads only the projected columns from parquet") {
    val plan = formatted(Scans.scanPruned(spark, sf001))
    val readSchema = plan.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(readSchema.contains("l_orderkey") && readSchema.contains("l_quantity"))
    assert(!readSchema.contains("l_extendedprice"), s"column pruning failed: $readSchema")
  }

  test("filter predicates reach the parquet scan as PushedFilters") {
    val plan = formatted(Filters.filterRangeInLike(spark, sf001))
    val pushed = plan.linesIterator.find(_.contains("PushedFilters")).getOrElse("")
    assert(pushed.contains("GreaterThanOrEqual(l_shipdate") || pushed.contains("In(l_returnflag"),
      s"no predicates pushed: $pushed")
  }

  test("star join broadcasts all three dimension tables") {
    val plan = formatted(Joins.joinBroadcast(spark, sf001))
    // formatted explain mentions each node in both the tree and detail section
    val broadcasts = "BroadcastHashJoin".r.findAllIn(plan).size
    assert(broadcasts >= 3, s"expected 3 broadcast joins, saw $broadcasts:\n$plan")
    assert(!plan.contains("SortMergeJoin"), "no dimension join should shuffle")
  }

  test("merge hint forces a sort-merge join") {
    val plan = formatted(Joins.joinSortMerge(spark, sf001))
    assert(plan.contains("SortMergeJoin"), plan)
  }

  test("global top-k fuses to TakeOrderedAndProject (no full sort)") {
    val plan = formatted(Sorts.topkGlobal(spark, sf001))
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("flagship aggregation is partial (map-side) then final") {
    val plan = formatted(Aggregations.aggPricingSummary(spark, sf001))
    val hashAggs = "HashAggregate".r.findAllIn(plan).size
    assert(hashAggs >= 2, s"expected partial+final HashAggregate, saw $hashAggs")
    assert(plan.contains("partial_sum"), "map-side partial aggregation missing")
    assert(plan.contains("hashpartitioning"), "final agg must follow a hash shuffle")
  }

  test("theta-range join stays a hash/merge join on the equi key, not nested-loop") {
    val plan = formatted(Joins.joinThetaRange(spark, sf001))
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"range join degenerated to a cross product:\n$plan")
  }

  test("composite Q3 pushes date filters to both fact scans and broadcasts customer") {
    val plan = formatted(Composite.q3ShippingPriority(spark, sf001))
    val pushedLines = plan.linesIterator.filter(_.contains("PushedFilters")).toSeq
    assert(pushedLines.exists(_.contains("l_shipdate")), "lineitem date filter not pushed")
    assert(pushedLines.exists(_.contains("o_orderdate")), "orders date filter not pushed")
    assert(plan.contains("BroadcastHashJoin"), "customer dimension should broadcast")
  }

  test("partitioned read prunes to the filtered partition") {
    // materialize the partitioned layout first (the query writes then reads)
    Scans.sourcePartitionedPrune(spark, sf001).collect()
    val tmp = s"${Scans.tmpRoot(spark)}/part_orders_${Scans.dirKey(sf001)}"
    val plan = formatted(spark.read.parquet(tmp).filter(col("o_year") === 1996)
      .groupBy("o_orderstatus").count())
    val pf = plan.linesIterator.find(_.contains("PartitionFilters")).getOrElse("")
    assert(pf.contains("o_year"), s"partition filter not applied: $pf")
  }

  test("lexicon sentiment broadcasts the lexicon side") {
    val plan = formatted(LlmText.llmSentimentLexicon(spark, sf001))
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"), plan)
  }

  test("embedding similarity queries never plan a nested-loop join") {
    // The exact all-pairs path is a fragment-replicate equi-join and the IVF
    // path scores centroids through a constant-key broadcast HASH join, so
    // no declared embedding query may fall back to BroadcastNestedLoopJoin.
    val embedding = Seq("llm_cosine_topk", "llm_knn_label", "llm_ann_ivf", "llm_embed_neardup")
    embedding.foreach { name =>
      val plan = formatted(graft.SparkEntry.queries(name)(spark, sf001))
      assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
        s"$name plans a nested-loop join:\n$plan")
    }
  }

  test("IVF cell scoring runs in-row, never as a materialized N×k fan-out") {
    // Round 8: the cell ranking is computed per row by the native
    // graft_ivf_topcells expression against the broadcast centroid matrix
    // — no (vector, centroid) pair relation, no per-vector ranking sort
    // (that sort was ~61 GB of spill traffic at the 100× sweep point).
    // If the scorer ever falls back to the exploded-pairs formulation, a
    // Window ordered by dist2cell reappears — this pin makes that a test
    // failure instead of a silent 3× scale regression.
    val plan = formatted(LlmVector.llmAnnIvf(spark, sf001))
    assert(plan.contains("graft_ivf_topcells"),
      s"cell scoring must use the native in-row scorer:\n$plan")
    assert(!plan.contains("dist2cell DESC"),
      s"cell ranking must not re-sort a materialized N×k relation:\n$plan")
  }

  test("exact cosine pair join stays a shuffled hash join, not a broadcast") {
    // the whole point of the numbered repartition + shuffle_hash hint: left
    // alone, AQE broadcasts the ~20 MB replicated fragment side and the
    // O(n²) dot stage collapses to one or two tasks
    val plan = formatted(LlmVector.llmCosineTopk(spark, sf001))
    assert(plan.contains("ShuffledHashJoin"),
      s"fragment-replicate join lost its shuffle-parallel shape:\n$plan")
  }

  test("bigram LM broadcasts its vocabulary-sized count tables") {
    val plan = formatted(LlmText.llmBigramLm(spark, sf001))
    val broadcasts = "BroadcastHashJoin".r.findAllIn(plan).size
    assert(broadcasts >= 3, s"expected bigram/unigram/vocab broadcasts, saw $broadcasts")
  }

  test("q6 pushes all three predicates into the parquet scan") {
    val plan = formatted(Tpch.q6ForecastRevenue(spark, sf001))
    val pushed = plan.linesIterator.find(_.contains("PushedFilters")).getOrElse("")
    assert(pushed.contains("l_shipdate") && pushed.contains("l_discount") &&
      pushed.contains("l_quantity"), s"scan-only query must push every predicate: $pushed")
  }

  test("contamination joins hashed grams through a broadcast of the eval side") {
    val plan = formatted(LlmText.llmContamination(spark, sf001))
    assert(plan.contains("BroadcastHashJoin"), "tiny eval side must broadcast")
    assert(!plan.contains("SortMergeJoin"), "gram join must not shuffle the corpus side")
  }

  test("domain resample broadcasts the per-domain rate table") {
    val plan = formatted(LlmText.llmDomainResample(spark, sf001))
    assert(plan.contains("BroadcastHashJoin"),
      s"rates (cardinality = #domains) must broadcast:\n$plan")
  }

  test("fuzzy join candidate stage is SHUFFLED on the signature key, never broadcast") {
    // The broadcast form is the scale killer this round's sweep caught:
    // Catalyst can't see through the deletion-variant explode, estimates
    // both sides customer-sized, and picks a broadcast hash join whose
    // build side materializes the full exploded signature table on the
    // driver (9.9 GiB at a 30× corpus — over the 8 GiB broadcast limit).
    // The merge (sort-merge) hint in joinFuzzyMatch pins the shuffled plan
    // (shuffle_hash OOM'd at 100× — see the Joins.scala note); this test
    // pins the hint.
    val plan = formatted(Joins.joinFuzzyMatch(spark, sf001))
    assert(plan.contains("ShuffledHashJoin") || plan.contains("SortMergeJoin"),
      s"candidate join must shuffle on (nk, seg, sig):\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"fuzzy join degenerated to all-pairs:\n$plan")
    // the only broadcast allowed is the 25-row nation dimension at the end
    val bhjNodes = """\(\d+\) BroadcastHashJoin""".r.findAllIn(plan).size
    assert(bhjNodes <= 1,
      s"expected at most the nation broadcast, saw $bhjNodes broadcast joins:\n$plan")
  }

  test("cohort LTV broadcasts the per-week cohort-size table") {
    val plan = formatted(EventTime.evtCohortLtv(spark, sf001))
    assert(plan.contains("BroadcastHashJoin"),
      s"cohort sizes (cardinality = #weeks) must broadcast:\n$plan")
  }

  test("dpp query plans a dynamic pruning subquery on the fact scan") {
    val plan = formatted(Scans.sourceDppPrune(spark, sf001))
    val pf = plan.linesIterator.find(_.contains("PartitionFilters")).getOrElse("")
    assert(pf.contains("dynamicpruning"),
      s"fact scan must carry a runtime pruning filter on o_year: $pf\n$plan")
  }

  test("dq_observe collects its metrics on the main pass (CollectMetrics node)") {
    val obs = org.apache.spark.sql.Observation()
    val observed = graft.Tables.lineitem(spark, sf001)
      .observe(obs, count(lit(1)).as("n_rows"))
    assert(formatted(observed).contains("CollectMetrics"),
      "observe() metrics must ride the scan as a CollectMetrics node")
  }

  test("dq_profile computes every column's stats from ONE scan") {
    // the profile's scale claim: multi-column distinct counting is a single
    // Expand over one pass, never a scan (or worse, a shuffle) per column
    val plan = formatted(Quality.dqProfile(spark, sf001))
    // count numbered detail entries — the tree section repeats each node
    val scans = """\(\d+\) Scan parquet""".r.findAllIn(plan).size
    assert(scans == 1, s"expected exactly 1 scan, saw $scans")
    assert(plan.contains("Expand"), "multi-distinct should plan a single Expand")
  }

  test("agg_histogram broadcasts its 1-row bounds, never collects or re-sorts") {
    val plan = formatted(Aggregations.aggHistogram(spark, sf001))
    assert(plan.contains("BroadcastHashJoin"), "bounds row must broadcast (Fanout)")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("CartesianProduct"))
  }

  test("sql_qualify plans the rank-limit pushdown (WindowGroupLimit)") {
    // the QUALIFY desugaring's scale claim: the rn <= 3 filter is pushed
    // below the window as a top-k-per-group limit — partial (pre-shuffle)
    // AND final — so the full per-partition sort never materializes
    val plan = formatted(Composite.sqlQualify(spark, sf001))
    val limits = """\(\d+\) WindowGroupLimit""".r.findAllIn(plan).size
    assert(limits == 2, s"expected partial+final WindowGroupLimit, saw $limits")
  }

  test("no declared query plans an accidental cross product") {
    // Intentional pairwise/cross plans: the bounded 25×5 cross-join grid,
    // and agg_theta_intersect's pairwise sketch comparison — a theta
    // (type_a < type_b) self-join over the ≤|event_type| MERGED sketch
    // rows (5 here), deliberately planned as a broadcast nested loop on a
    // planning-sized relation so the whole query stays one lazy plan.
    // ts_theil_sen's pairwise-slope enumeration is the OPERATOR'S
    // DEFINITION (median of all pairwise slopes) over the ≤365-row
    // windowed daily table — a bounded broadcast nested loop by design.
    // The similarity-search queries are covered (un-whitelisted) above.
    val whitelist = Set("join_cross", "agg_theta_intersect", "ts_theil_sen")
    val offenders = graft.SparkEntry.queries.toSeq
      .filterNot { case (name, _) => whitelist(name) }
      .flatMap { case (name, fn) =>
        // analysis only — plans are built, never executed
        val plan = formatted(fn(spark, sf001))
        if (plan.contains("CartesianProduct") || plan.contains("BroadcastNestedLoopJoin"))
          Some(name)
        else None
      }
    assert(offenders.isEmpty, s"cross products in: ${offenders.sorted.mkString(", ")}")
  }
}
