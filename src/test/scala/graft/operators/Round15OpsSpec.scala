package graft.operators

import graft.{ScaleRules, SparkSpec}

/** Round-15 invariants — the hardening pins the round-14 verdict asked for:
  *
  *  1. `ScaleRules` saturation. The bytes→parallelism rules are linear at
  *     every measured scale, but unclamped they were themselves the 100-TB
  *     bug (100 TB / 128 KB ≈ 8×10⁸ shuffle partitions; 100 TB / 1.4 MB ≈
  *     7×10⁷ output files). Pin that both rules saturate at their declared
  *     maxima AND that the floor/hysteresis behavior below the clamp is
  *     untouched (so every measured-scale plan stays byte-identical —
  *     confirmed by the round-15 same-code sweeps).
  *
  *  2. Proven output dtypes for ALL spec-gated rows. Oracle-checked rows
  *     get their dtypes gated by the driver (preverify PROVEN_DTYPES); the
  *     17 ✗-oracle rows never pass that gate, and the r12 q1_decimal
  *     divergence showed exactly how an unproven dtype hash-fails while
  *     value-identical. One loop over `queries.keySet -- oracleSql.keySet`
  *     catches drift for every current AND future spec-gated row in one
  *     place (round-14 verdict item 3).
  */
class Round15OpsSpec extends SparkSpec {

  test("ScaleRules: bytesScaledCount and wideBuildWidth saturate at their declared maxima") {
    val li = s"$sf01/lineitem.parquet"
    val bytes = ScaleRules.sourceBytes(spark, li)
    assert(bytes > ScaleRules.MaxScaledCount,
      "fixture assumption: sf0.01 lineitem must exceed MaxScaledCount bytes")
    // a 1-byte target demands `bytes` outputs — the clamp must win
    assert(ScaleRules.bytesScaledCount(spark, li, 1L, 8) === ScaleRules.MaxScaledCount)
    // the floor still wins below it (unchanged Round14 contract)
    assert(ScaleRules.bytesScaledCount(spark, li, Long.MaxValue, 8) === 8)
    // a 1-byte per-task budget demands `bytes` tasks — the clamp must win
    // (bytes >> hysteresis * session width, so the wide branch is taken)
    val conf = spark.sessionState.conf.numShufflePartitions
    assert(bytes > ScaleRules.MaxWideWidth.toLong &&
      ScaleRules.MaxWideWidth > ScaleRules.WideBuildHysteresis * conf)
    assert(ScaleRules.wideBuildWidth(spark, li, 1L) === ScaleRules.MaxWideWidth)
    // below spill onset the session width still comes back untouched
    assert(ScaleRules.wideBuildWidth(spark, li) === conf)
  }

  test("every spec-gated (no-oracle) query emits only driver-proven output dtypes") {
    val specGated = graft.SparkEntry.queries.keySet -- graft.SparkEntry.oracleSql.keySet
    // the population itself is pinned: a new ✗-oracle row must be added
    // here CONSCIOUSLY (and SURVEY §2 updated), not slip in ungated
    val declared = Set(
      "agg_approx_distinct", "agg_approx_percentile", "agg_cms_merge",
      "agg_hll_merge", "agg_quantile_merge", "agg_theta_intersect",
      "llm_ann_ivfpq", "llm_bpe_encode", "llm_bpe_merges",
      "llm_dedup_minhash", "llm_minhash_dedup_keep", "llm_mmr_rerank",
      "llm_simhash", "llm_simhash_neardup", "llm_split_neardup_safe",
      "sink_compaction", "sink_zorder")
    assert(specGated === declared,
      s"spec-gated population drifted: +${specGated -- declared} -${declared -- specGated}")
    // schema-only pass: building the plan is enough to read output dtypes
    // (some builders are eagerly side-effecting — sinks write their
    // fixture — but none needs a collect here)
    for (k <- declared.toSeq.sorted) {
      val df = graft.SparkEntry.queries(k)(spark, sf01)
      withClue(s"query $k: ") { assertProvenDtypes(df) }
    }
  }
}
