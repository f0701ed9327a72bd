package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Round-16 invariants — the IVF cell-count law fork (the round-15
  * verdict's item #1: the saturating b = clamp(ceil(log2(N/512)), 0, 8)
  * made BUILD candidate volume ∝N² past N ≈ 131k vectors; the ×300 probe
  * measured the candidate sort spilling 268.7 GB).
  *
  * The law itself is pinned value-by-value so a future edit cannot
  * silently move the knee, the √N slope, or the clamp: the oracle SQL
  * replays the same formula (ivfSql `bparam`), so any drift here is a
  * three-SF hash failure waiting for a bigger corpus — this spec makes it
  * a unit failure today.
  */
class Round16OpsSpec extends SparkSpec {

  test("IVF bucket-bit law: ~512-row cells to the 131k knee, sqrt(N) cells past it, clamped at 16") {
    import spark.implicits._
    val expected = Seq(
      // regime 1 (x ≤ 8): identical to the pre-round-16 law — every
      // oracle SF (200 / 500 / 2000) and the ×10/×30 sweep points
      200L -> 0, 500L -> 0, 2000L -> 2, 20000L -> 6, 60000L -> 7,
      // the knee itself: continuous (both branches give 8 at N = 512·2^8)
      131072L -> 8,
      // regime 2 (√N): the old law CLAMPED to 8 here — 9/10 are the fork
      200000L -> 9, // the graded ×100 point
      600000L -> 10, // the ×300 stretch-probe point
      // ×4 data per +1 bit under the √ law (2^b doubles as N quadruples)
      2097152L -> 10, 8388608L -> 11,
      // the clamp: an order of magnitude past any reachable corpus
      1000000000000L -> 16)
    val got = expected.map(_._1).toDF("n")
      .select(col("n"), LlmVector.bucketBits(col("n")).as("b"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    expected.foreach { case (n, b) =>
      assert(got(n) === b, s"bucketBits($n) drifted: got ${got(n)}, law says $b")
    }
  }

  test("IVF cell key separates labels: bucket range stays below the label shift") {
    // vcell = label·2^MaxBits + bucket; with MaxBits=16 the clamp above
    // guarantees bucket < 2^16, so cells can never collide across labels.
    // Pin via the law: the largest b the clamp emits is 16.
    import spark.implicits._
    val maxB = Seq(Long.MaxValue / 2).toDF("n")
      .select(LlmVector.bucketBits(col("n"))).head().getInt(0)
    assert(maxB === 16, s"clamp drifted to $maxB — vcell label shift must move with it")
  }
}
