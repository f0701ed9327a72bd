package graft.operators

import graft.SparkSpec

/** Round-19 (optimization round) invariants — the reworked operators must
  * keep their outputs bit-identical while changing shape:
  *
  *  - aggGini's partition-parallel rank decomposition (value buckets +
  *    exclusive prefix offsets — the winNtileCume round-7 treatment, per
  *    the r18 verdict's item #3) must be invariant in the bucket count,
  *    and its DECIMAL(38,0) s1 accumulation must survive rank·cents sums
  *    past Long.MaxValue (r18 ADVICE: the LONG sum overflows ~sf12 —
  *    ANSI aborts, non-ANSI silently wraps while DuckDB's HUGEINT does
  *    not).
  *  - ccPropagate's two-hops-per-round amortization (round 19) must still
  *    converge to exact min-label components on odd-diameter graphs (the
  *    fixpoint is reached mid-round there — over-running the second hop
  *    must be a no-op).
  */
class Round19OpsSpec extends SparkSpec {

  import org.apache.spark.sql.functions._

  private def giniRef(rows: Seq[(String, Long, Long)]): Map[String, (Long, BigInt, Double)] =
    rows.groupBy(_._1).map { case (seg, rs) =>
      val sorted = rs.sortBy(r => (r._3, r._2))
      val n = sorted.size.toLong
      val total = sorted.map(r => BigInt(r._3)).sum
      val s1 = sorted.zipWithIndex.map { case (r, i) => BigInt(i + 1) * BigInt(r._3) }.sum
      val gini = 2.0 * s1.toDouble / (n.toDouble * total.toDouble) - (n + 1.0) / n
      seg -> (n, total, math.rint(gini * 1e6) / 1e6)
    }

  test("giniCore: bucket decomposition is invariant in the bucket count and matches the exact reference") {
    import spark.implicits._
    val rng = new scala.util.Random(42)
    val rows = (1L to 400L).map { k =>
      (Seq("AUTO", "BUILDING", "MACH")(rng.nextInt(3)), k, 100L + rng.nextInt(100000))
    }
    val cust = rows.toDF("seg", "c_custkey", "cents")
    val ref = giniRef(rows)
    for (nb <- Seq(1, 3, 17, 256)) {
      val got = Aggregations.giniCore(cust, nb).collect()
        .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
        .toMap
      assert(got.keySet === ref.keySet, s"nb=$nb segment set")
      ref.foreach { case (seg, (n, total, gini)) =>
        val (gn, gt, gg) = got(seg)
        assert(gn === n, s"nb=$nb $seg n_cust")
        assert(BigInt(gt) === total, s"nb=$nb $seg total_cents")
        assert(math.abs(gg - gini) < 1e-9, s"nb=$nb $seg gini: got $gg want $gini")
      }
    }
  }

  test("giniCore: s1 past Long.MaxValue stays exact (decimal accumulation, r18 ADVICE)") {
    import spark.implicits._
    // 2000 customers at ~4.5e15 cents each: total_cents ≈ 9.0e18 (still a
    // legal BIGINT — total is LINEAR in n, it is s1 that is quadratic) but
    // sum(rk*cents) ≈ 9e21 ≫ Long.MaxValue — the old LONG s1 aborts under
    // ANSI (and wraps without it); DECIMAL(38,0) is exact and the final
    // double division matches the BigInt reference.
    val rows = (1L to 2000L).map(k => ("HUGE", k, 4500000000000000L + k * 13L))
    val cust = rows.toDF("seg", "c_custkey", "cents")
    val ref = giniRef(rows)("HUGE")
    val s1 = rows.sortBy(r => (r._3, r._2)).zipWithIndex
      .map { case (r, i) => BigInt(i + 1) * BigInt(r._3) }.sum
    assert(s1 > BigInt(Long.MaxValue),
      "fixture must put s1 = sum(rk*cents) past Long range")
    val r = Aggregations.giniCore(cust, 8).collect()
    assert(r.length === 1)
    assert(r(0).getLong(1) === ref._1)
    assert(BigInt(r(0).getLong(2)) === ref._2)
    assert(math.abs(r(0).getDouble(3) - ref._3) < 1e-9,
      s"overflow-range gini: got ${r(0).getDouble(3)} want ${ref._3}")
  }

  test("ccPropagate: odd-diameter path converges exactly under two-hops-per-round") {
    import spark.implicits._
    // Path 1-2-3-4-5-6 (5 hops of propagation needed — odd, so the
    // fixpoint lands mid-round) plus a separate 2-cycle {10, 11}.
    val und = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L), (10L, 11L))
    val sym = und.flatMap { case (a, b) => Seq((a, b), (b, a)) }.toDF("a", "b")
    val lab = Graph.ccPropagate(sym, 0).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((1L to 6L).forall(lab(_) == 1L), s"path component labels: $lab")
    assert(lab(10L) === 10L && lab(11L) === 10L, s"pair component labels: $lab")
    assert(lab.size === 8)
  }
}
