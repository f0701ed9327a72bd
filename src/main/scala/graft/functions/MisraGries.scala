package graft.functions

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.expressions.Aggregator

/** Candidate set emitted by the sketch (case-class wrapper so the output
  * rides the public product encoder as a struct<ids: array<bigint>>). */
case class FreqCandidates(ids: Seq[Long])

/** Misra-Gries heavy-hitters sketch: a mergeable k-counter frequency
  * summary whose candidate set provably contains EVERY item with true
  * frequency > n/(k+1) (n = stream length). The natural companion to the
  * mergeable HLL sketch (agg_hll_merge) for 100-TB profiling: per-partition
  * summaries are k entries each, merge is counter addition + a trim, so the
  * shuffle moves O(k) per group regardless of data volume — this is what
  * finds the hot keys that drive the skew strategy.
  *
  * Counter semantics (classic): an incoming item already tracked increments
  * its counter; an untracked item claims a free slot if one exists, else ALL
  * counters decrement by one (the arriving item is absorbed with count 0).
  * Merge follows the mergeable-summaries construction: add counters
  * pairwise, then if more than k survive subtract the (k+1)-th largest
  * count from every counter and drop the non-positive — the error bound
  * n/(k+1) is preserved under merge, so partial aggregation is safe.
  *
  * The per-item counts are stream-order dependent (only the CANDIDATE-SET
  * superset guarantee is order-invariant), so consumers must re-count
  * candidates exactly before reporting — see Aggregations.aggFreqItems,
  * which turns the sketch into a deterministic, oracle-checkable exact
  * heavy-hitters query.
  */
class MisraGries(k: Int) extends Aggregator[Long, Map[Long, Long], FreqCandidates] {
  require(k > 0, "MisraGries capacity must be positive")

  def zero: Map[Long, Long] = Map.empty

  def reduce(b: Map[Long, Long], x: Long): Map[Long, Long] =
    b.get(x) match {
      case Some(c) => b.updated(x, c + 1L)
      case None if b.size < k => b.updated(x, 1L)
      // full and x untracked: decrement everything, drop exhausted counters
      case None => b.collect { case (u, c) if c > 1L => u -> (c - 1L) }
    }

  def merge(a: Map[Long, Long], b: Map[Long, Long]): Map[Long, Long] = {
    val sum = b.foldLeft(a) { case (m, (u, c)) => m.updated(u, m.getOrElse(u, 0L) + c) }
    if (sum.size <= k) sum
    else {
      // subtract the (k+1)-th largest count from all, keep the positive
      val vals = sum.valuesIterator.toArray
      java.util.Arrays.sort(vals)
      val cut = vals(sum.size - k - 1)
      sum.collect { case (u, c) if c > cut => u -> (c - cut) }
    }
  }

  def finish(b: Map[Long, Long]): FreqCandidates = FreqCandidates(b.keys.toSeq.sorted)

  def bufferEncoder = Encoders.kryo[Map[Long, Long]]
  def outputEncoder = Encoders.product[FreqCandidates]
}
