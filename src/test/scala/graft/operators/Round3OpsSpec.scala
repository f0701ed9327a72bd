package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Invariant checks for the round-3 operators, complementing their DuckDB
  * oracle rows with semantic properties the hash-compare can't express
  * (the oracle proves Spark ≡ DuckDB; these prove both mean what the
  * operator claims). Runs on sf0.001. */
class Round3OpsSpec extends SparkSpec {

  test("ohlc bars: low <= open/close <= high, and volume sums to the total") {
    val bars = TimeSeries.tsOhlc(spark, sf001)
      .withColumn("ok",
        col("low") <= col("open") && col("open") <= col("high") &&
          col("low") <= col("close") && col("close") <= col("high"))
    assert(bars.filter(!col("ok")).count() === 0)
    val total = bars.agg(round(sum("volume"), 0)).head().getDouble(0)
    val raw = graft.Tables.events(spark, sf001).agg(round(sum("value"), 0)).head().getDouble(0)
    // per-bar 2-decimal rounding can drift the sum by < 0.005 per bar
    assert(math.abs(total - raw) <= 1.0)
  }

  test("ewma equals the first revenue on day one and stays within series bounds") {
    val rows = TimeSeries.winEwma(spark, sf001).select("rev", "ewma").collect()
    assert(math.abs(rows.head.getDouble(1) - rows.head.getDouble(0)) < 1e-6,
      "a 1-deep window renormalizes to exactly the first observation")
    val (lo, hi) = (rows.map(_.getDouble(0)).min, rows.map(_.getDouble(0)).max)
    assert(rows.forall { r => r.getDouble(1) >= lo - 1e-6 && r.getDouble(1) <= hi + 1e-6 },
      "a convex combination of observations cannot leave their range")
  }

  test("markov transition probabilities sum to 1 per current state") {
    val bad = EventTime.evtMarkov(spark, sf001)
      .groupBy("cur").agg(round(sum("p"), 2).as("s"))
      .filter(abs(col("s") - 1.0) > 0.02) // 4-decimal rounding × k next-states
    assert(bad.count() === 0)
  }

  test("retention offset-0 users equal the cohort sizes") {
    val r = EventTime.evtRetention(spark, sf001)
    val offset0 = r.filter(col("offset_days") === 0)
      .select(col("cohort"), col("users")).collect()
      .map(x => x.getDate(0).toString -> x.getLong(1)).toMap
    val cohorts = graft.Tables.events(spark, sf001)
      .select(col("user_id"), to_date(col("ts_ntz")).as("day"))
      .groupBy("user_id").agg(min("day").as("cohort"))
      .groupBy("cohort").agg(count(lit(1)).as("n")).collect()
      .map(x => x.getDate(0).toString -> x.getLong(1)).toMap
    assert(offset0 === cohorts, "every cohort member is active on their own first day")
  }

  test("drawdown is non-positive and a monotone-increasing series has zero drawdown") {
    import spark.implicits._
    val dd = TimeSeries.tsDrawdown(spark, sf001).collect()
    assert(dd.nonEmpty && dd.forall(_.getDouble(1) <= 0.0))
    // crafted monotone series through the same algebra used by the operator
    val s = Seq(1.0, 2.0, 3.0).toDF("rev")
      .withColumn("day", monotonically_increasing_id())
    val w = org.apache.spark.sql.expressions.Window.orderBy("day")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val worst = s.withColumn("ddv", col("rev") / max("rev").over(w) - 1.0)
      .agg(min("ddv")).head().getDouble(0)
    assert(worst === 0.0)
  }

  test("context packs partition the corpus and respect the running-sum budget shape") {
    val packs = llmPacks()
    val nDocs = packs.agg(sum("n_docs")).head().getLong(0)
    assert(nDocs === graft.Tables.documents(spark, sf001).count(),
      "every document lands in exactly one pack")
    // pack ids per lang are contiguous from 0
    val ids = packs.select("lang", "pack_id").collect()
      .groupBy(_.getString(0)).map { case (_, rs) => rs.map(_.getLong(1)).sorted.toSeq }
    assert(ids.forall(s => s == (0L until s.length)), "greedy packing leaves no gaps")
  }

  private def llmPacks() = LlmText.llmContextPack(spark, sf001)

  test("vocab coverage is monotone and ends at share 1.0") {
    val rows = LlmText.llmVocabCoverage(spark, sf001)
      .select("rnk", "cum_share").collect().sortBy(_.getLong(0))
    assert(rows.zip(rows.tail).forall { case (a, b) => a.getDouble(1) <= b.getDouble(1) + 1e-9 })
    assert(math.abs(rows.last.getDouble(1) - 1.0) < 1e-9)
  }

  test("bm25 scores are positive and capped by the sum of term idfs * (k1+1)") {
    val scores = LlmText.llmBm25(spark, sf001).collect().map(_.getDouble(1))
    assert(scores.nonEmpty && scores.forall(_ > 0.0))
    // loose structural cap: tf-normalization is < (k1+1)=2.2 per term, 3 terms,
    // idf <= ln(1 + (N+0.5)/0.5) — just assert a generous ceiling holds
    val n = graft.Tables.documents(spark, sf001).count().toDouble
    val cap = 3 * 2.2 * math.log(1.0 + (n + 0.5) / 0.5)
    assert(scores.forall(_ <= cap))
  }

  test("frame sampling boundaries: sub-frame docs drop, exact-length docs emit") {
    import spark.implicits._
    val dir = s"${System.getProperty("java.io.tmpdir")}/graft_frame_fixture"
    Seq(
      (1L, "a" * 10, "en", "src0", 10L),  // shorter than one frame → 0 frames
      (2L, "b" * 16, "en", "src0", 16L),  // exactly one frame
      (3L, "c" * 80, "en", "src0", 80L),  // frames at offsets 0 and 64
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val frames = LlmVector.llmFrameSample(spark, dir)
      .groupBy("doc_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(frames === Map(2L -> 1L, 3L -> 2L),
      "short docs must drop cleanly (engine division semantics differ on negatives)")
  }

  test("salted join equals the plain join result") {
    val salted = Joins.joinSkewSalted(spark, sf001).collect()
    val li = graft.Tables.lineitem(spark, sf001)
    val supp = graft.Tables.supplier(spark, sf001)
    val plain = li.join(supp, li("l_suppkey") === supp("s_suppkey"))
      .groupBy("s_name")
      .agg(count(lit(1)).as("n_items"),
        round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("revenue"))
      .orderBy("s_name").collect()
    assert(salted.toSeq === plain.toSeq)
  }
}
