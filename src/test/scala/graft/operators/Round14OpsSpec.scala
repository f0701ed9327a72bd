package graft.operators

import graft.{ScaleRules, SparkSpec}
import org.apache.spark.sql.functions._

/** Round-14 invariants — behaviors the oracle gate CANNOT exercise, so a
  * spec is their only gate (the ts_cusum P₀-floor precedent):
  *
  *  1. `Aggregations.toLongChecked` must RAISE on BIGINT overflow, not
  *     emit Spark's silent non-ANSI NULL. No test-SF corpus overflows
  *     (sf0.01's top charge_u6 sum is ~5.3e14, 4 orders of magnitude
  *     inside Long range), so without this pin the guard is dead code
  *     until a ~175 GB corpus silently nulls — exactly the divergence
  *     the round-13 advisory flagged.
  *  2. `ScaleRules` — the one bytes→parallelism policy both the sink
  *     file counts and the spill-onset build widths ride — must keep
  *     its floor/hysteresis contract: narrow below the gate (so every
  *     oracle-SF plan stays byte-identical), bytes/target above it.
  *  3. `StreamOps.ccConsolidate` is engine API since round 14; pin its
  *     labels on a hand-computed forest, independent of the streaming
  *     harness (StreamingSpec pins it against batch graph_cc end-to-end).
  */
class Round14OpsSpec extends SparkSpec {

  test("toLongChecked passes in-range sums through and RAISES on BIGINT overflow") {
    import spark.implicits._
    // in range: identical to a plain cast
    val ok = Seq("1", "-9223372036854775808", "9223372036854775807")
      .toDF("s").select(Aggregations.toLongChecked(col("s").cast("decimal(38,0)"), "v").as("v"))
    assert(ok.collect().map(_.getLong(0)).toSeq ===
      Seq(1L, Long.MinValue, Long.MaxValue))
    // out of range: the plain cast would yield NULL (non-ANSI); the guard
    // must fail the job loudly instead, carrying the column name
    val over = Seq("9223372036854775808") // Long.MaxValue + 1
      .toDF("s").select(Aggregations.toLongChecked(col("s").cast("decimal(38,0)"), "sum_charge_u6"))
    val e = intercept[Exception](over.collect())
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("sum_charge_u6")),
      s"overflow must raise with the column name, got: ${messages(e).mkString(" | ")}")
    // Mode independence (what the guard buys): Spark 4 defaults ANSI ON,
    // where the plain cast raises CAST_OVERFLOW but names no column;
    // under ansi=false — the legacy mode — the plain cast is WORSE than
    // the advisory's "silent NULLs": it silently WRAPS (2⁶³ comes back
    // as Long.MinValue — corrupted money, no error at all). The guard
    // fails loudly WITH the column name in both modes.
    val prev = spark.conf.get("spark.sql.ansi.enabled")
    try {
      spark.conf.set("spark.sql.ansi.enabled", "false")
      val silent = Seq("9223372036854775808").toDF("s")
        .select(col("s").cast("decimal(38,0)").cast("long")).head()
      assert(!silent.isNullAt(0) && silent.getLong(0) === Long.MinValue,
        s"plain cast under ansi=false silently wraps — the corruption the guard closes; got $silent")
      val e2 = intercept[Exception](Seq("9223372036854775808").toDF("s")
        .select(Aggregations.toLongChecked(col("s").cast("decimal(38,0)"), "sum_charge_u6"))
        .collect())
      assert(messages(e2).exists(_.contains("sum_charge_u6")),
        "guard must raise with the column name under ansi=false too")
    } finally spark.conf.set("spark.sql.ansi.enabled", prev)
  }

  test("ScaleRules: floors, bytes/target scaling, and wide-build hysteresis") {
    val li = s"$sf01/lineitem.parquet"
    val bytes = ScaleRules.sourceBytes(spark, li)
    assert(bytes > 0)
    // bytesScaledCount: floor wins on small sources, ceil(bytes/target) past
    // it (target chosen so the round-15 MaxScaledCount clamp stays clear —
    // saturation itself is pinned in Round15OpsSpec)
    assert(ScaleRules.bytesScaledCount(spark, li, Long.MaxValue, 8) === 8)
    assert(ScaleRules.bytesScaledCount(spark, li, 16L, 8) ===
      math.ceil(bytes.toDouble / 16).toInt)
    // hysteresis: below the gate the SESSION width comes back untouched
    // (oracle-SF plans stay byte-identical)...
    val conf = spark.sessionState.conf.numShufflePartitions
    assert(ScaleRules.wideBuildWidth(spark, li) === conf,
      "sf0.01 lineitem is far below spill onset — must return session width")
    // ...and past the gate the width is bytes/perTask, engaged only at
    // >= WideBuildHysteresis x session width
    val perTask = bytes / (ScaleRules.WideBuildHysteresis * conf + 1)
    val wide = ScaleRules.wideBuildWidth(spark, li, perTask)
    assert(wide === (bytes / perTask).toInt && wide > ScaleRules.WideBuildHysteresis * conf,
      s"past onset the width must be bytes/perTask, got $wide")
  }

  test("ccConsolidate labels a hand-built forest with per-component min node ids") {
    import spark.implicits._
    // two components {1,2,3,7} and {5,9}; forest edges emitted once per
    // undirected pair, in arbitrary orientation (as the stream does)
    val forest = Seq((2L, 1L), (2L, 3L), (7L, 3L), (9L, 5L)).toDF("a", "b")
    val labels = graft.streaming.StreamOps.ccConsolidate(forest)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(labels === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 7L -> 1L, 5L -> 5L, 9L -> 5L))
    assertProvenDtypes(graft.streaming.StreamOps.ccConsolidate(forest))
  }
}
