package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Invariant checks for the round-13 fixes that the oracle gate alone
  * cannot distinguish from their buggy predecessors:
  *  - the CUSUM P_0 = 0 baseline (the r12 advisory: the oracle replayed
  *    the SAME deviation, so the gate stayed green while the statistic
  *    was wrong — only an independent textbook-recurrence replay can
  *    catch a regression here), and
  *  - the q1_decimal ↔ flagship twin relationship (minor-units BIGINT
  *    output must agree with the independently-computed double path
  *    within the double path's declared rounding).
  */
class Round13OpsSpec extends SparkSpec {

  test("streaming CUSUM equals the textbook recurrence under all-positive drift") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    // mu = 0, sigma = 1 → allowance k = 0.5, decision h = 4. Constant
    // x = 2.0 drifts UP from the very first observation: every prefix
    // sum is positive, so a running min over OBSERVED rows only (the
    // r12 bug — minima initialized to MaxValue instead of the implicit
    // P_0 = 0) under-reports S⁺ by the first prefix value (1.5) forever
    // and fires the 4σ alarm one day late. The textbook recurrence
    // S⁺_t = max(0, S⁺_{t-1} + x_t − μ − k) gives exactly 1.5·t.
    val baseline = Map("m" -> (0.0, 1.0))
    val days = (1L to 6L).map(d => ("m", d, 2.0))
    val in = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(String, Long, Double)]
    val q = graft.streaming.StreamOps.cusumPerKey(in.toDS(), baseline)
      .toDF("k", "day", "s_up", "s_dn", "alarm")
      .writeStream.format("memory").queryName("t_cusum13").outputMode("update").start()
    try {
      // two micro-batches so the P_0 floor must survive a state round-trip
      in.addData(days.take(3)); q.processAllAvailable()
      in.addData(days.drop(3)); q.processAllAvailable()
      val got = spark.sql("SELECT day, s_up, s_dn, alarm FROM t_cusum13").collect()
        .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getBoolean(3)))
        .sortBy(_._1)
      // hand-rolled textbook recurrence, same rounding discipline
      var sUp = 0.0; var sDn = 0.0
      val expect = days.map { case (_, d, x) =>
        sUp = math.max(0.0, sUp + (x - 0.0 - 0.5))
        sDn = math.max(0.0, sDn + (0.0 - 0.5 - x))
        (d, BigDecimal(sUp).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble,
          BigDecimal(sDn).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble,
          sUp > 4.0 || sDn > 4.0)
      }
      assert(got.toSeq === expect,
        "CUSUM emissions must equal the textbook recurrence (P_0 = 0 floor)")
      // non-vacuity: the drift is positive from row one and the alarm fires
      assert(got.head._2 === 1.5 && got.exists(_._4),
        "fixture must exercise the all-positive-drift path and the alarm")
    } finally {
      q.stop()
      prev match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("q1_decimal minor units agree with the double-path flagship") {
    // independent paths: q1_decimal sums exact DECIMAL minor units into
    // BIGINT; the flagship sums doubles and rounds at 2. On 2-decimal
    // source data they must agree to the flagship's rounding quantum —
    // and the dtype contract (BIGINT out, SURVEY §5.7) must hold.
    val dec = Aggregations.aggPricingDecimal(spark, sf01)
    assert(Seq("sum_qty_c2", "sum_base_price_c2", "sum_disc_price_u4", "sum_charge_u6")
      .forall(c => dec.schema(c).dataType == org.apache.spark.sql.types.LongType),
      "minor-unit sums must be BIGINT (the driver-proven dtype)")
    val flag = Aggregations.aggPricingSummary(spark, sf01)
      .select(col("l_returnflag"), col("l_linestatus"), col("sum_qty"),
        col("sum_base_price"), col("sum_disc_price"), col("sum_charge"),
        col("count_order").as("count_order_flag"))
    val j = dec.join(flag, Seq("l_returnflag", "l_linestatus")).collect()
    assert(j.nonEmpty)
    // tolerance = the flagship's rounding quantum plus its double-sum
    // accumulation error (relative ~1e-9 on 1e8-magnitude group sums)
    def close(exactMinor: Long, unit: Double, dbl: Double): Boolean = {
      val exact = exactMinor / unit
      math.abs(exact - dbl) <= 0.011 + 1e-8 * math.abs(exact)
    }
    j.foreach { r =>
      assert(close(r.getAs[Long]("sum_qty_c2"), 100.0, r.getAs[Double]("sum_qty")))
      assert(close(r.getAs[Long]("sum_base_price_c2"), 100.0, r.getAs[Double]("sum_base_price")))
      assert(close(r.getAs[Long]("sum_disc_price_u4"), 1e4, r.getAs[Double]("sum_disc_price")))
      assert(close(r.getAs[Long]("sum_charge_u6"), 1e6, r.getAs[Double]("sum_charge")))
      assert(r.getAs[Long]("count_order") == r.getAs[Long]("count_order_flag"))
    }
  }
}
