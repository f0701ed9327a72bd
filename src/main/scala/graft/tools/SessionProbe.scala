package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Round-10 probe for the evt_session 100× band (round-9 verdict item #6):
  * times the DECLARED form (Spark's batch `session_window` groupBy,
  * EventTime.evtSession) against the gap-island window form (the oracle's
  * own shape: lag → new-session flag → running sum → groupBy) on the same
  * directory, N iterations each, interleaved so neither form systematically
  * benefits from page-cache or stall-window position. Prints per-iteration
  * seconds and the two output counts (they must match — both compute
  * per-user 30-minute-gap sessions with end = last event + gap).
  *
  * Usage: runMain graft.tools.SessionProbe [dir] [iters]
  */
object SessionProbe {
  private val GapUs = 30L * 60 * 1000000

  /** The oracle-shaped alternative: one partitioned window pass + one agg,
    * no session_window operator. */
  def gapIsland(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("epoch_us")
    Tables.events(spark, sfDir)
      .select(col("user_id"), col("ts_ntz"), col("epoch_us"))
      .withColumn("prev_us", lag("epoch_us", 1).over(w))
      .withColumn("is_new",
        when(col("prev_us").isNull || col("epoch_us") - col("prev_us") >= GapUs, 1L)
          .otherwise(0L))
      .withColumn("sess", sum("is_new").over(w))
      .groupBy("user_id", "sess")
      .agg(min("ts_ntz").as("session_start"),
        expr(s"timestampadd(MICROSECOND, $GapUs, max(ts_ntz))").as("session_end"),
        count(lit(1)).as("cnt"))
      .select("user_id", "session_start", "session_end", "cnt")
      .orderBy("user_id", "session_start")
  }

  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val iters = if (args.length > 1) args(1).toInt else 5
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val declared = () => graft.operators.EventTime.evtSession(spark, dir)
    val island = () => gapIsland(spark, dir)
    // parity first (counts must agree or the timing comparison is void)
    val nDecl = declared().count(); val nIsl = island().count()
    println(s"SESSPROBE counts: session_window=$nDecl gap_island=$nIsl match=${nDecl == nIsl}")
    (1 to iters).foreach { i =>
      for ((name, fn) <- Seq("session_window" -> declared, "gap_island" -> island)) {
        val t0 = System.nanoTime()
        fn().count()
        println(f"SESSPROBE $name iter $i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }
    spark.stop()
  }
}
