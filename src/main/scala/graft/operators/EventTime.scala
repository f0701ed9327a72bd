package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Event-time operators, batch-executed (SURVEY.md §2.9).
  *
  * Spark's `window()` / `session_window()` grouping works identically in
  * batch and streaming — these oracle-checked rows run in batch through
  * Verify; the streaming semantics (watermarks, late data, state) are covered
  * by the MemoryStream specs in graft.streaming.
  *
  * Session-gap semantics pinned on both engines: an event exactly `gap` after
  * its predecessor starts a NEW session (Spark's per-event window [t, t+gap)
  * is end-exclusive), hence the oracle's `>= INTERVAL 30 MINUTE` island test.
  *
  * Scale: tumbling/sliding windows are plain hash aggregations on
  * (window, keys) — partial agg + one shuffle. Session windows shuffle by
  * user then sort-merge per key, which distributes by user cardinality.
  */
object EventTime {

  /** 1-hour tumbling windows × event_type. */
  def evtTumbling(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .groupBy(window(col("ts_ntz"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("cnt"), round(sum("value"), 2).as("sum_value"))
      .select(col("w.start").cast("timestamp_ntz").as("ws"), col("event_type"),
        col("cnt"), col("sum_value"))
      .orderBy("ws", "event_type")

  /** 1-hour windows sliding every 15 minutes (slide ∣ window ⇒ each event in
    * exactly 4 windows). */
  def evtSliding(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .groupBy(window(col("ts_ntz"), "1 hour", "15 minutes").as("w"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("w.start").cast("timestamp_ntz").as("ws"), col("cnt"))
      .orderBy("ws")

  /** Per-user session windows with a 30-minute gap. */
  def evtSession(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .groupBy(session_window(col("ts_ntz"), "30 minutes").as("w"), col("user_id"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("user_id"),
        col("w.start").cast("timestamp_ntz").as("session_start"),
        col("w.end").cast("timestamp_ntz").as("session_end"),
        col("cnt"))
      .orderBy("user_id", "session_start")

  /** Dedup on (user_id, event_type, minute bucket); output is the key set
    * itself so survivor choice can't introduce nondeterminism. */
  def evtDedup(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .withColumn("minute_bucket", date_trunc("minute", col("ts_ntz")).cast("timestamp_ntz"))
      .select("user_id", "event_type", "minute_bucket")
      .dropDuplicates("user_id", "event_type", "minute_bucket")
      .orderBy("user_id", "event_type", "minute_bucket")

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "evt_tumbling" -> evtTumbling,
    "evt_sliding" -> evtSliding,
    "evt_session" -> evtSession,
    "evt_dedup" -> evtDedup,
  )

  val oracles: Map[String, String] = Map(
    "evt_tumbling" ->
      """SELECT time_bucket(INTERVAL '1 hour', CAST(ts AS TIMESTAMP)) AS ws,
        |  event_type, count(*) AS cnt, round(sum(value), 2) AS sum_value
        |FROM events GROUP BY ws, event_type ORDER BY ws, event_type""".stripMargin,
    "evt_sliding" ->
      """SELECT ws, count(*) AS cnt FROM (
        |  SELECT time_bucket(INTERVAL '15 minutes', CAST(ts AS TIMESTAMP))
        |    - off * INTERVAL 1 MINUTE AS ws
        |  FROM events, (SELECT unnest([0, 15, 30, 45]) AS off) offsets
        |) GROUP BY ws ORDER BY ws""".stripMargin,
    "evt_session" ->
      """WITH t AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts FROM events),
        |m AS (SELECT user_id, ts,
        |  CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
        |    OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts) >= INTERVAL 30 MINUTE
        |  THEN 1 ELSE 0 END AS is_new FROM t),
        |s AS (SELECT user_id, ts, sum(is_new) OVER (PARTITION BY user_id ORDER BY ts
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid FROM m)
        |SELECT user_id, min(ts) AS session_start,
        |  max(ts) + INTERVAL 30 MINUTE AS session_end, count(*) AS cnt
        |FROM s GROUP BY user_id, sid ORDER BY user_id, session_start""".stripMargin,
    "evt_dedup" ->
      """SELECT DISTINCT user_id, event_type,
        |  date_trunc('minute', CAST(ts AS TIMESTAMP)) AS minute_bucket
        |FROM events ORDER BY user_id, event_type, minute_bucket""".stripMargin,
  )
}
