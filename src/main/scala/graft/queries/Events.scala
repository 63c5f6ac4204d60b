package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.{Det, Tables}

/** Event-time windowing over the `events` table, in batch — the same
  * plans Structured Streaming runs incrementally (streaming/
  * EventStream); batch form makes them DuckDB-oracle-checkable.
  * Beyond-reference extension (the reference is batch-only,
  * SURVEY §2.10).
  */
object Events {
  import Det._

  type Q = (SparkSession, String) => DataFrame

  /** E1: tumbling 1-hour windows per event type. */
  val e1Tumbling: Q = (s, d) =>
    Tables.events(s, d)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("total"))
      .select(col("window.start").as("inicio"), col("window.end").as("fim"),
        col("event_type"), col("n"), col("total"))
      .orderBy(col("inicio"), col("event_type"))

  /** E2: sliding windows (2h size, 1h slide) — each event lands in two
    * windows. */
  val e2Sliding: Q = (s, d) =>
    Tables.events(s, d)
      .groupBy(window(col("ts"), "2 hours", "1 hour"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("total"))
      .select(col("window.start").as("inicio"), col("window.end").as("fim"),
        col("n"), col("total"))
      .orderBy(col("inicio"))

  /** E3: session windows per user (10-minute gap) — gaps-and-islands;
    * Spark's `session_window` end = last event + gap. */
  val e3Session: Q = (s, d) =>
    Tables.events(s, d)
      .groupBy(session_window(col("ts"), "10 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("total"))
      .select(col("user_id"),
        col("session_window.start").as("inicio"),
        col("session_window.end").as("fim"),
        col("n"), col("total"))
      .orderBy(col("user_id"), col("inicio"))

  val defs: Map[String, Q] = Map(
    "e1_tumbling_window" -> e1Tumbling,
    "e2_sliding_window" -> e2Sliding,
    "e3_session_window" -> e3Session)

  val oracles: Map[String, String] = Map(
    "e1_tumbling_window" -> s"""
      SELECT time_bucket(INTERVAL 1 HOUR, ts) AS inicio,
        time_bucket(INTERVAL 1 HOUR, ts) + INTERVAL 1 HOUR AS fim,
        event_type, COUNT(*) AS n, ${sqlDsum("value")} AS total
      FROM events
      GROUP BY 1, 2, 3
      ORDER BY inicio, event_type""",
    "e2_sliding_window" -> s"""
      WITH assigned AS (
        SELECT time_bucket(INTERVAL 1 HOUR, ts) AS inicio, value FROM events
        UNION ALL
        SELECT time_bucket(INTERVAL 1 HOUR, ts) - INTERVAL 1 HOUR, value
        FROM events)
      SELECT inicio, inicio + INTERVAL 2 HOUR AS fim,
        COUNT(*) AS n, ${sqlDsum("value")} AS total
      FROM assigned
      GROUP BY inicio
      ORDER BY inicio""",
    "e3_session_window" -> s"""
      WITH flagged AS (
        SELECT user_id, ts, value,
          CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                 > INTERVAL 10 MINUTE OR
               LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
            THEN 1 ELSE 0 END AS nova
        FROM events),
      sessions AS (
        SELECT user_id, ts, value,
          SUM(nova) OVER (PARTITION BY user_id ORDER BY ts
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        FROM flagged)
      SELECT user_id, MIN(ts) AS inicio,
        MAX(ts) + INTERVAL 10 MINUTE AS fim,
        COUNT(*) AS n, ${sqlDsum("value")} AS total
      FROM sessions
      GROUP BY user_id, sid
      ORDER BY user_id, inicio""")
}
