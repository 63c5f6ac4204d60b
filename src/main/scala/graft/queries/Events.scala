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

  /** E4: per-window value-distribution drift (PSI) — the
    * oracle-checked BATCH carrier of the streaming drift monitor
    * ([[graft.streaming.DocStream.windowedQualityCounts]] /
    * [[graft.streaming.DocStream.qualityPsi]] — this query calls the
    * SAME library scorer the stream runs in foreachBatch, so the
    * correctness gate covers the production code path): 1-hour
    * tumbling windows, value deciles (integer floor(value/10) capped
    * at 9 — IEEE-deterministic binning), PSI of each window's
    * histogram against the month's own reference histogram. Shape:
    * one scan for the reference census (10 driver-pinned rows), one
    * windowed aggregation onto windows × 10 bins, then the scorer's
    * grid-local arithmetic (x68 integer recipe). */
  val e4ValueDrift: Q = (s, d) => {
    val ev = Tables.events(s, d)
    val bin = least(floor(col("value") / 10).cast("long"), lit(9L))
    val ref = ev.select(bin.as("bin")).groupBy("bin").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toSeq
    val counts = ev.groupBy(window(col("ts"), "1 hour"), bin.as("bin"))
      .agg(count(lit(1)).as("c"))
    graft.streaming.DocStream.qualityPsi(counts, ref)
      .select(col("window.start").as("inicio"),
        col("window.end").as("fim"),
        col("n_docs").as("n_events"), col("psi"))
      .orderBy(col("inicio"))
  }

  val defs: Map[String, Q] = Map(
    "e1_tumbling_window" -> e1Tumbling,
    "e2_sliding_window" -> e2Sliding,
    "e3_session_window" -> e3Session,
    "e4_value_drift" -> e4ValueDrift)

  val oracles: Map[String, String] = Map(
    "e4_value_drift" -> """
      WITH binned AS (SELECT time_bucket(INTERVAL 1 HOUR, ts) AS inicio,
          LEAST(CAST(FLOOR(value / 10) AS BIGINT), 9) AS bin FROM events),
      ref AS (SELECT bin, COUNT(*) AS rc FROM binned GROUP BY bin),
      reftot AS (SELECT SUM(rc) AS nref FROM ref),
      counts AS (SELECT inicio, bin, COUNT(*) AS c FROM binned
        GROUP BY inicio, bin),
      tot AS (SELECT inicio, SUM(c) AS n FROM counts GROUP BY inicio),
      grid AS (SELECT t.inicio, t.n, g.bin
        FROM tot t, (SELECT unnest(range(0, 10)) AS bin) g),
      full_g AS (SELECT gr.inicio, gr.n, gr.bin,
          COALESCE(c.c, 0) AS c, COALESCE(r.rc, 0) AS rc
        FROM grid gr
        LEFT JOIN counts c ON gr.inicio = c.inicio AND gr.bin = c.bin
        LEFT JOIN ref r ON gr.bin = r.bin),
      contrib AS (SELECT inicio, n,
          CAST(ROUND((((c + 1) / CAST(n + 10 AS DOUBLE))
              - ((rc + 1) / CAST(nref + 10 AS DOUBLE)))
            * CAST(CAST(ROUND(LN(CAST((c + 1) * (nref + 10) AS DOUBLE)
                / CAST((rc + 1) * (n + 10) AS DOUBLE)) * 1e6, 0)
              AS BIGINT) AS DOUBLE) * 1e2, 0) AS BIGINT) AS cq
        FROM full_g CROSS JOIN reftot)
      SELECT inicio, inicio + INTERVAL 1 HOUR AS fim,
        CAST(MAX(n) AS BIGINT) AS n_events,
        CAST(SUM(cq) AS DOUBLE) / 1e8 AS psi
      FROM contrib GROUP BY inicio ORDER BY inicio""",
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
