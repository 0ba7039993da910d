package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Event-time windowed rollup AT INGEST — the q11 daily accounting as a
  * structured stream: watermark → 1-day tumbling window → append-mode
  * aggregation, the canonical Structured Streaming shape (SURVEY §2.8).
  * A window's row emits exactly once, when the watermark passes its
  * end — so a downstream consumer sees each day's totals precisely when
  * the day can no longer change, which is the contract an incremental
  * warehouse load needs.
  *
  * The batch face (q11) additionally carries `n_users` (exact
  * COUNT(DISTINCT user_id)); that column is deliberately absent here —
  * an exact per-window distinct in append mode holds every user id in
  * state until the window finalizes, which is the unbounded-state shape
  * the TTL work elsewhere exists to avoid. A stream that needs it
  * approximates (HLL sketch per window) or defers to the batch face.
  * The columns both faces share are definitionally identical
  * (spec-asserted equality against q11 on the same rows — including
  * the decimal-exact `sum_value` discipline, [[graft.Tables.sumd]]).
  */
object EventWindows {

  case class Ev(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
      event_type: String, value: Double)

  def dailyCounts(events: Dataset[Ev],
      watermarkDelay: String = "0 seconds"): DataFrame =
    events.toDF()
      .withWatermark("ts", watermarkDelay)
      .groupBy(window(col("ts"), "1 day").as("w"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        graft.Tables.sumd(col("value")).as("sum_value"))
      .select(to_date(col("w.start")).as("day"), col("event_type"),
        col("n_events"), col("sum_value"))
}
