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
  * The batch face (q11) carries `n_users` as an EXACT
  * COUNT(DISTINCT user_id); here the column is the HLL++ sketch
  * estimate `n_users_approx` instead — an exact per-window distinct in
  * append mode holds every user id in state until the window finalizes,
  * which is the unbounded-state shape the TTL work elsewhere exists to
  * avoid, while the sketch's state is a fixed-size register array per
  * open window regardless of cardinality (`approx_count_distinct`,
  * relative sd [[Rsd]]). A consumer that needs the exact count defers
  * to the batch face; the spec gates the sketch with a q22-style bound
  * certificate against q11's exact column on the same rows. The
  * remaining shared columns are definitionally identical
  * (spec-asserted equality against q11 — including the decimal-exact
  * `sum_value` discipline, [[graft.Tables.sumd]]).
  */
object EventWindows {

  case class Ev(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
      event_type: String, value: Double)

  /** Relative standard deviation for the per-window distinct-users
    * sketch. HLL++'s error is ~1/sqrt(m) with m registers — 0.05 is
    * ~2 KB of state per open (window, type) group, the bounded-state
    * trade the streaming face exists for. */
  val Rsd = 0.05

  def dailyCounts(events: Dataset[Ev],
      watermarkDelay: String = "0 seconds"): DataFrame =
    events.toDF()
      .withWatermark("ts", watermarkDelay)
      .groupBy(window(col("ts"), "1 day").as("w"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        approx_count_distinct(col("user_id"), Rsd).as("n_users_approx"),
        graft.Tables.sumd(col("value")).as("sum_value"))
      .select(to_date(col("w.start")).as("day"), col("event_type"),
        col("n_events"), col("n_users_approx"), col("sum_value"))
}
