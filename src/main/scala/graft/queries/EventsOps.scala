package graft.queries

import scala.collection.immutable.ListMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables._

/** Event-stream analytics over the `events` table — the batch face of the
  * reference's streaming surface (SURVEY §2.8): time-bucketed rollups,
  * semi-structured payload extraction (the reference stores txn payloads as
  * jsonb, /root/reference/src/transaction.rs:22), sessionization, and an
  * as-of ("most recent prior") join.
  *
  * `ts` arrives as long nanos or a µs timestamp depending on testdata
  * vintage (see [[graft.Tables.events]]); [[graft.Tables.epochUs]] adapts
  * per-dtype so all time arithmetic here is integer epoch microseconds and
  * Spark and the DuckDB oracle agree exactly; calendar bucketing converts
  * to civil date in UTC.
  *
  * Scale design: every query here groups or windows by (user_id) or by
  * (day, type) — both shuffle once on that key and never sort globally.
  * Sessionization is the classic gaps-and-islands formulation: one window
  * sort per user partition, then an aggregation; at 100 TB the same plan
  * holds provided user_id is not pathologically skewed (AQE skew-join/agg
  * handles the rest).
  */
object EventsOps {

  private def withTs(df: DataFrame): DataFrame =
    df.withColumn("ts_us", epochUs(df))

  /** Tumbling daily window per event type (reference §2.8 maps its 10s poll
    * micro-batches onto `window()` aggregation; daily here for stable
    * civil-time bucketing). */
  private def q11(s: SparkSession, d: String): DataFrame =
    withTs(events(s, d))
      .withColumn("day", to_date(timestamp_micros(col("ts_us"))))
      .groupBy(col("day"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"),
        sumd(col("value")).as("sum_value"))

  /** JSON payload extraction — jsonb parity (T9/K2): pull a typed field out
    * of the semi-structured `props` column, aggregate by it. */
  private def q12(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("k")).as("sum_k"),
        min(col("k")).as("min_k"),
        max(col("k")).as("max_k"))

  /** Sessionization (gaps-and-islands): a new session starts when the gap
    * to the previous event of the same user exceeds 30 min. Output: per
    * user, number of sessions and largest session size. */
  private def q13(s: SparkSession, d: String): DataFrame = {
    // DuckDB timestamps are µs-precision (parquet nanos truncate on read),
    // so all ordering and gap arithmetic uses per-value truncated µs.
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us"), col("event_id"))
    val gapUs = 1800L * 1000 * 1000
    withTs(events(s, d))
      .withColumn("prev_ts", lag(col("ts_us"), 1).over(byUser))
      .withColumn("new_sess",
        when(col("prev_ts").isNull || col("ts_us") - col("prev_ts") > gapUs, 1L)
          .otherwise(0L))
      .withColumn("sess_id", sum(col("new_sess")).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("sess_id"))
      .agg(count(lit(1)).as("sess_len"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_sessions"), max(col("sess_len")).as("max_sess_len"))
  }

  /** As-of join, window formulation: for each purchase, the most recent
    * strictly-prior click of the same user. Because ts is monotone within
    * the window frame, `max(case when click then ts)` over
    * (unbounded preceding .. 1 preceding) IS the as-of lookup — one
    * partition-local sort, no self-join, no shuffle beyond user_id. */
  private def q14(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    withTs(events(s, d))
      .withColumn("prev_click_ts",
        max(when(col("event_type") === "click", col("ts_us"))).over(w))
      .filter(col("event_type") === "purchase" && col("prev_click_ts").isNotNull)
      .select(col("event_id"), col("user_id"),
        (col("ts_us") - col("prev_click_ts")).as("gap_us"))
  }

  /** Three-stage funnel (signup → later click → later purchase): per-user
    * stage timestamps derived by successive conditional mins, then stage
    * population counts. Each phase is one aggregation over the user key —
    * three shuffles on user_id total, no self-join explosion; at scale the
    * three aggs pipeline over the same hash partitioning (Catalyst reuses
    * the exchange). */
  private def q15(s: SparkSession, d: String): DataFrame = {
    val ev = withTs(events(s, d))
      .select(col("user_id"), col("event_type"), col("ts_us"))
    val signup = ev.filter(col("event_type") === "signup")
      .groupBy(col("user_id")).agg(min(col("ts_us")).as("signup_ts"))
    val click = ev.filter(col("event_type") === "click")
      .join(signup, Seq("user_id"))
      .filter(col("ts_us") >= col("signup_ts"))
      .groupBy(col("user_id"), col("signup_ts"))
      .agg(min(col("ts_us")).as("click_ts"))
    val purchase = ev.filter(col("event_type") === "purchase")
      .join(click, Seq("user_id"))
      .filter(col("ts_us") >= col("click_ts"))
      .groupBy(col("user_id"))
      .agg(min(col("ts_us")).as("purchase_ts"))
    def stage(df: DataFrame, name: String): DataFrame =
      df.agg(count(lit(1)).as("n_users")).withColumn("stage", lit(name))
    stage(signup, "1_signup")
      .unionByName(stage(click, "2_click_after_signup"))
      .unionByName(stage(purchase, "3_purchase_after_click"))
      .select(col("stage"), col("n_users"))
  }

  /** Cohort retention: users grouped by first-seen day; per (cohort day,
    * day offset), how many distinct users were active. Two shuffles on
    * user_id (first-seen agg + join back), one on the cohort key — the
    * standard retention-matrix shape. The cohort side has one row per
    * DISTINCT user, which is unbounded at 100 TB, so no broadcast hint:
    * a shuffle join on user_id is the safe default, and AQE will still
    * pick broadcast at runtime whenever the cohort side is actually
    * small. */
  private def q33(s: SparkSession, d: String): DataFrame = {
    val ev = withTs(events(s, d))
      .withColumn("day", to_date(timestamp_micros(col("ts_us"))))
      .select(col("user_id"), col("day"))
    val cohort = ev.groupBy(col("user_id"))
      .agg(min(col("day")).as("cohort_day"))
    ev.join(cohort, Seq("user_id"))
      .groupBy(col("cohort_day"),
        datediff(col("day"), col("cohort_day")).cast("long").as("day_offset"))
      .agg(countDistinct(col("user_id")).as("n_active"))
  }

  /** Trailing 7-day RANGE window frame per user — the value-bounded frame
    * kind (q29 covers ROWS frames): per event, count and integer-sum of the
    * user's events in the preceding 7 days including this one. RANGE frames
    * are order-insensitive among ts peers, so the result is deterministic
    * without a tie-break column. One shuffle on user_id + a partition-local
    * sort — the same shape at any scale. */
  private def q34(s: SparkSession, d: String): DataFrame = {
    val sevenDaysUs = 7L * 86400 * 1000 * 1000
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts_us"))
      .rangeBetween(-sevenDaysUs, 0)
    withTs(events(s, d))
      .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
      .withColumn("trail_cnt", count(lit(1)).over(w))
      .withColumn("trail_sum_k", sum(col("k")).over(w))
      .select(col("event_id"), col("user_id"), col("trail_cnt"),
        col("trail_sum_k"))
  }

  /** IGNORE NULLS window navigation — the native operator behind q14's
    * max-of-case as-of emulation: for every event, the value `k` of the
    * user's most recent prior purchase (nulls for non-purchases skipped by
    * the frame function itself). Same single shuffle + partition-local
    * sort as every window here. */
  private def q38(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    withTs(events(s, d))
      .withColumn("purchase_k",
        when(col("event_type") === "purchase",
          get_json_object(col("props"), "$.k").cast("long")))
      .withColumn("prev_purchase_k",
        last(col("purchase_k"), ignoreNulls = true).over(w))
      .filter(col("prev_purchase_k").isNotNull)
      .select(col("event_id"), col("user_id"), col("prev_purchase_k"))
  }

  /** Time-series gap filling: the dense daily calendar per event type,
    * zero-filled where no events occurred — `sequence(min_day, max_day)`
    * exploded per type, left-joined back to the sparse daily counts. The
    * calendar side is |types| × |days| (tiny relative to events at any
    * scale); the only data-sized work is the one daily aggregation. */
  private def q42(s: SparkSession, d: String): DataFrame = {
    val daily = withTs(events(s, d))
      .withColumn("day", to_date(timestamp_micros(col("ts_us"))))
      .groupBy(col("event_type"), col("day"))
      .agg(count(lit(1)).as("n"))
    val cal = daily.groupBy(col("event_type"))
      .agg(min(col("day")).as("lo"), max(col("day")).as("hi"))
      .select(col("event_type"),
        explode(sequence(col("lo"), col("hi"))).as("day"))
    cal.join(daily, Seq("event_type", "day"), "left")
      .select(col("event_type"), col("day"),
        coalesce(col("n"), lit(0L)).as("n_events"))
  }

  val queries: ListMap[String, (SparkSession, String) => DataFrame] = ListMap(
    "q11_time_bucket_daily" -> q11 _,
    "q12_json_extract_agg" -> q12 _,
    "q13_sessionize" -> q13 _,
    "q14_asof_prev_click" -> q14 _,
    "q24_funnel_stages" -> q15 _,
    "q33_cohort_retention" -> q33 _,
    "q34_trailing_window" -> q34 _,
    "q38_ignore_nulls_nav" -> q38 _,
    "q42_gap_fill_calendar" -> q42 _,
  )

  val oracle: ListMap[String, String] = ListMap(
    "q11_time_bucket_daily" ->
      s"""SELECT CAST(ts AS DATE) AS day, event_type,
         |  COUNT(*) AS n_events,
         |  COUNT(DISTINCT user_id) AS n_users,
         |  ${sqlSumd("value")} AS sum_value
         |FROM events GROUP BY 1, 2""".stripMargin,
    "q12_json_extract_agg" ->
      """SELECT event_type, COUNT(*) AS n_events,
        |  SUM(CAST(json_extract_string(props, '$.k') AS BIGINT))::BIGINT AS sum_k,
        |  MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
        |  MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
        |FROM events GROUP BY event_type""".stripMargin,
    "q13_sessionize" ->
      """WITH flagged AS (
        |  SELECT user_id, event_id, ts_us,
        |    CASE WHEN prev_ts IS NULL OR ts_us - prev_ts > 1800000000
        |         THEN 1 ELSE 0 END AS new_sess
        |  FROM (SELECT user_id, event_id, epoch_us(ts) AS ts_us,
        |          LAG(epoch_us(ts)) OVER (PARTITION BY user_id
        |            ORDER BY epoch_us(ts), event_id) AS prev_ts
        |        FROM events)),
        |sess AS (
        |  SELECT user_id,
        |    SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
        |      ROWS UNBOUNDED PRECEDING) AS sess_id
        |  FROM flagged),
        |lens AS (
        |  SELECT user_id, sess_id, COUNT(*) AS sess_len
        |  FROM sess GROUP BY user_id, sess_id)
        |SELECT user_id, COUNT(*) AS n_sessions, MAX(sess_len) AS max_sess_len
        |FROM lens GROUP BY user_id""".stripMargin,
    "q14_asof_prev_click" ->
      """SELECT event_id, user_id,
        |  ts_us - prev_click_ts AS gap_us
        |FROM (
        |  SELECT event_id, user_id, epoch_us(ts) AS ts_us, event_type,
        |    MAX(CASE WHEN event_type = 'click' THEN epoch_us(ts) END)
        |      OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |      AS prev_click_ts
        |  FROM events)
        |WHERE event_type = 'purchase' AND prev_click_ts IS NOT NULL""".stripMargin,
    "q24_funnel_stages" ->
      """WITH signup AS (
        |  SELECT user_id, MIN(epoch_us(ts)) AS signup_ts
        |  FROM events WHERE event_type = 'signup' GROUP BY user_id),
        |click AS (
        |  SELECT e.user_id, s.signup_ts, MIN(epoch_us(e.ts)) AS click_ts
        |  FROM events e JOIN signup s ON e.user_id = s.user_id
        |  WHERE e.event_type = 'click' AND epoch_us(e.ts) >= s.signup_ts
        |  GROUP BY e.user_id, s.signup_ts),
        |purchase AS (
        |  SELECT e.user_id, MIN(epoch_us(e.ts)) AS purchase_ts
        |  FROM events e JOIN click c ON e.user_id = c.user_id
        |  WHERE e.event_type = 'purchase' AND epoch_us(e.ts) >= c.click_ts
        |  GROUP BY e.user_id)
        |SELECT '1_signup' AS stage, COUNT(*) AS n_users FROM signup
        |UNION ALL
        |SELECT '2_click_after_signup', COUNT(*) FROM click
        |UNION ALL
        |SELECT '3_purchase_after_click', COUNT(*) FROM purchase""".stripMargin,
    "q33_cohort_retention" ->
      """WITH ev AS (SELECT user_id, CAST(ts AS DATE) AS day FROM events),
        |cohort AS (
        |  SELECT user_id, MIN(day) AS cohort_day FROM ev GROUP BY user_id)
        |SELECT c.cohort_day,
        |  date_diff('day', c.cohort_day, e.day)::BIGINT AS day_offset,
        |  COUNT(DISTINCT e.user_id) AS n_active
        |FROM ev e JOIN cohort c ON e.user_id = c.user_id
        |GROUP BY 1, 2""".stripMargin,
    "q34_trailing_window" ->
      """SELECT event_id, user_id,
        |  COUNT(*) OVER w AS trail_cnt,
        |  (SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) OVER w)::BIGINT
        |    AS trail_sum_k
        |FROM (SELECT event_id, user_id, epoch_us(ts) AS ts_us, props
        |      FROM events)
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts_us
        |  RANGE BETWEEN 604800000000 PRECEDING AND CURRENT ROW)""".stripMargin,
    "q38_ignore_nulls_nav" ->
      """SELECT event_id, user_id, prev_purchase_k FROM (
        |  SELECT event_id, user_id,
        |    LAST_VALUE(CASE WHEN event_type = 'purchase'
        |        THEN CAST(json_extract_string(props, '$.k') AS BIGINT) END
        |      IGNORE NULLS) OVER (PARTITION BY user_id
        |        ORDER BY epoch_us(ts), event_id
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |      AS prev_purchase_k
        |  FROM events)
        |WHERE prev_purchase_k IS NOT NULL""".stripMargin,
    "q42_gap_fill_calendar" ->
      """WITH daily AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS n
        |  FROM events GROUP BY 1, 2),
        |bounds AS (
        |  SELECT event_type, MIN(day) AS lo, MAX(day) AS hi
        |  FROM daily GROUP BY 1),
        |cal AS (
        |  SELECT event_type,
        |    lo + UNNEST(range(0, date_diff('day', lo, hi) + 1))::INT AS day
        |  FROM bounds)
        |SELECT c.event_type, c.day, COALESCE(d.n, 0)::BIGINT AS n_events
        |FROM cal c LEFT JOIN daily d
        |  ON d.event_type = c.event_type AND d.day = c.day""".stripMargin,
  )
}
