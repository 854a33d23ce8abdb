package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Streaming-window surface beyond the reference's single tumbling
  * window (SURVEY.md §2.5 lists sliding/session windows as engine
  * surface the reference never exercises): sliding windows, session
  * windows, and the approximate-distinct variant of Q1 — all in batch
  * form over `events`, oracle-gated where exact.
  *
  * Scale notes: sliding windows multiply each row by L/s window
  * assignments before the shuffle — the expansion happens map-side and
  * the shuffle carries (window, partial-count) only. Session windows
  * shuffle once on the session key (user), then sessionize within
  * partitions — the same dataflow Spark's streaming
  * `session_window` state operator uses.
  */
object WindowQueries {

  /** Sliding 10-minute windows, 5-minute slide: every event lands in
    * exactly 2 windows.
    */
  def slidingCounts(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(window(col("ts"), "10 minutes", "5 minutes"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value")), 2).as("total_value"))
      .select(date_format(col("window.start"), "yyyy-MM-dd HH:mm").as("win_start"),
        col("n_events"), col("total_value"))
      .orderBy(col("win_start"))

  /** Session windows per user, 30-minute inactivity gap:
    * one output row per session with its event count and value sum.
    * Batch form of `session_window(ts, "30 minutes")`.
    */
  def userSessions(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value")), 2).as("session_value"))
      .select(col("user_id"),
        date_format(col("session_window.start"), "yyyy-MM-dd HH:mm:ss").as("session_start"),
        col("n_events"), col("session_value"))
      .orderBy(col("user_id"), col("session_start"))

  /** Q1's UV with `approx_count_distinct` (HLL++): the sketch-based
    * alternative SURVEY.md §7.5 names for streaming exact-distinct at
    * scale. The sketch value is Spark-specific, so this surface is
    * pinned by FidelitySpec's |approx − exact| ≤ 5% tolerance against
    * [[exactDailyUv]] rather than gated; the oracle-checkable
    * approximate-distinct gate is `kmv_daily_uv`
    * ([[graft.ext.Sketches.kmvDailyUv]], deterministic KMV).
    */
  def approxDailyUv(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("date_str"))
      .agg(approx_count_distinct(col("user_id")).as("approx_uv"))
      .orderBy(col("date_str"))

  /** The exact form of [[approxDailyUv]] — oracle-gated anchor. */
  def exactDailyUv(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("date_str"))
      .agg(countDistinct(col("user_id")).as("exact_uv"))
      .orderBy(col("date_str"))

  /** Time-series gap-fill: per-minute event counts over a DENSE
    * minute spine covering [min(ts), max(ts)] — missing minutes
    * appear with n=0 — plus a running cumulative count. The resample
    * step every monitoring/feature pipeline needs before charting or
    * diff-ing a series (a groupBy alone silently drops empty
    * buckets).
    *
    * The spine is generated distributed and hierarchically: one row
    * of day-sequence exploded to days (tiny), then each day exploded
    * to its minutes — so no single task ever materializes the whole
    * range, and the spine parallelizes across the day axis at any
    * scale. The final left join is a broadcast-able tiny-vs-small
    * join at minute grain; the cumulative sum is a single ordered
    * window over the spine (minutes are ≪ events — ~0.5M rows per
    * spine-year — so the one-partition window frame is not the
    * bottleneck it would be over raw events).
    */
  def gapFillMinutes(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ev = Tables.events(spark, dir)
    val perMin = ev
      .groupBy(date_trunc("minute", col("ts")).as("minute"))
      .agg(count(lit(1)).as("n"))
    val bounds = ev.agg(
      date_trunc("day", min(col("ts"))).as("day_lo"),
      date_trunc("minute", min(col("ts"))).as("lo"),
      date_trunc("minute", max(col("ts"))).as("hi"))
    val days = bounds.select(col("lo"), col("hi"),
      explode(sequence(col("day_lo"), col("hi"), expr("INTERVAL 1 DAY")))
        .as("day"))
    val spine = days.select(col("lo"), col("hi"),
        explode(sequence(col("day"),
          least(col("hi"), col("day") + expr("INTERVAL 23 HOURS 59 MINUTES")),
          expr("INTERVAL 1 MINUTE"))).as("minute"))
      .filter(col("minute") >= col("lo") && col("minute") <= col("hi"))
      .select(col("minute"))
    spine.join(perMin, Seq("minute"), "left")
      .select(col("minute"), coalesce(col("n"), lit(0L)).as("n"))
      .withColumn("cum_n", sum(col("n")).over(
        Window.orderBy(col("minute"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select(date_format(col("minute"), "yyyy-MM-dd HH:mm").as("minute"),
        col("n"), col("cum_n"))
      .orderBy(col("minute"))
  }

  /** Analytic lead/lag surface: per-user inter-event gaps (lag over a
    * (ts, event_id)-ordered user window — the unique tiebreak makes
    * the whole result deterministic), rolled up with `min_by`/`max_by`
    * for first/last event types. One shuffle on user_id; the window
    * and the aggregation reuse the same hash partitioning, so
    * Catalyst plans a single exchange. Timestamps travel as epoch
    * micros longs — the gap sums are exact integers, no double drift.
    */
  def leadLagGaps(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("us"), col("event_id"))
    Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
      .withColumn("gap_us", col("us") - lag(col("us"), 1).over(w))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("gap_us")).as("sum_gap_us"),
        max(col("gap_us")).as("max_gap_us"),
        min_by(col("event_type"), col("event_id")).as("first_type"),
        max_by(col("event_type"), col("event_id")).as("last_type"))
      .orderBy(col("user_id"))
  }

  /** Trailing 7-day per-user daily totals — a RANGE frame over day
    * numbers (`rangeBetween(-6, 0)`), not a ROWS frame: missing days
    * fall out of the window by VALUE, so sparse activity needs no
    * gap-fill first. Values travel as exact integer cents (no double
    * drift through the two shuffles); the day axis is an integer so
    * the range frame is engine-independent. One shuffle for the daily
    * rollup, one for the user-partitioned window — both keyed on
    * user_id, so AQE reuses the exchange; per-user frames are
    * days-not-events sized at any scale.
    */
  def rollingUserDaily(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = Tables.events(spark, dir)
      .select(col("user_id"), to_date(col("ts")).as("day"),
        round(col("value") * 100, 0).cast("long").as("cents"))
      .groupBy(col("user_id"), col("day"))
      .agg(sum(col("cents")).as("cents"))
      .withColumn("dayn",
        datediff(col("day"), to_date(lit("1970-01-01"))).cast("long"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("dayn")).rangeBetween(-6, 0)
    daily.select(col("user_id"),
        date_format(col("day"), "yyyy-MM-dd").as("date_str"),
        col("cents"), sum(col("cents")).over(w).as("cents_7d"))
      .orderBy(col("user_id"), col("date_str"))
  }

  /** Observation-indexed EWMA (α = 0.5) of each user's daily totals —
    * the sequential/recursive computation shape (`sₜ = α·xₜ +
    * (1−α)·sₜ₋₁`) that has no closed windowed form, expressed as an
    * `aggregate` higher-order fold over the user's day-sorted series:
    * one shuffle to collect per-user days (bounded: days ≪ events),
    * then the fold runs inside codegen. Seeded with the FIRST
    * observation (not zero) — the same left-fold-with-first-init
    * semantics DuckDB's `list_reduce` implements, so the doubles
    * match bit-exactly. `array_sort` on (dayn, cents) structs makes
    * the collected order deterministic regardless of partitioning.
    */
  def ewmaUserDaily(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(spark, dir)
      .select(col("user_id"), to_date(col("ts")).as("day"),
        round(col("value") * 100, 0).cast("long").as("cents"))
      .groupBy(col("user_id"), col("day"))
      .agg(sum(col("cents")).as("cents"))
      .withColumn("dayn",
        datediff(col("day"), to_date(lit("1970-01-01"))).cast("long"))
    daily.groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_days"),
        array_sort(collect_list(struct(col("dayn"), col("cents")))).as("s"))
      .select(col("user_id"), col("n_days"),
        transform(col("s"), r => r.getField("cents").cast("double")).as("cs"))
      .select(col("user_id"), col("n_days"),
        round(aggregate(
          slice(col("cs"), lit(2), greatest(size(col("cs")) - 1, lit(0))),
          element_at(col("cs"), 1),
          (acc, x) => acc * lit(0.5) + x * lit(0.5)), 4).as("ewma"))
      .orderBy(col("user_id"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "win_ewma_user" -> (ewmaUserDaily _),
    "win_rolling_7d" -> (rollingUserDaily _),
    "win_lead_lag" -> (leadLagGaps _),
    "win_sliding_counts" -> (slidingCounts _),
    "win_user_sessions" -> (userSessions _),
    // approxDailyUv (HLL) is deliberately NOT gated: its sketch value
    // is implementation-seeded and can never hash-match an oracle.
    // FidelitySpec pins its tolerance against exactDailyUv; the
    // oracle-checkable approximate-distinct surface is
    // graft.ext.Sketches.kmvDailyUv (gate `kmv_daily_uv`).
    "win_exact_daily_uv" -> (exactDailyUv _),
    "ts_gapfill" -> (gapFillMinutes _)
  )

  val oracles: Map[String, String] = Map(
    "win_ewma_user" ->
      """WITH d AS (
        |  SELECT user_id,
        |         CAST(datediff('day', DATE '1970-01-01', CAST(ts AS DATE))
        |              AS BIGINT) AS dayn,
        |         sum(CAST(round(value * 100, 0) AS BIGINT)) AS cents
        |  FROM events GROUP BY 1, 2),
        |s AS (
        |  SELECT user_id, count(*) AS n_days,
        |         list_transform(list_sort(list({'dayn': dayn, 'cents': cents})),
        |                        r -> CAST(r.cents AS DOUBLE)) AS cs
        |  FROM d GROUP BY 1)
        |SELECT user_id, n_days,
        |       round(list_reduce(cs, (acc, x) -> acc * 0.5 + x * 0.5), 4) AS ewma
        |FROM s ORDER BY user_id""".stripMargin,
    "win_rolling_7d" ->
      """WITH d AS (
        |  SELECT user_id, CAST(ts AS DATE) AS day,
        |         CAST(datediff('day', DATE '1970-01-01', CAST(ts AS DATE))
        |              AS BIGINT) AS dayn,
        |         CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT) AS cents
        |  FROM events GROUP BY 1, 2, 3)
        |SELECT user_id, strftime(day, '%Y-%m-%d') AS date_str, cents,
        |       CAST(sum(cents) OVER (PARTITION BY user_id ORDER BY dayn
        |            RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS BIGINT) AS cents_7d
        |FROM d ORDER BY 1, 2""".stripMargin,
    "win_lead_lag" ->
      """WITH e AS (SELECT user_id, event_id, event_type,
        |                  epoch_us(ts) AS us FROM events),
        |g AS (SELECT user_id, event_id, event_type,
        |             us - lag(us) OVER (PARTITION BY user_id
        |                                ORDER BY us, event_id) AS gap_us
        |      FROM e)
        |SELECT user_id, count(*) AS n_events,
        |       CAST(sum(gap_us) AS BIGINT) AS sum_gap_us,
        |       max(gap_us) AS max_gap_us,
        |       arg_min(event_type, event_id) AS first_type,
        |       arg_max(event_type, event_id) AS last_type
        |FROM g GROUP BY 1 ORDER BY 1""".stripMargin,
    "win_exact_daily_uv" ->
      """SELECT strftime(ts, '%Y-%m-%d') AS date_str,
        |       count(DISTINCT user_id) AS exact_uv
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    // each event belongs to windows k=0,1: start = 5-min-floor(ts) − k·5min
    "win_sliding_counts" ->
      """SELECT strftime(make_timestamp(
        |         (CAST(floor(epoch(ts) / 300) AS BIGINT) * 300 - k * 300) * 1000000),
        |         '%Y-%m-%d %H:%M') AS win_start,
        |       count(*) AS n_events,
        |       round(sum(value), 2) AS total_value
        |FROM events CROSS JOIN (SELECT unnest([0, 1]) AS k)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // gaps-and-islands sessionization: new session when the gap to the
    // previous event of the same user is >= 30 minutes
    "win_user_sessions" ->
      """WITH marked AS (
        |  SELECT user_id, ts, value,
        |         CASE WHEN ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
        |              OR lag(ts) OVER w IS NULL THEN 1 ELSE 0 END AS new_session
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
        |sessions AS (
        |  SELECT user_id, ts, value,
        |         sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        |  FROM marked)
        |SELECT user_id,
        |       strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
        |       count(*) AS n_events,
        |       round(sum(value), 2) AS session_value
        |FROM sessions GROUP BY user_id, session_id
        |ORDER BY user_id, session_start""".stripMargin,
    "ts_gapfill" ->
      """WITH b AS (SELECT date_trunc('minute', min(ts)) AS lo,
        |                  date_trunc('minute', max(ts)) AS hi FROM events),
        |spine AS (SELECT unnest(generate_series(lo, hi, INTERVAL 1 MINUTE)) AS minute
        |          FROM b),
        |pm AS (SELECT date_trunc('minute', ts) AS minute, count(*) AS n
        |       FROM events GROUP BY 1)
        |SELECT strftime(s.minute, '%Y-%m-%d %H:%M') AS minute,
        |       coalesce(pm.n, 0) AS n,
        |       CAST(sum(coalesce(pm.n, 0)) OVER
        |            (ORDER BY s.minute ROWS BETWEEN UNBOUNDED PRECEDING
        |             AND CURRENT ROW) AS BIGINT) AS cum_n
        |FROM spine s LEFT JOIN pm USING (minute)
        |ORDER BY minute""".stripMargin
  )
}
