package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** The reference's seven canonical metric queries (SURVEY.md §2, Q1–Q6)
  * re-expressed over the driver's `events` fixture table, which stands
  * in for the Kafka `user_behavior` order stream (FIXTURES.md §B):
  * `user_id` → `user_id`, `amount` → `value`, `channel_id` →
  * `event_type`, event time `order_time`/`ts` → `ts`.
  *
  * Batch forms here; streaming twins live in
  * [[graft.streaming.StreamingQueries]]. Each query:
  *  - is a declarative DataFrame pipeline (Catalyst plans partial/final
  *    aggregates, pushes filters/projections into the parquet scan);
  *  - emits time keys as formatted STRINGS, never raw timestamps — the
  *    fixtures carry nanosecond precision which Spark truncates to
  *    microseconds, so raw-timestamp output cannot hash-match an
  *    engine that keeps nanoseconds;
  *  - rounds DOUBLE aggregates to 2 decimals (money semantics, and
  *    addition-order-independent comparison);
  *  - ends with a deterministic ORDER BY on its group keys.
  *
  * Scale notes: every query is a single hash-aggregation over the fact
  * table — one shuffle on the group key, map-side partial aggregation
  * first. Cardinality of the group keys (days, minutes, users,
  * channels, hours) is tiny relative to input, so the shuffle carries
  * only partial aggregates: this shape survives a 1000-executor
  * 100 TB scan unchanged.
  */
object EventQueries {

  /** Pinned `now()` — the reference computes `now` driver-side
    * (`doc/Cumulative.java:59-61`, `doc/temp.md:461`); we parameterize
    * and pin it for determinism (SURVEY.md §7.6). All sf fixtures span
    * 2024-01-01 .. 2024-01-30 23:5x, so this is "just after the data".
    */
  val AsOf = "2024-01-31 00:00:00"

  /** Q1 — per-day cumulative distinct-user count + GMV + latest time
    * of day (`doc/temp.md:376-386`).
    */
  def q1DailyUvGmv(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      // group on the 8-byte truncated timestamp, format AFTER the agg:
      // at 20M rows this halves the rollup (no per-row string key, and
      // the shuffle carries longs). Within a day, max(ts) is the
      // latest event, so its HH:mm equals max of the per-row strings.
      .groupBy(date_trunc("DAY", col("ts")).as("d"))
      .agg(
        countDistinct(col("user_id")).as("uv"),
        round(sum(col("value")), 2).as("payment"),
        max(col("ts")).as("max_ts"))
      .select(date_format(col("d"), "yyyy-MM-dd").as("date_str"),
        col("uv"), col("payment"),
        date_format(col("max_ts"), "HH:mm").as("time_str"))
      .orderBy(col("date_str"))

  /** Q2 — orders per 1-minute tumbling window (`doc/temp.md:390-394`).
    * Batch form of the tumbling window: `window(ts, "1 minute")`; the
    * window start is emitted as a minute-grain string.
    */
  def q2PerMinute(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(window(col("ts"), "1 minute"))
      .agg(count(lit(1)).as("buy_cnt"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm").as("min_of_day"),
        col("buy_cnt"))
      .orderBy(col("min_of_day"))

  /** Q3 — running GMV per user (`doc/temp.md:398-402`). */
  def q3UserGmv(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("user_id"))
      .agg(round(sum(col("value")), 2).as("amount"))
      .orderBy(col("user_id"))

  /** Q4 — running GMV per channel (`doc/temp.md:405-410`);
    * `event_type` plays `channel_id`.
    */
  def q4ChannelGmv(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("event_type").as("channel_id"))
      .agg(round(sum(col("value")), 2).as("amount"))
      .orderBy(col("channel_id"))

  /** Q5 — single-hour UV / order-count / GMV via the reference's
    * two-phase rollup: inner GROUP BY (hour, user) then outer GROUP BY
    * hour (`doc/temp.md:463-474`). The reference's `${last_hour}`
    * template bug is fixed by parameterizing the hour; here pinned to
    * the last full hour before [[AsOf]].
    *
    * The nested shape is kept deliberately (SURVEY.md §2.4): Catalyst
    * plans it as two hash-aggregate pairs with map-side partials — the
    * classic scalable exact-distinct pattern (shuffle keyed on
    * (hour, user) first, so no single reducer sees a whole hour).
    */
  def q5HourlyRollup(spark: SparkSession, dir: String): DataFrame = {
    val lastHour = "2024-01-30 23"
    // hour filter as a timestamp RANGE on the raw column (reaches the
    // parquet scan via NanosFilterPushdown), not a string equality on
    // a computed column (which scans everything — the reference's
    // shape, doc/temp.md:470)
    val perUser = Tables.events(spark, dir)
      .filter(col("ts") >= to_timestamp(lit(s"$lastHour:00:00")) &&
        col("ts") < to_timestamp(lit("2024-01-31 00:00:00")))
      .groupBy(date_trunc("HOUR", col("ts")).as("h"), col("user_id"))
      .agg(count(lit(1)).as("cnt"), sum(col("value")).as("amt"))
    perUser
      .groupBy(col("h"))
      .agg(
        count(lit(1)).as("uv"),
        sum(col("cnt")).as("buy_cnt"),
        round(sum(col("amt")), 2).as("amount"))
      .select(date_format(col("h"), "yyyy-MM-dd HH").as("dt"),
        col("uv"), col("buy_cnt"), col("amount"))
      .orderBy(col("dt"))
  }

  /** Q6 — trailing-24h hourly UV / buy_cnt / GMV, newest hour first
    * (`doc/Cumulative.java:63-80`): range filter on event time, the
    * same two-phase distinct rollup as Q5, then a global sort.
    *
    * The filter compares the raw `ts` column against a literal, so it
    * pushes into the parquet scan (row-group min/max skipping) — the
    * reference's form (`cast(order_time AS bigint) >= ...` above an
    * unpartitioned JDBC scan, `doc/Cumulative.java:75`) could not.
    */
  def q6TrailingRollup(spark: SparkSession, dir: String): DataFrame = {
    val cutoff = "2024-01-30 00:00:00" // AsOf - 24h, driver-side constant fold
    val perUser = Tables.events(spark, dir)
      .filter(col("ts") >= to_timestamp(lit(cutoff)))
      .groupBy(date_trunc("HOUR", col("ts")).as("h"), col("user_id"))
      .agg(count(lit(1)).as("cnt"), sum(col("value")).as("amt"))
    perUser
      .groupBy(col("h"))
      .agg(
        count(col("user_id")).as("uv"),
        sum(col("cnt")).as("buy_cnt"),
        round(sum(col("amt")), 2).as("amount"))
      .select(date_format(col("h"), "yyyy-MM-dd HH").as("dt"),
        col("uv"), col("buy_cnt"), col("amount"))
      .orderBy(col("dt").desc)
  }

  /** DuckDB oracle SQL twins — identical semantics, identical output
    * column names/ordering (the driver hash-compares after sorting
    * columns by name). `CAST(... AS BIGINT)` pins DuckDB's
    * HUGEINT `sum(BIGINT)` back to int64 to match Spark's LongType.
    */
  val oracles: Map[String, String] = Map(
    "q1_daily_uv_gmv" ->
      """SELECT strftime(ts, '%Y-%m-%d') AS date_str,
        |       count(DISTINCT user_id) AS uv,
        |       round(sum(value), 2) AS payment,
        |       max(strftime(ts, '%H:%M')) AS time_str
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "q2_per_minute" ->
      """SELECT strftime(date_trunc('minute', ts), '%Y-%m-%d %H:%M') AS min_of_day,
        |       count(*) AS buy_cnt
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "q3_user_gmv" ->
      """SELECT user_id, round(sum(value), 2) AS amount
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "q4_channel_gmv" ->
      """SELECT event_type AS channel_id, round(sum(value), 2) AS amount
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "q5_hourly_rollup" ->
      """SELECT dt, count(*) AS uv, CAST(sum(cnt) AS BIGINT) AS buy_cnt,
        |       round(sum(amt), 2) AS amount
        |FROM (SELECT strftime(ts, '%Y-%m-%d %H') AS dt, user_id,
        |             count(*) AS cnt, sum(value) AS amt
        |      FROM events
        |      WHERE strftime(ts, '%Y-%m-%d %H') = '2024-01-30 23'
        |      GROUP BY 1, 2)
        |GROUP BY dt ORDER BY dt""".stripMargin,
    "q6_trailing_rollup" ->
      """SELECT dt, count(user_id) AS uv, CAST(sum(cnt) AS BIGINT) AS buy_cnt,
        |       round(sum(amt), 2) AS amount
        |FROM (SELECT strftime(ts, '%Y-%m-%d %H') AS dt, user_id,
        |             count(*) AS cnt, sum(value) AS amt
        |      FROM events
        |      WHERE ts >= TIMESTAMP '2024-01-30 00:00:00'
        |      GROUP BY 1, 2)
        |GROUP BY dt ORDER BY dt DESC""".stripMargin
  )

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_daily_uv_gmv" -> (q1DailyUvGmv _),
    "q2_per_minute" -> (q2PerMinute _),
    "q3_user_gmv" -> (q3UserGmv _),
    "q4_channel_gmv" -> (q4ChannelGmv _),
    "q5_hourly_rollup" -> (q5HourlyRollup _),
    "q6_trailing_rollup" -> (q6TrailingRollup _)
  )
}
