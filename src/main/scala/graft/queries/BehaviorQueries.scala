package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Behavioral analytics over the event stream — the funnel /
  * retention / quantile-bucketing family every product-analytics
  * engine ships (engine surface beyond the reference's rollups; the
  * reference's `user_behavior` table is exactly this workload's
  * input shape, `doc/temp.md:205-225`).
  *
  * Scale notes: every stage keys by `user_id` — the three funnel
  * aggregations and the retention join all hash-partition on the
  * same key, so AQE can reuse the exchange; per-user frames are
  * ≪ events (one row per user per stage). ntile partitions by
  * event_type (5 partitions at any scale — fine because the per-type
  * sort is the point; for high-cardinality keys use `percentile` +
  * range bucketing instead).
  */
object BehaviorQueries {

  /** Ordered-funnel completion: users whose first `view` precedes
    * their first subsequent `click` precedes their first subsequent
    * `purchase`. Stage k's timestamp is the earliest event of the
    * stage-k type at-or-after the user's stage-(k−1) timestamp —
    * ties (same-timestamp distinct events) count, matching the SQL
    * oracle's `>=`.
    */
  def funnelStages(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val v = ev.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("ts")).as("v_ts"))
    val c = ev.filter(col("event_type") === "click")
      .join(v, "user_id").filter(col("ts") >= col("v_ts"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("c_ts"))
    val p = ev.filter(col("event_type") === "purchase")
      .join(c, "user_id").filter(col("ts") >= col("c_ts"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("p_ts"))
    v.agg(count(lit(1)).as("n_view"))
      .crossJoin(c.agg(count(lit(1)).as("n_click_after_view")))
      .crossJoin(p.agg(count(lit(1)).as("n_purchase_after_click")))
  }

  /** Day-N retention cohorts: users grouped by first-seen day; for
    * offsets 0..7, how many of each cohort were active `offset` days
    * later. All integer/date arithmetic — hash-exact across engines.
    */
  def retentionCohorts(spark: SparkSession, dir: String, maxOffset: Int = 7): DataFrame = {
    val ev = Tables.events(spark, dir)
    val cohort = ev.groupBy(col("user_id"))
      .agg(min(to_date(col("ts"))).as("cohort_date"))
    val activity = ev.select(col("user_id"), to_date(col("ts")).as("d")).distinct()
    activity.join(cohort, "user_id")
      .withColumn("day_offset", datediff(col("d"), col("cohort_date")))
      .filter(col("day_offset") <= maxOffset)
      .groupBy(col("cohort_date"), col("day_offset"))
      .agg(countDistinct(col("user_id")).as("n_users"))
      .select(date_format(col("cohort_date"), "yyyy-MM-dd").as("cohort"),
        col("day_offset"), col("n_users"))
      .orderBy(col("cohort"), col("day_offset"))
  }

  /** Per-type value deciles via `ntile(10)` with a total order
    * (`value, event_id` — the unique tiebreak keeps bucket
    * boundaries engine-independent), summarized per bucket.
    */
  def ntileValueBuckets(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("event_type"))
      .orderBy(col("value").asc, col("event_id").asc)
    Tables.events(spark, dir)
      .withColumn("decile", ntile(10).over(w))
      .groupBy(col("event_type"), col("decile"))
      .agg(count(lit(1)).as("n"),
        round(min(col("value")), 2).as("lo"),
        round(max(col("value")), 2).as("hi"))
      .orderBy(col("event_type"), col("decile"))
  }

  /** Market-basket association over event types: for every type pair,
    * the users doing both, support, and lift — the co-occurrence
    * screen behind "users who X also Y". All ratios derive from
    * integer counts through one shared syntactic expression, so the
    * doubles hash-match the oracle bit-exactly. The self-join fans
    * out ≤ C(|types|, 2) per user (types are a bounded domain);
    * everything downstream of the distinct is tiny.
    */
  def assocTypePairs(spark: SparkSession, dir: String): DataFrame = {
    val ut = Tables.events(spark, dir)
      .select(col("user_id"), col("event_type")).distinct()
    val nUsers = ut.select(col("user_id")).distinct()
      .agg(count(lit(1)).as("n_users"))
    val perType = ut.groupBy(col("event_type")).agg(count(lit(1)).as("n_t"))
    val pairs = ut.select(col("user_id"), col("event_type").as("type_a"))
      .join(ut.select(col("user_id"), col("event_type").as("type_b")),
        Seq("user_id"))
      .filter(col("type_a") < col("type_b"))
      .groupBy(col("type_a"), col("type_b")).agg(count(lit(1)).as("n_ab"))
    pairs
      .join(broadcast(perType.select(col("event_type").as("type_a"),
        col("n_t").as("n_a"))), Seq("type_a"))
      .join(broadcast(perType.select(col("event_type").as("type_b"),
        col("n_t").as("n_b"))), Seq("type_b"))
      .crossJoin(broadcast(nUsers))
      .select(col("type_a"), col("type_b"), col("n_ab"),
        round(col("n_ab").cast("double") / col("n_users").cast("double"), 6)
          .as("support"),
        round((col("n_ab").cast("double") * col("n_users").cast("double"))
          / (col("n_a").cast("double") * col("n_b").cast("double")), 6)
          .as("lift"))
      .orderBy(col("type_a"), col("type_b"))
  }

  /** Analytic rank surface completion: `percent_rank` + `cume_dist`
    * over per-user GMV (exact integer cents; unique (cents, user)
    * tiebreak keeps both engine-independent). The total-order window
    * runs on the AGGREGATED per-user frame — users ≪ events — never
    * on raw events.
    */
  def userGmvRanks(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.orderBy(col("cents"), col("user_id"))
    Tables.events(spark, dir)
      .select(col("user_id"),
        round(col("value") * 100, 0).cast("long").as("cents"))
      .groupBy(col("user_id")).agg(sum(col("cents")).as("cents"))
      .select(col("user_id"), col("cents"),
        round(percent_rank().over(w), 6).as("pct_rank"),
        round(cume_dist().over(w), 6).as("cume"))
      .orderBy(col("user_id"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "assoc_type_pairs" -> (assocTypePairs _),
    "pct_rank_user_gmv" -> (userGmvRanks _),
    "funnel_stages" -> (funnelStages _),
    "retention_cohorts" -> ((s, d) => retentionCohorts(s, d)),
    "ntile_value_buckets" -> (ntileValueBuckets _)
  )

  val oracles: Map[String, String] = Map(
    "assoc_type_pairs" ->
      """WITH ut AS (SELECT DISTINCT user_id, event_type FROM events),
        |n AS (SELECT count(DISTINCT user_id) AS n_users FROM ut),
        |t AS (SELECT event_type, count(*) AS n_t FROM ut GROUP BY 1),
        |p AS (SELECT a.event_type AS type_a, b.event_type AS type_b,
        |             count(*) AS n_ab
        |      FROM ut a JOIN ut b ON a.user_id = b.user_id
        |        AND a.event_type < b.event_type
        |      GROUP BY 1, 2)
        |SELECT p.type_a, p.type_b, p.n_ab,
        |       round(CAST(p.n_ab AS DOUBLE) / CAST(n.n_users AS DOUBLE), 6)
        |         AS support,
        |       round((CAST(p.n_ab AS DOUBLE) * CAST(n.n_users AS DOUBLE))
        |             / (CAST(ta.n_t AS DOUBLE) * CAST(tb.n_t AS DOUBLE)), 6)
        |         AS lift
        |FROM p
        |JOIN t ta ON ta.event_type = p.type_a
        |JOIN t tb ON tb.event_type = p.type_b
        |CROSS JOIN n
        |ORDER BY 1, 2""".stripMargin,
    "pct_rank_user_gmv" ->
      """WITH g AS (
        |  SELECT user_id,
        |         CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT)
        |           AS cents
        |  FROM events GROUP BY 1)
        |SELECT user_id, cents,
        |       round(percent_rank() OVER (ORDER BY cents, user_id), 6)
        |         AS pct_rank,
        |       round(cume_dist() OVER (ORDER BY cents, user_id), 6) AS cume
        |FROM g ORDER BY user_id""".stripMargin,
    "funnel_stages" ->
      """WITH v AS (SELECT user_id, min(ts) AS v_ts FROM events
        |           WHERE event_type = 'view' GROUP BY 1),
        |c AS (SELECT e.user_id, min(e.ts) AS c_ts FROM events e
        |      JOIN v ON e.user_id = v.user_id
        |      WHERE e.event_type = 'click' AND e.ts >= v.v_ts GROUP BY 1),
        |p AS (SELECT e.user_id, min(e.ts) AS p_ts FROM events e
        |      JOIN c ON e.user_id = c.user_id
        |      WHERE e.event_type = 'purchase' AND e.ts >= c.c_ts GROUP BY 1)
        |SELECT (SELECT count(*) FROM v) AS n_view,
        |       (SELECT count(*) FROM c) AS n_click_after_view,
        |       (SELECT count(*) FROM p) AS n_purchase_after_click""".stripMargin,
    "retention_cohorts" ->
      """WITH cohort AS (
        |  SELECT user_id, min(CAST(ts AS DATE)) AS cohort_date
        |  FROM events GROUP BY 1),
        |activity AS (
        |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events)
        |SELECT strftime(c.cohort_date, '%Y-%m-%d') AS cohort,
        |       CAST(datediff('day', c.cohort_date, a.d) AS INTEGER) AS day_offset,
        |       count(DISTINCT a.user_id) AS n_users
        |FROM activity a JOIN cohort c ON a.user_id = c.user_id
        |WHERE datediff('day', c.cohort_date, a.d) <= 7
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "ntile_value_buckets" ->
      """WITH t AS (
        |  SELECT event_type, value,
        |         CAST(ntile(10) OVER (PARTITION BY event_type
        |              ORDER BY value ASC, event_id ASC) AS INTEGER) AS decile
        |  FROM events)
        |SELECT event_type, decile, count(*) AS n,
        |       round(min(value), 2) AS lo, round(max(value), 2) AS hi
        |FROM t GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
  )
}
