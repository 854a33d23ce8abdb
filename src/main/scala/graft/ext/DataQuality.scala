package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Data-quality / validation operators — the capability the reference
  * itself names as its missing piece ("清洗/验证/监控" — cleaning /
  * validation / monitoring, `doc/temp.md:929`, SURVEY.md §5.1).
  *
  * Shape: one scan computes a per-row rule bitmap; from it derive
  * (a) the clean subset, (b) the quarantine subset with reasons,
  * (c) an aggregated rule-violation report. All three come from the
  * SAME narrow projection — at 100 TB you never scan twice to split
  * clean/dirty, and the report shuffle carries only rule counters.
  */
object DataQuality {

  /** The pinned event-type domain — the ONE copy shared by the
    * validation rule below and the pivot's explicit value list
    * ([[graft.queries.ExtraQueries.EventTypes]]): a new type added
    * here fails the `event_type_known` rule loudly instead of being
    * silently dropped by a stale pivot column list.
    */
  val KnownEventTypes: Seq[String] =
    Seq("click", "error", "purchase", "signup", "view")

  /** Validation rules for the `events` table: (name, predicate-OK). */
  def eventRules: Seq[(String, Column)] = Seq(
    "ts_in_range" ->
      (col("ts") >= to_timestamp(lit("2024-01-01 00:00:00")) &&
        col("ts") < to_timestamp(lit("2025-01-01 00:00:00"))),
    "user_id_positive" -> (col("user_id") > 0),
    "value_non_negative" -> (col("value") >= 0.0),
    "event_type_known" ->
      col("event_type").isInCollection(KnownEventTypes),
    "props_valid_json" ->
      get_json_object(col("props"), "$.k").isNotNull
  )

  /** Rows + a boolean column per rule + overall validity. */
  def validated(df: DataFrame, rules: Seq[(String, Column)]): DataFrame = {
    val withFlags = rules.foldLeft(df) { case (d, (name, ok)) =>
      d.withColumn(s"ok_$name", coalesce(ok, lit(false)))
    }
    withFlags.withColumn("is_valid",
      rules.map { case (n, _) => col(s"ok_$n") }.reduce(_ && _))
  }

  def clean(df: DataFrame, rules: Seq[(String, Column)]): DataFrame =
    validated(df, rules).filter(col("is_valid")).drop(
      ("is_valid" +: rules.map { case (n, _) => s"ok_$n" }): _*)

  def quarantine(df: DataFrame, rules: Seq[(String, Column)]): DataFrame =
    validated(df, rules).filter(!col("is_valid"))
      .withColumn("violations",
        concat_ws(",", rules.map { case (n, _) =>
          when(!col(s"ok_$n"), lit(n)).otherwise(lit(null))
        }: _*))

  /** Violation report: per-rule failure counts in ONE aggregation
    * (conditional sums — no per-rule scans).
    */
  def report(df: DataFrame, rules: Seq[(String, Column)]): DataFrame = {
    val v = validated(df, rules)
    val aggs = Seq(
      count(lit(1)).as("total_rows"),
      sum(when(col("is_valid"), 1L).otherwise(0L)).as("valid_rows")) ++
      rules.map { case (n, _) =>
        sum(when(!col(s"ok_$n"), 1L).otherwise(0L)).as(s"fail_$n")
      }
    v.agg(aggs.head, aggs.tail: _*)
  }

  /** Key-skew profile — the diagnostic every 100 TB join/agg plan
    * starts from: the distribution of per-key row counts for a
    * prospective shuffle key, reduced to one row (distinct keys,
    * total rows, max/p50/p99 frequency, skew ratio, and the salt
    * factor [[graft.ops.SkewJoin]] would need to equalize the hot
    * key). `skew_x100` ≈ max·100/mean and `salt_factor` = ⌈max/mean⌉
    * are integer-exact and OVERFLOW-SAFE at catalog scale: the mean
    * is fixed first (`mean_x100 = total·100 div n_keys`) and the
    * ratios divide by it, so every intermediate stays ≤
    * max(total, max_cnt)·10⁴ — the naive cross-multiply
    * `max·100·n_keys` wraps Long at ~1e10 keys × 1e9-row hot key,
    * exactly the population this diagnostic exists for (and the
    * DuckDB twin would hard-error on the overflow while Spark wraps
    * silently — the worst parity split). Both engines evaluate the
    * SAME floor compositions, so the oracle compares exact integers.
    *
    * Scale shape: one map-side-combined groupBy(key) count, then a
    * single-row reduction whose exact-percentile buffer is keyed by
    * DISTINCT FREQUENCY VALUES, not keys — per-key counts repeat
    * massively (most keys share small frequencies), so the final
    * task's state is the frequency histogram, bounded far below the
    * key count.
    */
  def keySkewProfile(df: DataFrame, keyCol: String): DataFrame =
    df.groupBy(col(keyCol)).agg(count(lit(1)).as("cnt"))
      .agg(
        count(lit(1)).as("n_keys"),
        sum(col("cnt")).as("total_rows"),
        max(col("cnt")).as("max_cnt"),
        round(expr("percentile(cnt, 0.5)"), 4).as("p50_cnt"),
        round(expr("percentile(cnt, 0.99)"), 4).as("p99_cnt"))
      .withColumn("mean_x100", expr("(total_rows * 100) div n_keys"))
      .withColumn("skew_x100",
        expr("(max_cnt * 10000) div mean_x100"))
      .withColumn("salt_factor",
        expr("(max_cnt * 100 + mean_x100 - 1) div mean_x100"))
      .drop("mean_x100")

  /** Per-column presence census — the first profile run on any new
    * table: rows present (non-null), nulls, and EXACT distinct count
    * per column, one output row per column. One input scan: the
    * multi-`countDistinct` aggregate plans as a single Expand +
    * aggregation pass, and the per-column melt is a `stack` over the
    * 1-row result — no per-column re-scans. Exact distincts are the
    * profile's point at validation scale; monitoring at 100 TB swaps
    * in the gated KMV/HLL sketches per column with the same output
    * shape.
    */
  def columnProfile(df: DataFrame, cols: Seq[String]): DataFrame = {
    // positional aliases (c_0/d_0/…), never the caller's names: a
    // user column named `a b` or `x"y` must not reach any identifier
    // position. The melt is typed Columns (explode of struct array
    // over the 1-row aggregate — same single Expand pass stack()
    // compiled to), so the name appears only as a string LITERAL.
    val aggs = cols.zipWithIndex.flatMap { case (c, i) => Seq(
      count(col(c)).as(s"c_$i"), countDistinct(col(c)).as(s"d_$i")) } :+
      count(lit(1)).as("n_rows")
    val rows = array(cols.zipWithIndex.map { case (c, i) =>
      struct(lit(c).as("column"), col(s"c_$i").as("n_present"),
        col(s"d_$i").as("n_distinct")) }: _*)
    df.agg(aggs.head, aggs.tail: _*)
      .select(explode(rows).as("r"), col("n_rows"))
      .select(col("r.column").as("column"), col("r.n_present").as("n_present"),
        (col("n_rows") - col("r.n_present")).as("n_null"),
        col("r.n_distinct").as("n_distinct"))
      .orderBy(col("column"))
  }

  /** Distribution-drift monitor between two cohorts of the same
    * table — the check a pipeline owner runs when a new crawl, a new
    * quarter, or a new upstream version lands: per value bucket, both
    * cohorts' counts and the integer basis-point share delta
    * (`nA·10⁴ div totalA − nB·10⁴ div totalB`). Exact integers
    * end-to-end, so a drift alert threshold compares identically on
    * every engine and run (a PSI-style score needs `ln` — the shares
    * table IS its input, the snap-once discipline of
    * [[Sampling.dsirLogRatio]] applies if one is wanted).
    *
    * Scale shape: one narrow bucket map inside the scan, ONE combined
    * count shuffle on (bucket) carrying both cohorts as conditional
    * sums (never two scans), totals via a 4-value window over the
    * bucket frame (bucket-count-sized, not data-sized).
    */
  def distributionDrift(df: DataFrame, bucketExpr: org.apache.spark.sql.Column,
      inB: org.apache.spark.sql.Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    df.select(bucketExpr.as("bucket"), inB.as("is_b"))
      .groupBy(col("bucket"))
      .agg(sum(when(!col("is_b"), 1L).otherwise(0L)).as("n_a"),
        sum(when(col("is_b"), 1L).otherwise(0L)).as("n_b"))
      .withColumn("tot_a", sum(col("n_a")).over(Window.partitionBy()))
      .withColumn("tot_b", sum(col("n_b")).over(Window.partitionBy()))
      .withColumn("share_a_x10k", expr(
        "CASE WHEN tot_a = 0 THEN NULL ELSE (n_a * 10000) div tot_a END"))
      .withColumn("share_b_x10k", expr(
        "CASE WHEN tot_b = 0 THEN NULL ELSE (n_b * 10000) div tot_b END"))
      .withColumn("delta_x10k", col("share_b_x10k") - col("share_a_x10k"))
      .drop("tot_a", "tot_b")
      .orderBy(col("bucket"))
  }

  /** k-anonymity risk audit over a quasi-identifier tuple: every QI
    * equivalence class smaller than k, with its size — the groups
    * whose members a release would re-identify. One hash aggregate on
    * the QI columns and a count filter: the privacy screen that runs
    * at scan-shuffle cost next to the other profile passes. (The
    * k-threshold is reported per class so downstream can suppress or
    * generalize; classes ≥ k never leave the aggregate.)
    */
  def kAnonymityRisk(df: DataFrame, qi: Seq[String], k: Long): DataFrame =
    df.groupBy(qi.map(col): _*)
      .agg(count(lit(1)).as("class_size"))
      .filter(col("class_size") < k)
      .orderBy(qi.map(col): _*)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // QI = (nation, market segment) on customers; k = 25 so the
    // fixture yields a non-degenerate at-risk set
    "dq_k_anonymity" -> ((s, d) =>
      kAnonymityRisk(Tables.customer(s, d),
        Seq("c_nationkey", "c_mktsegment"), k = 25L)),
    // cohort A = first half of the fixture month, B = the rest; same
    // 50-wide value buckets as hist_value_buckets
    "dq_drift_value" -> ((s, d) =>
      distributionDrift(Tables.events(s, d),
        floor(col("value") / 50.0).cast("long"),
        dayofmonth(col("ts")) > 15)),
    "dq_column_profile" -> ((s, d) =>
      columnProfile(Tables.events(s, d),
        Seq("event_id", "user_id", "event_type", "value", "props"))),
    "dq_key_skew" -> ((s, d) =>
      keySkewProfile(Tables.events(s, d), "user_id")),
    "dq_report" -> ((s, d) => report(Tables.events(s, d), eventRules)),
    "dq_clean_count" -> ((s, d) =>
      clean(Tables.events(s, d), eventRules)
        .groupBy(col("event_type")).agg(count(lit(1)).as("n"))
        .orderBy(col("event_type")))
  )

  val oracles: Map[String, String] = Map(
    "dq_k_anonymity" ->
      """SELECT c_nationkey, c_mktsegment, count(*) AS class_size
        |FROM customer
        |GROUP BY 1, 2 HAVING count(*) < 25
        |ORDER BY 1, 2""".stripMargin,
    // same conditional-sum per bucket, totals as scalar subqueries,
    // identical integer div — day-of-month cohort split. n_a is
    // spelled NOT (day(ts) > 15), not the ELSE branch of the n_b
    // CASE: a NULL ts must land in NEITHER cohort (engine side:
    // when(!is_b, 1).otherwise(0) with is_b NULL yields 0), whereas
    // `CASE WHEN day(ts) > 15 THEN 0 ELSE 1` would fall through to
    // cohort A on NULL and hash-mismatch.
    "dq_drift_value" ->
      """WITH b AS (
        |  SELECT CAST(floor(value / 50.0) AS BIGINT) AS bucket,
        |         CAST(sum(CASE WHEN NOT (day(ts) > 15) THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
        |         CAST(sum(CASE WHEN day(ts) > 15 THEN 1 ELSE 0 END) AS BIGINT) AS n_b
        |  FROM events GROUP BY 1),
        |t AS (SELECT CAST(sum(n_a) AS BIGINT) AS tot_a,
        |             CAST(sum(n_b) AS BIGINT) AS tot_b FROM b)
        |SELECT bucket, n_a, n_b,
        |       CASE WHEN t.tot_a = 0 THEN NULL
        |            ELSE (n_a * 10000) // t.tot_a END AS share_a_x10k,
        |       CASE WHEN t.tot_b = 0 THEN NULL
        |            ELSE (n_b * 10000) // t.tot_b END AS share_b_x10k,
        |       CASE WHEN t.tot_b = 0 THEN NULL
        |            ELSE (n_b * 10000) // t.tot_b END -
        |       CASE WHEN t.tot_a = 0 THEN NULL
        |            ELSE (n_a * 10000) // t.tot_a END AS delta_x10k
        |FROM b, t ORDER BY bucket""".stripMargin,
    "dq_column_profile" -> {
      val branches = Seq("event_id", "user_id", "event_type", "value",
        "props").map { c =>
        s"""SELECT '$c' AS "column", count($c) AS n_present,
           |       count(*) - count($c) AS n_null,
           |       count(DISTINCT $c) AS n_distinct FROM events""".stripMargin
      }.mkString("\nUNION ALL\n")
      s"""SELECT * FROM ($branches)
         |ORDER BY "column"""".stripMargin
    },
    "dq_key_skew" ->
      """WITH c AS (SELECT user_id, count(*) AS cnt FROM events GROUP BY 1),
        |s AS (
        |  SELECT count(*) AS n_keys,
        |         CAST(sum(cnt) AS BIGINT) AS total_rows,
        |         CAST(max(cnt) AS BIGINT) AS max_cnt,
        |         round(quantile_cont(cnt, 0.5), 4) AS p50_cnt,
        |         round(quantile_cont(cnt, 0.99), 4) AS p99_cnt
        |  FROM c),
        |m AS (SELECT *, (total_rows * 100) // n_keys AS mean_x100 FROM s)
        |SELECT n_keys, total_rows, max_cnt, p50_cnt, p99_cnt,
        |       (max_cnt * 10000) // mean_x100 AS skew_x100,
        |       (max_cnt * 100 + mean_x100 - 1) // mean_x100 AS salt_factor
        |FROM m""".stripMargin,
    "dq_report" ->
      """SELECT count(*) AS total_rows,
        |  CAST(sum(CASE WHEN ok_ts AND ok_uid AND ok_val AND ok_type AND ok_json
        |                THEN 1 ELSE 0 END) AS BIGINT) AS valid_rows,
        |  CAST(sum(CASE WHEN NOT ok_ts THEN 1 ELSE 0 END) AS BIGINT) AS fail_ts_in_range,
        |  CAST(sum(CASE WHEN NOT ok_uid THEN 1 ELSE 0 END) AS BIGINT) AS fail_user_id_positive,
        |  CAST(sum(CASE WHEN NOT ok_val THEN 1 ELSE 0 END) AS BIGINT) AS fail_value_non_negative,
        |  CAST(sum(CASE WHEN NOT ok_type THEN 1 ELSE 0 END) AS BIGINT) AS fail_event_type_known,
        |  CAST(sum(CASE WHEN NOT ok_json THEN 1 ELSE 0 END) AS BIGINT) AS fail_props_valid_json
        |FROM (SELECT
        |  coalesce(ts >= TIMESTAMP '2024-01-01 00:00:00'
        |           AND ts < TIMESTAMP '2025-01-01 00:00:00', false) AS ok_ts,
        |  coalesce(user_id > 0, false) AS ok_uid,
        |  coalesce(value >= 0.0, false) AS ok_val,
        |  coalesce(event_type IN ('click','view','purchase','signup','error'), false) AS ok_type,
        |  coalesce(json_extract(props, '$.k') IS NOT NULL, false) AS ok_json
        |FROM events)""".stripMargin,
    "dq_clean_count" ->
      """SELECT event_type, count(*) AS n FROM events
        |WHERE coalesce(ts >= TIMESTAMP '2024-01-01 00:00:00'
        |               AND ts < TIMESTAMP '2025-01-01 00:00:00', false)
        |  AND coalesce(user_id > 0, false)
        |  AND coalesce(value >= 0.0, false)
        |  AND coalesce(event_type IN ('click','view','purchase','signup','error'), false)
        |  AND coalesce(json_extract(props, '$.k') IS NOT NULL, false)
        |GROUP BY 1 ORDER BY 1""".stripMargin
  )
}
