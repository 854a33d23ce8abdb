package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Slowly-changing-dimension Type 2: apply a dimension snapshot to a
  * versioned history table, closing superseded versions and opening
  * new ones — `MERGE ... WHEN MATCHED AND <attrs changed> THEN
  * close+insert` re-expressed as one full-outer join plus projections.
  *
  * Contract: `current` holds the full version history —
  * `(key, attrs…, valid_from, valid_to)` with `valid_to IS NULL` on
  * exactly the open version of each key; `updates` holds at most one
  * snapshot row per key. Then:
  *
  *  - update differs from the open version → close it
  *    (`valid_to := effective`) and insert the update as the new open
  *    version;
  *  - update identical (null-safe, all attrs) → no-op (the classic
  *    SCD2 bug is re-versioning unchanged rows on every load — the
  *    null-safe `<=>` comparison is the guard);
  *  - new key → insert as open version;
  *  - key absent from `updates`, and all closed history → pass through.
  *
  * Scale: ONE shuffle of the open slice and one of the updates (the
  * full-outer join on the key); closed history passes through without
  * touching the join — at 100 TB the closed majority of a years-old
  * dimension never shuffles at all. No window functions, no driver
  * state. Exactly the plan a lakehouse MERGE compiles to, minus the
  * transaction log (pair with [[Layout.upsertPartitions]] to land it).
  *
  * Reference scope: the reference keeps dims unversioned (plain MySQL
  * upsert, `doc/Cumulative.java:84-90` overwrites in place); SCD2 is
  * the warehouse-standard versioned form of that operation.
  */
object Scd2 {

  /** Apply `updates` (one row per key, already carrying `eff` as the
    * effective timestamp column) to `current`. Attribute columns are
    * `attrs`; everything else in `current` must be the key and the
    * two validity columns.
    */
  def apply2(current: DataFrame, updates: DataFrame, key: String,
      attrs: Seq[String], effective: Column): DataFrame = {
    val open = current.filter(col("valid_to").isNull)
    val closedHistory = current.filter(col("valid_to").isNotNull)
    val u = updates.select(
      (col(key) +: attrs.map(a => col(a).as(s"__u_$a"))) :+
        effective.as("__eff"): _*)
    val j = open.join(u, Seq(key), "full_outer")
    // null-safe "any attribute differs"; for update-only rows (no open
    // version) this is true, which routes them to the insert leg
    val changed = attrs.map(a => !(col(a) <=> col(s"__u_$a"))).reduce(_ || _)
    val hasOpen = col("valid_from").isNotNull
    val hasUpd = col("__eff").isNotNull
    val stillOpen = j
      .filter(hasOpen && (!hasUpd || !changed))
      .select((col(key) +: attrs.map(col)) :+
        col("valid_from") :+ col("valid_to"): _*)
    val closedNow = j
      .filter(hasOpen && hasUpd && changed)
      .select((col(key) +: attrs.map(col)) :+
        col("valid_from") :+ col("__eff").as("valid_to"): _*)
    val openedNow = j
      .filter(hasUpd && (!hasOpen || changed))
      .select((col(key) +: attrs.map(a => col(s"__u_$a").as(a))) :+
        col("__eff").as("valid_from") :+
        lit(null).cast(j.schema("valid_to").dataType).as("valid_to"): _*)
    closedHistory.unionByName(stillOpen)
      .unionByName(closedNow).unionByName(openedNow)
  }

  // ------------------------------------------------------------ the gate

  /** Initial load date / snapshot date of the gate scenario. */
  val T0 = "2024-01-01"
  val T1 = "2024-06-01"

  /** Gate: customers as the initial open version at [[T0]]; the [[T1]]
    * snapshot changes every key ≡0 (mod 3), repeats every key ≡1
    * unchanged (must no-op), omits keys ≡2, and adds one new customer
    * per nation. Full versioned table out, dates as strings.
    */
  def customerHistory(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir)
    val current = cust.select(col("c_custkey"), col("c_mktsegment"),
        col("c_acctbal"),
        to_date(lit(T0)).as("valid_from"),
        lit(null).cast("date").as("valid_to"))
    val updates = cust.filter(col("c_custkey") % 3 === 0)
      .select(col("c_custkey"),
        concat(lit("X-"), col("c_mktsegment")).as("c_mktsegment"),
        (col("c_acctbal") + 100.0).as("c_acctbal"))
      .unionByName(cust.filter(col("c_custkey") % 3 === 1)
        .select(col("c_custkey"), col("c_mktsegment"), col("c_acctbal")))
      .unionByName(Tables.nation(spark, dir).select(
        (col("n_nationkey").cast("long") + lit(1000000L)).as("c_custkey"),
        lit("NEW").as("c_mktsegment"),
        lit(0.0).as("c_acctbal")))
    apply2(current, updates, "c_custkey",
      Seq("c_mktsegment", "c_acctbal"), to_date(lit(T1)))
      .select(col("c_custkey"), col("c_mktsegment"), col("c_acctbal"),
        date_format(col("valid_from"), "yyyy-MM-dd").as("valid_from"),
        date_format(col("valid_to"), "yyyy-MM-dd").as("valid_to"))
      .orderBy(col("c_custkey"), col("valid_from"))
  }

  /** Point-in-time lookup against the versioned dimension: every
    * event joins the customer VERSION that was valid at the event's
    * date (the fact-to-SCD2 resolution every warehouse query over a
    * versioned dim needs — joining the open version instead is the
    * classic silent-history-rewrite bug). The dim is built by
    * [[apply2]] with a mid-range effective date so events genuinely
    * straddle both versions.
    *
    * Scale: versions-per-key is small and bounded (here ≤2), so the
    * lookup is ONE keyed equi-join with bounded fanout plus a narrow
    * validity filter — facts shuffle once on the key, exactly like a
    * plain dim join. (For pathological version counts, the as-of
    * union+window form in [[graft.ops.AsOfJoin]] bounds the work per
    * key instead.) Values aggregate as exact integer cents.
    */
  def pointInTimeLookup(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir)
    val current = cust.select(col("c_custkey"), col("c_mktsegment"),
      to_date(lit(T0)).as("valid_from"),
      lit(null).cast("date").as("valid_to"))
    val updates = cust.filter(col("c_custkey") % 3 === 0)
      .select(col("c_custkey"),
        concat(lit("X-"), col("c_mktsegment")).as("c_mktsegment"))
    val hist = apply2(current, updates, "c_custkey",
      Seq("c_mktsegment"), to_date(lit(TMid)))
    val ev = Tables.events(spark, dir)
      .select(col("user_id").as("c_custkey"), to_date(col("ts")).as("d"),
        round(col("value") * 100, 0).cast("long").as("cents"))
    ev.join(hist, Seq("c_custkey"))
      .filter(col("d") >= col("valid_from") &&
        (col("valid_to").isNull || col("d") < col("valid_to")))
      .groupBy(col("c_mktsegment").as("segment"))
      .agg(count(lit(1)).as("n_events"), sum(col("cents")).as("value_cents"))
      .orderBy(col("segment"))
  }

  /** Effective date of the lookup gate's second version — inside the
    * events fixture's date range so both versions resolve. */
  val TMid = "2024-01-15"

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "scd2_customer_history" -> (customerHistory _),
    "scd2_point_in_time" -> (pointInTimeLookup _)
  )

  val oracles: Map[String, String] = Map(
    "scd2_customer_history" ->
      s"""SELECT c_custkey, c_mktsegment, c_acctbal,
         |       '$T0' AS valid_from, '$T1' AS valid_to
         |FROM customer WHERE c_custkey % 3 = 0
         |UNION ALL
         |SELECT c_custkey, 'X-' || c_mktsegment, c_acctbal + 100,
         |       '$T1', NULL
         |FROM customer WHERE c_custkey % 3 = 0
         |UNION ALL
         |SELECT c_custkey, c_mktsegment, c_acctbal, '$T0', NULL
         |FROM customer WHERE c_custkey % 3 <> 0
         |UNION ALL
         |SELECT CAST(n_nationkey AS BIGINT) + 1000000, 'NEW', 0.0,
         |       '$T1', NULL
         |FROM nation
         |ORDER BY 1, 4""".stripMargin,
    "scd2_point_in_time" ->
      s"""WITH hist AS (
         |  SELECT c_custkey, c_mktsegment,
         |         DATE '$T0' AS vf, DATE '$TMid' AS vt
         |  FROM customer WHERE c_custkey % 3 = 0
         |  UNION ALL
         |  SELECT c_custkey, 'X-' || c_mktsegment, DATE '$TMid', NULL
         |  FROM customer WHERE c_custkey % 3 = 0
         |  UNION ALL
         |  SELECT c_custkey, c_mktsegment, DATE '$T0', NULL
         |  FROM customer WHERE c_custkey % 3 <> 0)
         |SELECT h.c_mktsegment AS segment, count(*) AS n_events,
         |       CAST(sum(CAST(round(e.value * 100, 0) AS BIGINT)) AS BIGINT)
         |         AS value_cents
         |FROM events e JOIN hist h ON e.user_id = h.c_custkey
         |  AND CAST(e.ts AS DATE) >= h.vf
         |  AND (h.vt IS NULL OR CAST(e.ts AS DATE) < h.vt)
         |GROUP BY 1 ORDER BY 1""".stripMargin
  )
}
