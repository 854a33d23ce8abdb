package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Sketch-family aggregation: bitmap-index distinct counting and a
  * count-min frequency sketch — the OLAP techniques behind fast UV /
  * heavy-hitter queries (the reference's Q1/Q3 workload shape is
  * exactly per-key UV+GMV; bitmap UV is how warehouse engines answer
  * it without a distinct shuffle per query).
  *
  * Both sketches here are DETERMINISTIC (hash-bucketed, no RNG), so
  * unlike HLL they are oracle-checkable: the bitmap UV must equal the
  * exact distinct count, and the CMS estimate is reproduced
  * independently by DuckDB from the materialized bucket assignments
  * (`.aux/cms_buckets`).
  *
  * Scale notes:
  *  - [[bitmapDailyUv]]: first aggregation carries (day, 2^15-wide
  *    bucket) → one 4 KB bitmap per group (map-side combined OR), the
  *    second sums tiny per-bucket cardinalities. No row-level
  *    distinct state ever shuffles; the bitmap layer is re-mergeable,
  *    so daily bitmaps can persist and roll up to weeks/months
  *    without touching raw events again.
  *  - [[cmsUserCounts]]: the sketch IS a (table, bucket) count frame
  *    — 4×1024 cells regardless of input size; building it is one
  *    shuffle of 4-per-row (table, bucket) partials with map-side
  *    combine, and estimation broadcasts the KB-sized sketch back.
  *    Estimates are upper bounds (min over tables of a
  *    non-decreasing cell); the gate carries exact counts alongside.
  */
object Sketches {

  /** Exact daily UV via bitmap index: `user_id` maps to
    * (bucket, bit); per (day, bucket) an OR-merged bitmap; per day
    * the summed bit count. Equals `count(DISTINCT user_id)` — the
    * oracle asserts exactly that.
    */
  def bitmapDailyUv(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("date_str"),
        expr("bitmap_bucket_number(user_id)").as("bkt"))
      .agg(expr("bitmap_construct_agg(bitmap_bit_position(user_id))").as("bm"))
      .groupBy(col("date_str"))
      .agg(sum(expr("bitmap_count(bm)")).as("uv"))
      .orderBy(col("date_str"))

  val CmsDepth = 4
  val CmsWidth = 1024L

  /** KMV (k-minimum-values) distinct-count sketch parameters. k = 16
    * keeps the estimator branch exercised at gate scale (daily UV at
    * sf0.01 exceeds k) while the n < k branch degrades to exact.
    */
  val KmvK = 16
  val KmvSalt = 64L

  /** The KMV hash — shared by the gated query and the `.aux`
    * materialization the oracle recomputes from, so the only trusted
    * surface is the key→hash mapping (the selection and the estimate
    * are re-derived independently in DuckDB).
    */
  def kmvHash(key: Column): Column = xxhash64(key)

  /** Approximate daily UV via a DETERMINISTIC KMV sketch — the
    * oracle-checkable replacement for HLL `approx_count_distinct`
    * (which is seeded/implementation-specific and can never
    * hash-match an oracle; its tolerance is asserted in FidelitySpec
    * instead). Estimate: with h normalized to [0,1) by a monotone
    * affine map of the signed 64-bit hash, and hₖ the k-th smallest
    * distinct hash of the day, UV ≈ (k−1)/hₖ; days with fewer than k
    * distinct hashes report the exact count.
    *
    * Scale shape: the distinct layer is a map-side-combined
    * (day, h) aggregation; the k-th order statistic is selected in
    * TWO window levels — per (day, h mod 64) salt bucket first, then
    * per day over ≤ 64·k survivors — so no task ever sorts more than
    * a salt bucket's distinct hashes (global k-min ⊆ union of
    * per-bucket k-mins, so the two-level selection is exact). KMV
    * sketches are re-mergeable (union the hash sets, keep the k
    * smallest), so daily sketches roll up to weeks/months like the
    * bitmap layer does.
    *
    * All float steps are IEEE-pinned and mirrored literally in the
    * oracle: signed-hash + 2⁶³ then ÷ 2⁶⁴ (both exactly-representable
    * doubles), one division, `floor`. The `greatest(…, 2⁻⁶⁵)` guard
    * only fires for the measure-zero h = Long.MinValue day-minimum
    * and keeps both engines finite.
    */
  def kmvDailyUv(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val distinctHashes = Tables.events(spark, dir)
      .select(date_format(col("ts"), "yyyy-MM-dd").as("date_str"),
        kmvHash(col("user_id")).as("h"))
      .distinct()
    val wSalt = Window
      .partitionBy(col("date_str"), pmod(col("h"), lit(KmvSalt)))
      .orderBy(col("h"))
    val wDay = Window.partitionBy(col("date_str")).orderBy(col("h"))
    val frac = greatest(
      (col("hk").cast("double") + lit(9.223372036854776e18)) /
        lit(1.8446744073709552e19),
      lit(2.710505431213761e-20))
    distinctHashes
      .withColumn("rn", row_number().over(wSalt)).filter(col("rn") <= KmvK)
      .withColumn("rn2", row_number().over(wDay)).filter(col("rn2") <= KmvK)
      .groupBy(col("date_str"))
      .agg(max(col("h")).as("hk"), count(lit(1)).as("m"))
      .select(col("date_str"),
        when(col("m") < KmvK, col("m"))
          .otherwise(floor(lit((KmvK - 1).toDouble) / frac).cast("long"))
          .as("uv_est"))
      .orderBy(col("date_str"))
  }

  /** Bucket of `key` in CMS table `t` — pure function shared by the
    * sketch build, the estimate probe, and the `.aux` materialization
    * the oracle recomputes from.
    */
  def cmsBucket(key: Column, t: Int): Column =
    pmod(xxhash64(lit(t), key), lit(CmsWidth))

  /** Per-user exact count + count-min estimate. `est_n >= exact_n`
    * always; equality whenever no hash collision inflates every one
    * of the key's cells.
    *
    * The sketch IS bounded state — CmsDepth × CmsWidth cells,
    * independent of data volume — so it is built in ONE pass
    * (one posexplode aggregation), collected once, and probed as a
    * broadcast literal map lookup per depth. The earlier per-depth
    * broadcast-join formulation re-filtered the uncached sketch
    * frame, recomputing the full events scan + bucket aggregation
    * CmsDepth times; the literal probe also drops the probe-side
    * joins entirely (the estimate is a narrow codegen projection).
    */
  def cmsUserCounts(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir).select(col("user_id"))
    val cells: Map[Long, Long] = ev
      .select(posexplode(array((0 until CmsDepth).map(t =>
        cmsBucket(col("user_id"), t)): _*)).as(Seq("t", "bkt")))
      .groupBy(col("t"), col("bkt")).agg(count(lit(1)).as("c"))
      .collect()
      .map(r => (r.getInt(0) * CmsWidth + r.getLong(1)) -> r.getLong(2))
      .toMap
    val cellMap = typedlit(cells)
    // a probed key always contributed to its own cells, so every
    // looked-up cell exists in the map (no null branch to coalesce)
    ev.groupBy(col("user_id")).agg(count(lit(1)).as("exact_n"))
      .select(col("user_id"), col("exact_n"),
        least((0 until CmsDepth).map(t =>
          element_at(cellMap,
            lit(t * CmsWidth) + cmsBucket(col("user_id"), t))): _*).as("est_n"))
      .orderBy(col("user_id"))
  }

  // -------------------------------------------------------- gate wiring

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "bitmap_daily_uv" -> (bitmapDailyUv _),
    "kmv_daily_uv" -> (kmvDailyUv _),
    "sketch_cms_users" -> (cmsUserCounts _)
  )

  val oracles: Map[String, String] = Map(
    // the bitmap path must be EXACT
    "bitmap_daily_uv" ->
      """SELECT strftime(ts, '%Y-%m-%d') AS date_str,
        |       count(DISTINCT user_id) AS uv
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    // DuckDB re-derives the k smallest per-day distinct hashes from
    // the materialized user→hash mapping DIRECTLY (one global window,
    // mathematically identical to the engine's two-level salted
    // selection) and re-applies the pinned estimate formula
    "kmv_daily_uv" ->
      s"""WITH a AS (SELECT * FROM
         |           read_parquet('__OUTDIR__/.aux/kmv_hashes/*.parquet')),
         |d AS (SELECT DISTINCT strftime(e.ts, '%Y-%m-%d') AS date_str, a.h
         |      FROM events e JOIN a USING (user_id)),
         |r AS (SELECT date_str, h,
         |             row_number() OVER (PARTITION BY date_str ORDER BY h) AS rn
         |      FROM d),
         |s AS (SELECT date_str, max(h) AS hk, count(*) AS m
         |      FROM r WHERE rn <= $KmvK GROUP BY 1)
         |SELECT date_str,
         |       CASE WHEN m < $KmvK THEN m
         |            ELSE CAST(floor(${(KmvK - 1).toDouble} /
         |                 greatest((CAST(hk AS DOUBLE) + 9.223372036854776e18)
         |                          / 1.8446744073709552e19,
         |                          2.710505431213761e-20)) AS BIGINT)
         |       END AS uv_est
         |FROM s ORDER BY date_str""".stripMargin,
    // DuckDB re-runs the estimate from the materialized bucket
    // assignments: cell(t,b) = total rows whose key hashes to b in
    // table t; estimate = min over tables of the key's cell
    "sketch_cms_users" -> {
      val cells = (0 until CmsDepth).map(t =>
        s"""t$t AS (SELECT a.b$t AS b, sum(k.exact_n) AS c
           |       FROM k JOIN a USING (user_id) GROUP BY 1)""".stripMargin)
        .mkString(",\n")
      val joins = (0 until CmsDepth)
        .map(t => s"JOIN t$t ON a.b$t = t$t.b").mkString("\n")
      val mins = (0 until CmsDepth).map(t => s"t$t.c").mkString(", ")
      s"""WITH k AS (SELECT user_id, count(*) AS exact_n
         |           FROM events GROUP BY 1),
         |a AS (SELECT * FROM
         |      read_parquet('__OUTDIR__/.aux/cms_buckets/*.parquet')),
         |$cells
         |SELECT k.user_id, k.exact_n,
         |       CAST(least($mins) AS BIGINT) AS est_n
         |FROM k JOIN a USING (user_id)
         |$joins
         |ORDER BY k.user_id""".stripMargin
    }
  )
}
