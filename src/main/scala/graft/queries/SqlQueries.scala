package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.sources.Tables

/** The reference's second entry point: SQL text over registered temp
  * views (`spark.sql(...)` after `createOrReplaceTempView`,
  * SURVEY.md §3.2, `doc/Cumulative.java:54-80`). Each query here is
  * the Spark-SQL-text twin of a DataFrame pipeline elsewhere in the
  * engine and shares its DuckDB oracle — proving the two surfaces
  * (typed DataFrame and SQL text) resolve to the same plans/results.
  */
object SqlQueries {

  /** Q6 as SQL text — structurally the reference's query
    * (`doc/Cumulative.java:63-80`): two-phase rollup + trailing
    * filter + desc sort, with the §7.6 time-semantics corrections
    * (raw `ts` range filter, pinned asOf).
    */
  def sqlQ6(spark: SparkSession, dir: String): DataFrame = {
    Tables.registerAll(spark, dir)
    spark.sql(
      """SELECT dt, count(user_id) AS uv, sum(cnt) AS buy_cnt,
        |       round(sum(amt), 2) AS amount
        |FROM (SELECT date_format(ts, 'yyyy-MM-dd HH') AS dt, user_id,
        |             count(1) AS cnt, sum(value) AS amt
        |      FROM events
        |      WHERE ts >= timestamp'2024-01-30 00:00:00'
        |      GROUP BY 1, 2)
        |GROUP BY dt
        |ORDER BY dt DESC""".stripMargin)
  }

  /** TPC-H-style revenue join as SQL text (twin of
    * [[StarQueries.revenueByNation]], broadcast hints included the
    * SQL way).
    */
  def sqlRevenue(spark: SparkSession, dir: String): DataFrame = {
    Tables.registerAll(spark, dir)
    spark.sql(
      """SELECT /*+ BROADCAST(customer), BROADCAST(nation) */
        |       n_name AS nation, year(o_orderdate) AS order_year,
        |       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name, year(o_orderdate)
        |ORDER BY nation, order_year""".stripMargin)
  }

  /** The native expressions through the SQL-TEXT surface: the
    * `GraftExtensions.injectFunction` registrations make
    * `simhash64`/`vec_dot`/… callable from `spark.sql(...)` exactly
    * like builtins (codegen included). Twin of
    * [[graft.ext.Dedup.simhash]]; shares its aux-based oracle.
    */
  def sqlSimhash(spark: SparkSession, dir: String): DataFrame = {
    Tables.registerAll(spark, dir)
    spark.sql(
      """SELECT doc_id, simhash64(split(lower(trim(text)), '\\s+')) AS simhash
        |FROM documents ORDER BY doc_id""".stripMargin)
  }

  /** The PIVOT clause through the SQL-text surface — twin of
    * [[ExtraQueries.pivotTypeDaily]] (same pinned value list, same
    * conditional-aggregation plan); empty cells coalesced to 0 for
    * count semantics.
    */
  def sqlPivot(spark: SparkSession, dir: String): DataFrame = {
    Tables.registerAll(spark, dir)
    val types = ExtraQueries.EventTypes
    val inList = types.map(t => s"'$t'").mkString(", ")
    val outer = types.map(t => s"coalesce($t, 0) AS $t").mkString(", ")
    spark.sql(
      s"""SELECT date_str, $outer FROM (
         |  SELECT date_format(ts, 'yyyy-MM-dd') AS date_str, event_type
         |  FROM events)
         |PIVOT (count(1) FOR event_type IN ($inList))
         |ORDER BY date_str""".stripMargin)
  }

  /** The GENERATOR through the SQL-text surface: LATERAL VIEW over
    * the injected `word_ngrams` table function — twin of
    * [[graft.ext.Search.ngramGenCounts]] (same Generate plan, same
    * oracle).
    */
  def sqlNgramGen(spark: SparkSession, dir: String): DataFrame = {
    Tables.registerAll(spark, dir)
    spark.sql(
      """SELECT ngram, count(*) AS cnt
        |FROM documents
        |LATERAL VIEW word_ngrams(filter(split(text, '\\s+'), x -> x != ''), 2)
        |  t AS ngram
        |GROUP BY ngram ORDER BY cnt DESC, ngram LIMIT 40""".stripMargin)
  }

  /** Bitmap-index distinct counting through SQL text — twin of
    * [[graft.ext.Sketches.bitmapDailyUv]] (same plan: partial
    * OR-merged bitmaps per (day, bucket), summed bit counts), sharing
    * its exact-countDistinct oracle.
    */
  def sqlBitmapUv(spark: SparkSession, dir: String): DataFrame = {
    Tables.registerAll(spark, dir)
    spark.sql(
      """SELECT date_str, sum(bitmap_count(bm)) AS uv
        |FROM (SELECT date_format(ts, 'yyyy-MM-dd') AS date_str,
        |             bitmap_bucket_number(user_id) AS bkt,
        |             bitmap_construct_agg(bitmap_bit_position(user_id)) AS bm
        |      FROM events GROUP BY 1, 2)
        |GROUP BY date_str ORDER BY date_str""".stripMargin)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sql_bitmap_uv" -> (sqlBitmapUv _),
    "sql_q6_trailing" -> (sqlQ6 _),
    "sql_revenue_by_nation" -> (sqlRevenue _),
    "sql_simhash" -> (sqlSimhash _),
    "sql_pivot" -> (sqlPivot _),
    "sql_ngram_gen" -> (sqlNgramGen _)
  )

  /** Shared with the DataFrame twins' oracles. */
  val oracles: Map[String, String] = Map(
    "sql_bitmap_uv" -> graft.ext.Sketches.oracles("bitmap_daily_uv"),
    "sql_q6_trailing" -> EventQueries.oracles("q6_trailing_rollup"),
    "sql_revenue_by_nation" -> StarQueries.oracles("star_revenue_by_nation"),
    "sql_simhash" -> graft.ext.Dedup.oracles("dedup_simhash"),
    "sql_pivot" -> ExtraQueries.oracles("pivot_type_daily"),
    "sql_ngram_gen" -> graft.ext.Search.oracles("ngram_gen_counts")
  )
}
