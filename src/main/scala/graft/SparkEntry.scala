package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.ext.{DataQuality, Dedup, Multimodal, Similarity, TextAnalysis}
import graft.gen.OrderGen
import graft.queries.{EventQueries, ExtraQueries, SqlQueries, StarQueries, WindowQueries}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the engine's full operator surface, one entry per
  * implemented operator from SURVEY.md §2 (+ north-star extensions);
  * `oracleSql` carries a DuckDB-equivalent SQL twin for every
  * SQL-expressible query (the driver hash-compares result sets).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    StarQueries.revenueByNation(spark, "/root/testdata/sf0.001")

  /** GEN (SURVEY.md §2.1): the reference's order generator as a
    * deterministic distributed source, JSON wire round-trip included,
    * then a Q1-shape daily rollup over the generated orders. The
    * generator's hash derivations have no SQL twin, but the ROLLUP
    * does: Verify materializes the generated orders to
    * `__OUTDIR__/.aux/gen_orders` and the oracle rolls up that same
    * input in DuckDB.
    */
  private def genRollup(spark: SparkSession, dir: String): DataFrame = {
    val orders = OrderGen.decodeJson(OrderGen.ordersJson(spark, 100000L))
    orders
      .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("date_str"))
      .agg(countDistinct(col("user_id")).as("uv"),
        sum(col("amount")).as("gmv"),
        count(lit(1)).as("orders"))
      .orderBy(col("date_str"))
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    EventQueries.queries ++ StarQueries.queries ++
      TextAnalysis.queries ++ Dedup.queries ++ Similarity.queries ++
      Multimodal.queries ++ graft.streaming.StreamingQueries.queries ++
      WindowQueries.queries ++ ExtraQueries.queries ++ SqlQueries.queries ++
      DataQuality.queries + ("gen_orders_rollup" -> (genRollup _))

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    EventQueries.oracles ++ StarQueries.oracles ++
      TextAnalysis.oracles ++ Dedup.oracles ++ Similarity.oracles ++
      Multimodal.oracles ++ graft.streaming.StreamingQueries.oracles ++
      WindowQueries.oracles ++ ExtraQueries.oracles ++ SqlQueries.oracles ++
      DataQuality.oracles +
      ("gen_orders_rollup" ->
        """SELECT strftime(ts, '%Y-%m-%d') AS date_str,
          |       count(DISTINCT user_id) AS uv,
          |       CAST(sum(amount) AS BIGINT) AS gmv,
          |       count(*) AS orders
          |FROM read_parquet('__OUTDIR__/.aux/gen_orders/*.parquet')
          |GROUP BY 1 ORDER BY 1""".stripMargin)
}
