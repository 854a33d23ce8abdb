package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.gen.OrderGen

/** Byte-faithful reference behavior (SURVEY.md §7.6): the reference's
  * exact SQL text run over a generated `user_behavior` view, including
  * its documented quirks. These tests pin what the reference DOES, not
  * what it intended — the canonical engine queries implement the
  * intent (timestamp_seconds + parameterized hour).
  */
class FidelitySpec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession.local("graft-fidelity-test")

  private def registerOrders(n: Long): Unit =
    OrderGen.orders(spark, n)
      .createOrReplaceTempView("user_behavior")

  test("Q6 byte-faithful: cast(order_time as timestamp) treats seconds correctly on Spark >= 3.1") {
    registerOrders(50000)
    // the reference's inner query shape, doc/Cumulative.java:63-78,
    // with startTime pinned instead of Instant.now (doc/Cumulative.java:59-61)
    val startTime = OrderGen.BaseEpoch // include everything
    val ref = spark.sql(
      s"""SELECT t1.dt AS dt, count(t1.user_id) AS uv,
         |       sum(t1.buy_count) AS buy_cnt, sum(t1.amount) AS amount
         |FROM (
         |  SELECT substr(from_utc_timestamp(cast(order_time as timestamp), 'PRC'), 1, 13) AS dt,
         |         cast(user_id as string) AS user_id,
         |         count(1) AS buy_count, sum(amount) AS amount
         |  FROM user_behavior
         |  WHERE cast(order_time AS bigint) >= $startTime
         |  GROUP BY substr(from_utc_timestamp(cast(order_time as timestamp), 'PRC'), 1, 13),
         |           cast(user_id as string)
         |) t1 GROUP BY t1.dt
         |ORDER BY cast(t1.dt AS timestamp) DESC""".stripMargin)
    // canonical intent-form over the same data (PRC wall-clock hour)
    val canonical = OrderGen.orders(spark, 50000)
      .withColumn("ts", timestamp_seconds(col("order_time")))
      .withColumn("dt", date_format(from_utc_timestamp(col("ts"), "PRC"), "yyyy-MM-dd HH"))
      .groupBy(col("dt"), col("user_id"))
      .agg(count(lit(1)).as("cnt"), sum(col("amount")).as("amt"))
      .groupBy(col("dt"))
      .agg(count(col("user_id")).as("uv"), sum(col("cnt")).as("buy_cnt"),
        sum(col("amt")).as("amount"))
      .orderBy(col("dt").desc)
    val refRows = ref.collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val canRows = canonical.collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(refRows.toSeq === canRows.toSeq,
      "byte-faithful Q6 must agree with the canonical form on modern Spark")
  }

  test("Q5 byte-faithful: the order_time*1000 quirk is REJECTED by modern Spark") {
    registerOrders(10000)
    // doc/temp.md:463-474 passes `order_time*1000` (BIGINT) straight to
    // from_utc_timestamp. On the reference's Spark 3.0 the implicit
    // numeric→timestamp cast silently treated the value as SECONDS
    // (far-future wall times → the filter matched nothing). Spark 4's
    // ANSI analyzer refuses the implicit cast entirely — the quirk is
    // now an analysis-time error, which we pin as documented behavior.
    val lastHour = "2024-01-01 08"
    val ex = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql(
        s"""SELECT substr(from_utc_timestamp(order_time*1000, 'PRC'), 1, 13) AS dt
           |FROM user_behavior
           |WHERE substr(from_utc_timestamp(order_time*1000, 'PRC'), 1, 13) = '$lastHour'
           |""".stripMargin).collect()
    }
    assert(ex.getMessage.contains("DATATYPE_MISMATCH"))
    // the corrected form (explicit seconds cast) analyzes AND matches
    val fixed = spark.sql(
      s"""SELECT count(1) FROM user_behavior
         |WHERE substr(from_utc_timestamp(cast(order_time as timestamp), 'PRC'), 1, 13)
         |      = '$lastHour'""".stripMargin)
    assert(fixed.collect()(0).getLong(0) > 0)
  }

  test("approx_count_distinct daily UV is within 5% of exact") {
    val approx = graft.queries.WindowQueries
      .approxDailyUv(spark, "/root/testdata/sf0.001")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = graft.sources.Tables.events(spark, "/root/testdata/sf0.001")
      .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("d"))
      .agg(countDistinct(col("user_id")).as("uv"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (d, uv) =>
      val a = approx(d)
      assert(math.abs(a - uv).toDouble / uv <= 0.05, s"day $d: approx=$a exact=$uv")
    }
  }
}
