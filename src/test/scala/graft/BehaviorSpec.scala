package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.BehaviorQueries
import graft.sources.Tables

/** Funnel / retention / ntile semantics that need no external oracle. */
class BehaviorSpec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession.local("graft-behavior-test")
  val dir = "/root/testdata/sf0.001"

  test("funnel stages are monotone non-increasing") {
    val r = BehaviorQueries.funnelStages(spark, dir).collect()(0)
    val (v, c, p) = (r.getAs[Long]("n_view"),
      r.getAs[Long]("n_click_after_view"),
      r.getAs[Long]("n_purchase_after_click"))
    assert(v >= c && c >= p, s"funnel not monotone: $v, $c, $p")
    assert(v > 0)
  }

  test("retention day-0 equals cohort size; later offsets never exceed it") {
    val ret = BehaviorQueries.retentionCohorts(spark, dir).collect()
    val day0 = ret.filter(_.getAs[Int]("day_offset") == 0)
      .map(r => r.getAs[String]("cohort") -> r.getAs[Long]("n_users")).toMap
    // day 0: every user is active on their first-seen day, so day-0
    // retention IS the cohort size
    val cohortSizes = Tables.events(spark, dir)
      .groupBy(col("user_id")).agg(min(to_date(col("ts"))).as("cd"))
      .groupBy(date_format(col("cd"), "yyyy-MM-dd").as("cohort"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => r.getAs[String]("cohort") -> r.getAs[Long]("n")).toMap
    assert(day0 === cohortSizes)
    ret.foreach { r =>
      assert(r.getAs[Long]("n_users") <= day0(r.getAs[String]("cohort")))
    }
  }

  test("ntile buckets are balanced, exhaustive, and range-ordered per type") {
    val rows = BehaviorQueries.ntileValueBuckets(spark, dir).collect()
    val ev = Tables.events(spark, dir)
    val typeCounts = ev.groupBy(col("event_type")).count()
      .collect().map(r => r.getAs[String]("event_type") -> r.getAs[Long]("count")).toMap
    rows.groupBy(_.getAs[String]("event_type")).foreach { case (t, rs) =>
      val sorted = rs.sortBy(_.getAs[Int]("decile"))
      assert(sorted.map(_.getAs[Int]("decile")).toSeq === (1 to 10))
      val ns = sorted.map(_.getAs[Long]("n"))
      assert(ns.sum === typeCounts(t))
      assert(ns.max - ns.min <= 1, s"unbalanced ntile for $t: ${ns.toSeq}")
      // ranges ordered: bucket k's hi <= bucket k+1's hi (value ties
      // may straddle a boundary, so compare hi-to-hi, lo-to-lo)
      val los = sorted.map(_.getAs[Double]("lo"))
      val his = sorted.map(_.getAs[Double]("hi"))
      assert(los.zip(los.tail).forall { case (a, b) => a <= b })
      assert(his.zip(his.tail).forall { case (a, b) => a <= b })
    }
  }
}
