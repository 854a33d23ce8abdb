package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ext.Scd2

/** SCD Type-2 semantics on hand fixtures: close+insert on change,
  * no-op on identical snapshot, insert on new key, closed history
  * pass-through — and the load-level invariants (idempotence, one
  * open version per key).
  */
class Scd2Spec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession.local("graft-scd2-test")
  import java.sql.Date

  private def cur() = {
    import spark.implicits._
    Seq(
      // key 1: one closed + one open version
      (1L, "A", 10.0, Date.valueOf("2023-01-01"), Option(Date.valueOf("2023-06-01"))),
      (1L, "B", 11.0, Date.valueOf("2023-06-01"), None),
      // key 2: open only
      (2L, "C", 20.0, Date.valueOf("2023-01-01"), None),
      // key 3: open only, will not be in updates
      (3L, "D", 30.0, Date.valueOf("2023-01-01"), None)
    ).toDF("k", "attr", "bal", "valid_from", "valid_to")
  }

  private def upd() = {
    import spark.implicits._
    Seq(
      (1L, "B2", 11.5), // changed -> close + insert
      (2L, "C", 20.0),  // identical -> no-op
      (9L, "Z", 90.0)   // new key -> insert
    ).toDF("k", "attr", "bal")
  }

  private val eff = to_date(lit("2024-01-01"))

  test("close+insert / no-op / new-key / pass-through, exact rows") {
    val out = Scd2.apply2(cur(), upd(), "k", Seq("attr", "bal"), eff)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2),
        String.valueOf(r.getDate(3)), String.valueOf(r.getDate(4)))).toSet
    assert(out === Set(
      (1L, "A", 10.0, "2023-01-01", "2023-06-01"), // closed history untouched
      (1L, "B", 11.0, "2023-06-01", "2024-01-01"), // closed now
      (1L, "B2", 11.5, "2024-01-01", "null"),      // new open version
      (2L, "C", 20.0, "2023-01-01", "null"),       // identical snapshot: no-op
      (3L, "D", 30.0, "2023-01-01", "null"),       // absent from updates
      (9L, "Z", 90.0, "2024-01-01", "null")        // new key
    ))
  }

  test("re-applying the same snapshot is a no-op") {
    val once = Scd2.apply2(cur(), upd(), "k", Seq("attr", "bal"), eff)
    val twice = Scd2.apply2(once, upd(), "k", Seq("attr", "bal"),
      to_date(lit("2024-02-01")))
    assert(twice.except(once).count() === 0)
    assert(once.except(twice).count() === 0)
  }

  test("point-in-time lookup resolves each event to exactly one version") {
    val fixtures = "/root/testdata/sf0.001"
    val ev = graft.sources.Tables.events(spark, fixtures)
    val resolved = Scd2.pointInTimeLookup(spark, fixtures)
    // total resolved events == total events: one version per event,
    // never zero (gap) and never two (overlap)
    val totalResolved = resolved.agg(sum(col("n_events"))).collect()(0).getLong(0)
    assert(totalResolved === ev.count())
    // the X- (post-change) versions only absorb events dated >= TMid:
    // a pre-change event resolving to the new version would be the
    // silent-history-rewrite bug the operator exists to prevent
    val preChange = ev.filter(to_date(col("ts")) < to_date(lit(Scd2.TMid)))
      .filter(col("user_id") % 3 === 0).count()
    val xSegments = resolved.filter(col("segment").startsWith("X-"))
      .agg(sum(col("n_events"))).collect()(0).getLong(0)
    val postChange = ev.filter(to_date(col("ts")) >= to_date(lit(Scd2.TMid)))
      .filter(col("user_id") % 3 === 0).count()
    assert(xSegments === postChange,
      s"new-version events $xSegments must equal post-$preChange-change count $postChange")
  }

  test("exactly one open version per key; versions never overlap") {
    val out = Scd2.apply2(cur(), upd(), "k", Seq("attr", "bal"), eff)
    val opens = out.filter(col("valid_to").isNull)
      .groupBy("k").agg(count(lit(1)).as("n"))
    assert(opens.filter(col("n") =!= 1).count() === 0)
    // each key's intervals chain: every closed valid_to equals some
    // later version's valid_from (the fixture has linear histories)
    val bad = out.filter(col("valid_to").isNotNull).alias("a")
      .join(out.alias("b"),
        col("a.k") === col("b.k") &&
          col("a.valid_to") === col("b.valid_from"), "left_anti")
    assert(bad.count() === 0)
  }
}
