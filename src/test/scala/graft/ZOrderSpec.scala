package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ext.ZOrder
import graft.sources.Tables

/** Z-order clustering: interleave round-trip, per-coordinate
  * monotonicity (the property the box-query bound relies on),
  * semantic neutrality of the layout + z-range conjunct, and the
  * pushed z bounds.
  */
class ZOrderSpec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession.local("graft-zorder-test")
  val dir = "/root/testdata/sf0.001"

  /** Reference deinterleave (driver-side) for round-trip checks. */
  private def unspread(z: Long): Long = {
    var x = z & 0x55555555L
    x = (x | (x >> 1)) & 0x33333333L
    x = (x | (x >> 2)) & 0x0F0F0F0FL
    x = (x | (x >> 4)) & 0x00FF00FFL
    x = (x | (x >> 8)) & 0x0000FFFFL
    x
  }

  test("morton interleave round-trips both coordinates") {
    val rnd = new scala.util.Random(7)
    (0 until 2000).foreach { _ =>
      val x = rnd.nextInt(65536).toLong
      val y = rnd.nextInt(65536).toLong
      val z = ZOrder.morton(x, y)
      assert(unspread(z) === x)
      assert(unspread(z >> 1) === y)
    }
  }

  test("column morton equals driver-side morton") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val pts = Seq.fill(500)((rnd.nextInt(65536).toLong, rnd.nextInt(65536).toLong))
    val df = pts.toDF("x", "y")
      .select(col("x"), col("y"), ZOrder.morton(col("x"), col("y")).as("z"))
    val got = df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    got.foreach { case (x, y, z) => assert(z === ZOrder.morton(x, y)) }
  }

  test("morton is monotone per coordinate: box points stay inside corner z bounds") {
    val rnd = new scala.util.Random(13)
    (0 until 200).foreach { _ =>
      val x1 = rnd.nextInt(60000); val x2 = x1 + rnd.nextInt(65536 - x1)
      val y1 = rnd.nextInt(60000); val y2 = y1 + rnd.nextInt(65536 - y1)
      val zLo = ZOrder.morton(x1.toLong, y1.toLong)
      val zHi = ZOrder.morton(x2.toLong, y2.toLong)
      (0 until 20).foreach { _ =>
        val x = x1 + rnd.nextInt(x2 - x1 + 1)
        val y = y1 + rnd.nextInt(y2 - y1 + 1)
        val z = ZOrder.morton(x.toLong, y.toLong)
        assert(z >= zLo && z <= zHi,
          s"z($x,$y)=$z outside [z($x1,$y1)=$zLo, z($x2,$y2)=$zHi]")
      }
    }
  }

  test("z-ordered box aggregate equals the direct box aggregate") {
    val viaLayout = ZOrder.boxAggregate(spark, dir)
    val direct = Tables.events(spark, dir)
      .filter(col("user_id") >= ZOrder.XLo && col("user_id") <= ZOrder.XHi &&
        col("value") >= ZOrder.YLo && col("value") <= ZOrder.YHi)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value")), 2).as("total_value"),
        min(col("event_id")).as("first_event"))
      .orderBy(col("event_type"))
    assert(viaLayout.except(direct).count() === 0)
    assert(direct.except(viaLayout).count() === 0)
  }

  test("z-range bounds reach PushedFilters on the layout scan") {
    // formatted mode: the default plan string truncates the scan line
    // before its (long) PushedFilters list
    val plan = ZOrder.boxAggregate(spark, dir).queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    val zLo = ZOrder.morton(ZOrder.XLo, ZOrder.YLo.toLong)
    val zHi = ZOrder.morton(ZOrder.XHi, ZOrder.YHi.toLong)
    assert(plan.contains(s"GreaterThanOrEqual(z,$zLo)"), plan.linesIterator
      .filter(_.contains("PushedFilters")).mkString("\n"))
    assert(plan.contains(s"LessThanOrEqual(z,$zHi)"))
  }
}
