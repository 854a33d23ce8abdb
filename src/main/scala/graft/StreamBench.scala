package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.{JdbcUpsertSink, StreamingQueries}

/** Streaming throughput measurement: replays the sf events through the
  * Q1/Q3 streaming pipelines (watermarked dedup-distinct; unbounded
  * keyed agg → PK upsert sink) in micro-batches and reports events/s.
  *
  * Context for BASELINE.md: the reference's streaming leg is bounded
  * by its generator at ~0.1–0.33 events/s end-to-end
  * (`__init__.py:24-25`); this measures what the same queries sustain
  * on this engine at local[32]. The sink is the REAL executor-side
  * JDBC upsert path against embedded Derby — throughput includes the
  * per-batch upsert round-trips, not a driver-map shortcut.
  */
object StreamBench {

  final case class E(ts: java.sql.Timestamp, user_id: Long, value: Double,
      event_type: String)

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark: SparkSession = GraftSession.local("graft-stream-bench")
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rows = graft.sources.Tables.events(spark, sfDir)
      .select("ts", "user_id", "value", "event_type").collect()
      .map(r => E(r.getTimestamp(0), r.getLong(1), r.getDouble(2), r.getString(3)))
    val nBatches = sys.env.getOrElse("SPARK_GRAFT_STREAM_BATCHES", "10").toInt
    val batches = rows.grouped(math.max(1, rows.length / nBatches)).toSeq

    def run(name: String, build: org.apache.spark.sql.DataFrame =>
        org.apache.spark.sql.DataFrame, keys: Seq[String]): Unit = {
      val in = MemoryStream[E]
      val sink = new JdbcUpsertSink(
        s"jdbc:derby:memory:streambench_$name;create=true", s"sb_$name", keys)
      val q = sink.writeTo(build(in.toDF()).writeStream.outputMode("update"))
      val t0 = System.nanoTime()
      batches.foreach { b => in.addData(b); q.processAllAvailable() }
      val secs = (System.nanoTime() - t0) / 1e9
      q.stop()
      val finalKeys = sink.toDF(spark).count()
      println(f"""{"stream":"$name","events":${rows.length},"sec":$secs%.2f,"events_per_sec":${rows.length / secs}%.0f,"final_keys":$finalKeys}""")
    }

    run("q3_user_gmv", StreamingQueries.q3UserGmv, Seq("user_id"))
    run("q1_daily_uv", StreamingQueries.q1DailyUv, Seq("date_str"))
    spark.stop()
  }
}
