package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming STATE-at-scale rehearsal (builder-side measurement main,
  * like [[StreamBench]] / [[ScaleRehearsal]]): the reference's
  * Q1/Q3-shape unbounded aggregations keep state that grows with the
  * distinct-key count (`doc/temp.md:377-410` — per-day distinct users,
  * per-user running GMV). At sf0.1 that state is trivially small; at
  * 100× the state store is the first thing to fall over — so this main
  * MEASURES it instead of asserting it: a `rate-micro-batch` stream of
  * ALL-NEW keys every batch (the worst case: state grows by the full
  * batch size, forever) through the same dataflow shapes
  * [[graft.streaming.StreamingQueries]] gates, under BOTH state store
  * providers:
  *
  *  - `RocksDBStateStoreProvider` (the production choice at scale:
  *    state lives off-heap/on-disk per partition, memory bounded by
  *    block cache + memtables regardless of key count), and
  *  - the default `HDFSBackedStateStoreProvider` (state = an in-heap
  *    map per partition; memory grows linearly with keys — fine until
  *    it isn't).
  *
  * One JSON line per observed micro-batch: state rows, addBatch /
  * state-commit wall time, state memory, and (RocksDB) SST-file bytes.
  * The claim under test — per-batch cost stays ~flat as state ramps
  * 1M→10M+ keys (batch-proportional, NOT state-proportional), and
  * RocksDB memory stays bounded where the heap provider's grows — is
  * recorded as a ladder in BASELINE.md. The sink is `noop`: the state
  * machinery IS the measurement target (StreamBench measures the
  * sink-inclusive path at fixture scale).
  *
  * Knobs: SPARK_GRAFT_STATE_ROWS_PER_BATCH (default 1M),
  * SPARK_GRAFT_STATE_BATCHES (default 10), SPARK_GRAFT_STATE_ONLY
  * (substring filter over arm names, e.g. `rocksdb_q3`).
  */
object StateRehearsal {

  val RocksDbProvider =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  /** Q3 shape: unbounded per-key running aggregate; every key new →
    * state rows == total rows seen.
    */
  def q3Shape(stream: DataFrame): DataFrame =
    stream.select(col("value").as("user_id"),
        (pmod(col("value"), lit(1000L)).cast("double") / 10.0).as("value"))
      .groupBy(col("user_id"))
      .agg(round(sum(col("value")), 2).as("amount"))

  /** Q1 shape: watermarked streaming dedup then a running count — the
    * exact-distinct dataflow of `stream_q1_daily_uv`; dedup state
    * holds one entry per distinct key ever seen.
    */
  def q1Shape(stream: DataFrame): DataFrame =
    stream
      .withWatermark("timestamp", "5 seconds")
      .select(col("timestamp").as("ts"),
        date_format(col("timestamp"), "yyyy-MM-dd").as("date_str"),
        col("value").as("user_id"))
      .dropDuplicates("date_str", "user_id")
      .groupBy(col("date_str"))
      .agg(count(lit(1)).as("uv"))

  /** Stream-stream interval-join shape (the `stream_join_attrib`
    * gate's dataflow): the rate stream split into two sides by value
    * parity, joined on `value div 2` (each odd row matches exactly
    * its even twin — the match rate is a constant, never a blow-up)
    * within a 3-second event-time interval. The claim under test is
    * the gate Scaladoc's state bound: join state holds BOTH sides'
    * rows only until the opposite watermark passes the interval —
    * O(interval × rate), NOT O(stream) — so with rate-micro-batch
    * advancing 1 s/batch, state must PLATEAU at ~interval+lateness
    * batches' worth of rows while input ramps forever. A shape whose
    * state ramped linearly here would be unusable at 100 TB.
    */
  def joinShape(stream: DataFrame): DataFrame = {
    val a = stream.filter(pmod(col("value"), lit(2L)) === 0L)
      .select(expr("value div 2").as("k"), col("timestamp").as("a_ts"))
      .withWatermark("a_ts", "1 second")
    val b = stream.filter(pmod(col("value"), lit(2L)) === 1L)
      .select(expr("value div 2").as("bk"), col("timestamp").as("b_ts"))
      .withWatermark("b_ts", "1 second")
    b.join(a, col("bk") === col("k") &&
        col("a_ts") <= col("b_ts") &&
        col("a_ts") >= col("b_ts") - expr("INTERVAL 3 seconds"))
      .select(col("k"), col("b_ts"))
  }

  /** Session-window shape (the `stream_sessions_user` dataflow): the
    * MERGING-window state family, distinct from keyed aggs (fixed key
    * → one row) and join buffers (row retention) — session state rows
    * split/merge as events arrive and EVICT once the watermark passes
    * session end + gap. Keys are `value div 50` (each "user" lives
    * inside one micro-batch; rate-micro-batch advances event time
    * 1 s/batch), gap 3 s, watermark 5 s — so open-session state must
    * PLATEAU at ~(gap + lateness) batches' worth of users (~8 × 20k
    * rows) while input ramps forever. Linear growth here would mean
    * session analytics is unusable on an unbounded stream.
    */
  def sessionShape(stream: DataFrame): DataFrame =
    stream
      .withWatermark("timestamp", "5 seconds")
      .select(expr("value div 50").as("user_id"), col("timestamp"))
      .groupBy(col("user_id"),
        session_window(col("timestamp"), "3 seconds"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("session_window.start").as("s_start"),
        col("n_events"))

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.configure(
      SparkSession.builder().master(s"local[$cpus]"), cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val rowsPerBatch =
      sys.env.getOrElse("SPARK_GRAFT_STATE_ROWS_PER_BATCH", "1000000").toLong
    val nBatches = sys.env.getOrElse("SPARK_GRAFT_STATE_BATCHES", "10").toInt
    val only = sys.env.get("SPARK_GRAFT_STATE_ONLY")

    // State partition count binds at query start from
    // spark.sql.shuffle.partitions (see StreamingQueries.replay): 8
    // state partitions keep per-batch fixed commit overhead honest
    // while still exercising parallel state commits.
    spark.conf.set("spark.sql.shuffle.partitions", "8")

    def run(arm: String, provider: String,
        shape: DataFrame => DataFrame,
        changelog: Boolean = false,
        minDeltasForSnapshot: Option[Int] = None,
        // stream-stream joins only support append
        outputMode: String = "update"): Unit = {
      if (!only.forall(arm.contains(_))) return
      spark.conf.set("spark.sql.streaming.stateStore.providerClass", provider)
      // Changelog checkpointing: per-commit the store uploads the small
      // batch changelog instead of a full SST snapshot (snapshots move
      // to a background cadence), decoupling commit latency from
      // compaction/snapshot size — the knob under test for the dedup
      // arm's 13–15 s commit spikes. Reset per arm: conf is read at
      // query start.
      spark.conf.set(
        "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled",
        changelog.toString)
      // Snapshot cadence (changelog mode): how many changelog commits
      // accumulate before a background snapshot consolidates them
      // (default 10 — exactly the batch-9 deferred landing the round-6
      // arm caught). Smaller = more frequent, smaller snapshots: the
      // amortization knob under test in the snap arms. Reset to the
      // default when unset: conf leaks across arms otherwise.
      spark.conf.set("spark.sql.streaming.stateStore.minDeltasForSnapshot",
        minDeltasForSnapshot.getOrElse(10).toString)
      val ckpt = RunScratch.dir(s"state_rehearsal_$arm", arm)
      val src = spark.readStream.format("rate-micro-batch")
        .option("rowsPerBatch", rowsPerBatch)
        .option("numPartitions", 8)
        .load()
      val q = shape(src).writeStream.outputMode(outputMode)
        .option("checkpointLocation", ckpt)
        .format("noop").start()
      // rate-micro-batch is unbounded: processAllAvailable() would
      // never return — poll until the target batch has a progress
      // entry, then stop (recentProgress keeps the observed window)
      try {
        val deadline = System.nanoTime() + 30L * 60 * 1000000000L
        while (Option(q.lastProgress).forall(_.batchId < nBatches - 1) &&
            System.nanoTime() < deadline) Thread.sleep(200)
      } finally q.stop()
      q.recentProgress.filter(_.numInputRows > 0).foreach { p =>
        val so = p.stateOperators
        val stateRows = so.map(_.numRowsTotal).sum
        val stateMem = so.map(_.memoryUsedBytes).sum
        val commitMs = so.map(_.commitTimeMs).sum
        val sst = so.map(s => Option(s.customMetrics.get("rocksdbSstFileSize"))
          .map(_.longValue).getOrElse(0L)).sum
        val add = p.durationMs.getOrDefault("addBatch", 0L)
        println(s"""{"arm":"$arm","batch":${p.batchId},"rows":${p.numInputRows},"state_rows":$stateRows,"add_batch_ms":$add,"state_commit_ms":$commitMs,"state_mem_bytes":$stateMem,"rocksdb_sst_bytes":$sst}""")
      }
    }

    run("rocksdb_q3", RocksDbProvider, q3Shape)
    run("rocksdb_q1_dedup", RocksDbProvider, q1Shape)
    // arm name deliberately NOT a superstring of rocksdb_q1_dedup:
    // SPARK_GRAFT_STATE_ONLY is a substring filter, and the plain
    // arm's documented solo invocation must not drag this one in
    run("rocksdb_changelog_q1_dedup", RocksDbProvider, q1Shape,
      changelog = true)
    run("rocksdb_changelog_snap3_q1_dedup", RocksDbProvider, q1Shape,
      changelog = true, minDeltasForSnapshot = Some(3))
    run("rocksdb_ssjoin", RocksDbProvider, joinShape, outputMode = "append")
    run("rocksdb_sessions", RocksDbProvider, sessionShape,
      outputMode = "append")
    run("hdfs_q3",
      "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider",
      q3Shape)
    spark.stop()
  }
}
