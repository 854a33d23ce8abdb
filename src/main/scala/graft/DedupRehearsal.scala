package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** State rehearsal for the COMPOSED streaming incremental-dedup
  * pipeline (builder-side measurement main — the [[StateRehearsal]]
  * protocol applied to the one streaming gate whose state is NOT a
  * state store: `stream_dedup_incremental`'s state is the append-only
  * parquet fingerprint index each batch anti-joins against through
  * the bloom path). The gate replays 500 docs over 3 batches; this
  * main replays 10×-and-beyond volume (default 10 batches × 200k
  * docs, ~10% cross-batch duplicates) through the EXACT gated
  * dataflow ([[graft.streaming.StreamingQueries.runDedupStream]] —
  * same foreachBatch, same bloom anti-join, same idempotent
  * landings) and measures what the gate cannot: per-batch wall time
  * as the fingerprint index ramps 0 → 2M rows.
  *
  * The claim under test: per-batch cost = (fixed micro-batch
  * machinery) + (batch-proportional fingerprint+anti-join work) +
  * (history-proportional BLOOM BUILD over a single narrow fp
  * column). The third term is the one that grows — the rehearsal
  * records its slope so the 100 TB story ("state is an append-only
  * fp index, read as the anti-join build, never rewritten") carries
  * a measured number, not a shape argument.
  *
  * One JSON line per batch: batch wall ms + cumulative history rows.
  * Knobs: SPARK_GRAFT_DEDUP_ROWS_PER_BATCH (default 200000),
  * SPARK_GRAFT_DEDUP_BATCHES (default 10),
  * SPARK_GRAFT_DEDUP_MODE=exact|neardup (default exact — neardup
  * replays the SAME synthetic corpus through
  * [[graft.streaming.StreamingQueries.runNearDupStream]], whose
  * state is TWO indexes: band keys (16 rows/doc) and shingle arrays;
  * per-batch cost carries the history band join + Jaccard verify, so
  * the slope being measured is the banded path's, not a bloom
  * build's).
  */
object DedupRehearsal {

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.configure(
      SparkSession.builder().master(s"local[$cpus]"), cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val n = sys.env.getOrElse("SPARK_GRAFT_DEDUP_ROWS_PER_BATCH", "200000").toLong
    val nBatches = sys.env.getOrElse("SPARK_GRAFT_DEDUP_BATCHES", "10").toInt
    val mode = sys.env.getOrElse("SPARK_GRAFT_DEDUP_MODE", "exact")
    // round-11 probe arm: after the ramp, small batches (one per
    // comma-separated size in PROBE_ROWS, e.g. "500,500,50,50") hit
    // the fully-ramped index — the production point-lookup regime the
    // bucket-pruned reads exist for; each probe's per-root
    // (opened, total) leaf-path counts are reported so the prune is a
    // measured fraction, not a shape claim
    val probeSizes = sys.env.getOrElse("SPARK_GRAFT_DEDUP_PROBE_ROWS", "")
      .split(",").toSeq.map(_.trim).filter(_.nonEmpty).map(_.toLong)
      .filter(_ > 0)
    // PROBE_ROWS changed meaning in round 11 (single size × PROBE_
    // BATCHES → a comma-separated size LIST); a caller still setting
    // the retired knob would silently get one probe per listed size —
    // fail loudly instead (ADVICE round 11)
    require(!sys.env.contains("SPARK_GRAFT_DEDUP_PROBE_BATCHES"),
      "SPARK_GRAFT_DEDUP_PROBE_BATCHES is retired: list every probe " +
        "batch's size in SPARK_GRAFT_DEDUP_PROBE_ROWS instead " +
        "(comma-separated, e.g. \"500,500,50,50\")")
    // the +1 verbatim-slot dup rule below guarantees the copied slot
    // holds verbatim text only when n ≡ 0 (mod 10) — any other value
    // can land dups on overridden slots and silently re-open the
    // zero-candidate regime the +1 fix closed (ADVICE round 11)
    require(n % 10 == 0,
      s"SPARK_GRAFT_DEDUP_ROWS_PER_BATCH must be a multiple of 10 " +
        s"(got $n): the cross-batch dup rule derives verbatim slots " +
        "mod 10")
    // state-compaction cadence (round 9): 0 = the pre-compaction
    // flat-delta layout (control arm for the listing-cost claim)
    val cadence = sys.env.getOrElse("SPARK_GRAFT_DEDUP_CADENCE", "2").toInt
    // minor runs per async major fold (round 10 tiered compaction);
    // the per-batch sync cost is the MINOR fold only — this knob sets
    // how often the state-proportional work happens off-thread
    val majorRuns = sys.env.getOrElse("SPARK_GRAFT_DEDUP_MAJOR",
      graft.streaming.StreamingQueries.CompactedState.DefaultMajorRuns
        .toString).toInt
    // neardup-only knobs: fold-bucket count (the read-prune fan-out;
    // a LINEAGE constant — each run starts a fresh root) and the
    // bucket-engagement byte floor (set huge for the unbucketed
    // full-scan CONTROL arm)
    val nBuckets = sys.env.getOrElse("SPARK_GRAFT_DEDUP_BUCKETS",
      graft.streaming.StreamingQueries.CompactedState.DefaultStateBuckets
        .toString).toInt
    val bucketMin = sys.env.getOrElse("SPARK_GRAFT_DEDUP_BUCKET_MIN",
      graft.streaming.StreamingQueries.CompactedState
        .DefaultBucketMinFoldBytes.toString).toLong
    // schema dir only (doc_id/source/text) — data is synthetic
    val schemaDir = "/root/testdata/sf0.01"

    val base = RunScratch.dir("dedup_rehearsal", s"$n-$nBatches-$mode-c$cadence")
    val hPath = new org.apache.hadoop.fs.Path(base)
    hPath.getFileSystem(spark.sessionState.newHadoopConf()).delete(hPath, true)

    // ~20-word docs; in batch b > 0, every 10th doc verbatim-repeats
    // the PRECEDING-position doc of batch b−1 (a true cross-batch dup
    // the anti join must drop); everything else is unique. The +1
    // offset matters (fixed round 11): copying the SAME position
    // (id − n) referenced a slot whose own text was overridden by the
    // previous batch's dup rule for every b ≥ 2, so those "dups"
    // matched nothing in history and ramp batches past 1 silently
    // measured the zero-candidate regime.
    def textOf(id: org.apache.spark.sql.Column) =
      concat_ws(" ", transform(sequence(lit(1), lit(20)),
        i => concat(lit("w"), pmod(xxhash64(id, i), lit(5000L)))))
    (0 until nBatches).foreach { b =>
      val src = spark.range(b * n, (b + 1) * n)
        .select(col("id").as("doc_id"), lit(s"src$b").as("source"),
          when(lit(b) > 0 && pmod(col("id"), lit(10L)) === 0L,
            textOf(col("id") - n + 1)).otherwise(textOf(col("id"))).as("text"))
      val p = s"$base/src/batch_$b"
      src.coalesce(1).write.mode("overwrite").parquet(p)
      new java.io.File(p).listFiles().filter(_.getName.endsWith(".parquet"))
        .foreach(f => require(f.setLastModified(1000000000000L + b * 60000L)))
    }
    // probe tail: tiny batches, every 10th doc a verbatim dup of a
    // ramp-corpus doc (so candidates exist), the rest unique
    val probeLos = probeSizes.scanLeft(nBatches * n)(_ + _)
    probeSizes.zipWithIndex.foreach { case (probeRows, q) =>
      val b = nBatches + q
      val lo = probeLos(q)
      val src = spark.range(lo, lo + probeRows)
        .select(col("id").as("doc_id"), lit(s"probe$q").as("source"),
          // +1 lands the copied slot on a %10 == 1 position — a ramp
          // doc whose text was stored verbatim (see the ramp comment)
          when(pmod(col("id"), lit(10L)) === 0L,
            textOf(pmod(col("id"), lit(nBatches * n)) + 1))
            .otherwise(textOf(col("id"))).as("text"))
      val p = s"$base/src/batch_$b"
      src.coalesce(1).write.mode("overwrite").parquet(p)
      new java.io.File(p).listFiles().filter(_.getName.endsWith(".parquet"))
        .foreach(f => require(f.setLastModified(1000000000000L + b * 60000L)))
    }

    // per-batch wall time from the afterWrites hook (fires after both
    // idempotent landings — the full batch cost, machinery included)
    val t0 = System.nanoTime()
    var last = t0
    val marks =
      scala.collection.mutable.ArrayBuffer.empty[(Long, Long, String)]
    val roots = if (mode == "neardup")
      Seq("bands" -> s"$base/bands", "shingles" -> s"$base/shingles")
    else Seq("fp" -> s"$base/state")
    val hook: Long => Unit = { id =>
      val now = System.nanoTime()
      val stats = roots.map { case (name, root) =>
        val (o, t) = Option(graft.streaming.StreamingQueries
          .CompactedState.readStats.get(root)).getOrElse((0, 0))
        s""""${name}_opened":$o,"${name}_total":$t"""
      }.mkString(",")
      marks += ((id, (now - last) / 1000000L, stats))
      last = now
    }
    val arm =
      if (mode == "neardup") {
        graft.streaming.StreamingQueries.runNearDupStream(
          spark, schemaDir, base, afterWrites = hook,
          compactCadence = cadence, majorRuns = majorRuns,
          nBuckets = nBuckets, bucketMinBytes = bucketMin)
        "bandindex_neardup"
      } else {
        graft.streaming.StreamingQueries.runDedupStream(
          spark, schemaDir, base, afterWrites = hook,
          compactCadence = cadence, majorRuns = majorRuns)
        "fpindex_dedup"
      }
    marks.foreach { case (id, ms, stats) =>
      val q = (id - nBatches).toInt
      val rows = if (id < nBatches) n else probeSizes(q)
      val hist = if (id <= nBatches) id * n else probeLos(q)
      println(s"""{"arm":"$arm","cadence":$cadence,"major":$majorRuns,"batch":$id,"rows":$rows,"batch_ms":$ms,"hist_doc_rows":$hist,$stats}""")
    }
    spark.stop()
  }
}
