package graft

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ext.{GraphOps, Sampling}
import graft.sources.Tables

/** Injects one transient task failure into partition 0's first attempt
  * of every job launched while armed. Task-level statics are visible
  * because tests run local-mode (executor == driver JVM); the armed
  * window is per-test, the fired counter proves the failure actually
  * happened (a spec that "survives" a failure that never fired tests
  * nothing).
  */
object FlakyInjector {
  @volatile var armed = false
  val fired = new java.util.concurrent.atomic.AtomicInteger(0)

  def maybeFail(): Unit = {
    val tc = org.apache.spark.TaskContext.get()
    if (armed && tc != null && tc.partitionId() == 0 &&
        tc.attemptNumber() == 0) {
      fired.incrementAndGet()
      throw new RuntimeException(
        "graft-test: injected transient task failure (retry expected)")
    }
  }
}

/** Retry-determinism: at 100 TB task retries are ROUTINE (spot-kills,
  * OOMs, fetch failures — a cluster's default is 4 attempts), and a
  * selection operator whose kept set depends on execution accidents
  * (arrival order, partition count, which attempt survived) is the
  * classic silent corruption: results differ between retried and
  * clean runs with no error anywhere. The engine's selection family
  * is pure-function-of-key BY DESIGN (seeded xxhash64 buckets, md5
  * prefix order, integer thresholds); this spec pins that the design
  * actually survives re-execution — each operator runs once clean and
  * once with an injected first-attempt task failure (the scheduler
  * retries under the session's `local[n, 2]` master, see
  * [[GraftSession.local]]), and the outputs must be bit-identical.
  *
  * The injection wraps the INPUT scan, so the retried task re-runs
  * the upstream read + every narrow stage fused onto it — the same
  * recompute shape a lost-executor retry produces. The fired counter
  * asserts the failure really happened in every armed run.
  */
class RetryDeterminismSpec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession.local("graft-retry-test")
  val dir = "/root/testdata/sf0.001"

  /** The input frame with the failure hook on every partition. */
  private def flaky(df: DataFrame): DataFrame = {
    val schema = df.schema
    val rdd = df.rdd.mapPartitions { it =>
      FlakyInjector.maybeFail()
      it
    }
    df.sparkSession.createDataFrame(rdd, schema)
  }

  private def canon(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  /** Run `op` clean, then over the flaky wrapper with the injector
    * armed; assert ≥1 injected failure fired and bit-identical output.
    */
  private def assertRetrySafe(name: String, input: DataFrame,
      op: DataFrame => DataFrame): Unit = {
    val clean = canon(op(input))
    assert(clean.nonEmpty, s"$name: test input must produce rows")
    val before = FlakyInjector.fired.get()
    FlakyInjector.armed = true
    val retried =
      try canon(op(flaky(input)))
      finally FlakyInjector.armed = false
    assert(FlakyInjector.fired.get() > before,
      s"$name: the injected failure never fired - nothing was tested")
    assert(retried === clean,
      s"$name: output changed under task retry")
  }

  private lazy val docs = Tables.documents(spark, dir)

  test("scheduler retries the injected failure (sanity)") {
    import spark.implicits._
    val base = (1 to 100).toDF("v")
    val before = FlakyInjector.fired.get()
    FlakyInjector.armed = true
    try {
      assert(flaky(base).agg(sum(col("v"))).first().getLong(0) === 5050L)
    } finally FlakyInjector.armed = false
    assert(FlakyInjector.fired.get() > before)
  }

  test("hashSample kept set is identical under task retry") {
    assertRetrySafe("hashSample", docs,
      d => Sampling.hashSample(d, "doc_id", 0.35).select(col("doc_id")))
  }

  test("capPerGroup kept set is identical under task retry") {
    assertRetrySafe("capPerGroup", docs,
      d => Sampling.capPerGroup(d, "source", "doc_id",
        md5(col("doc_id").cast("string")), 5).select(col("doc_id")))
  }

  test("tokenBudgetPerSource is identical under task retry (both paths)") {
    // plain window path
    assertRetrySafe("tokenBudget/plain", docs,
      d => Sampling.tokenBudgetPerSource(d, budget = 500L))
    // forced two-level decomposition (census probe + broadcast prefix
    // sums + in-segment window - the multi-stage path where a retried
    // upstream task feeds several consumers)
    assertRetrySafe("tokenBudget/decomposed", docs,
      d => Sampling.tokenBudgetPerSource(d, budget = 500L,
        localMaxSource = 0L))
  }

  test("shuffleOrder positions are identical under task retry (both paths)") {
    assertRetrySafe("shuffleOrder/plain", docs,
      d => Sampling.shuffleOrder(d))
    assertRetrySafe("shuffleOrder/decomposed", docs,
      d => Sampling.shuffleOrder(d, localMax = 0L))
  }

  test("capped co-activity selection is identical under task retry") {
    import spark.implicits._
    // the GraphOpsSpec hot-minute fixture: cap=3 bites on the 9-user
    // minute, so the md5-order TopK selection itself is under test
    val act = (0 until 9).map(u => ("2024-01-01 12:00:00", u.toLong))
      .++(Seq(("2024-01-01 12:05:00", 100L), ("2024-01-01 12:05:00", 101L)))
      .toDF("ms", "user_id")
      .select(col("ms").cast("timestamp").as("m"), col("user_id"))
    assertRetrySafe("coActivityCapped", act,
      a => GraphOps.coActivityEdgesCappedOf(a, maxUsersPerMinute = 3))
  }

  test("splitAssign is identical under task retry") {
    assertRetrySafe("splitAssign", docs,
      d => Sampling.splitAssign(d, "doc_id").select(col("doc_id"), col("split")))
  }

  test("qualityWeightedSample is identical under task retry") {
    assertRetrySafe("qualityWeightedSample", docs,
      d => Sampling.qualityWeightedSample(d))
  }

  test("epochOrder positions are identical under task retry") {
    assertRetrySafe("epochOrder", docs,
      d => Sampling.epochOrder(d, epochs = 2))
  }

  test("streaming q1 replay lands bit-identical output under task retry") {
    import graft.streaming.StreamingQueries
    // The streaming arm (round-7 verdict item 5): the q1 replay is the
    // production foreachBatch → JDBC-upsert landing; the injector runs
    // as a pass-through UDF at TWO points — on the scanned user_id
    // (the retried task re-runs the micro-batch scan + dedup input)
    // and on the aggregated uv feeding the sink task (the retried
    // task re-runs the Derby upsert partition). Unlike `flaky`, a UDF
    // survives streaming planning, where df.rdd is illegal.
    val flakyLong = udf { x: java.lang.Long => FlakyInjector.maybeFail(); x }
    def canon(df: DataFrame): Seq[String] =
      df.collect().map(_.toString).sorted.toSeq
    val dir = "/root/testdata/sf0.001"
    val clean = canon(
      StreamingQueries.replay(spark, dir, StreamingQueries.q1DailyUv,
        Seq("date_str")))
    assert(clean.nonEmpty)
    val before = FlakyInjector.fired.get()
    FlakyInjector.armed = true
    val retried =
      try canon(StreamingQueries.replay(spark, dir,
        src => StreamingQueries.q1DailyUv(
            src.withColumn("user_id", flakyLong(col("user_id"))))
          .withColumn("uv", flakyLong(col("uv"))),
        Seq("date_str")))
      finally FlakyInjector.armed = false
    assert(FlakyInjector.fired.get() > before,
      "streaming q1: the injected failure never fired - nothing was tested")
    assert(retried === clean,
      "streaming q1: landed output changed under task retry")
  }

  test("soft-EM expected counts are identical under task retry (the 1e-4 snap absorbs re-execution)") {
    // the lattice marginals are double-precision forward-backward
    // sums; a retried task can re-accumulate partial aggregates in a
    // different order, so the RAW doubles are not retry-stable — the
    // per-(word, piece) snap to 1e-4 integer units is what makes the
    // operator's OUTPUT a pure function of the data again (noise
    // ~1e-13 against a 1e-4 grid), and every downstream aggregate is
    // exact integer arithmetic from there
    assertRetrySafe("unigram_soft_counts", docs,
      d => graft.ext.CorpusPrep.unigramSoftCounts(d))
  }

  test("sampled subword segmentation is identical under task retry") {
    // the pick is a pure integer threshold over (xxhash64(seed, word),
    // snapped 1e-6 weights) — re-execution cannot move it
    assertRetrySafe("unigram_segment_sampled", docs,
      d => graft.ext.CorpusPrep.unigramSegmentSampled(d))
  }

  test("BPE-dropout encode is identical under task retry") {
    // the dropped-merge set is a pure function of (word, round, seed)
    assertRetrySafe("bpe_encode_dropout", docs,
      d => graft.ext.CorpusPrep.bpeEncodeIdsDropout(d)
        .select(col("doc_id"), col("n_tokens"), col("n_unk"),
          md5(array_join(transform(col("ids"), i => i.cast("string")), " "))
            .as("ids_md5")))
  }
}
