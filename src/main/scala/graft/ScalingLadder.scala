package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Second scale point for the nonlinear families (builder-side
  * measurement main, like [[ScaleRehearsal]]): every family whose
  * cost is NOT trivially linear — dedup pair generation, ANN, graph
  * rounds, end-to-end curation — measured at size n AND 2n on
  * corpora with sf-realistic structure, reporting the observed
  * growth ratio. The sf0.1 bench can't see super-linear growth (one
  * point defines no curve); a 2× ladder pins the exponent: ratio ≈ 2
  * is linear, ≈ 2.2 is n·log n, ≈ 4 means a quadratic term escaped
  * its blocking and the operator would NOT survive the next 10×.
  *
  * Corpus structure matters: a ladder over exact copies would be a
  * near-dup explosion (every copy pairs with every other — ~4× pair
  * output by construction, saying nothing about the operator), so
  * documents spread over `blocks` sources with triple-level
  * similarity, embeddings over hash-derived clusters, and graphs
  * keep constant degree while growing node count. Where the DESIGN
  * scales a parameter with corpus size (IVF: k ≈ √n), the ladder
  * scales it the same way.
  */
object ScalingLadder {

  /** n docs over `blocks` sources; within a source, triples share a
    * template except one word (same density at every n — pair output
    * scales linearly with n by construction). Source is assigned per
    * TRIPLE (`id div 3`), so near-dup pairs never straddle a block
    * boundary and the blocked operators can find them.
    */
  def docs(spark: SparkSession, n: Long, blocks: Int = 20,
      vocab: Int = 2000): DataFrame =
    spark.range(n).select(col("id").as("doc_id"),
      concat(lit("s"), pmod(expr("id div 3"), lit(blocks))).as("source"),
      concat_ws(" ",
        (0 until 29).map(i =>
          concat(lit("w"), pmod(xxhash64(expr("id div 3"), lit(i)), lit(vocab)))) :+
        concat(lit("v"), pmod(col("id"), lit(3))): _*).as("text"))

  /** Blocks scale WITH the corpus (constant ~1250 docs/source): a
    * growing corpus gains sources, it doesn't inflate each source —
    * the structure real provenance blocking has. A fixed block count
    * would make within-block self-joins quadratic BY CONSTRUCTION
    * and measure the fixture, not the operator. (The residual
    * hot-block hazard is what sub-blocking handles, rehearsed
    * separately in [[ScaleRehearsal]].)
    */
  def blocksFor(n: Long): Int = math.max(4, (n / 1250).toInt)

  /** Constant-degree edge set: cliques of 5 plus a long chain — node
    * and edge count scale together, per-node degree does not.
    */
  def edges(spark: SparkSession, nEdges: Long): DataFrame = {
    val chainLen = nEdges / 20
    val cliques = spark.range(nEdges - chainLen)
      .select((col("id") / 4).cast("long").as("g"), col("id"))
      .select((col("g") * 5 + lit(chainLen)).as("doc_a"),
        ((col("g") * 5) + pmod(xxhash64(col("id")), lit(4)) + 1 + lit(chainLen)).as("doc_b"))
    val chain = spark.range(chainLen - 1)
      .select(col("id").as("doc_a"), (col("id") + 1).as("doc_b"))
    chain.union(cliques)
  }

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.configure(
      SparkSession.builder().master(s"local[$cpus]"), cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(f: => Long): (Double, Long) = {
      val t0 = System.nanoTime(); val rows = f
      ((System.nanoTime() - t0) / 1e9, rows)
    }
    /** One ladder family: run at n and 2n, report both + ratio.
      * Corpus caches are released before EVERY timed run — the n1
      * warm-up would otherwise leave its plan-keyed cache warm for
      * the n1 timing while the n2 timing (different plan) runs cold,
      * biasing the ratio upward.
      */
    // Dev aid (same contract as Bench): SPARK_GRAFT_LADDER_ONLY=a,b
    // restricts to matching families for single-family iteration.
    val only = sys.env.get("SPARK_GRAFT_LADDER_ONLY").map(_.split(',').toSeq)
    def ladder(name: String, n1: Long)(run: Long => Long): Unit = {
      if (!only.forall(_.exists(name.contains))) return
      val n2 = 2 * n1
      run(n1) // warm-up at the small size: JIT + codegen cache
      graft.ext.CorpusCache.releaseAll()
      val (s1, r1) = time(run(n1))
      graft.ext.CorpusCache.releaseAll()
      val (s2, r2) = time(run(n2))
      graft.ext.CorpusCache.releaseAll()
      println(f"""{"ladder":"$name","n1":$n1,"sec1":$s1%.2f,"rows1":$r1,"n2":$n2,"sec2":$s2%.2f,"rows2":$r2,"ratio":${s2 / s1}%.2f}""")
    }

    // temp trees created by rung closures (state trees, synthetic
    // event fixtures) — reclaimed in one pass AFTER every timed run,
    // never inside one (ADVICE r13/r14)
    val ladderTmp = scala.collection.mutable.ArrayBuffer.empty[String]

    val base = sys.env.getOrElse("SPARK_GRAFT_LADDER_DOCS", "25000").toLong
    // the ann_ivf_ingest rung's one-time frozen index (train + assign),
    // shared across its warm-up and both timed runs — rebuilding it per
    // run would time the index build, not the ingest
    var ingestIndex: Option[(Array[(Int, Seq[Double])], org.apache.spark.sql.DataFrame)] = None
    ladder("dedup_minhash", base) { n =>
      graft.ext.Dedup.minhashPairs(docs(spark, n), threshold = 0.8)
        .queryExecution.toRdd.count()
    }
    ladder("dedup_minhash_incremental", base) { n =>
      // mod-3 ingest split of the same corpus: each similarity triple
      // holds one batch doc + two history docs, so cross near-dups
      // exist at every n and both sides grow with the rung — ratio ≈ 2
      // pins the asymmetric band join + cross-sliver verify as linear
      val all = docs(spark, n)
      graft.ext.Dedup.minhashPairsAgainst(
          all.filter(pmod(col("doc_id"), lit(3)) === 0),
          all.filter(pmod(col("doc_id"), lit(3)) =!= 0), threshold = 0.8)
        .queryExecution.toRdd.count()
    }
    ladder("dedup_jaccard_blocked", base) { n =>
      // blocks MUST scale with the corpus (blocksFor — constant docs
      // per source): round-13 measured the fixed-20-block form at
      // 4.49× per doubling at 125k→250k docs — the by-construction
      // within-block quadratic the class Scaladoc warns about, i.e.
      // the fixture, not the operator
      graft.ext.Dedup.jaccardPairsBySource(
          docs(spark, n, blocks = blocksFor(n)), threshold = 0.8)
        .queryExecution.toRdd.count()
    }
    ladder("dedup_ngram_jaccard", base) { n =>
      graft.ext.Dedup.ngramJaccardPairs(docs(spark, n), threshold = 0.6)
        .queryExecution.toRdd.count()
    }
    ladder("encode_pack", base) { n =>
      // train → encode → pack at ladder scale (the pack_encoded_ids
      // lineage, VERDICT r8 item 8): the trainer collects a CAPPED
      // dict (vocabulary-bounded by contract), the encode is a
      // broadcast probe above the token explode, the pack is the
      // two-level offset scan — the corpus crosses one word-count
      // shuffle and is never shuffled to encode; ratio ≈ 2 pins that
      // claim with a number
      graft.ext.Packing.packSequencesOf(
        graft.ext.CorpusPrep.bpeEncodeIds(docs(spark, n))
          .select(col("doc_id"), size(col("ids")).cast("long").as("n")))
        .queryExecution.toRdd.count()
    }
    ladder("cosine_ivf", base) { n =>
      // the design guidance the Scaladoc states: k ≈ √n keeps
      // per-cluster work flat — the ladder scales k the same way
      val k = math.max(32, math.sqrt(n.toDouble).toInt)
      graft.ext.Similarity.cosineNearDupPairs(
          ScaleRehearsal.clusteredEmbeddings(spark, n, centers = (n / 250).toInt),
          threshold = 0.9, nClusters = k, targetSubBlock = 512)
        .queryExecution.toRdd.count()
    }
    ladder("ann_ivf_ingest", 2500) { n =>
      // batch-proportional ingest claim, measured directly: a FIXED
      // 100k-vector history index is trained + assigned + materialized
      // ONCE (the precomputed bucketed state a production deployment
      // keeps); the rung doubles only the BATCH, timing probe-list
      // derivation + probe join + top-k — ratio ≈ 2 pins per-ingest
      // cost as proportional to the batch, independent of history size
      val hist = ScaleRehearsal.clusteredEmbeddings(spark, 100000L, centers = 200)
      val (centroids, histAssigned) = ingestIndex.getOrElse {
        val c = graft.ext.Similarity.ivfTrain(hist, nClusters = 128)
        val a = graft.ext.Similarity.ivfAssignCorpus(c, hist).localCheckpoint(true)
        val pair = (c, a)
        ingestIndex = Some(pair)
        pair
      }
      val batch = ScaleRehearsal.clusteredEmbeddings(spark, n, centers = 200)
        .withColumn("vec_id", col("vec_id") + lit(100000L))
      graft.ext.Similarity.ivfTopK(
          (histAssigned, graft.ext.Similarity.ivfProbes(centroids, batch)), k = 10)
        .queryExecution.toRdd.count()
    }
    ladder("curate_corpus", base / 5) { n =>
      // qualityMin = 0: the synthetic ladder texts shouldn't be
      // quality-filtered away — the ladder measures the dedup +
      // component stages, not the gate's threshold choice
      graft.ext.Curation.curate(docs(spark, n, blocks = 20), qualityMin = 0)
        .queryExecution.toRdd.count()
    }
    ladder("text_repetition_inscan", base * 20) { n =>
      // the round-4 zero-shuffle rewrite: per-doc sorted-bigram fold
      // inside the scan — the rung pins that it stays linear (the
      // only exchange is the one-narrow-row-per-doc output sort)
      graft.ext.CorpusPrep.repetitionStats(docs(spark, n))
        .queryExecution.toRdd.count()
    }
    ladder("text_span_dedup", base * 4) { n =>
      // the fixture's triples share 29/30 template words, so dup
      // 8-gram density is constant in n (hits and output both scale
      // linearly BY CONSTRUCTION) — the rung measures the gram
      // count-shuffle + merge join + per-doc island windows
      graft.ext.CorpusPrep.spanDupStats(docs(spark, n))
        .queryExecution.toRdd.count()
    }
    ladder("text_decontam_gramjoin", base * 20) { n =>
      // gram build pinned to one split per doc; eval side broadcasts
      graft.ext.CorpusPrep.decontaminate(docs(spark, n))
        .queryExecution.toRdd.count()
    }
    ladder("unigram_train_round", base * 4) { n =>
      // the full prune iteration (vocab → Viterbi usage → prune →
      // re-cost → round-2 segment) on a growing corpus whose WORD
      // DICT grows with n (fixture vocab scales as n/5, so the rung
      // measures dict-proportional DP work, not a saturated cache);
      // ratio ≈ 2 pins the trainer linear in corpus + dict
      graft.ext.CorpusPrep.unigramSegmentPruned(
          docs(spark, n, vocab = math.max(2000, (n / 5).toInt)))
        .queryExecution.toRdd.count()
    }
    ladder("text_gopher_filter", base * 20) { n =>
      // pure narrow map (pinned token array, zero shuffles): the rung
      // pins that no rule re-expansion sneaks in a super-linear term
      graft.ext.TextAnalysis.gopherFilter(docs(spark, n))
        .queryExecution.toRdd.count()
    }
    ladder("decontam_embedding", base * 4) { n =>
      // FIXED 500-vector eval set (bounded by contract — benchmarks
      // don't grow with the corpus); only the corpus doubles. The
      // per-vector cost is |eval| dots + one map-side-combined
      // max(struct) — ratio ≈ 2 pins the screen as linear in the
      // corpus with the eval side broadcast
      val evalSet = ScaleRehearsal.clusteredEmbeddings(spark, 500L, centers = 50)
      val corpus = ScaleRehearsal
        .clusteredEmbeddings(spark, n, centers = (n / 250).toInt)
        .withColumn("vec_id", col("vec_id") + lit(10000000L))
        .withColumn("label", pmod(col("vec_id"), lit(100)).cast("int"))
      graft.ext.Similarity.evalDecontam(corpus, evalSet, threshold = 0.9)
        .queryExecution.toRdd.count()
    }
    val edgeBase = sys.env.getOrElse("SPARK_GRAFT_LADDER_EDGES", "1000000").toLong
    ladder("connected_components", edgeBase) { n =>
      // localMaxEdges = 0: the ladder measures the DISTRIBUTED
      // log-round loop (the 100 TB path) — the adaptive single-task
      // escape hatch would otherwise absorb the 1M rung
      graft.ext.Dedup.connectedComponents(edges(spark, n), "doc_a", "doc_b",
          localMaxEdges = 0L)
        .queryExecution.toRdd.count()
    }
    ladder("pagerank_5rounds", edgeBase) { n =>
      // localMaxEdges = 0: measure the distributed rounds (see the
      // connected_components rung note)
      graft.ext.GraphOps.pageRankFixedPoint(
          edges(spark, n).select(col("doc_a").as("a"), col("doc_b").as("b")),
          iters = 5, localMaxEdges = 0L)
        .queryExecution.toRdd.count()
    }
    ladder("coactivity_hot_minute", 5000) { n =>
      val act = spark.range(n)
        .select(lit("2024-01-01 12:00:00").cast("timestamp").as("m"),
          col("id").as("user_id"))
      graft.ext.GraphOps.coActivityEdgesOf(act)
        .queryExecution.toRdd.count()
    }
    // ---- round-13 rungs (VERDICT r12 #5): the families added since
    // the round-4 ladder run — WordPiece deep train+encode, the BERT
    // per-doc composition, the consolidated-fold probe read, and the
    // 8-stage curation composition (incremental IVF ingest is the
    // ann_ivf_ingest rung above)
    ladder("wordpiece_deep_encode", base * 4) { n =>
      // deep-train (collected dict, driver lazy-PQ loop) + per-word
      // greedy encode on a corpus whose WORD DICT grows with n
      // (vocab = n/5): the corpus pays one word-count shuffle,
      // everything after is dict-proportional — ratio ≈ 2 pins both
      // stages linear in the dictionary
      graft.ext.CorpusPrep.wordPieceEncodeWords(
          docs(spark, n, vocab = math.max(2000, (n / 5).toInt)))
        .queryExecution.toRdd.count()
    }
    ladder("wordpiece_docs_bert", base) { n =>
      // the round-13 production-charset gate end-to-end: decorate →
      // basic-tokenize (native NFD strip + padding regexes) → train →
      // greedy encode → per-doc reassembly
      graft.ext.CorpusPrep.wordPieceEncodeDocsBert(
          docs(spark, n, vocab = math.max(2000, (n / 5).toInt)))
        .queryExecution.toRdd.count()
    }
    ladder("curate_pipeline_pack", base / 5) { n =>
      // the 8-stage composed pipeline (domain canon → quality → exact
      // → minhash near-dup → 3-arm decontam → budget → pack) in one
      // lineage; embeddings scale with the corpus like the cosine rung
      val emb = ScaleRehearsal.clusteredEmbeddings(spark, n,
          centers = math.max(4, (n / 250).toInt))
        .withColumn("label", pmod(col("vec_id"), lit(100)).cast("int"))
      graft.ext.Curation.pipelinePack(docs(spark, n), emb, qualityMin = 0)
        .queryExecution.toRdd.count()
    }
    ladder("state_fold_probe_read", base * 8) { n =>
      // consolidated-fold write + bucket-pruned read at N=2048 (the
      // round-12 __brange layout): one n-row delta folds into ≤32
      // span dirs, then a 64-key probe reads back through the span
      // prune + pushed __bucket filter — ratio ≈ 2 pins fold+read
      // linear in state rows at a fixed probe size
      import graft.streaming.StreamingQueries.CompactedState
      import org.apache.spark.sql.types.{LongType, StructField, StructType}
      val root = java.nio.file.Files
        .createTempDirectory("ladder_state").toString
      val content = StructType(Seq(StructField("k", LongType),
        StructField("v", LongType)))
      CompactedState.append(
        spark.range(n).select(col("id").as("k"), (col("id") * 7L).as("v")),
        0L, root)
      CompactedState.maybeCompact(spark, root, content, 1L, cadence = 1,
        sortCols = Seq("k"), majorRuns = 1000,
        bucketCols = Seq("k"), nBuckets = 2048, bucketMinBytes = 0L)
      val probe = spark.range(64).select((col("id") * (n / 64)).as("k"))
      val hit = CompactedState.bucketsHit(probe, Seq(col("k")), 2048)
      val rows = CompactedState.read(spark, root, content, 2L, Some(hit))
        .queryExecution.toRdd.count()
      // each ladder step writes an n-row parquet state tree under a
      // fresh temp dir — queue it for reclamation AFTER the ladder
      // call (ADVICE r14: deleting inside this closure put the
      // deletion time inside the rung's measured seconds)
      ladderTmp += root
      rows
    }

    // ---- round-14 rungs (VERDICT r13 #5): the remaining sf1.0 ≥4.5×
    // unlabeled gates. Event-time structure is provenance-honest (the
    // round-13 jaccard lesson applied to TIME): growing data means a
    // LONGER history at constant concurrency — constant user count,
    // span ∝ n, 4-event 15-minute sessions one per user-hour — not
    // more rows crammed into a fixed day (which would make overlap
    // output quadratic BY CONSTRUCTION and measure the fixture).
    // pack_encoded_ids needs no new rung: `encode_pack` above IS its
    // exact gate lineage.
    val SessionUsers = 200L
    def syntheticEvents(n: Long): DataFrame =
      spark.range(n).select(
        col("id").as("event_id"),
        timestamp_micros(lit(1704067200000000L) +
          expr(s"(id div $SessionUsers) div 4") * lit(3600L * 1000000L) +
          pmod(expr(s"id div $SessionUsers"), lit(4)) * lit(300L * 1000000L))
          .as("ts"),
        pmod(col("id"), lit(SessionUsers)).as("user_id"),
        concat(lit("t"), pmod(col("id"), lit(5))).as("event_type"),
        (pmod(xxhash64(col("id")), lit(1000)) / lit(10.0)).as("value"),
        lit("{}").as("props"))

    ladder("overlap_sessions", base * 8) { n =>
      // (user, hr) sessionize + time-bucketed range join at constant
      // concurrency (~SessionUsers concurrent sessions per bucket at
      // every n): ratio ≈ 2 pins the bucket join linear in history
      // length — the sf1.0 4.79 is bucket-occupancy amortization of
      // the fixed-span fixture, not operator growth
      graft.queries.ExtraQueries.overlapSessionsOf(syntheticEvents(n))
        .queryExecution.toRdd.count()
    }

    ladder("text_token_counts", base * 20) { n =>
      // pure in-scan counting — the sf1.0 6.9 on a 0.40 s micro-gate
      // is session fixed cost; ratio ≈ 2 pins the scan linear
      graft.ext.TextAnalysis.tokenCounts(docs(spark, n))
        .queryExecution.toRdd.count()
    }

    // the streaming session gate drives the REAL replay machinery
    // (checkpoint + sentinel flush + session_window state) over a
    // pre-written synthetic fixture; the parquet is written once per
    // size OUTSIDE the timing, and each invocation gets a fresh
    // fixture-dir symlink so its replay scratch/checkpoint is cold
    // (a reused checkpoint would replay nothing and time an empty run)
    val eventsData = scala.collection.mutable.Map.empty[Long, String]
    def eventsFixture(n: Long): String = {
      val data = eventsData.getOrElseUpdate(n, {
        val d = java.nio.file.Files
          .createTempDirectory("ladder_events_data").toString
        ladderTmp += d
        syntheticEvents(n).coalesce(8).write.mode("overwrite")
          .parquet(s"$d/events.parquet")
        d
      })
      val call = java.nio.file.Files.createTempDirectory("ladder_events_call")
      ladderTmp += call.toString
      java.nio.file.Files.createSymbolicLink(call.resolve("events.parquet"),
        java.nio.file.Paths.get(data, "events.parquet"))
      call.toString
    }
    // pre-build the synthetic events parquet for BOTH rung sizes
    // (ADVICE r14: ladder() only warms up at n1, so the n2 fixture
    // used to be generated and WRITTEN inside the timed run(n2)
    // closure — sec2 and the reported ratio carried fixture-write
    // cost n1 never paid). The timed closures below then only create
    // the cheap per-call symlink dir.
    if (only.forall(_.exists("stream_sessions_user".contains)))
      Seq(base * 8, base * 16).foreach { n => eventsFixture(n); () }
    ladder("stream_sessions_user", base * 8) { n =>
      graft.streaming.StreamingQueries.replayAppendFlush(spark,
          eventsFixture(n), graft.streaming.StreamingQueries.qSessions)
        .filter(col("user_id") =!= -1L)
        .queryExecution.toRdd.count()
    }
    // reclaim every rung temp tree (state trees + synthetic event
    // fixtures) — outside any timed closure, stream CLOSED (ADVICE
    // r14: Files.walk streams were never closed here)
    ladderTmp.foreach { d =>
      val w = java.nio.file.Files.walk(java.nio.file.Paths.get(d))
      try w.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
        .forEach(p => { java.nio.file.Files.deleteIfExists(p); () })
      finally w.close()
    }

    graft.ext.CorpusCache.releaseAll()
    spark.stop()
  }
}
