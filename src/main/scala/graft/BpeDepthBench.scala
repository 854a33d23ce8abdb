package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Production-depth measurement for the deep BPE trainer (builder-side
  * measurement main, like [[ScalingLadder]] / [[StateRehearsal]]):
  * real vocabularies need 10⁴–10⁵ merges, but the fixture's synthetic
  * vocabulary (~60 distinct words) exhausts after a few dozen — so
  * depth is measured on a vocabulary-rich synthetic corpus instead:
  * `nWords` distinct seeded random words (length 6–14) under a
  * Zipf-ish weight, spread over `nDocs` documents. The corpus-sized
  * stage (the word-count shuffle) and the collect both run exactly as
  * in the gated path; the number reported is the driver loop's merge
  * throughput once the dictionary is memory-resident — the quantity
  * that decides whether 50k merges is minutes or hours.
  *
  * Output: one JSON line {dict_words, target_rounds, merges_done,
  * collect_sec, loop_sec, rounds_per_sec}.
  *
  * Knobs: SPARK_GRAFT_BPE_WORDS (default 50000),
  * SPARK_GRAFT_BPE_ROUNDS (default 20000).
  */
object BpeDepthBench {

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.configure(
      SparkSession.builder().master(s"local[$cpus]"), cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val nWords = sys.env.getOrElse("SPARK_GRAFT_BPE_WORDS", "50000").toInt
    val rounds = sys.env.getOrElse("SPARK_GRAFT_BPE_ROUNDS", "20000").toInt

    // nWords seeded words; word w repeats ~nWords/(w+1) times capped
    // at 64 (Zipf-ish head) — weights matter to the argmax order, not
    // to the loop's cost model
    val docs = spark.range(nWords.toLong)
      .select(col("id"),
        concat_ws("", transform(sequence(lit(0),
            (pmod(xxhash64(col("id")), lit(9L)) + lit(5L)).cast("int")),
          i => element_at(
            split(lit("abcdefghijklmnopqrstuvwxyz"), ""),
            (pmod(xxhash64(col("id"), i), lit(26L)) + lit(1L)).cast("int"))))
          .as("word"),
        expr(s"least(64L, $nWords div (id + 1) + 1L)").as("reps"))
      .select(col("id").as("doc_id"),
        concat_ws(" ", transform(sequence(lit(1L), col("reps")),
          _ => col("word"))).as("text"))

    // SPARK_GRAFT_DEPTH_MODE=unigram measures the OTHER trainer on
    // the same vocabulary-rich corpus: multi-round prune training,
    // one distributed DP job per round over the collected model —
    // reported as wall seconds per round (the quantity that decides
    // whether a 20-round production prune schedule is minutes)
    if (sys.env.get("SPARK_GRAFT_DEPTH_MODE")
        .exists(_.startsWith("unigram"))) {
      // "unigram" = usage-floor prune loop; "unigram_em" = the
      // SentencePiece loss-criterion loop (one extra distributed
      // exclusion-DP job per round — the price of the real
      // criterion); "unigram_em_soft" = loss criterion + lattice
      // forward–backward expected counts (one more fold pass per
      // round — the full SentencePiece estimator)
      val mode = sys.env("SPARK_GRAFT_DEPTH_MODE")
      val r = sys.env.getOrElse("SPARK_GRAFT_UNIGRAM_ROUNDS", "8").toInt
      val t0 = System.nanoTime()
      val n = mode match {
        case "unigram_em_soft" =>
          graft.ext.CorpusPrep.unigramTrainEmSoftRounds(docs, r).count()
        case "unigram_em" =>
          graft.ext.CorpusPrep.unigramTrainEmRounds(docs, r).count()
        case _ =>
          graft.ext.CorpusPrep.unigramTrainRounds(docs, r).count()
      }
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"""{"mode":"$mode%s","dict_words":$n,"rounds":$r,"total_sec":$sec%.2f,"sec_per_round":${sec / r}%.2f}""")
      spark.stop(); return
    }

    // stage the two costs inside ONE run: the distributed
    // word-count + capped collect, then the memory-resident driver
    // loop, each timed directly (a differenced second collect run
    // benefits from warmed caches/JIT and skews rounds_per_sec).
    // SPARK_GRAFT_DEPTH_MODE=wordpiece swaps in the WordPiece deep
    // loop (likelihood-ratio argmax + denominator re-pricing) on the
    // same corpus — its merges/s is expected BELOW the BPE loop's
    // (every merge re-prices all pairs adjacent to three symbols),
    // and this run prices that intrinsic extra.
    // SPARK_GRAFT_DEPTH_MODE=byte prices the BYTE-LEVEL loop (round
    // 14): the same lazy-PQ machinery over hex-byte-pair symbols —
    // initial sequences are ~1–2× longer than char splits (ASCII is
    // 1 byte/char, so mostly equal here) and the alphabet is denser,
    // which shifts pair-count fan-out; this run prices that.
    val mode0 = sys.env.getOrElse("SPARK_GRAFT_DEPTH_MODE", "bpe")
    val wp = mode0 == "wordpiece"
    val byte = mode0 == "byte"
    val t0 = System.nanoTime()
    val dictRows =
      if (wp) graft.ext.CorpusPrep.wordPieceDictCollect(docs)
      else if (byte) graft.ext.ByteBpe.byteDictCollect(docs)
      else graft.ext.CorpusPrep.bpeDictCollect(docs)
    val collectSec = (System.nanoTime() - t0) / 1e9
    val t1 = System.nanoTime()
    val n =
      if (wp) graft.ext.CorpusPrep.wordPieceDeepMerges(dictRows, rounds).length
      else if (byte) graft.ext.ByteBpe.trainDeepMerges(dictRows, rounds).length
      else graft.ext.CorpusPrep.bpeDeepMerges(dictRows, rounds).length
    val loopSec = math.max((System.nanoTime() - t1) / 1e9, 0.001)
    val mode = if (wp) "wordpiece" else if (byte) "byte" else "bpe"
    println(f"""{"mode":"$mode%s","dict_words":${dictRows.length},"target_rounds":$rounds,"merges_done":$n,"collect_sec":$collectSec%.2f,"loop_sec":$loopSec%.2f,"rounds_per_sec":${n / loopSec}%.0f}""")
    spark.stop()
  }
}
