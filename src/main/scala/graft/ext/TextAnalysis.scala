package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Text analysis for a large-scale training-data pipeline, over the
  * `documents` fixture table: language-ID (stopword-lexicon heuristic),
  * quality scoring, token counting (whitespace + BPE-ish regex), and
  * exact fingerprinting.
  *
  * Everything is built from codegen'd `org.apache.spark.sql.functions`
  * (higher-order array functions, regexes) — no UDFs — so the whole
  * pipeline stays inside whole-stage codegen and scales as a pure
  * narrow map over the corpus: zero shuffles, any parallelism.
  *
  * For each operator the DuckDB oracle SQL is *generated from the same
  * lexicon/constants* (see [[oracles]]) so the two implementations
  * can't drift.
  */
object TextAnalysis {

  /** Tiny per-language stopword lexicon for the lang-ID heuristic.
    * Order matters: argmax ties resolve to the earlier entry.
    */
  val lexicon: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "it"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein", "nicht"),
    "es" -> Seq("el", "la", "de", "los", "que", "y", "en"),
    "fr" -> Seq("le", "la", "les", "des", "et", "un", "est"),
    "zh" -> Seq("的", "是", "在", "了", "和")
  )

  /** The ENGLISH stopword list, selected by key — the single copy
    * shared by [[qualityScore]]'s stopword-ratio term,
    * [[gopherFilter]]'s stop_ok floor, and their oracle generators.
    * (Selecting positionally via `lexicon.head` would silently change
    * semantics on a lexicon reorder — in engine and oracle together,
    * where the gate cannot catch it.)
    */
  val EnStop: Seq[String] = lexicon.toMap.apply("en")

  /** Whitespace tokens of `text` (lowercased). */
  def tokens(text: Column): Column =
    split(lower(trim(text)), "\\s+")

  /** Punctuation class shared with the oracle (explicit list — POSIX
    * classes differ subtly between regex engines).
    */
  val PunctClass = """[.,!?;:'"()\[\]-]"""

  /** BPE-ish token pattern: runs of alphanumerics OR single
    * non-alnum-non-space symbols — the classic pre-tokenizer shape.
    */
  val BpePattern = "[A-Za-z0-9]+|[^A-Za-z0-9 ]"

  // ---------------------------------------------------------------- ops

  /** Whitespace + BPE-ish token counts per document. */
  def tokenCounts(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      size(tokens(col("text"))).cast("long").as("ws_tokens"),
      size(regexp_extract_all(col("text"), lit(BpePattern), lit(0)))
        .cast("long").as("bpe_tokens"))

  /** Language-ID: per-language stopword hit counts over the token
    * multiset; prediction = argmax (ties → lexicon order). A real
    * deployment swaps the lexicon for n-gram tables; the dataflow — a
    * narrow projection, no shuffle — is the part that matters at scale.
    */
  def langId(docs: DataFrame): DataFrame = {
    // tokens pinned behind a Generate barrier: one regex split per
    // row, not one per language lexicon (see CorpusPrep.gramArrays
    // for the idiom and the measured cost of leaving it un-pinned)
    val toks = col("toks")
    val scored = docs
      .select(col("doc_id"), col("lang").as("labeled_lang"),
        explode(array(tokens(col("text")))).as("toks"))
      .select(
        col("doc_id") +: col("labeled_lang") +:
          lexicon.map { case (lang, words) =>
            size(filter(toks, t => t.isInCollection(words))).cast("long").as(s"hits_$lang")
          }: _*)
    // chained argmax with >= so earlier lexicon entries win ties
    val pred = lexicon.map(_._1).foldRight(lit("und")) { (lang, elseCol) =>
      val others = lexicon.map(_._1).filterNot(_ == lang)
        .map(o => col(s"hits_$lang") >= col(s"hits_$o"))
        .reduce(_ && _)
      when(col(s"hits_$lang") > 0 && others, lit(lang)).otherwise(elseCol)
    }
    scored.withColumn("pred_lang", pred)
  }

  /** Quality score in [0,1]:
    * 0.3·length-saturation + 0.3·lexical-diversity +
    * 0.2·en-stopword-ratio + 0.2·(1 − punctuation-density).
    */
  def qualityScore(docs: DataFrame): DataFrame = {
    // tokens pinned: three uses below (count, diversity, stopwords)
    // would each re-run the split under CollapseProject
    val pinned = docs.select(col("doc_id"), col("text"),
      explode(array(tokens(col("text")))).as("toks"))
    val toks = col("toks")
    val nTok = size(toks).cast("double")
    val enWords = EnStop
    val lenSat = least(lit(1.0), nTok / lit(100.0))
    val diversity = size(array_distinct(toks)).cast("double") / nTok
    val stopRatio = size(filter(toks, t => t.isInCollection(enWords))).cast("double") / nTok
    val punctDensity =
      (length(col("text")) - length(regexp_replace(col("text"), PunctClass, "")))
        .cast("double") / length(col("text")).cast("double")
    val q = lit(0.3) * lenSat + lit(0.3) * diversity +
      lit(0.2) * stopRatio + lit(0.2) * (lit(1.0) - punctDensity)
    // Integer score (×10⁴), not round(q, 4): the weighted sum of
    // decimal-weighted rationals can land *exactly* on a .00005
    // boundary (observed at sf0.001), where Spark's string-based
    // HALF_UP and an oracle's scaled-multiply round disagree.
    // floor(q·10⁴ + 0.5) is computed identically on the bit-identical
    // doubles both engines produce for this expression.
    pinned.select(col("doc_id"),
      floor(q * lit(10000.0) + lit(0.5)).as("quality_x10k"))
  }

  /** Exact content fingerprint (md5 of raw text) — the anchor for
    * exact dedup and an oracle-checkable baseline for the hash-based
    * fingerprints in [[Dedup]].
    */
  def fingerprint(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), md5(col("text")).as("fp"))

  /** Cross-modal quality profile: documents joined to their embedding
    * rows (`doc_id = vec_id`, the multimodal-lake invariant that text
    * and vector modalities share a key), quality-scored per embedding
    * cluster label. The per-label aggregates stay integer-exact (sum/
    * min/max of the integer score — no cross-engine float division).
    *
    * At 100 TB this is THE join shape of multimodal curation — both
    * sides hash-partition once on the shared id; the label rollup is
    * a second tiny shuffle.
    */
  def qualityByEmbeddingLabel(docs: DataFrame, emb: DataFrame): DataFrame =
    qualityScore(docs)
      .join(emb.select(col("vec_id"), col("label")),
        col("doc_id") === col("vec_id"))
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("quality_x10k")).as("sum_quality"),
        min(col("quality_x10k")).as("min_quality"),
        max(col("quality_x10k")).as("max_quality"))
      .orderBy(col("label"))

  /** Top-k salient terms per language — TF-IDF-style keyword
    * extraction over the corpus.
    *
    * Dataflow (the classic distributed wordcount family):
    *   1. explode tokens → (doc_id, lang, term); narrow.
    *   2. `tf(lang, term)` = occurrence count — one shuffle on
    *      (lang, term), partial aggregation map-side.
    *   3. `df(term)` = # distinct docs containing term — distinct on
    *      (doc_id, term) then count; shares the exploded frame.
    *   4. N (corpus size) joined in as a broadcast 1-row frame — no
    *      driver-side `count()` action.
    *   5. df-band filter (`2 ≤ df` and `df ≤ 80% of N`): drops
    *      hapax noise and corpus-wide stopwords — the integer-only
    *      stand-in for an idf cutoff.
    *   6. rank = row_number over (lang / tf desc, term asc): the
    *      ordering key is integers+strings only, so ranking is
    *      deterministic; the tfidf VALUE (`tf · ln(N/df)`, rounded)
    *      is carried as a reported column, never as a sort key.
    *
    * At 100 TB: steps 2–3 are the only shuffles, both combiner-style;
    * the per-lang top-k window sees only distinct (lang, term) rows
    * (≪ corpus); no driver materialization anywhere.
    */
  def topTerms(docs: DataFrame, k: Int = 5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val exploded = docs
      .select(col("doc_id"), col("lang"),
        explode(filter(tokens(col("text")), t => length(t) >= 2)).as("term"))
    val tf = exploded.groupBy(col("lang"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val df = exploded.select(col("doc_id"), col("term")).distinct()
      .groupBy(col("term")).agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("n_docs"))
    // merge hint: tf and df are both VOCABULARY-sized (web-corpus
    // vocabularies reach 10⁸+ terms) with explode-garbled estimates —
    // the unhinted planner broadcast one side (round-4 plan audit)
    val ranked = tf.join(df.hint("merge"), "term")
      .crossJoin(broadcast(n))
      .filter(col("df") >= 2 && col("df") * 5 <= col("n_docs") * 4)
      .withColumn("tfidf",
        round(col("tf") * log(col("n_docs").cast("double") / col("df")), 2))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("lang"))
          .orderBy(col("tf").desc, col("term").asc)))
    ranked.filter(col("rank") <= k)
      .select(col("lang"), col("rank"), col("term"), col("tf"), col("df"),
        col("tfidf"))
  }

  // ------------------------------------------------------------ queries

  /** Per-language corpus stats via the typed
    * [[graft.functions.TextStatsAggregator]] (custom Aggregator
    * surface, SURVEY.md §2.10), exposed untyped through `udaf`.
    */
  def statsByLang(docs: DataFrame): DataFrame = {
    import graft.functions.TextStatsAggregator
    val stats = udaf(TextStatsAggregator.TextStats,
      org.apache.spark.sql.Encoders.STRING)
    docs.groupBy(col("lang")).agg(stats(col("text")).as("st"))
      .select(col("lang"), col("st.n_docs"), col("st.total_tokens"),
        col("st.max_tokens"), round(col("st.avg_tokens"), 2).as("avg_tokens"),
        col("st.total_chars"))
  }

  /** Gopher-style quality-rule filter (the rule-set shape of Rae et
    * al. 2021's document filters, bounds scaled to the fixture's
    * 10–99-word documents — production runs the canonical 50/100k
    * bounds through the same parameters). The stopword floor
    * (`stop_ok`) is ENGLISH-only by design, mirroring Gopher's
    * English-corpus rule — non-English documents fail it and are
    * expected to be routed by `lang` upstream. Emits one row per document
    * with each rule's pass flag and the conjunction, so a curation
    * report can show WHICH rule removed a document, not just that one
    * did.
    *
    * Every rule is an INTEGER comparison (cross-multiplied
    * thresholds: `sumLen·10 ≥ nw·40` rather than `sumLen/nw ≥ 4.0`),
    * so both engines compare exact integers and no float division
    * can land a document on different sides of a boundary.
    *
    * Scale shape: a pure narrow map inside the scan's codegen stage
    * (the token array is pinned behind one unit Generate — each rule
    * reads the SAME array; un-pinned, CollapseProject would re-run
    * the split per rule). Zero shuffles at any corpus size.
    */
  def gopherFilter(docs: DataFrame): DataFrame = {
    val pinned = docs.select(col("doc_id"), col("text"),
      explode(array(tokens(col("text")))).as("toks"))
    val toks = col("toks")
    val nw = size(toks).cast("long")
    val sumLen = aggregate(toks, lit(0L), (acc, t) => acc + length(t))
    val nStop = size(filter(toks,
      t => t.isInCollection(EnStop))).cast("long")
    val nDistinct = size(array_distinct(toks)).cast("long")
    val wcOk = nw >= GopherMinWords && nw <= GopherMaxWords
    val lenOk = sumLen * 10L >= nw * GopherLenLo10 &&
      sumLen * 10L <= nw * GopherLenHi10
    val stopOk = nStop >= GopherMinStop
    val dupOk = nDistinct * 100L >= nw * (100L - GopherMaxDupPct)
    pinned.select(col("doc_id"), nw.as("n_words"),
      wcOk.cast("int").as("wc_ok"), lenOk.cast("int").as("len_ok"),
      stopOk.cast("int").as("stop_ok"), dupOk.cast("int").as("dup_ok"),
      (wcOk && lenOk && stopOk && dupOk).cast("int").as("keep"))
  }

  /** [[gopherFilter]] bounds, shared with the oracle text. Scaled to
    * the fixture (see the Scaladoc); each rule measurably bites there.
    */
  val GopherMinWords = 25L
  val GopherMaxWords = 80L
  val GopherLenLo10 = 40L // mean word length ≥ 4.0
  val GopherLenHi10 = 47L // mean word length ≤ 4.7
  val GopherMinStop = 2L
  val GopherMaxDupPct = 65L // duplicate-word fraction ≤ 0.65

  /** (doc_id, w1, w2): each document's adjacent token bigrams —
    * shared by the LM training side and the scoring side. The size
    * guard is the BPE-rounds lesson: `sequence(1, 0)` DESCENDS on a
    * 1-token doc and the element probes throw under ANSI.
    */
  def docBigrams(docs: DataFrame): DataFrame =
    // the token array is PINNED behind a unit Generate before the
    // per-position probes reference it (CorpusPrep.gramArrays'
    // round-4 discipline): a plain projection collapses and re-inlines
    // the split into every element_at — O(tokens²) splits per doc,
    // measured 9 s at sf0.1 vs ~1 s pinned
    docs
      .select(col("doc_id"), explode(array(tokens(col("text")))).as("w"))
      .select(col("doc_id"), explode(
          when(size(col("w")) >= 2,
            transform(sequence(lit(1), size(col("w")) - 1),
              i => struct(element_at(col("w"), i).as("w1"),
                element_at(col("w"), i + 1).as("w2"))))
            .otherwise(array().cast("array<struct<w1:string,w2:string>>")))
          .as("bg"))
      .select(col("doc_id"), col("bg.w1").as("w1"), col("bg.w2").as("w2"))

  /** Laplace-smoothed bigram cross-entropy table, trained on the
    * corpus itself — the CCNet-style LM-quality signal's engine half:
    * `xent(w1,w2) = −ln((c(w1,w2)+1) / (c(w1·)+V))`, snapped to
    * integer nano-units (the [[Sampling.dsirLogRatio]] discipline —
    * `ln` runs exactly once, here; every downstream comparison is
    * exact integer arithmetic; xent ≥ 0 always since
    * `c12+1 ≤ c1+V`, so integer division truncation and flooring
    * agree across engines). Context counts derive from the bigram
    * table itself (`c1 = Σ_w2 c12`), so the table is self-consistent
    * by construction.
    *
    * Scale shape: the dictionary is bigram-TYPE-sized (vocabulary
    * bound, not corpus bound) — one (w1,w2)-keyed count shuffle, one
    * w1-keyed context sum, a 1-row vocab-size broadcast.
    */
  def lmBigramXent(docs: DataFrame): DataFrame = {
    val bg = docBigrams(docs)
      .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c12"))
    val c1 = bg.groupBy(col("w1")).agg(sum(col("c12")).as("c1"))
    val v = docs.select(explode(tokens(col("text"))).as("w"))
      .agg(countDistinct(col("w")).as("v"))
    // merge hint: BOTH sides are data-derived vocabulary tables with
    // explode-garbled size estimates — at web scale the unigram
    // context frame is itself huge, and an estimate-blind broadcast
    // of it is the round-4 failure signature (PlanAudit catch, r7)
    bg.join(c1.hint("merge"), "w1").crossJoin(broadcast(v))
      .select(col("w1"), col("w2"),
        round((log(col("c1") + col("v")) - log(col("c12") + lit(1)))
          * lit(1e9), 0).cast("long").as("xent_x1e9"))
  }

  /** Per-document LM fluency score under the corpus bigram model:
    * bigram count, total and mean cross-entropy in nano-nats —
    * the quality-filtering signal a perplexity bucket sorts on
    * (high mean = improbable token transitions = boilerplate, noise,
    * or wrong-language text). Every corpus bigram exists in the
    * table by construction, so the dictionary join is inner and
    * lossless; the merge hint pins the strategy — the dictionary is
    * data-derived (vocabulary-sized, not bounded-by-contract) and
    * the explode-lineage estimates would otherwise invite a
    * corpus-sized broadcast.
    */
  def lmScore(docs: DataFrame): DataFrame =
    docBigrams(docs)
      .join(lmBigramXent(docs).hint("merge"), Seq("w1", "w2"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        sum(col("xent_x1e9")).as("xent_sum_x1e9"))
      .withColumn("xent_mean_x1e9", expr("xent_sum_x1e9 div n_bigrams"))

  /** (doc_id, b): the classifier's hashed feature stream — unigrams
    * plus adjacent bigrams, each hashed to one of 4096 md5-prefix
    * STRING buckets (the [[Sampling.dsirLogRatio]] bucket idiom: a
    * key both engines derive identically). Bigrams ride the pinned
    * [[docBigrams]] lineage; the feature space is the fastText
    * word+bigram recipe. */
  def classifierFeatures(docs: DataFrame): DataFrame = {
    val uni = docs.select(col("doc_id"),
      explode(tokens(col("text"))).as("feat"))
    val bi = docBigrams(docs).select(col("doc_id"),
      concat(col("w1"), lit(" "), col("w2")).as("feat"))
    uni.unionByName(bi)
      .select(col("doc_id"), substring(md5(col("feat")), 1, 3).as("b"))
  }

  /** Linear quality-classifier APPLICATION — the fastText-shaped
    * scoring stage a DCLM/FineWeb-style pipeline runs over every
    * document: hashed word+bigram features ([[classifierFeatures]]),
    * a ≤ 4096-row weight vector joined broadcast (bounded BY the
    * 3-hex-char bucket space — the classifier-application shape: the
    * model is tiny, the corpus is not), and an exact INTEGER logit
    * (milli-units) with a threshold verdict — no float accumulation
    * to drift across engines.
    *
    * The WEIGHTS are a deterministic STUB (a bijective scramble of
    * the bucket index into [−1000, 1000] milli-units) standing in for
    * a trained table — swapping in real trained weights changes one
    * frame, exactly like [[Multimodal.FakeCodec]]'s decode seam. The
    * plumbing — feature hashing, broadcast model join, integer
    * accumulation, verdict — is the production dataflow. Scale: token
    * explode → broadcast join → doc-keyed sum; the token-counting
    * class, no corpus shuffle.
    */
  def classifierScore(docs: DataFrame, thresholdMilli: Long = 0L): DataFrame = {
    val feats = classifierFeatures(docs)
    val weights = feats.select(col("b")).distinct()
      .withColumn("v",
        (expr("instr('0123456789abcdef', substring(b, 1, 1))") - 1) * 256 +
          (expr("instr('0123456789abcdef', substring(b, 2, 1))") - 1) * 16 +
          (expr("instr('0123456789abcdef', substring(b, 3, 1))") - 1))
      .withColumn("w_milli",
        pmod(col("v").cast("long") * lit(2654435761L), lit(2001L)) - 1000L)
      .select(col("b"), col("w_milli"))
    val scored = feats.join(broadcast(weights), "b")
      .groupBy(col("doc_id"))
      .agg(sum(col("w_milli")).as("logit_milli"),
        count(lit(1)).as("n_feats"))
    docs.select(col("doc_id")).join(scored, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("logit_milli"), lit(0L)).as("logit_milli"),
        coalesce(col("n_feats"), lit(0L)).as("n_feats"))
      .withColumn("quality_pass",
        (col("logit_milli") >= thresholdMilli).cast("int"))
      .orderBy(col("doc_id"))
  }

  /** Classifier TRAINING — the Naive-Bayes log-odds table over the
    * same hashed feature space [[classifierScore]] applies: per
    * bucket, Laplace-smoothed `ln P(b|target) − ln P(b|rest)`,
    * snapped to integer nano-units (the [[Sampling.dsirLogRatio]]
    * discipline: `ln` — the one non-correctly-rounded op — runs
    * exactly ONCE, Spark-side; every downstream comparison is exact
    * integer arithmetic, and the oracle consumes this table as aux
    * state rather than re-deriving `ln` cross-engine). The fastText
    * supervised recipe's counts-based sibling: same features, same
    * tiny-model-broadcast application, trainable in one aggregation
    * pass over the corpus — no gradient loop, no float accumulation.
    */
  def classifierTrain(docs: DataFrame, isTarget: Column): DataFrame = {
    val nBuckets = 4096
    val feats = classifierFeatures(docs)
      .join(docs.select(col("doc_id"), isTarget.as("is_t")), "doc_id")
    val counts = feats.groupBy(col("b")).agg(
      count(lit(1)).as("c_all"),
      sum(when(col("is_t"), 1L).otherwise(0L)).as("c_t"))
    val totals = feats.agg(count(lit(1)).as("n_all"),
      sum(when(col("is_t"), 1L).otherwise(0L)).as("n_t"))
    counts.crossJoin(broadcast(totals))
      .select(col("b"), round(
        (log(col("c_t") + lit(1)) - log(col("n_t") + lit(nBuckets)) -
          log(col("c_all") - col("c_t") + lit(1)) +
          log(col("n_all") - col("n_t") + lit(nBuckets)))
          * lit(1e9), 0).cast("long").as("w_nano"))
  }

  /** [[classifierScore]] with a TRAINED weight table instead of the
    * stub scramble — the composed train → apply path. Buckets absent
    * from the table score 0 (left join), so a model trained on one
    * corpus applies cleanly to another.
    */
  def classifierScoreWith(docs: DataFrame, weights: DataFrame,
      thresholdNano: Long = 0L): DataFrame = {
    val scored = classifierFeatures(docs)
      .join(broadcast(weights), Seq("b"), "left")
      .groupBy(col("doc_id"))
      .agg(sum(coalesce(col("w_nano"), lit(0L))).as("logit_nano"),
        count(lit(1)).as("n_feats"))
    docs.select(col("doc_id")).join(scored, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("logit_nano"), lit(0L)).as("logit_nano"),
        coalesce(col("n_feats"), lit(0L)).as("n_feats"))
      .withColumn("quality_pass",
        (col("logit_nano") >= thresholdNano).cast("int"))
      .orderBy(col("doc_id"))
  }

  /** Unicode NFC normalization stats per document — the curation
    * stage that must run BEFORE any hash-based dedup: the same
    * rendered string arrives precomposed and decomposed from real
    * crawls, and exact/line/span dedup treats them as different
    * documents otherwise. Runs through the native codegen
    * [[graft.functions.NfcNormalize]] expression (no UDF; fast path
    * returns the untouched UTF8String when already NFC). The md5
    * digest crosses the gate so DuckDB's ICU `nfc_normalize`
    * re-derives byte equality independently.
    */
  def nfcNormalizeStats(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("text"),
        graft.functions.NfcNormalize.nfc_normalize(col("text")).as("norm"))
      .select(col("doc_id"), md5(col("norm")).as("norm_md5"),
        length(col("norm")).cast("long").as("n_chars"),
        (col("norm") =!= col("text")).cast("int").as("changed"))
      .orderBy(col("doc_id"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_nfc_normalize" -> ((s, d) =>
      nfcNormalizeStats(Tables.documents(s, d))),
    "text_classifier_score" -> ((s, d) =>
      classifierScore(Tables.documents(s, d))),
    // train -> apply composed: NB weights trained on the en cohort,
    // applied to the whole corpus ("does this look like the target
    // distribution" — the DCLM/FineWeb quality-model loop end-to-end)
    "text_classifier_trained" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      classifierScoreWith(docs, classifierTrain(docs, col("lang") === "en"))
    }),
    "text_lm_score" -> ((s, d) =>
      lmScore(Tables.documents(s, d)).orderBy(col("doc_id"))),
    "text_stats_by_lang" -> ((s, d) =>
      statsByLang(Tables.documents(s, d)).orderBy(col("lang"))),
    "text_token_counts" -> ((s, d) =>
      tokenCounts(Tables.documents(s, d)).orderBy(col("doc_id"))),
    "text_lang_id" -> ((s, d) =>
      langId(Tables.documents(s, d))
        .select(col("doc_id"), col("pred_lang")).orderBy(col("doc_id"))),
    "text_quality" -> ((s, d) =>
      qualityScore(Tables.documents(s, d)).orderBy(col("doc_id"))),
    "text_gopher_filter" -> ((s, d) =>
      gopherFilter(Tables.documents(s, d)).orderBy(col("doc_id"))),
    "text_fingerprint" -> ((s, d) =>
      fingerprint(Tables.documents(s, d)).orderBy(col("doc_id"))),
    "text_top_terms" -> ((s, d) =>
      topTerms(Tables.documents(s, d)).orderBy(col("lang"), col("rank"))),
    "xmodal_label_quality" -> ((s, d) =>
      qualityByEmbeddingLabel(Tables.documents(s, d), Tables.embeddings(s, d)))
  )

  // ------------------------------------------------------- oracle twins

  private def sqlList(words: Seq[String]) =
    words.map(w => s"'$w'").mkString("(", ", ", ")")

  /** [[PunctClass]] as a DuckDB string literal (''-escaped quote). */
  private val punctSql = PunctClass.replace("'", "''")

  private val sqlToks = "string_split_regex(lower(trim(text)), '\\s+')"

  private def sqlHits(words: Seq[String]) =
    s"CAST(len(list_filter($sqlToks, t -> t IN ${sqlList(words)})) AS BIGINT)"

  /** The integer quality score as one SQL expression — the single
    * copy shared by the `text_quality` and `xmodal_label_quality`
    * oracles (generated from the same lexicon/constants as the Spark
    * form, so the engines cannot drift).
    */
  private[ext] lazy val qualitySqlExpr: String = {
    val enList = sqlList(EnStop)
    s"""CAST(floor((
       |  0.3 * least(1.0, len($sqlToks) / 100.0) +
       |  0.3 * (len(list_distinct($sqlToks)) * 1.0 / len($sqlToks)) +
       |  0.2 * (len(list_filter($sqlToks, t -> t IN $enList)) * 1.0 / len($sqlToks)) +
       |  0.2 * (1.0 - (length(text) - length(regexp_replace(text, '$punctSql', '', 'g'))) * 1.0 / length(text))
       |) * 10000.0 + 0.5) AS BIGINT)""".stripMargin
  }

  val oracles: Map[String, String] = Map(
    // the ICU twin of the JDK Normalizer — NFC is UAX#15, both
    // engines must produce byte-identical output or the digest splits
    "text_nfc_normalize" ->
      """SELECT doc_id, md5(nfc_normalize(text)) AS norm_md5,
        |       CAST(len(nfc_normalize(text)) AS BIGINT) AS n_chars,
        |       CAST(CASE WHEN nfc_normalize(text) != text THEN 1 ELSE 0 END
        |            AS INTEGER) AS changed
        |FROM documents ORDER BY doc_id""".stripMargin,
    // same feature hashing (md5-prefix buckets), same positional
    // hex→index weight scramble (strpos ≡ Spark's instr, 1-based),
    // exact integer logits end-to-end
    "text_classifier_score" ->
      """WITH tk AS (
        |  SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS w
        |  FROM documents),
        |uni AS (SELECT doc_id, unnest(w) AS feat FROM tk),
        |bi AS (SELECT doc_id,
        |         w[CAST(t.i AS INTEGER)] || ' ' ||
        |         w[CAST(t.i AS INTEGER) + 1] AS feat
        |       FROM tk, unnest(range(1, len(w))) t(i)),
        |f AS (SELECT doc_id, substr(md5(feat), 1, 3) AS b
        |      FROM (SELECT * FROM uni UNION ALL SELECT * FROM bi)),
        |wt AS (SELECT b,
        |         ((strpos('0123456789abcdef', substr(b, 1, 1)) - 1) * 256 +
        |          (strpos('0123456789abcdef', substr(b, 2, 1)) - 1) * 16 +
        |          (strpos('0123456789abcdef', substr(b, 3, 1)) - 1))
        |         * 2654435761 % 2001 - 1000 AS w_milli
        |       FROM (SELECT DISTINCT b FROM f)),
        |sc AS (SELECT f.doc_id,
        |         CAST(sum(w_milli) AS BIGINT) AS logit_milli,
        |         count(*) AS n_feats
        |       FROM f JOIN wt USING (b) GROUP BY 1)
        |SELECT d.doc_id,
        |       CAST(coalesce(sc.logit_milli, 0) AS BIGINT) AS logit_milli,
        |       CAST(coalesce(sc.n_feats, 0) AS BIGINT) AS n_feats,
        |       CAST(CASE WHEN coalesce(sc.logit_milli, 0) >= 0
        |            THEN 1 ELSE 0 END AS INT) AS quality_pass
        |FROM documents d LEFT JOIN sc USING (doc_id)
        |ORDER BY d.doc_id""".stripMargin,
    // the trained twin consumes the Verify-materialized NB weight
    // table (ln snapped once, Spark-side — the dsir_logratio aux
    // discipline) and re-derives features + integer sums in SQL
    "text_classifier_trained" ->
      """WITH tk AS (
        |  SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS w
        |  FROM documents),
        |uni AS (SELECT doc_id, unnest(w) AS feat FROM tk),
        |bi AS (SELECT doc_id,
        |         w[CAST(t.i AS INTEGER)] || ' ' ||
        |         w[CAST(t.i AS INTEGER) + 1] AS feat
        |       FROM tk, unnest(range(1, len(w))) t(i)),
        |f AS (SELECT doc_id, substr(md5(feat), 1, 3) AS b
        |      FROM (SELECT * FROM uni UNION ALL SELECT * FROM bi)),
        |wt AS (SELECT * FROM read_parquet('__OUTDIR__/.aux/clf_weights/*.parquet')),
        |sc AS (SELECT f.doc_id,
        |         CAST(sum(coalesce(wt.w_nano, 0)) AS BIGINT) AS logit_nano,
        |         count(*) AS n_feats
        |       FROM f LEFT JOIN wt USING (b) GROUP BY 1)
        |SELECT d.doc_id,
        |       CAST(coalesce(sc.logit_nano, 0) AS BIGINT) AS logit_nano,
        |       CAST(coalesce(sc.n_feats, 0) AS BIGINT) AS n_feats,
        |       CAST(CASE WHEN coalesce(sc.logit_nano, 0) >= 0
        |            THEN 1 ELSE 0 END AS INT) AS quality_pass
        |FROM documents d LEFT JOIN sc USING (doc_id)
        |ORDER BY d.doc_id""".stripMargin,
    // the integer-snapped cross-entropy table is the aux (ln runs
    // once, engine-side); the oracle re-derives each doc's bigrams
    // and sums exact integers against it
    "text_lm_score" ->
      s"""WITH lp AS (SELECT * FROM read_parquet('__OUTDIR__/.aux/lm_bigram_xent/*.parquet')),
         |w AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS w
         |      FROM documents),
         |bg AS (SELECT doc_id, w[CAST(i AS INTEGER)] AS w1,
         |              w[CAST(i + 1 AS INTEGER)] AS w2
         |       FROM w, unnest(range(1, len(w))) t(i))
         |SELECT bg.doc_id, count(*) AS n_bigrams,
         |       CAST(sum(lp.xent_x1e9) AS BIGINT) AS xent_sum_x1e9,
         |       CAST(sum(lp.xent_x1e9) AS BIGINT) // count(*) AS xent_mean_x1e9
         |FROM bg JOIN lp ON lp.w1 = bg.w1 AND lp.w2 = bg.w2
         |GROUP BY bg.doc_id ORDER BY bg.doc_id""".stripMargin,
    "text_stats_by_lang" ->
      s"""SELECT lang, count(*) AS n_docs,
         |       CAST(sum(len(list_filter(string_split_regex(text, '\\s+'), t -> t != ''))) AS BIGINT) AS total_tokens,
         |       CAST(max(len(list_filter(string_split_regex(text, '\\s+'), t -> t != ''))) AS BIGINT) AS max_tokens,
         |       round(sum(len(list_filter(string_split_regex(text, '\\s+'), t -> t != ''))) * 1.0 / count(*), 2) AS avg_tokens,
         |       CAST(sum(length(text)) AS BIGINT) AS total_chars
         |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,
    "text_token_counts" ->
      s"""SELECT doc_id,
         |       CAST(len($sqlToks) AS BIGINT) AS ws_tokens,
         |       CAST(len(regexp_extract_all(text, '$BpePattern')) AS BIGINT) AS bpe_tokens
         |FROM documents ORDER BY doc_id""".stripMargin,
    "text_lang_id" -> {
      val hits = lexicon.map { case (l, ws) => s"${sqlHits(ws)} AS hits_$l" }.mkString(",\n         |       ")
      val pred = lexicon.map(_._1).foldRight("'und'") { (lang, els) =>
        val others = lexicon.map(_._1).filterNot(_ == lang)
          .map(o => s"hits_$lang >= hits_$o").mkString(" AND ")
        s"CASE WHEN hits_$lang > 0 AND $others THEN '$lang' ELSE $els END"
      }
      s"""SELECT doc_id, $pred AS pred_lang
         |FROM (SELECT doc_id,
         |       $hits
         |FROM documents) ORDER BY doc_id""".stripMargin
    },
    "text_quality" ->
      s"""SELECT doc_id, $qualitySqlExpr AS quality_x10k
         |FROM documents ORDER BY doc_id""".stripMargin,
    // integer cross-multiplied rules generated from the same constants
    "text_gopher_filter" -> {
      val enList = sqlList(EnStop)
      s"""WITH t AS (
         |  SELECT doc_id,
         |         CAST(len($sqlToks) AS BIGINT) AS nw,
         |         CAST(list_sum(list_transform($sqlToks, t -> length(t))) AS BIGINT) AS sum_len,
         |         CAST(len(list_filter($sqlToks, t -> t IN $enList)) AS BIGINT) AS n_stop,
         |         CAST(len(list_distinct($sqlToks)) AS BIGINT) AS n_distinct
         |  FROM documents),
         |f AS (
         |  SELECT doc_id, nw,
         |         CASE WHEN nw >= $GopherMinWords AND nw <= $GopherMaxWords THEN 1 ELSE 0 END AS wc_ok,
         |         CASE WHEN sum_len * 10 >= nw * $GopherLenLo10
         |               AND sum_len * 10 <= nw * $GopherLenHi10 THEN 1 ELSE 0 END AS len_ok,
         |         CASE WHEN n_stop >= $GopherMinStop THEN 1 ELSE 0 END AS stop_ok,
         |         CASE WHEN n_distinct * 100 >= nw * ${100L - GopherMaxDupPct} THEN 1 ELSE 0 END AS dup_ok
         |  FROM t)
         |SELECT doc_id, nw AS n_words,
         |       CAST(wc_ok AS INTEGER) AS wc_ok, CAST(len_ok AS INTEGER) AS len_ok,
         |       CAST(stop_ok AS INTEGER) AS stop_ok, CAST(dup_ok AS INTEGER) AS dup_ok,
         |       CAST(wc_ok * len_ok * stop_ok * dup_ok AS INTEGER) AS keep
         |FROM f ORDER BY doc_id""".stripMargin
    },
    "xmodal_label_quality" ->
      s"""WITH q AS (SELECT doc_id, $qualitySqlExpr AS quality_x10k
         |           FROM documents)
         |SELECT e.label, count(*) AS n_docs,
         |       CAST(sum(q.quality_x10k) AS BIGINT) AS sum_quality,
         |       min(q.quality_x10k) AS min_quality,
         |       max(q.quality_x10k) AS max_quality
         |FROM q JOIN embeddings e ON q.doc_id = e.vec_id
         |GROUP BY e.label ORDER BY e.label""".stripMargin,
    "text_fingerprint" ->
      "SELECT doc_id, md5(text) AS fp FROM documents ORDER BY doc_id",
    "text_top_terms" ->
      s"""WITH toks AS (
         |  SELECT doc_id, lang, unnest($sqlToks) AS term FROM documents),
         |t AS (SELECT * FROM toks WHERE length(term) >= 2),
         |tf AS (SELECT lang, term, count(*) AS tf FROM t GROUP BY 1, 2),
         |df AS (SELECT term, count(DISTINCT doc_id) AS df FROM t GROUP BY 1),
         |n AS (SELECT count(*) AS n_docs FROM documents),
         |ranked AS (
         |  SELECT tf.lang, tf.term, tf.tf, df.df,
         |         round(tf.tf * ln(n.n_docs * 1.0 / df.df), 2) AS tfidf,
         |         CAST(row_number() OVER (PARTITION BY tf.lang
         |              ORDER BY tf.tf DESC, tf.term ASC) AS INTEGER) AS rank
         |  FROM tf JOIN df USING (term) CROSS JOIN n
         |  WHERE df.df >= 2 AND df.df * 5 <= n.n_docs * 4)
         |SELECT lang, rank, term, tf, df, tfidf
         |FROM ranked WHERE rank <= 5 ORDER BY lang, rank""".stripMargin
  )
}
