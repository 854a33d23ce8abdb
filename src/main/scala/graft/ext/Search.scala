package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Retrieval surface over the document corpus: BM25 keyword ranking
  * and vocabulary dictionary encoding — the index-side operators a
  * training-data pipeline runs to select/weight documents by query
  * relevance and to fix a token→id mapping before tokenization.
  *
  * Scale notes (100 TB design):
  *  - [[bm25]] never explodes tokens: per-document term frequencies
  *    come from `size(filter(tokens, _ = term))` higher-order
  *    functions INSIDE the scan's codegen stage (narrow, zero
  *    shuffle), so the only wide operations are a 1-row corpus-stats
  *    aggregate (broadcast back) and the final top-k
  *    (`TakeOrderedAndProject` — per-partition heaps, never a global
  *    sort). A wordcount-shaped inverted index is only worth building
  *    when the query workload is large and reusable; for scoring a
  *    fixed query list, the HOF form reads the corpus exactly once.
  *  - [[vocabEncode]] is the wordcount family (map-side combined);
  *    the single-partition `row_number` window runs AFTER the
  *    dictionary is capped to `maxVocab` rows, so the total-order
  *    step touches a bounded frame no matter the corpus size.
  */
object Search {

  /** Whitespace tokens with empties dropped — the shared tokenizer
    * (regex split keeps multi-space runs from minting "" tokens).
    */
  def tokens(text: Column): Column =
    filter(split(text, "\\s+"), t => t =!= "")

  /** BM25 ranking with the RATIONAL idf variant
    * `idf = (N − df + 0.5) / (df + 0.5)` — the standard formula minus
    * the outer `ln`. Monotonicity in (tf, df, dl) is identical to
    * classic BM25 (ln is monotone), so rankings agree for
    * single-term queries and differ from the ln form only in how
    * multi-term scores mix. The payoff: every operation is IEEE
    * +,·,/ — correctly rounded and therefore bit-identical across
    * engines when evaluated in the same syntactic order, which makes
    * the top-k hash-comparable against the DuckDB oracle with no
    * transcendental-function ULP risk (`ln` carries no such
    * cross-engine guarantee).
    *
    * k1 = 1.2, b = 0.75 (the classic defaults, folded into the
    * literals: `k1+1 = 2.2`, `1−b = 0.25`).
    */
  def bm25(docs: DataFrame, idCol: String, textCol: String,
      terms: Seq[String], k: Int): DataFrame = {
    require(terms.nonEmpty && terms.distinct == terms,
      "bm25: terms must be a non-empty distinct list")
    // tokens pinned behind a Generate barrier: one split per row,
    // not one per query term (see CorpusPrep.gramArrays)
    val toks = col("toks")
    val perDoc = docs
      .select(col(idCol), explode(array(tokens(col(textCol)))).as("toks"))
      .select(
        col(idCol) +: size(toks).as("dl") +:
          terms.zipWithIndex.map { case (t, i) =>
            size(filter(toks, x => x === lit(t))).as(s"tf_$i")
          }: _*)
    val stats = perDoc.agg(
      count(lit(1)).as("n"),
      sum(col("dl")).as("sdl") +:
        terms.indices.map(i =>
          sum(when(col(s"tf_$i") > 0, 1L).otherwise(0L)).as(s"df_$i")): _*)
    val nd = col("n").cast("double")
    val avgdl = col("sdl").cast("double") / nd
    def termScore(i: Int): Column = {
      val tfd = col(s"tf_$i").cast("double")
      val dfd = col(s"df_$i").cast("double")
      val idf = (nd - dfd + lit(0.5)) / (dfd + lit(0.5))
      idf * ((tfd * lit(2.2)) / (tfd + lit(1.2) *
        (lit(0.25) + lit(0.75) * (col("dl").cast("double") / avgdl))))
    }
    perDoc.crossJoin(broadcast(stats))
      .select(col(idCol),
        round(terms.indices.map(termScore).reduceLeft(_ + _), 4).as("score"))
      .orderBy(col("score").desc, col(idCol))
      .limit(k)
  }

  /** Token→id dictionary: tokens with corpus frequency ≥ `minCount`,
    * capped to the `maxVocab` most frequent, ids dense 1..V assigned
    * by (frequency desc, token asc) — the deterministic vocabulary
    * build in front of any tokenizer/embedding stage.
    */
  def vocabEncode(docs: DataFrame, textCol: String,
      minCount: Long, maxVocab: Int): DataFrame = {
    val capped = docs
      .select(explode(tokens(col(textCol))).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= minCount)
      .orderBy(col("cnt").desc, col("token"))
      .limit(maxVocab)
    capped
      .withColumn("id",
        row_number().over(Window.orderBy(col("cnt").desc, col("token"))))
      .select(col("token"), col("id"), col("cnt"))
      .orderBy(col("id"))
  }

  /** Corpus bigram counts through the [[graft.functions.WordNgrams]]
    * GENERATOR (the UDTF surface): windows stream out of the Generate
    * node map-side with no intermediate per-row array, then one
    * wordcount shuffle and a deterministic top-40. SQL-text twin:
    * `sql_ngram_gen` (LATERAL VIEW over the injected function).
    */
  def ngramGenCounts(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(graft.functions.WordNgrams
        .wordNgrams(tokens(col("text")), 2).as("ngram"))
      .groupBy(col("ngram")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("ngram"))
      .limit(40)

  /** Per-document out-of-vocabulary rate against the capped
    * dictionary ([[vocabEncode]]) — the tokenizer-prep diagnostic:
    * how much of each document a fixed vocabulary fails to cover
    * (rising OOV on fresh ingest = vocabulary drift). The dictionary
    * is ≤ `maxVocab` tokens BY CONTRACT, so it broadcasts explicitly
    * and the per-token membership probe is a map-side hash lookup —
    * the corpus explode never shuffles. Zero-token documents report
    * NULL rate (ANSI div-by-zero guard), not a silent 0.
    */
  def vocabOovRate(docs: DataFrame, textCol: String,
      minCount: Long, maxVocab: Int): DataFrame = {
    val vocab = vocabEncode(docs, textCol, minCount, maxVocab)
      .select(col("token")).withColumn("__in", lit(1))
    val perDoc = docs
      .select(col("doc_id"), explode(tokens(col(textCol))).as("token"))
      .join(broadcast(vocab), Seq("token"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"),
        count(when(col("__in").isNull, 1)).as("n_oov"))
    // explode drops zero-token docs; re-attach them with 0/0/NULL.
    // merge hint (round-4 pair-join discipline): perDoc descends from
    // the token explode so its size estimate is explode-blind, and
    // both sides are corpus-sized — an unhinted planner may broadcast
    // one of them on a guessed-small estimate
    docs.select(col("doc_id")).join(perDoc.hint("merge"), Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("n_oov"), lit(0L)).as("n_oov"))
      .withColumn("oov_x10k", expr(
        "CASE WHEN n_tokens = 0 THEN NULL ELSE (n_oov * 10000) div n_tokens END"))
  }

  // ---- gate wiring -------------------------------------------------

  private val QueryTerms = Seq("spark", "hash", "vector")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "search_bm25" -> ((s, d) =>
      bm25(Tables.documents(s, d), "doc_id", "text", QueryTerms, k = 15)),
    "vocab_encode" -> ((s, d) =>
      vocabEncode(Tables.documents(s, d), "text", minCount = 20L,
        maxVocab = 1000)),
    "vocab_oov_rate" -> ((s, d) =>
      vocabOovRate(Tables.documents(s, d), "text", minCount = 20L,
        maxVocab = 1000).orderBy(col("doc_id"))),
    "ngram_gen_counts" -> (ngramGenCounts _)
  )

  /** The oracle mirrors the Spark arithmetic SYNTACTICALLY — same
    * operations, same order, same literals — so IEEE correct rounding
    * makes the doubles bit-identical (see [[bm25]] Scaladoc).
    */
  val oracles: Map[String, String] = Map(
    "search_bm25" -> {
      def term(i: Int): String =
        s"""((CAST(n AS DOUBLE) - CAST(df_$i AS DOUBLE) + 0.5) / (CAST(df_$i AS DOUBLE) + 0.5))
           | * ((CAST(tf_$i AS DOUBLE) * 2.2) / (CAST(tf_$i AS DOUBLE) + 1.2
           |    * (0.25 + 0.75 * (CAST(dl AS DOUBLE) / (CAST(sdl AS DOUBLE) / CAST(n AS DOUBLE))))))""".stripMargin
      val tfs = QueryTerms.zipWithIndex.map { case (t, i) =>
        s"len(list_filter(toks, x -> x = '$t')) AS tf_$i" }.mkString(",\n       ")
      val dfs = QueryTerms.indices.map(i =>
        s"sum(CASE WHEN tf_$i > 0 THEN 1 ELSE 0 END) AS df_$i").mkString(",\n       ")
      s"""WITH d AS (
         |  SELECT doc_id,
         |         list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS toks
         |  FROM documents),
         |t AS (
         |  SELECT doc_id, len(toks) AS dl,
         |       $tfs
         |  FROM d),
         |s AS (
         |  SELECT count(*) AS n, sum(dl) AS sdl,
         |       $dfs
         |  FROM t)
         |SELECT doc_id,
         |       round(${QueryTerms.indices.map(term).mkString("\n + ")}, 4) AS score
         |FROM t, s
         |ORDER BY score DESC, doc_id LIMIT 15""".stripMargin
    },
    "ngram_gen_counts" ->
      """WITH d AS (
        |  SELECT list_filter(string_split_regex(text, '\s+'),
        |                     x -> x <> '') AS toks
        |  FROM documents),
        |b AS (
        |  SELECT unnest(list_transform(generate_series(1, len(toks) - 1),
        |                               i -> toks[i] || ' ' || toks[i + 1])) AS ngram
        |  FROM d)
        |SELECT ngram, count(*) AS cnt FROM b
        |GROUP BY 1 ORDER BY cnt DESC, ngram LIMIT 40""".stripMargin,
    "vocab_encode" ->
      """WITH toks AS (
        |  SELECT unnest(list_filter(string_split_regex(text, '\s+'),
        |                            x -> x <> '')) AS token
        |  FROM documents),
        |c AS (SELECT token, count(*) AS cnt FROM toks
        |      GROUP BY 1 HAVING count(*) >= 20),
        |capped AS (SELECT token, cnt FROM c
        |           ORDER BY cnt DESC, token LIMIT 1000)
        |SELECT token,
        |       CAST(row_number() OVER (ORDER BY cnt DESC, token) AS INTEGER) AS id,
        |       cnt
        |FROM capped ORDER BY id""".stripMargin,
    // the same capped dictionary, then per-doc membership counts via
    // an explode + left join; zero-token docs re-attach with NULL rate
    "vocab_oov_rate" ->
      """WITH toks AS (
        |  SELECT unnest(list_filter(string_split_regex(text, '\s+'),
        |                            x -> x <> '')) AS token
        |  FROM documents),
        |c AS (SELECT token, count(*) AS cnt FROM toks
        |      GROUP BY 1 HAVING count(*) >= 20),
        |v AS (SELECT token FROM c ORDER BY cnt DESC, token LIMIT 1000),
        |dt AS (
        |  SELECT doc_id, unnest(list_filter(string_split_regex(text, '\s+'),
        |                                    x -> x <> '')) AS token
        |  FROM documents),
        |agg AS (
        |  SELECT dt.doc_id, count(*) AS n_tokens,
        |         CAST(sum(CASE WHEN v.token IS NULL THEN 1 ELSE 0 END)
        |              AS BIGINT) AS n_oov
        |  FROM dt LEFT JOIN v ON v.token = dt.token
        |  GROUP BY dt.doc_id)
        |SELECT d.doc_id,
        |       coalesce(a.n_tokens, 0) AS n_tokens,
        |       coalesce(a.n_oov, 0) AS n_oov,
        |       CASE WHEN coalesce(a.n_tokens, 0) = 0 THEN NULL
        |            ELSE (a.n_oov * 10000) // a.n_tokens END AS oov_x10k
        |FROM documents d LEFT JOIN agg a USING (doc_id)
        |ORDER BY d.doc_id""".stripMargin
  )
}
