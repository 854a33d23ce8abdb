package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Text cleaning / PII redaction — the normalization pass a
  * training-data pipeline runs before tokenization: redact email
  * addresses, URLs, and long digit runs (phone/account numbers), then
  * collapse whitespace. The reference's author lists 清洗 (cleaning)
  * as the known gap of the pipeline (`doc/temp.md:929`); this is that
  * stage, built for the 100 TB corpus case.
  *
  * Everything is `regexp_replace` / `regexp_extract_all` on codegen'd
  * built-ins — a pure narrow map over the corpus: no shuffle, no UDF,
  * evaluated inside the scan's whole-stage-codegen pipeline. At
  * 100 TB the cost is one read pass (plus the rewrite of the cleaned
  * text), the same shape as [[TextAnalysis]].
  *
  * Patterns are written in the common subset of Java regex (Spark)
  * and RE2 (DuckDB oracle): no backreferences, no lookaround, explicit
  * character classes. Order of application matters and is fixed:
  * emails → URLs → digit runs (an email never survives into the URL
  * pass; placeholder tokens contain no digits so the digit pass
  * cannot re-match them).
  *
  * The synthetic `documents` fixture contains no organic PII, so the
  * gate annotates each row with deterministic PII built from fixture
  * columns (`source`, `doc_id`) — both engines construct the
  * identical annotated input, and the redaction is genuinely
  * exercised on every row.
  */
object Cleaning {

  /** user@host.tld — local part per RFC-ish common subset. */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** http(s) URL up to the next whitespace. */
  val UrlPattern = "https?://[^ \\t\\n]+"

  /** 7+ consecutive digits — phone/account/id numbers. */
  val LongNumPattern = "[0-9]{7,}"

  /** Redact PII in `text`: emails → `<EMAIL>`, then URLs → `<URL>`,
    * then 7+-digit runs → `<ID>`; finally collapse whitespace runs to
    * a single space and trim.
    */
  def redactPii(text: Column): Column = {
    val noEmail = regexp_replace(text, EmailPattern, "<EMAIL>")
    val noUrl = regexp_replace(noEmail, UrlPattern, "<URL>")
    val noNum = regexp_replace(noUrl, LongNumPattern, "<ID>")
    trim(regexp_replace(noNum, WsClass, " "))
  }

  /** Per-document redaction counts (on the raw text, before any
    * replacement): how much PII the cleaning pass removed — the
    * audit metric a pipeline reports per source.
    */
  def piiCounts(text: Column): Seq[Column] = Seq(
    size(regexp_extract_all(text, lit(EmailPattern), lit(0)))
      .cast("long").as("n_emails"),
    size(regexp_extract_all(text, lit(UrlPattern), lit(0)))
      .cast("long").as("n_urls"))

  /** Clean a corpus: returns (doc_id, n_emails, n_urls, clean_text). */
  def clean(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.select(
      col("doc_id") +: piiCounts(col(textCol)) :+
        redactPii(col(textCol)).as("clean_text"): _*)

  // ---------------------------------------- line-level boilerplate dedup

  /** A line is boilerplate when it appears verbatim in at least this
    * many distinct documents. */
  val BoilerMinDocs = 5L

  /** Corpus-level line deduplication — the CCNet/C4-style boilerplate
    * removal pass: a line occurring verbatim in ≥ `minDocs` distinct
    * documents (cookie banners, navigation text, license footers) is
    * dropped from EVERY document; per document the op returns line
    * counts and the md5 fingerprint of the surviving text (the
    * fingerprint rather than the text itself — at 100 TB the cleaned
    * rewrite is a separate data-scale pass and this op is its plan).
    * Every input document appears in the output, including ones
    * stripped to nothing (`clean_md5 = md5("")`).
    *
    * Scale shape: two keyed shuffles, both as narrow as the semantics
    * allow. (1) Line frequency groups by the 128-bit md5 of the line,
    * NOT the line text — the exchange carries a fixed-width key, and
    * the distinct-doc count combines map-side. (2) Document
    * reassembly is one groupBy(doc_id) whose collect_list is sorted
    * in the array domain (line_idx leads the struct), so the rebuilt
    * order is deterministic regardless of shuffle arrival. The
    * boilerplate marker set is heavy-hitter-bounded (≤ total_lines /
    * minDocs) and joins back by the same fixed-width key.
    */
  def lineDedup(docs: DataFrame, minDocs: Long = BoilerMinDocs,
      textCol: String = "text"): DataFrame = {
    val lines = docs
      .select(col("doc_id"),
        posexplode(split(col(textCol), "\n")).as(Seq("line_idx", "line")))
      .withColumn("lh", md5(col("line")))
    val boiler = lines.groupBy(col("lh"))
      .agg(countDistinct(col("doc_id")).as("nd"))
      .filter(col("nd") >= minDocs)
      .select(col("lh"), lit(true).as("is_boiler"))
    // merge hint, per the round-4 pair-join discipline: boiler is
    // CORPUS-derived (the distinct ≥minDocs line set — a template
    // farm makes it arbitrarily large) and sits on explode-blind
    // lineage, so an unhinted planner broadcasts it on a guessed-small
    // estimate. Cost: the boiler side reuses its groupBy(lh) exchange;
    // the lines side pays one new lh-keyed shuffle + sort of the
    // exploded corpus — the price of never broadcasting an unbounded
    // frame.
    lines.join(boiler.hint("merge"), Seq("lh"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_lines"),
        count(when(col("is_boiler").isNull, 1)).as("n_kept"),
        md5(array_join(transform(
          array_sort(collect_list(when(col("is_boiler").isNull,
            struct(col("line_idx"), col("line"))))),
          s => s("line")), "\n")).as("clean_md5"))
      .orderBy(col("doc_id"))
  }

  // ------------------------------------------------------------ gate

  /** The fixture text annotated with deterministic PII derived from
    * fixture columns — e.g. doc 42 of src3 becomes
    * `<text> contact src3@crawl.example.com id 000000042 see
    * https://src3.example.com/d/42`. The DuckDB oracle builds the
    * same string, so both engines clean identical input.
    */
  private def annotated: Column =
    concat(col("text"),
      lit(" contact "), col("source"), lit("@crawl.example.com id "),
      lpad(col("doc_id").cast("string"), 9, "0"),
      lit(" see https://"), col("source"), lit(".example.com/d/"),
      col("doc_id").cast("string"))

  /** The fixture text carries no newlines, so the line-dedup gate
    * synthesizes multi-line structure the same way [[annotated]]
    * synthesizes PII: a header line shared by ALL docs, the original
    * text as the (unique) body line, a footer line shared by all
    * docs, and a fourth line shared by the doc_id % 4 == 0 quarter —
    * so the op strips 3 lines from a quarter of the corpus and 2
    * from the rest, and keeps every unique body. The DuckDB oracle
    * builds the identical string.
    */
  private def lineAnnotated: Column =
    concat(lit("all rights reserved\n"), col("text"),
      lit("\ncontact support via the site footer"),
      when(col("doc_id") % 4 === 0,
        lit("\nsubscribe to the newsletter for updates"))
        .otherwise(lit("")))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_clean_pii" -> ((s, d) =>
      clean(Tables.documents(s, d).withColumn("text", annotated))
        .orderBy(col("doc_id"))),
    "text_line_dedup" -> ((s, d) =>
      lineDedup(Tables.documents(s, d).withColumn("text", lineAnnotated)))
  )

  private val annotatedSql =
    "text || ' contact ' || source || '@crawl.example.com id ' || " +
      "lpad(CAST(doc_id AS VARCHAR), 9, '0') || ' see https://' || " +
      "source || '.example.com/d/' || CAST(doc_id AS VARCHAR)"

  /** Whitespace-collapse class, shared verbatim by both engines. Its
    * runtime value holds the two-character escapes `\t`/`\n` (normal
    * Scala string), which Java regex and RE2 read identically.
    * Interpolated into the oracle SQL rather than written inline —
    * the `s"""..."""` interpolator DOES process escapes in literal
    * parts, so an inline `\t` would reach DuckDB as a raw TAB
    * character (same regex semantics inside a class, but not the
    * string one intended to write).
    */
  private val WsClass = "[ \\t\\n]+"

  /** The patterns' runtime values hold single backslashes (`\t`,
    * `\.`), which is exactly what RE2 must see inside the SQL string
    * literal (standard SQL strings process no escapes) — interpolate
    * them verbatim.
    */
  val oracles: Map[String, String] = Map(
    "text_clean_pii" ->
      s"""WITH a AS (SELECT doc_id, $annotatedSql AS text FROM documents)
         |SELECT doc_id,
         |  CAST(len(regexp_extract_all(text, '$EmailPattern')) AS BIGINT) AS n_emails,
         |  CAST(len(regexp_extract_all(text, '$UrlPattern')) AS BIGINT) AS n_urls,
         |  trim(regexp_replace(
         |    regexp_replace(
         |      regexp_replace(
         |        regexp_replace(text, '$EmailPattern', '<EMAIL>', 'g'),
         |        '$UrlPattern', '<URL>', 'g'),
         |      '$LongNumPattern', '<ID>', 'g'),
         |    '$WsClass', ' ', 'g')) AS clean_text
         |FROM a ORDER BY doc_id""".stripMargin,
    // the oracle re-runs the same line split / frequency / strip /
    // ordered-reassembly pipeline; line_idx bases differ (0- vs
    // 1-based) but only the ordering they induce is observable
    "text_line_dedup" ->
      s"""WITH a AS (SELECT doc_id,
         |             'all rights reserved' || chr(10) || text || chr(10) ||
         |             'contact support via the site footer' ||
         |             CASE WHEN doc_id % 4 = 0
         |                  THEN chr(10) || 'subscribe to the newsletter for updates'
         |                  ELSE '' END AS text
         |           FROM documents),
         |l AS (SELECT doc_id, i AS line_idx, ls[i] AS line
         |      FROM (SELECT doc_id, string_split(text, chr(10)) AS ls FROM a),
         |           unnest(range(1, len(ls) + 1)) AS t(i)),
         |f AS (SELECT md5(line) AS lh
         |      FROM l GROUP BY 1
         |      HAVING count(DISTINCT doc_id) >= $BoilerMinDocs)
         |SELECT l.doc_id, count(*) AS n_lines,
         |       count(*) FILTER (WHERE f.lh IS NULL) AS n_kept,
         |       md5(coalesce(
         |         string_agg(l.line, chr(10) ORDER BY l.line_idx)
         |           FILTER (WHERE f.lh IS NULL), '')) AS clean_md5
         |FROM l LEFT JOIN f ON md5(l.line) = f.lh
         |GROUP BY l.doc_id ORDER BY l.doc_id""".stripMargin
  )
}
