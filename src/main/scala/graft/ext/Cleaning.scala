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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_clean_pii" -> ((s, d) =>
      clean(Tables.documents(s, d).withColumn("text", annotated))
        .orderBy(col("doc_id")))
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
         |FROM a ORDER BY doc_id""".stripMargin
  )
}
