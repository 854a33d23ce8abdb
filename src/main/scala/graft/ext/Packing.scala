package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Sequence packing — the step between a curated corpus and a trainer:
  * concatenate all documents in a deterministic global order and cut
  * the combined token stream into fixed-budget training sequences,
  * emitting for every (sequence, document) pair the span the document
  * contributes. This is the standard GPT-style "concat then chunk"
  * packing (documents may straddle sequence boundaries), so there is
  * no bin-packing heuristic to tune and utilization is exactly 100%
  * on every sequence but the last.
  *
  * The only global state the operator needs is each document's offset
  * in the concatenated token stream — a prefix sum over the corpus in
  * doc_id order. A single `Window.orderBy` computes that on ONE
  * partition (the classic scale trap); instead the offsets come from a
  * two-level scan, all DataFrame ops:
  *
  *   1. group documents into deterministic buckets of [[BucketSize]]
  *      consecutive doc_ids (`doc_id div G` — a pure projection, NOT
  *      `spark_partition_id`, so the result never depends on how Spark
  *      happened to partition the scan);
  *   2. per-bucket token totals (tiny: corpus/G rows), then bucket
  *      prefix offsets with one ordered window over that reduced frame
  *      — the single-partition window now touches n/G rows, not n;
  *   3. broadcast the (bucket, prefix) frame back and finish with a
  *      per-bucket window (`partitionBy(bucket)`, bounded by G rows)
  *      for the intra-bucket running sum.
  *
  * At 100 TB with G sized so per-bucket totals stay ~10⁶ rows the
  * reduced window is a single-task blip; a third level (buckets of
  * buckets) extends the same recursion if the corpus outgrows it.
  * Everything downstream of the offsets is a narrow projection:
  * the (first_seq..last_seq) span explode is bounded by
  * ceil(len/B)+1 rows per document, and the output is already
  * hash-distributable by seq_id for the trainer's shuffle-free
  * read-back.
  *
  * Reference scope: the reference engine has no packing operator; this
  * is part of the training-data extension surface (builder brief), with
  * semantics matching the published "concat and chunk" recipe (GPT-3
  * appendix B; T5's pack_dataset).
  */
object Packing {

  /** Tokens per training sequence. Small relative to the 30–160-word
    * fixture docs so spans genuinely straddle boundaries in the gate.
    */
  val SeqBudget = 64L

  /** Documents per offset bucket (two-level prefix scan granularity).
    * 128 keeps several buckets live even at sf0.01 (500 docs) so the
    * gate exercises the cross-bucket offset stitching, not just the
    * in-bucket window.
    */
  val BucketSize = 128L

  private def fdiv(c: Column, d: Long): Column =
    floor(c / lit(d.toDouble)).cast("long")

  /** Per-document token offsets in the concatenated corpus stream:
    * (doc_id, n, off) with `off` = sum of token counts of all docs
    * with smaller doc_id. Two-level scan as per the class doc.
    */
  def offsets(docs: DataFrame): DataFrame =
    offsetsOf(docs.select(col("doc_id"),
      size(TextAnalysis.tokens(col("text"))).cast("long").as("n")))

  /** [[offsets]] over an arbitrary per-document length frame
    * `(doc_id, n)` — the seam that lets packing compose with any
    * tokenizer (whitespace counts for the classic gate, trained-BPE id
    * counts for [[CorpusPrep.bpeEncodeIds]]). Same two-level scan.
    */
  def offsetsOf(counts: DataFrame): DataFrame = {
    val counted = counts
      .withColumn("bucket", fdiv(col("doc_id"), BucketSize))
    val bucketPrefix = counted
      .groupBy(col("bucket")).agg(sum(col("n")).as("tot"))
      .withColumn("prefix",
        coalesce(
          sum(col("tot")).over(Window.orderBy(col("bucket"))
            .rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .select(col("bucket"), col("prefix"))
    val intra = Window.partitionBy(col("bucket")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    counted
      .join(broadcast(bucketPrefix), "bucket")
      .withColumn("off",
        col("prefix") + coalesce(sum(col("n")).over(intra), lit(0L)))
      .select(col("doc_id"), col("n"), col("off"))
  }

  /** The packed-span table: one row per (sequence, document) overlap.
    *
    *  - `seq_id`       fixed-[[SeqBudget]] training sequence index
    *  - `start_in_seq` where the doc's tokens begin inside the sequence
    *  - `doc_off`      which token of the doc that is
    *  - `n_toks`       how many tokens the doc contributes there
    *
    * Every sequence's spans sum to exactly [[SeqBudget]] (except the
    * final partial sequence), every document's spans cover it exactly
    * once — both invariants are property-tested in PackingSpec.
    */
  def packSequences(docs: DataFrame): DataFrame =
    packSpans(offsets(docs))

  /** [[packSequences]] over a pre-tokenized length frame `(doc_id, n)`
    * — documents with `n = 0` (a tokenizer CAN emit zero ids for a
    * doc, unlike the whitespace count which is ≥ 1) contribute no
    * tokens to the stream and are excluded BEFORE the span derivation:
    * `sequence(firstSeq, lastSeq)` with n = 0 would DESCEND
    * (lastSeq < firstSeq) and emit a phantom span.
    */
  def packSequencesOf(counts: DataFrame): DataFrame =
    packSpans(offsetsOf(counts.filter(col("n") > 0)))

  private def packSpans(o: DataFrame): DataFrame = {
    val firstSeq = fdiv(col("off"), SeqBudget)
    val lastSeq = fdiv(col("off") + col("n") - 1, SeqBudget)
    o.select(col("doc_id"), col("n"), col("off"),
        explode(sequence(firstSeq, lastSeq)).as("seq_id"))
      .select(
        col("seq_id"),
        col("doc_id"),
        (greatest(col("off"), col("seq_id") * SeqBudget)
          - col("seq_id") * SeqBudget).as("start_in_seq"),
        (greatest(col("off"), col("seq_id") * SeqBudget)
          - col("off")).as("doc_off"),
        (least(col("off") + col("n"), (col("seq_id") + 1) * SeqBudget)
          - greatest(col("off"), col("seq_id") * SeqBudget)).as("n_toks"))
      .orderBy(col("seq_id"), col("doc_id"))
  }

  // ------------------------------------------------------------ queries

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "pack_sequences" -> ((s, d) => packSequences(Tables.documents(s, d)))
  )

  // ------------------------------------------------------- oracle twins

  val oracles: Map[String, String] = Map(
    // One flat window in the oracle vs the engine's two-level scan —
    // identical offsets by construction, which is the point of the gate.
    "pack_sequences" ->
      s"""WITH w AS (
         |  SELECT doc_id,
         |         len(string_split_regex(lower(trim(text)), '\\s+')) AS n
         |  FROM documents),
         |o AS (
         |  SELECT doc_id, n,
         |         CAST(coalesce(sum(n) OVER (ORDER BY doc_id
         |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS off
         |  FROM w)
         |SELECT CAST(t.seq AS BIGINT) AS seq_id,
         |       doc_id,
         |       CAST(greatest(off, t.seq*$SeqBudget) - t.seq*$SeqBudget AS BIGINT) AS start_in_seq,
         |       CAST(greatest(off, t.seq*$SeqBudget) - off AS BIGINT) AS doc_off,
         |       CAST(least(off + n, (t.seq+1)*$SeqBudget)
         |            - greatest(off, t.seq*$SeqBudget) AS BIGINT) AS n_toks
         |FROM o, unnest(range(off // $SeqBudget, (off + n - 1) // $SeqBudget + 1)) AS t(seq)
         |ORDER BY seq_id, doc_id""".stripMargin
  )
}
