package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed corpus-statistics aggregator — the `Aggregator[IN, BUF, OUT]`
  * surface SURVEY.md §2.10 plans for text stats (the reference defines
  * no UDAF; this is engine surface for the training-data pipeline).
  *
  * Computes per-group document stats in ONE pass: document count,
  * total/max token count, total characters. The buffer is a tiny
  * fixed-size case class, merged associatively — map-side partial
  * aggregation applies, so the shuffle carries one buffer per
  * (partition × group), never rows: the correct shape at 100 TB.
  *
  * Usable typed (`ds.groupByKey(...).agg(TextStats.toColumn)`) and
  * untyped (`udaf(TextStats)` registered for SQL/DataFrame).
  */
object TextStatsAggregator {

  final case class Buf(docs: Long, tokens: Long, maxTokens: Long, chars: Long)
  final case class Stats(n_docs: Long, total_tokens: Long, max_tokens: Long,
      avg_tokens: Double, total_chars: Long)

  object TextStats extends Aggregator[String, Buf, Stats] {
    override def zero: Buf = Buf(0L, 0L, 0L, 0L)

    override def reduce(b: Buf, text: String): Buf = {
      // token = non-whitespace run; counting nonEmpty pieces of a
      // \s+ split needs NO trim, and gives 0 for empty/blank text —
      // semantics the SQL oracle mirrors with list_filter(…, t -> t
      // != '') (Java .trim strips \t\n\r where SQL trim strips only
      // spaces, so trim-based counts would diverge on edge rows).
      val t = if (text == null) 0L
        else text.split("\\s+").count(_.nonEmpty).toLong
      Buf(b.docs + 1, b.tokens + t, math.max(b.maxTokens, t),
        b.chars + (if (text == null) 0 else text.length))
    }

    override def merge(a: Buf, b: Buf): Buf =
      Buf(a.docs + b.docs, a.tokens + b.tokens,
        math.max(a.maxTokens, b.maxTokens), a.chars + b.chars)

    override def finish(b: Buf): Stats =
      Stats(b.docs, b.tokens, b.maxTokens,
        if (b.docs == 0) 0.0 else b.tokens.toDouble / b.docs, b.chars)

    override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
    override def outputEncoder: Encoder[Stats] = Encoders.product[Stats]
  }
}
