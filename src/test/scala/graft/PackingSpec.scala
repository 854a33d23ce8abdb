package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ext.{Packing, TextAnalysis}
import graft.sources.Tables

/** Sequence packing: exact-coverage and budget invariants, plus
  * equality of the two-level offset scan with a flat single-window
  * prefix sum (the oracle's formulation).
  */
class PackingSpec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession.local("graft-packing-test")
  val dir = "/root/testdata/sf0.001"

  lazy val docs = Tables.documents(spark, dir)
  lazy val packed = Packing.packSequences(docs).cache()

  test("every sequence except the last is filled to exactly SeqBudget") {
    val fills = packed.groupBy("seq_id")
      .agg(sum("n_toks").as("fill"))
    val maxSeq = fills.agg(max("seq_id")).collect()(0).getLong(0)
    val bad = fills.filter(col("seq_id") < maxSeq &&
      col("fill") =!= Packing.SeqBudget).count()
    assert(bad === 0)
    val lastFill = fills.filter(col("seq_id") === maxSeq)
      .collect()(0).getAs[Long]("fill")
    assert(lastFill >= 1 && lastFill <= Packing.SeqBudget)
  }

  test("every document is covered exactly once, in order, with no gaps") {
    // spans of one doc: doc_off runs 0, then previous doc_off+n_toks
    val spans = packed.groupBy("doc_id")
      .agg(sum("n_toks").as("covered"),
        min("doc_off").as("first_off"),
        count(lit(1)).as("n_spans"),
        max(col("doc_off") + col("n_toks")).as("end_off"))
    val counts = docs.select(col("doc_id"),
      size(TextAnalysis.tokens(col("text"))).cast("long").as("n"))
    val joined = spans.join(counts, "doc_id")
    assert(joined.filter(col("covered") =!= col("n")).count() === 0)
    assert(joined.filter(col("first_off") =!= 0).count() === 0)
    assert(joined.filter(col("end_off") =!= col("n")).count() === 0)
  }

  test("start_in_seq/n_toks stay inside the sequence budget") {
    assert(packed.filter(col("start_in_seq") < 0 ||
      col("start_in_seq") >= Packing.SeqBudget ||
      col("n_toks") < 1 ||
      col("start_in_seq") + col("n_toks") > Packing.SeqBudget).count() === 0)
  }

  test("two-level offsets equal a flat single-window prefix sum") {
    val twoLevel = Packing.offsets(docs)
    val flat = docs
      .select(col("doc_id"),
        size(TextAnalysis.tokens(col("text"))).cast("long").as("n"))
      .withColumn("off",
        coalesce(sum(col("n")).over(Window.orderBy(col("doc_id"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
    assert(twoLevel.except(flat).count() === 0)
    assert(flat.except(twoLevel).count() === 0)
  }

  test("total sequences = ceil(total tokens / budget)") {
    val totalToks = docs.select(
      sum(size(TextAnalysis.tokens(col("text"))).cast("long"))).collect()(0).getLong(0)
    val nSeqs = packed.select(countDistinct("seq_id")).collect()(0).getLong(0)
    assert(nSeqs === (totalToks + Packing.SeqBudget - 1) / Packing.SeqBudget)
  }
}
