package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ext.Search
import graft.ops.FuzzyJoin
import graft.queries.{ExtraQueries, WindowQueries}
import graft.sources.Tables

/** Retrieval + ranking additions: BM25 semantics, vocabulary
  * encoding, bounded top-k aggregation vs the window form, blocked
  * fuzzy join vs the naive cross product, and the range-frame
  * rolling window vs a self-join formulation.
  */
class SearchSpec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession.local("graft-search-test")
  val dir = "/root/testdata/sf0.001"

  test("bm25 ranks higher tf first at equal length, zero for absent terms") {
    import spark.implicits._
    val docs = Seq(
      (1L, "spark spark spark pad pad pad"),
      (2L, "spark spark pad pad pad pad"),
      (3L, "spark pad pad pad pad pad"),
      (4L, "pad pad pad pad pad pad")
    ).toDF("doc_id", "text")
    val got = Search.bm25(docs, "doc_id", "text", Seq("spark"), k = 4)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(got.map(_._1).toSeq === Seq(1L, 2L, 3L, 4L),
      "more occurrences of the query term must rank higher")
    assert(got.take(3).forall(_._2 > 0.0))
    assert(got.last._2 === 0.0, "no query term -> zero score")
  }

  test("bm25 penalizes document length at equal tf") {
    import spark.implicits._
    val docs = Seq(
      (1L, "spark pad"),
      (2L, "spark pad pad pad pad pad pad pad pad pad")
    ).toDF("doc_id", "text")
    val got = Search.bm25(docs, "doc_id", "text", Seq("spark"), k = 2)
      .collect().map(_.getLong(0)).toSeq
    assert(got === Seq(1L, 2L), "shorter doc with same tf must rank higher")
  }

  test("vocabEncode: dense ids 1..V ordered by (count desc, token)") {
    val v = Search.vocabEncode(Tables.documents(spark, dir), "text",
      minCount = 5L, maxVocab = 1000).collect()
    assert(v.nonEmpty)
    assert(v.map(_.getInt(1)).toSeq === (1 to v.length).toSeq, "ids dense from 1")
    val counts = v.map(r => (r.getLong(2), r.getString(0)))
    val resorted = counts.sortBy { case (c, t) => (-c, t) }.toSeq
    assert(counts.toSeq === resorted, "id order is (count desc, token asc)")
    assert(counts.forall(_._1 >= 5L), "minCount respected")
  }

  test("bounded top-k aggregation equals the window row_number form") {
    import org.apache.spark.sql.expressions.Window
    val viaAgg = ExtraQueries.topkPerType(spark, dir)
    val w = Window.partitionBy(col("event_type"))
      .orderBy(col("value").desc, col("event_id").asc)
    val viaWindow = Tables.events(spark, dir)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 3)
      .select(col("event_type"), col("rank"), col("event_id"),
        round(col("value"), 2).as("value"))
    assert(viaAgg.except(viaWindow).count() === 0)
    assert(viaWindow.except(viaAgg).count() === 0)
  }

  test("blocked fuzzy join equals the naive all-pairs formulation") {
    val blocked = ExtraQueries.fuzzyPartNames(spark, dir)
    val names = Tables.part(spark, dir)
      .groupBy(col("p_name")).agg(count(lit(1)).as("n_rows"))
      .withColumn("noun", element_at(split(col("p_name"), " "), 2))
    val a = names.select(col("noun").as("noun_a"), col("p_name").as("name1"),
      col("n_rows").as("rows1"))
    val b = names.select(col("noun").as("noun_b"), col("p_name").as("name2"),
      col("n_rows").as("rows2"))
    val naive = a.crossJoin(b)
      .filter(col("noun_a") === col("noun_b") && col("name1") < col("name2")
        && levenshtein(col("name1"), col("name2")) <= 3)
      .select(col("noun_a").as("noun"), col("name1"), col("name2"),
        levenshtein(col("name1"), col("name2")).as("dist"),
        (col("rows1") * col("rows2")).as("pair_weight"))
    assert(blocked.except(naive).count() === 0)
    assert(naive.except(blocked).count() === 0)
    assert(blocked.count() > 0, "fixture must exercise the operator")
  }

  test("ER canonicalization: variants collapse to one min-id entity") {
    import spark.implicits._
    // "acme corp"/"acme corpx"/"acme corps" are within dist 3 of each
    // other; "acme industries" shares the block but is too far; a
    // different block never pairs
    val dict = Seq(
      (10L, "acme corp", "corp"), (20L, "acme corpx", "corp"),
      (30L, "acme corps", "corp"), (40L, "acme corporation", "corp"),
      (50L, "zenith gear", "gear"))
      .toDF("name_id", "name", "blk")
    val res = graft.ops.FuzzyJoin
      .canonicalEntities(dict, "name_id", "name", "blk", maxDist = 3)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getString(2)))
      .toMap
    assert(res("acme corp") === (10L, "acme corp"))
    assert(res("acme corpx") === (10L, "acme corp"))
    assert(res("acme corps") === (10L, "acme corp"))
    // "corporation" is 7 edits from "corp" - its own entity
    assert(res("acme corporation") === (40L, "acme corporation"))
    assert(res("zenith gear") === (50L, "zenith gear"))
    // every canonical name is the name of its entity id
    assert(res.values.toSeq.distinct.forall { case (id, cn) =>
      res(cn)._1 === id })
  }

  test("range-frame rolling 7d equals a bounded self-join") {
    val rolled = WindowQueries.rollingUserDaily(spark, dir)
    val daily = Tables.events(spark, dir)
      .select(col("user_id"), to_date(col("ts")).as("day"),
        round(col("value") * 100, 0).cast("long").as("cents"))
      .groupBy(col("user_id"), col("day"))
      .agg(sum(col("cents")).as("cents"))
    val other = daily.select(col("user_id"), col("day").as("day2"),
      col("cents").as("cents2"))
    val viaJoin = daily.join(other, Seq("user_id"))
      .filter(datediff(col("day"), col("day2")).between(0, 6))
      .groupBy(col("user_id"), col("day"), col("cents"))
      .agg(sum(col("cents2")).as("cents_7d"))
      .select(col("user_id"), date_format(col("day"), "yyyy-MM-dd").as("date_str"),
        col("cents"), col("cents_7d"))
    assert(rolled.except(viaJoin).count() === 0)
    assert(viaJoin.except(rolled).count() === 0)
  }

  test("bm25 plan: no row-multiplying token explode, top-k via TakeOrderedAndProject") {
    val plan = Search.bm25(Tables.documents(spark, dir), "doc_id", "text",
      Seq("spark", "hash"), 10).queryExecution.executedPlan.toString
    // the token-array PIN (explode over a 1-element array — one row
    // in, one row out) is allowed; a Generate over the token array
    // itself (one row PER TOKEN, the wordcount shape bm25 exists to
    // avoid) is not
    assert(!plan.contains("Generate explode(filter(split("),
      s"bm25 must not explode tokens row-per-token:\n$plan")
    assert(plan.contains("Generate explode(array("),
      s"the token-array pin must survive (one split per row):\n$plan")
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-k must be a bounded take, not a global sort:\n$plan")
  }

  test("word_ngrams generator: Generate node, HOF equivalence, SQL twin") {
    val gen = Search.ngramGenCounts(spark, dir)
    assert(gen.queryExecution.executedPlan.toString.contains("Generate"),
      "the UDTF must plan a Generate node")
    // equivalence with the transform+explode HOF formulation
    val toks = Search.tokens(col("text"))
    val hof = Tables.documents(spark, dir)
      .select(explode(when(size(toks) >= 2,
        transform(sequence(lit(0), size(toks) - 2),
          i => concat_ws(" ", element_at(toks, i + 1), element_at(toks, i + 2))))
        .otherwise(array().cast("array<string>"))).as("ngram"))
      .groupBy(col("ngram")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("ngram")).limit(40)
    assert(gen.collect().toSeq === hof.collect().toSeq)
    // SQL-text twin through the injected function resolves identically
    val sqlTwin = graft.queries.SqlQueries.sqlNgramGen(spark, dir)
    assert(gen.collect().toSeq === sqlTwin.collect().toSeq)
  }

  test("fuzzy join plans a hash join on the block key, no nested loop") {
    val plan = ExtraQueries.fuzzyPartNames(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      s"blocked fuzzy join must be an equi-join:\n$plan")
  }

  test("bounded top-k plans a partial aggregation, not a window sort") {
    val plan = ExtraQueries.topkPerType(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"),
      s"typed aggregator must plan ObjectHashAggregate:\n$plan")
    assert(!plan.contains("Window"),
      s"the aggregation form must not fall back to a window:\n$plan")
  }

  test("EWMA fold matches an iterative per-user reference computation") {
    val got = WindowQueries.ewmaUserDaily(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val daily = Tables.events(spark, dir)
      .select(col("user_id"), to_date(col("ts")).as("day"),
        round(col("value") * 100, 0).cast("long").as("cents"))
      .groupBy(col("user_id"), col("day"))
      .agg(sum(col("cents")).as("cents"))
      .collect().map(r => (r.getLong(0), r.getDate(1).toLocalDate, r.getLong(2)))
    val byUser = daily.groupBy(_._1).map { case (u, rows) =>
      val series = rows.sortBy(_._2.toEpochDay).map(_._3.toDouble)
      u -> (rows.length.toLong,
        BigDecimal(series.tail.foldLeft(series.head)((acc, x) => acc * 0.5 + x * 0.5))
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    assert(got.length === byUser.size)
    got.foreach { case (u, n, e) =>
      val (refN, refE) = byUser(u)
      assert(n === refN && e === refE, s"user $u: got ($n, $e) want ($refN, $refE)")
    }
  }

  test("zscore outlier profile: hand-checked on a tiny frame") {
    import spark.implicits._
    // values 1..8 plus one far outlier; mean/sd shift, only the
    // outlier exceeds |z| > 2
    val ev = (1 to 8).map(i => ("a", i.toDouble)) :+ (("a", 1000.0))
    val df = ev.toDF("event_type", "value")
      .withColumn("event_id", monotonically_increasing_id())
      .withColumn("ts", current_timestamp())
      .withColumn("props", lit("{}"))
    // reuse the gate's arithmetic via a local temp dir write? simpler:
    // inline the same computation shape
    val e = df.select(col("event_type"),
      round(col("value") * 100, 0).cast("long").as("cents"))
    val m = e.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("cents")).as("s1"),
        sum(col("cents") * col("cents")).as("s2"))
      .select(col("event_type"),
        (col("s1").cast("double") / col("n").cast("double")).as("meand"),
        sqrt(col("s2").cast("double") / col("n").cast("double")
          - (col("s1").cast("double") / col("n").cast("double"))
            * (col("s1").cast("double") / col("n").cast("double"))).as("sd"))
    val z = (col("cents").cast("double") - col("meand")) / col("sd")
    val out = e.join(m, "event_type")
      .agg(count(when(z > 2.0, 1)).as("n_hi"),
        count(when(z < -2.0, 1)).as("n_lo")).collect()(0)
    assert(out.getLong(0) === 1L, "exactly the planted outlier is high")
    assert(out.getLong(1) === 0L)
  }

  test("degenerate inputs: empty corpus, blank docs, over-sized quotas") {
    import spark.implicits._
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(Search.bm25(empty, "doc_id", "text", Seq("spark"), 5).count() === 0)
    assert(Search.vocabEncode(empty, "text", 1L, 10).count() === 0)
    // blank/whitespace-only docs: zero tokens, zero score, no crash
    val blank = Seq((1L, ""), (2L, "   "), (3L, "spark")).toDF("doc_id", "text")
    val scored = Search.bm25(blank, "doc_id", "text", Seq("spark"), 3)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(scored(3L) > 0.0 && scored(1L) === 0.0 && scored(2L) === 0.0)
    // quota larger than every group: capPerGroup is the identity
    val docs = Tables.documents(spark, dir)
    val capped = graft.ext.Sampling.capPerGroup(docs, "source", "doc_id",
      md5(col("text")), n = 1000000)
    assert(capped.count() === docs.count())
  }

  test("gate zscore profile is internally consistent") {
    val r = ExtraQueries.zscoreOutliers(spark, dir).collect()
    assert(r.nonEmpty)
    r.foreach { row =>
      val (n, hi, lo) = (row.getLong(1), row.getLong(2), row.getLong(3))
      assert(hi + lo < n, "outliers are a strict minority")
      assert(row.getDouble(5) > 0.0, "sd positive on real data")
    }
  }
}
