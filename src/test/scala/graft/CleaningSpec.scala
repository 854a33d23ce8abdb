package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ext.{Cleaning, TextAnalysis}
import graft.sources.Tables

/** PII redaction and TF-IDF keyword extraction semantics. */
class CleaningSpec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession.local("graft-cleaning-test")
  val dir = "/root/testdata/sf0.001"

  test("redaction replaces emails, urls, and long digit runs; normalizes whitespace") {
    import spark.implicits._
    val df = Seq(
      (1L, "mail bob.smith+x@foo-bar.example.org now"),
      (2L, "see https://a.example.com/p?q=1#frag and http://b.io/x then text"),
      (3L, "call 12345678 ok but keep 123456 (six digits)"),
      (4L, "spaced   out\t text \n lines"),
      (5L, "combo a@b.co https://c.dd/e 99999999 end")
    ).toDF("doc_id", "text")
    val out = Cleaning.clean(df).orderBy("doc_id").collect()
    assert(out(0).getAs[String]("clean_text") === "mail <EMAIL> now")
    assert(out(0).getAs[Long]("n_emails") === 1L)
    assert(out(1).getAs[String]("clean_text") === "see <URL> and <URL> then text")
    assert(out(1).getAs[Long]("n_urls") === 2L)
    assert(out(2).getAs[String]("clean_text") === "call <ID> ok but keep 123456 (six digits)")
    assert(out(3).getAs[String]("clean_text") === "spaced out text lines")
    assert(out(4).getAs[String]("clean_text") === "combo <EMAIL> <URL> <ID> end")
  }

  test("redaction is idempotent: cleaning cleaned text is a no-op") {
    val docs = Tables.documents(spark, dir)
      .withColumn("text", concat(col("text"),
        lit(" x@y.zz https://q.example.com/1 123456789")))
    val once = Cleaning.clean(docs)
    val twice = Cleaning.clean(
      once.select(col("doc_id"), col("clean_text").as("text")))
      .select(col("doc_id"), col("clean_text"))
    assert(once.select(col("doc_id"), col("clean_text"))
      .except(twice).count() === 0)
    // and the cleaned corpus carries no residual PII
    assert(twice.filter(col("clean_text").rlike(Cleaning.EmailPattern) ||
      col("clean_text").rlike(Cleaning.LongNumPattern)).count() === 0)
  }

  test("line dedup strips corpus-frequent lines, keeps unique bodies in order") {
    import spark.implicits._
    // 6 docs share header/footer; each has a unique body; doc 6 is
    // ONLY boilerplate and must survive as an empty document
    val docs = (1 to 5).map(i =>
        (i.toLong, s"shared header\nunique body $i\nline two $i\nshared footer")) :+
      (6L, "shared header\nshared footer")
    val out = Cleaning.lineDedup(docs.toDF("doc_id", "text"), minDocs = 5L)
      .collect()
    assert(out.length === 6)
    val byId = out.map(r => r.getAs[Long]("doc_id") -> r).toMap
    (1 to 5).foreach { i =>
      assert(byId(i.toLong).getAs[Long]("n_lines") === 4L)
      assert(byId(i.toLong).getAs[Long]("n_kept") === 2L)
      // fingerprint matches the kept lines joined in original order
      val expect = java.security.MessageDigest.getInstance("MD5")
        .digest(s"unique body $i\nline two $i".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      assert(byId(i.toLong).getAs[String]("clean_md5") === expect)
    }
    assert(byId(6L).getAs[Long]("n_kept") === 0L)
    assert(byId(6L).getAs[String]("clean_md5") ===
      "d41d8cd98f00b204e9800998ecf8427e") // md5("")
    // below the threshold nothing is boilerplate
    val loose = Cleaning.lineDedup(docs.toDF("doc_id", "text"), minDocs = 7L)
    assert(loose.filter(col("n_kept") =!= col("n_lines")).count() === 0)
  }

  test("top terms: ranked by tf within lang, df band excludes stopword-like and hapax terms") {
    val docs = Tables.documents(spark, dir)
    val top = TextAnalysis.topTerms(docs, k = 5)
    val rows = top.collect()
    assert(rows.nonEmpty)
    // rank is 1..k and tf non-increasing within each lang
    rows.groupBy(_.getAs[String]("lang")).foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getAs[Int]("rank"))
      assert(sorted.map(_.getAs[Int]("rank")).toSeq === (1 to sorted.length))
      val tfs = sorted.map(_.getAs[Long]("tf")).toSeq
      assert(tfs === tfs.sorted.reverse)
    }
    // df band: every kept term in >=2 docs and <=80% of docs
    val n = docs.count()
    rows.foreach { r =>
      val df = r.getAs[Long]("df")
      assert(df >= 2 && df * 5 <= n * 4)
    }
  }
}
