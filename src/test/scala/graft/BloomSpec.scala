package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ext.Dedup
import graft.functions.BloomFilter
import graft.ops.BloomJoin
import graft.sources.Tables

/** Bloom filter build/probe and the prefiltered join paths. */
class BloomSpec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession.local("graft-bloom-test")
  val dir = "/root/testdata/sf0.001"

  val Bits = 1 << 14
  val Hashes = 5

  test("bloom has no false negatives and a plausible false-positive rate") {
    import spark.implicits._
    val members = spark.range(0, 1000).toDF("k")
    val bloom = BloomFilter.build(members, Seq(col("k")), Bits, Hashes)
    // every member must probe true
    val fn = members.crossJoin(broadcast(bloom))
      .filter(!BloomFilter.mightContain(col("bloom"), Seq(col("k")), Bits, Hashes))
      .count()
    assert(fn === 0L)
    // non-members: fp rate well under 10% at 16 bits/key
    val nonMembers = spark.range(1000000, 1010000).toDF("k")
    val fp = nonMembers.crossJoin(broadcast(bloom))
      .filter(BloomFilter.mightContain(col("bloom"), Seq(col("k")), Bits, Hashes))
      .count()
    assert(fp < 1000L, s"false-positive count $fp out of 10000 non-members")
  }

  test("bloom semi join equals plain left-semi join") {
    val li = Tables.lineitem(spark, dir)
    val hot = Tables.orders(spark, dir)
      .filter(col("o_totalprice") > 450000.0).select(col("o_orderkey"))
    val viaBloom = BloomJoin.semiJoin(li, col("l_orderkey"), hot, col("o_orderkey"))
    val plain = li.join(hot, li("l_orderkey") === hot("o_orderkey"), "left_semi")
    assert(viaBloom.count() === plain.count())
    assert(viaBloom.except(plain).isEmpty && plain.except(viaBloom).isEmpty)
  }

  test("bloom anti join equals plain left-anti join") {
    val li = Tables.lineitem(spark, dir)
    val hot = Tables.orders(spark, dir)
      .filter(col("o_totalprice") > 450000.0).select(col("o_orderkey"))
    val viaBloom = BloomJoin.antiJoin(li, col("l_orderkey"), hot, col("o_orderkey"))
    val plain = li.join(hot, li("l_orderkey") === hot("o_orderkey"), "left_anti")
    assert(viaBloom.count() === plain.count())
    assert(viaBloom.except(plain).isEmpty && plain.except(viaBloom).isEmpty)
  }

  test("incremental dedup: batch ∖ history by bag fingerprint, exercised on real collisions") {
    val docs = Tables.documents(spark, dir)
    val history = docs.filter(col("doc_id") % 2 === 0)
    val batch = docs.filter(col("doc_id") % 2 === 1)
    val survivors = Dedup.incrementalDedup(history, batch)
    val nBatch = batch.count()
    val nSurvivors = survivors.count()
    // some batch docs must collide with history (else the gate is vacuous)
    assert(nSurvivors < nBatch, "expected at least one fingerprint collision")
    // survivors' fingerprints are disjoint from history's
    val fpOf = Dedup.bagFingerprint(col("text"))
    val histFps = history.select(fpOf.as("fp")).distinct()
    assert(survivors.select(fpOf.as("fp"))
      .join(histFps, "fp").count() === 0L)
  }
}
