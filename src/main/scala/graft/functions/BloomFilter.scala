package graft.functions

import org.apache.spark.sql.{Column, DataFrame, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Distributed Bloom filter: build as a typed `Aggregator` (partial
  * bitmaps OR-merged map-side, so the shuffle carries one
  * `numBits/8`-byte buffer per partition, never keys), probe as a
  * pure built-in column expression (`pmod`/`element_at`/`bit_get` —
  * codegen'd, no UDF on the 100 TB side).
  *
  * This is the engine's runtime-filter primitive: build a filter over
  * a small join side, broadcast the one-row bitmap, and pre-filter
  * the large side BEFORE its shuffle — the pattern behind
  * [[graft.ops.BloomJoin]]'s semi/anti joins (and what Spark's AQE
  * `runtimeFilter` does internally for eligible equi-joins; here it
  * is a first-class operator the pipeline can apply to any key
  * expression, including fingerprints that only exist as derived
  * columns).
  *
  * Hashing: double hashing `pos_i = (h1 + i·h2) mod numBits` (Kirsch–
  * Mitzenmacher), with `h1 = xxhash64(keys)` and `h2 = xxhash64(SALT,
  * keys)` computed BY SPARK on both build and probe side — the
  * aggregator receives the two hashes as its input, so the JVM code
  * never re-implements the hash and build/probe cannot drift.
  * Both hashes are reduced mod `numBits` BEFORE combining —
  * `(h1 + i·h2) mod m ≡ ((h1 mod m) + i·(h2 mod m)) mod m` — so the
  * arithmetic never exceeds `(numHashes+1)·numBits` and cannot
  * overflow under ANSI mode (Spark 4 default throws on Long
  * overflow rather than wrapping); JVM `floorMod` matches Spark
  * `pmod` exactly, including negative hashes.
  */
object BloomFilter {

  /** Salt distinguishing h2 from h1 (any fixed non-colliding value). */
  private val H2Salt = 0x9e3779b97f4a7c15L

  def h1(keys: Column*): Column = xxhash64(keys: _*)
  def h2(keys: Column*): Column = xxhash64(lit(H2Salt) +: keys: _*)

  /** Bitmap builder over pre-hashed input rows (h1, h2). */
  final case class BloomAgg(numBits: Int, numHashes: Int)
      extends Aggregator[(Long, Long), Array[Long], Array[Long]] {
    require(numBits > 0 && numBits % 64 == 0, "numBits must be a positive multiple of 64")
    require(numHashes > 0)

    override def zero: Array[Long] = new Array[Long](numBits / 64)

    override def reduce(b: Array[Long], in: (Long, Long)): Array[Long] = {
      val m = numBits.toLong
      val r1 = java.lang.Math.floorMod(in._1, m)
      val r2 = java.lang.Math.floorMod(in._2, m)
      var i = 0
      while (i < numHashes) {
        val pos = (r1 + i.toLong * r2) % m
        b((pos >> 6).toInt) |= 1L << (pos & 63)
        i += 1
      }
      b
    }

    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < a.length) { a(i) |= b(i); i += 1 }
      a
    }

    override def finish(b: Array[Long]): Array[Long] = b

    override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  }

  /** One-row frame `(bloom: Array[Long])` over the distinct hashes of
    * `keys` in `df`. Distributed build: partial bitmaps per partition,
    * OR-merge at the single final reducer.
    */
  def build(df: DataFrame, keys: Seq[Column], numBits: Int,
      numHashes: Int): DataFrame = {
    val agg = udaf(BloomAgg(numBits, numHashes))
    df.select(h1(keys: _*).as("h1"), h2(keys: _*).as("h2"))
      .agg(agg(col("h1"), col("h2")).as("bloom"))
  }

  /** Membership probe — true if `keys` MAY be in the set (false ⇒
    * definitely absent). Pure built-in expressions; stays inside
    * whole-stage codegen on the probe side.
    */
  def mightContain(bloom: Column, keys: Seq[Column], numBits: Int,
      numHashes: Int): Column = {
    val m = lit(numBits.toLong)
    val r1 = pmod(h1(keys: _*), m)
    val r2 = pmod(h2(keys: _*), m)
    (0 until numHashes).map { i =>
      val pos = pmod(r1 + lit(i.toLong) * r2, m)
      val word = element_at(bloom, (pos / 64).cast("int") + lit(1))
      bit_get(word, (pos % 64).cast("int")) === lit(1)
    }.reduce(_ && _)
  }
}
