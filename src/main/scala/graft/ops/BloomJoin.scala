package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.BloomFilter

/** Bloom-prefiltered joins — shrink the LARGE side of a semi/anti
  * join before its shuffle, with exactness restored by the join
  * itself (semi) or guaranteed by the filter's no-false-negative
  * property (anti).
  *
  * Why not just join: at 100 TB a left-semi join shuffles every large-
  * side row on the key even though only a few percent survive. The
  * bloom bitmap (KBs–MBs) broadcasts to every task and eliminates
  * non-matching rows inside the scan's codegen stage, so the shuffle
  * carries ~(selectivity + fp_rate) of the input instead of all of it.
  *
  * Semi: prefilter keeps maybe-members, the real semi join then
  * removes bloom false positives → result ≡ plain semi join.
  * Anti: rows the bloom rejects are DEFINITELY absent from the small
  * side (no false negatives) → emit directly, no join; only maybe-
  * members go through the exact anti join → result ≡ plain anti join.
  * The anti path reads the large side twice (both passes narrow);
  * persist upstream if the scan dominates.
  */
object BloomJoin {

  val DefaultBits = 1 << 18 // 32 KB bitmap — ~24 bits/key at 10k keys
  val DefaultHashes = 5

  /** `large` rows whose `largeKey` appears in `small.smallKey`
    * (left-semi), bloom-prefiltered. Column sets of `large` pass
    * through unchanged.
    */
  def semiJoin(large: DataFrame, largeKey: Column, small: DataFrame,
      smallKey: Column, numBits: Int = DefaultBits,
      numHashes: Int = DefaultHashes): DataFrame = {
    val bloom = BloomFilter.build(small, Seq(smallKey), numBits, numHashes)
    val keys = small.select(smallKey.as("__k")).distinct()
    large
      .crossJoin(broadcast(bloom))
      .filter(BloomFilter.mightContain(col("bloom"), Seq(largeKey), numBits, numHashes))
      .drop("bloom")
      .join(keys, largeKey === col("__k"), "left_semi")
  }

  /** `large` rows whose `largeKey` does NOT appear in
    * `small.smallKey` (left-anti), bloom-accelerated: definite
    * non-members skip the join entirely.
    */
  def antiJoin(large: DataFrame, largeKey: Column, small: DataFrame,
      smallKey: Column, numBits: Int = DefaultBits,
      numHashes: Int = DefaultHashes): DataFrame = {
    val bloom = BloomFilter.build(small, Seq(smallKey), numBits, numHashes)
    val keys = small.select(smallKey.as("__k")).distinct()
    val withFlag = large.crossJoin(broadcast(bloom))
      .withColumn("__maybe",
        BloomFilter.mightContain(col("bloom"), Seq(largeKey), numBits, numHashes))
      .drop("bloom")
    val certainNew = withFlag.filter(!col("__maybe")).drop("__maybe")
    val checked = withFlag.filter(col("__maybe")).drop("__maybe")
      .join(keys, largeKey === col("__k"), "left_anti")
    certainNew.unionByName(checked)
  }
}
