package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys — the manual fallback when AQE's
  * skew-join splitting isn't available (e.g. the skew is in a
  * broadcast-ineligible aggregation input, or a pre-3.0 cluster).
  *
  * Mechanics: the skewed (large) side gets a pseudo-random salt in
  * [0, buckets); the small side is replicated `buckets` times with
  * every salt value; the join key becomes (key, salt). A hot key's
  * rows now spread over `buckets` reducers instead of one.
  *
  * The salt is derived from stable row content (`xxhash64` over
  * `saltSource` columns), keeping the operator deterministic — no
  * `rand()`, so retried tasks produce identical output (required for
  * exactly-once sinks and for the correctness gate).
  *
  * At 100 TB: replicate-factor × small-side must stay
  * broadcast-or-shuffle-affordable; `buckets` ≈ (hot-key rows ÷
  * target-partition rows).
  */
object SkewJoin {

  def saltedJoin(large: DataFrame, small: DataFrame, key: String,
      buckets: Int, saltSource: Seq[String]): DataFrame = {
    require(buckets > 0)
    val saltCols = saltSource.map(col)
    val salted = large.withColumn("__salt",
      pmod(xxhash64(saltCols: _*), lit(buckets.toLong)))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0L), lit(buckets.toLong - 1))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }
}
