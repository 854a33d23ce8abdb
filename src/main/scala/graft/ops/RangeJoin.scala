package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bucketed range join: rows-to-intervals with NO equi key.
  *
  * Spark plans a bare inequality join (`l.ts BETWEEN r.start AND
  * r.end`) as `BroadcastNestedLoopJoin` — every left row tested
  * against every interval, O(n·m), the classic scale trap (fine only
  * while one side broadcasts). The bucketed form manufactures the
  * missing equi key from time itself: intervals explode onto every
  * fixed-size bucket they overlap, left rows key to their single
  * containing bucket, and the join becomes a hash equi-join on the
  * bucket id with the exact range predicate as a post-filter.
  *
  * Each (row, interval) match is produced EXACTLY once — the row's
  * bucket is unique, and the interval has one copy per bucket, so the
  * pair meets at one copy only: no dedup pass. Cost: interval
  * replication ×(span/bucket + 1); pick `bucketSeconds` near the
  * typical interval span so replication stays ~2× while bucket
  * population (the per-key probe work) stays bounded. At 100 TB this
  * is the difference between a keyed shuffle and a nested loop over
  * the corpus.
  */
object RangeJoin {

  import org.apache.spark.sql.Column
  import org.apache.spark.sql.types.{ByteType, DataType, IntegerType, LongType, ShortType, TimestampType}

  /** Exact `floor(c / size)` bucket id, integral end-to-end: the
    * previous cast-to-double form was exact only below 2⁵³ — fine
    * for epoch-µs, but nothing guarantees a caller's numeric bounds
    * stay under the ceiling (advisory r8 latent #5). Timestamps cast
    * to long as floor-epoch-seconds (Spark's cast is `floorDiv(µs,
    * 10⁶)`), integrals pass through, fractional numerics floor first
    * (`⌊x/b⌋ = ⌊⌊x⌋/b⌋` for integer b > 0, so nothing shifts). The
    * positive `pmod` is subtracted BEFORE the division so the decimal
    * divide is of an exact multiple — the quotient is an exact
    * integer at any Long magnitude and no rounding mode can engage;
    * decimal(38,0) arithmetic can't overflow on the subtraction
    * either (c = Long.MinValue would underflow a long subtract).
    */
  private def bucketOf(dt: DataType, c: Column, size: Long): Column = {
    val base = dt match {
      case TimestampType => c.cast("long")
      case LongType | IntegerType | ShortType | ByteType => c
      case _ => floor(c).cast("long")
    }
    val d = base.cast("decimal(38,0)")
    ((d - pmod(d, lit(size))) / lit(size)).cast("long")
  }

  /** Join `left` rows (timestamp `tsCol`) to `right` intervals
    * (`startCol`..`endCol`, inclusive both ends). Caller supplies
    * frames with disjoint column names.
    */
  def byTime(left: DataFrame, tsCol: String,
      right: DataFrame, startCol: String, endCol: String,
      bucketSeconds: Long = 600L): DataFrame = {
    val r = right.withColumn("__b", explode(sequence(
      bucketOf(right.schema(startCol).dataType, col(startCol), bucketSeconds),
      bucketOf(right.schema(endCol).dataType, col(endCol), bucketSeconds))))
    val l = left.withColumn("__b",
      bucketOf(left.schema(tsCol).dataType, col(tsCol), bucketSeconds))
    // merge hint: the exploded interval side has Generate-garbled
    // size estimates, and the unhinted planner BROADCAST it (round-4
    // plan audit) — silently reintroducing the broadcast dependence
    // this operator exists to remove. Callers who KNOW the interval
    // set is tiny can broadcast before calling; the default is the
    // shape that survives a large interval table.
    l.join(r.hint("merge"), Seq("__b"))
      .filter(col(tsCol) >= col(startCol) && col(tsCol) <= col(endCol))
      .drop("__b")
  }

  /** Interval×interval OVERLAP join — the family's second member:
    * BOTH sides spread onto every fixed-size bucket they span, meet
    * by hash equi-join on the bucket id, and the exact overlap
    * predicate (`aStart ≤ bEnd ∧ bStart ≤ aEnd`, inclusive)
    * post-filters. A pair overlapping k shared buckets would surface
    * k times, so the CANONICAL-BUCKET filter keeps only the copy in
    * the bucket containing the LATER of the two starts — a bucket
    * both intervals necessarily cover whenever they overlap — which
    * emits each pair EXACTLY once with NO distinct pass (a dedup
    * over pair output is the hidden corpus-sized shuffle this trick
    * removes). Replication economics and the merge-hint rationale
    * are [[byTime]]'s; `bucketSize` is in the UNIT of the bound
    * columns (epoch seconds for timestamps, or the integer unit of
    * numeric bounds, e.g. 600·10⁶ for µs longs — exact at any Long
    * magnitude via [[bucketOf]]'s integral floor division).
    */
  def overlapByTime(left: DataFrame, lStart: String, lEnd: String,
      right: DataFrame, rStart: String, rEnd: String,
      bucketSize: Long = 600L): DataFrame = {
    def spread(df: DataFrame, s: String, e: String) =
      df.withColumn("__b", explode(sequence(
        bucketOf(df.schema(s).dataType, col(s), bucketSize),
        bucketOf(df.schema(e).dataType, col(e), bucketSize))))
    spread(left, lStart, lEnd)
      .join(spread(right, rStart, rEnd).hint("merge"), Seq("__b"))
      .filter(col(lStart) <= col(rEnd) && col(rStart) <= col(lEnd))
      // canonical bucket = the LATER start's bucket, computed as the
      // max of the two PER-SIDE bucket ids (bucketOf is monotone, so
      // max∘bucket ≡ bucket∘max) — each side's bucket derives from its
      // OWN column dtype, exactly matching the spread-side buckets.
      // Bucketing greatest(lStart, rStart) directly would derive the
      // dtype from one side while Spark coerces the comparison to a
      // common type (advisory r9: int-vs-long or fractional mixes
      // could floor/cast inconsistently with the spread buckets).
      .filter(col("__b") === greatest(
        bucketOf(left.schema(lStart).dataType, col(lStart), bucketSize),
        bucketOf(right.schema(rStart).dataType, col(rStart), bucketSize)))
      .drop("__b")
  }
}
