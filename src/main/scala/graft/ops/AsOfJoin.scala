package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — for each left row, the most recent right row with
  * `rightTime <= leftTime` within the same key group. The canonical
  * time-series enrichment operator (pandas `merge_asof`, DuckDB/kdb
  * `ASOF JOIN`); Spark has no native form.
  *
  * Implemented by composition (preference (a) of the build contract —
  * compose existing ops before reaching for a custom SparkPlan):
  *
  *   1. UNION the two inputs with a side marker, right rows carrying
  *      their payload, left rows carrying null payload;
  *   2. one window pass per key, ordered by (time, side): `last(payload,
  *      ignoreNulls)` over rows-unbounded-preceding propagates the
  *      latest right payload onto every subsequent left row;
  *   3. keep left rows.
  *
  * Cost: ONE shuffle on the key (same as any keyed join) + one
  * in-partition sort — strictly cheaper than the naive
  * join-then-rank-then-filter (which shuffles the full left×right
  * match set). Skew behaves like any window: a hot key serializes its
  * partition; salt upstream if a single key exceeds a partition.
  *
  * Tie-break at equal times: right row sorts BEFORE the left row
  * (side marker 0 < 1), so an exactly-simultaneous right row is
  * visible to the left row — matching DuckDB `ASOF JOIN`'s
  * `right.t <= left.t` semantics (the oracle in
  * [[graft.queries.StarQueries]]-style gate entries).
  */
object AsOfJoin {

  /** @param left        left (probe) rows
    * @param right       right (reference) rows
    * @param keys        equi-join key columns (present in both)
    * @param leftTime    event-time column name on the left
    * @param rightTime   event-time column name on the right
    * @param payloadCols right columns to carry onto left rows (renamed
    *                    as given in the map: rightName -> outName)
    */
  def asOf(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String,
      payloadCols: Map[String, String]): DataFrame = {
    val keyCols = keys.map(col)
    val leftCols = left.columns

    val rightMarked = right.select(
      keyCols ++
        Seq(col(rightTime).as("__t"), lit(0).as("__side"),
          struct(payloadCols.keys.toSeq.sorted.map(col): _*).as("__payload")) ++
        leftCols.filterNot(keys.contains).map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)
    val leftMarked = left.select(
      keyCols ++
        Seq(col(leftTime).as("__t"), lit(1).as("__side"),
          lit(null).cast(rightMarked.schema("__payload").dataType).as("__payload")) ++
        leftCols.filterNot(keys.contains).map(col): _*)

    val w = Window.partitionBy(keyCols: _*)
      .orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val joined = rightMarked.unionByName(leftMarked)
      .withColumn("__asof", last(col("__payload"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)

    val out = joined.select(
      leftCols.map(col) ++
        payloadCols.toSeq.sortBy(_._1).map { case (r, o) => col(s"__asof.$r").as(o) }: _*)
    out
  }
}
