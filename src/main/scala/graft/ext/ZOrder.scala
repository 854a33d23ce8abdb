package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Z-order (Morton) layout clustering: interleave the bits of two
  * query dimensions into one sort key, so ONE physical ordering gives
  * row-group min/max pruning on BOTH dimensions at once.
  *
  * Directory partitioning ([[Layout.writePartitioned]]) prunes on one
  * low-cardinality column; sorting prunes on one ordered column. A
  * 100 TB events lake queried by `user_id × value` boxes fits neither:
  * partitioning by user explodes directories, sorting by user leaves
  * `value` predicates scanning everything. The Morton curve maps
  * 2-d proximity to 1-d proximity, so files/row groups written in
  * z order carry tight min/max ranges on the z column, and a 2-d box
  * becomes:
  *
  *   - a PUSHED z-range conjunct `z BETWEEN morton(x₁,y₁) AND
  *     morton(x₂,y₂)` — valid because the interleave is monotone in
  *     each coordinate separately (raising x with y fixed can only
  *     raise even-position bits ⇒ z(x,y) ∈ [z(x₁,y₁), z(x₂,y₂)]
  *     whenever x∈[x₁,x₂], y∈[y₁,y₂]); it skips row groups at scan
  *     time (a necessary-not-sufficient range: the curve wanders out
  *     of the box, so it over-approximates but never misses);
  *   - the EXACT per-dimension predicates evaluated on the surviving
  *     rows.
  *
  * The bit-spread uses the standard mask-shift doubling (Morton 1966;
  * the "Interleave bits by Binary Magic Numbers" construction from
  * the public Bit Twiddling Hacks collection). The DuckDB oracle
  * expression is generated from the SAME [[SpreadSteps]] constants,
  * so the two engines' codes cannot drift.
  *
  * Reference scope: the reference's at-rest layout is 2-bucket ORC
  * (`doc/temp.md:639-648`) with no multi-dimensional clustering; this
  * is engine surface the 100 TB design needs (the lakehouse
  * OPTIMIZE ZORDER BY primitive, re-expressed as plain Spark).
  */
object ZOrder {

  /** (shift, mask) doubling steps spreading a 16-bit value onto the
    * even bits of a 32-bit lane.
    */
  val SpreadSteps: Seq[(Int, Long)] = Seq(
    8 -> 0x00FF00FFL, 4 -> 0x0F0F0F0FL, 2 -> 0x33333333L, 1 -> 0x55555555L)

  /** Spread the low 16 bits of `c` onto even bit positions (codegen'd
    * builtin bit ops — no UDF).
    */
  def spread16(c: Column): Column =
    SpreadSteps.foldLeft(c.bitwiseAND(lit(0xFFFFL))) {
      case (x, (s, m)) => x.bitwiseOR(shiftleft(x, s)).bitwiseAND(lit(m))
    }

  /** 32-bit Morton code of two 16-bit coordinates. */
  def morton(x: Column, y: Column): Column =
    spread16(x).bitwiseOR(shiftleft(spread16(y), 1))

  /** Driver-side twin for computing literal z bounds of a query box. */
  def spread16(v: Long): Long =
    SpreadSteps.foldLeft(v & 0xFFFFL) { case (x, (s, m)) => (x | (x << s)) & m }

  def morton(x: Long, y: Long): Long = spread16(x) | (spread16(y) << 1)

  /** DuckDB expression for [[spread16]]/[[morton]], generated from the
    * same constants.
    */
  def spreadSql(e: String): String =
    SpreadSteps.foldLeft(s"($e & 65535)") {
      case (x, (s, m)) => s"(($x | ($x << $s)) & $m)"
    }

  def mortonSql(x: String, y: String): String =
    s"(${spreadSql(x)} | (${spreadSql(y)} << 1))"

  /** The gate's query box (user_id × value) — bounds chosen non-empty
    * at every fixture scale (sf0.001 has only users 0–14).
    */
  val XLo = 2L; val XHi = 120L
  val YLo = 100.0; val YHi = 300.0

  /** Events + their z code over (user_id, floor(value)). */
  def withZ(events: DataFrame): DataFrame =
    events.withColumn("z",
      morton(col("user_id"), floor(col("value")).cast("long")))

  /** Rows per z-clustered output file. r15: was 1 000 — at sf0.1 the
    * write emitted ~430 thousand-row files (guide §6: tiny files pay
    * open/footer cost twice) through a HARD-CODED 8-way range
    * partition; the clustered write now fans out with the session's
    * parallelism and cuts files of this size. Pruning is unaffected:
    * files stay z-sorted, so footer AND row-group min/max stay tight,
    * and the z-range conjunct still skips at both granularities
    * (PlansSpec pins the pushed filter). A production lake would size
    * by bytes (write.target-file-size); rows are the knob plain
    * parquet exposes deterministically. */
  val ZRecordsPerFile = 16384L

  /** Z-ordered layout round-trip: write events clustered by z (range
    * partitioned by the session's parallelism + sorted within tasks,
    * [[ZRecordsPerFile]]-row files so every file carries a tight z
    * range), then answer a 2-d box query through the z-range + exact
    * predicates, aggregated per event type. The oracle runs the same
    * box off the original table — layout and the redundant z conjunct
    * must never change results, only cost. PlansSpec asserts the z
    * bounds reach `PushedFilters`.
    */
  def boxAggregate(spark: SparkSession, dir: String): DataFrame = {
    // fixed per-fixture path + overwrite, same rationale as
    // Layout.pruneAggregate: bench reruns rewrite one copy
    val tmp = graft.RunScratch.dir("zorder", dir)
    withZ(Tables.events(spark, dir))
      .repartitionByRange(spark.sparkContext.defaultParallelism, col("z"))
      .sortWithinPartitions(col("z"))
      .write.option("maxRecordsPerFile", ZRecordsPerFile)
      .mode("overwrite").parquet(tmp)
    val zLo = morton(XLo, YLo.toLong)
    val zHi = morton(XHi, YHi.toLong)
    spark.read.parquet(tmp)
      .filter(col("z") >= zLo && col("z") <= zHi) // pruned at row-group level
      .filter(col("user_id") >= XLo && col("user_id") <= XHi &&
        col("value") >= YLo && col("value") <= YHi)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value")), 2).as("total_value"),
        min(col("event_id")).as("first_event"))
      .orderBy(col("event_type"))
  }

  /** The raw codes for a deterministic event subset — the gate that
    * pins the interleave math itself against DuckDB's bit ops.
    */
  def codes(spark: SparkSession, dir: String): DataFrame =
    withZ(Tables.events(spark, dir))
      .filter(col("event_id") % 17 === 0)
      .select(col("event_id"), col("z"))
      .orderBy(col("event_id"))

  // ------------------------------------------------------------ queries

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "zorder_code" -> (codes _),
    "zorder_box_agg" -> (boxAggregate _)
  )

  // ------------------------------------------------------- oracle twins

  val oracles: Map[String, String] = Map(
    "zorder_code" ->
      s"""SELECT event_id,
         |       ${mortonSql("user_id", "CAST(floor(value) AS BIGINT)")} AS z
         |FROM events WHERE event_id % 17 = 0
         |ORDER BY event_id""".stripMargin,
    "zorder_box_agg" ->
      s"""SELECT event_type, count(*) AS n_events,
         |       round(sum(value), 2) AS total_value,
         |       min(event_id) AS first_event
         |FROM events
         |WHERE user_id BETWEEN $XLo AND $XHi
         |  AND value BETWEEN $YLo AND $YHi
         |GROUP BY event_type ORDER BY event_type""".stripMargin
  )
}
