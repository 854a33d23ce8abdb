package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** JSON and CSV file sources/sinks with declared schemas — the
  * text-format leg of the engine's source surface. The reference's
  * wire format is JSON over Kafka (`doc/temp.md:293-312`,
  * `datagenkafka.py`); at rest, text formats appear whenever a lake
  * ingests third-party drops. The engine's rules for them at 100 TB:
  *
  *  - **declared schemas, never inference** — schema inference is a
  *    second full scan before the first real one; both readers here
  *    take explicit `StructType`s.
  *  - **splittable compression or none** — a single 1 TB gzip JSON
  *    file is one task forever; the writers emit uncompressed
  *    many-file output sized by upstream partitioning.
  *  - **quoting is correctness** — the `props` column is itself JSON
  *    (commas, quotes, braces); the CSV round-trip exercises
  *    quote/escape fidelity, the JSON round-trip exercises nested
  *    escaping. The gates aggregate over round-tripped data and must
  *    hash-match the oracle computed off the original parquet:
  *    format hops must never change values.
  *
  * Timestamps deliberately stay OUT of the text schema (they travel
  * as epoch longs when needed) — text-format timestamp parsing is
  * locale/format-dependent drift the lake never has to pay if the
  * wire carries integers, which is also how the reference's JSON wire
  * carries `create_time` (epoch seconds; `datagenkafka.py:15`).
  */
object FileFormats {

  /** The stable projection of `events` that round-trips (ts as raw
    * epoch-micros long).
    */
  private def stableEvents(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir).select(
      col("event_id"), col("user_id"), col("event_type"),
      col("value"), col("props"),
      unix_micros(col("ts")).as("ts_us"))

  val eventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType),
    StructField("ts_us", LongType)))

  def writeJson(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  def readJson(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  /** CSV options pinned for fidelity, not defaults:
    *  - the writer's whitespace trimming is ON by default and silently
    *    corrupts padded strings — disabled;
    *  - the reader's default `nullValue` is the empty string, which
    *    turns a written `""` into NULL — remapped to a token that
    *    never occurs (U+0000), so empty strings survive. (CSV
    *    cannot carry both NULL and "" distinguishably without a
    *    dedicated null token; this surface's contract is no-null
    *    string columns — enforce upstream with [[graft.ext.DataQuality]].)
    */
  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").option("header", "true")
      .option("quoteAll", "true")
      .option("ignoreLeadingWhiteSpace", "false")
      .option("ignoreTrailingWhiteSpace", "false")
      .csv(path)

  def readCsv(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).option("header", "true")
      .option("nullValue", "\u0000").csv(path)

  /** Shared rollup run after each round trip; oracle computes the
    * same off the original parquet. `sum(length(props))` pins quoting
    * fidelity byte-for-byte, `max(ts_us)` pins the epoch-long leg.
    */
  private def rollup(df: DataFrame): DataFrame =
    df.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"),
        round(sum(col("value")), 2).as("total_value"),
        sum(length(col("props"))).as("props_chars"),
        max(col("ts_us")).as("last_ts_us"))
      .orderBy(col("event_type"))

  def jsonRoundTrip(spark: SparkSession, dir: String): DataFrame = {
    val tmp = graft.RunScratch.dir("json_events", dir)
    writeJson(stableEvents(spark, dir), tmp)
    rollup(readJson(spark, tmp, eventSchema))
  }

  def csvRoundTrip(spark: SparkSession, dir: String): DataFrame = {
    val tmp = graft.RunScratch.dir("csv_events", dir)
    writeCsv(stableEvents(spark, dir), tmp)
    rollup(readCsv(spark, tmp, eventSchema))
  }

  /** ORC round-trip (the reference's at-rest format,
    * `doc/temp.md:639-648`): self-describing columnar — no read
    * schema needed, zstd-compressed like a production lake table.
    * Same adversarial rows, same rollup oracle as the JSON/CSV
    * gates.
    */
  def orcRoundTrip(spark: SparkSession, dir: String): DataFrame = {
    val tmp = graft.RunScratch.dir("orc_events", dir)
    stableEvents(spark, dir).write.mode("overwrite")
      .option("compression", "zstd").orc(tmp)
    rollup(spark.read.orc(tmp))
  }

  /** Parquet schema evolution: generation 1 files lack the `channel`
    * column, generation 2 files carry it; a `mergeSchema` read
    * presents the union schema with nulls for gen-1 rows — the
    * add-a-column-without-rewriting-history contract every long-lived
    * lake table depends on. (Default reads take the schema of one
    * footer — silently DROPPING the new column is the failure mode
    * this gate pins against.) The rollup counts per-generation
    * presence, which the oracle recomputes from the parity split.
    */
  def schemaEvolutionRollup(spark: SparkSession, dir: String): DataFrame = {
    val root = graft.RunScratch.dir("schema_evo", dir)
    val ev = Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
    ev.filter(col("event_id") % 2 === 0)
      .write.mode("overwrite").parquet(s"$root/gen=1")
    ev.filter(col("event_id") % 2 === 1)
      .withColumn("channel",
        concat(lit("ch"), (col("user_id") % 3).cast("string")))
      .write.mode("overwrite").parquet(s"$root/gen=2")
    spark.read.option("mergeSchema", "true")
      .parquet(s"$root/gen=1", s"$root/gen=2")
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        count(col("channel")).as("n_with_channel"),
        countDistinct(col("channel")).as("n_channels"))
      .orderBy(col("event_type"))
  }

  // ------------------------------------------------------------ queries

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "src_json_roundtrip" -> (jsonRoundTrip _),
    "src_csv_roundtrip" -> (csvRoundTrip _),
    "src_orc_roundtrip" -> (orcRoundTrip _),
    "src_schema_evolution" -> (schemaEvolutionRollup _)
  )

  // ------------------------------------------------------- oracle twins

  private val RollupSql =
    """SELECT event_type, count(*) AS n_events,
      |       count(DISTINCT user_id) AS n_users,
      |       round(sum(value), 2) AS total_value,
      |       CAST(sum(length(props)) AS BIGINT) AS props_chars,
      |       max(epoch_us(ts)) AS last_ts_us
      |FROM events
      |GROUP BY event_type ORDER BY event_type""".stripMargin

  val oracles: Map[String, String] = Map(
    "src_json_roundtrip" -> RollupSql,
    "src_csv_roundtrip" -> RollupSql,
    "src_orc_roundtrip" -> RollupSql,
    "src_schema_evolution" ->
      """SELECT event_type, count(*) AS n,
        |       count(CASE WHEN event_id % 2 = 1 THEN 1 END) AS n_with_channel,
        |       count(DISTINCT CASE WHEN event_id % 2 = 1
        |             THEN 'ch' || CAST(user_id % 3 AS VARCHAR) END) AS n_channels
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin
  )
}
