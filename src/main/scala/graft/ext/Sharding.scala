package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Deterministic shard export + manifest — the last stage of a
  * training-data pipeline: split the curated corpus into S
  * content-addressed shards a tokenizer/trainer fleet consumes, and
  * emit a per-shard manifest (row counts + order-insensitive content
  * fingerprints) that a consumer can re-verify without trusting the
  * producer.
  *
  * Shard assignment is `substr(md5(key), 1, nibbles)` — a pure
  * function of the row key, so the layout is reproducible across
  * runs, cluster sizes, and engines (md5 is everywhere; the oracle
  * recomputes assignment independently). 16^nibbles shards; a 's'
  * prefix keeps the partition directory values unambiguously strings.
  *
  * Scale notes: the export is one `repartition` on the shard key
  * (each shard written by one task, size-bounded via
  * [[Layout.writePartitioned]]); the manifest is one keyed
  * aggregation whose min/max fingerprints are order-insensitive, so
  * it verifies content equality regardless of row order within a
  * shard — re-exports compare manifest-to-manifest without reading
  * data twice.
  */
object Sharding {

  /** Shard key for a row key: 's' + first `nibbles` hex chars of
    * md5(key) — 16^nibbles shards, deterministic, engine-independent.
    */
  def shardKey(key: Column, nibbles: Int): Column =
    concat(lit("s"), substring(md5(key.cast("string")), 1, nibbles))

  /** Export `df` as a shard-partitioned parquet layout. */
  def exportShards(df: DataFrame, path: String, keyCol: String,
      nibbles: Int = 1): Unit =
    Layout.writePartitioned(
      df.withColumn("shard", shardKey(col(keyCol), nibbles)),
      path, partitionCols = Seq("shard"), sortCols = Seq(keyCol))

  /** Per-shard manifest of an exported document layout: row count,
    * total characters, and order-insensitive content-fingerprint
    * bounds (min/max of per-row md5).
    */
  def manifest(shards: DataFrame, textCol: String): DataFrame =
    shards.groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"),
        sum(length(col(textCol))).as("total_chars"),
        min(md5(col(textCol))).as("fp_lo"),
        max(md5(col(textCol))).as("fp_hi"))
      .orderBy(col("shard"))

  // -------------------------------------------------------- gate wiring

  /** Round-trips `documents` through a real on-disk shard export,
    * then manifests the READ-BACK shards; the oracle recomputes
    * shard assignment + manifest straight off the original table —
    * export and read-back must lose nothing.
    */
  def shardManifestGate(spark: SparkSession, dir: String): DataFrame = {
    val tmp = graft.RunScratch.dir("shard_export", dir)
    val docs = Tables.documents(spark, dir)
    exportShards(docs, tmp, keyCol = "doc_id")
    manifest(Layout.readBack(spark, tmp,
      docs.withColumn("shard", shardKey(col("doc_id"), 1)).schema), "text")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "shard_manifest" -> (shardManifestGate _)
  )

  val oracles: Map[String, String] = Map(
    "shard_manifest" ->
      """SELECT 's' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) AS shard,
        |       count(*) AS n_docs,
        |       CAST(sum(length(text)) AS BIGINT) AS total_chars,
        |       min(md5(text)) AS fp_lo, max(md5(text)) AS fp_hi
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin
  )
}
