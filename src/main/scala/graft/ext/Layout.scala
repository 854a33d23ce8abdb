package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** At-rest layout control for a training-data lake: partitioned,
  * sorted, size-bounded parquet. The reference's at-rest layout is a
  * 2-bucket transactional ORC table (`doc/temp.md:639-648`); at
  * 100 TB the equivalent concerns are
  *
  *  1. **partition pruning** — a query filtering on the partition
  *     column must read only matching directories (the scan shows
  *     `PartitionFilters`, and non-matching partitions are never
  *     listed, let alone opened);
  *  2. **within-file ordering** — sorting within partitions gives
  *     parquet tight min/max column statistics, so row groups that
  *     can't match a predicate are skipped at scan time;
  *  3. **file sizing** — `maxRecordsPerFile` bounds file size from
  *     above (no 10 GB monoliths that defeat task parallelism), and
  *     one `repartition` on the partition columns bounds the file
  *     COUNT from below (without it, every input task writes a file
  *     into every output partition: tasks × partitions small files —
  *     the classic lake-rot failure mode).
  */
object Layout {

  /** Write `df` as a partitioned parquet layout:
    * directory-partitioned by `partitionCols`, rows sorted by
    * `sortCols` within each file, at most `maxRecordsPerFile` rows
    * per file. The `repartition` on the partition columns routes each
    * output partition's rows to one task (one writer per partition ×
    * at-most-maxRecords file splits); `sortWithinPartitions` orders
    * rows inside each task so every written file carries monotone
    * `sortCols` ranges — the layout parquet min/max pruning exploits.
    */
  def writePartitioned(df: DataFrame, path: String,
      partitionCols: Seq[String], sortCols: Seq[String],
      maxRecordsPerFile: Long = 1000000L): Unit =
    df.repartition(partitionCols.map(col): _*)
      .sortWithinPartitions((partitionCols ++ sortCols).map(col): _*)
      .write
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy(partitionCols: _*)
      .mode("overwrite")
      .parquet(path)

  /** Incremental partition refresh: overwrite ONLY the partitions
    * present in `updates` (dynamic partition overwrite), leaving
    * every other partition's files untouched — the daily-refresh
    * primitive of a partitioned lake. Static overwrite would drop
    * the whole table first; append would duplicate; read-modify-
    * write of the full lake to refresh one day is exactly what a
    * 100 TB layout cannot afford. Same sort/size discipline as
    * [[writePartitioned]].
    */
  def upsertPartitions(updates: DataFrame, path: String,
      partitionCols: Seq[String], sortCols: Seq[String],
      maxRecordsPerFile: Long = 1000000L): Unit = {
    val spark = updates.sparkSession
    val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try writePartitioned(updates, path, partitionCols, sortCols, maxRecordsPerFile)
    finally prev match {
      case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
      case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    }
  }

  /** The pruning round-trip surfaced at the gate: lay `documents`
    * out partitioned by `lang` (sorted by `source, doc_id` within
    * partitions), then aggregate ONE language partition. The read
    * plan prunes to the single matching directory (asserted in
    * PlansSpec); the oracle aggregates the same slice off the
    * original un-partitioned table — layout must never change
    * results, only cost.
    */
  def pruneAggregate(spark: SparkSession, dir: String): DataFrame = {
    // fixed per-fixture path + overwrite mode: repeated bench/verify
    // invocations rewrite ONE layout copy instead of leaking a fresh
    // temp directory per call (Bench alone runs this 5× per run)
    val tmp = s"${sys.props("java.io.tmpdir")}/graft_layout_prune_${
      math.abs(dir.hashCode.toLong)}"
    writePartitioned(Tables.documents(spark, dir), tmp,
      partitionCols = Seq("lang"), sortCols = Seq("source", "doc_id"),
      maxRecordsPerFile = 100000L)
    spark.read.parquet(tmp)
      .filter(col("lang") === "en")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(length(col("text"))).as("total_chars"),
        min(col("doc_id")).as("first_doc"))
      .orderBy(col("source"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "layout_prune_agg" -> (pruneAggregate _)
  )

  val oracles: Map[String, String] = Map(
    "layout_prune_agg" ->
      """SELECT source, count(*) AS n_docs,
        |       CAST(sum(length(text)) AS BIGINT) AS total_chars,
        |       min(doc_id) AS first_doc
        |FROM documents WHERE lang = 'en'
        |GROUP BY source ORDER BY source""".stripMargin
  )
}
