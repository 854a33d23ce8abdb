package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Embedding-column utilities beyond similarity search: per-vector
  * int8 scalar quantization — the storage/bandwidth lever every
  * 100 TB vector corpus pulls (4 B float32 → 1 B code, 4× smaller
  * shuffles and scans for candidate generation; exact re-rank reads
  * the float column for survivors only, cf. the PQ path in
  * [[Similarity]]).
  *
  * Codes are `least(255, floor((x − min) · 255 / (max − min)))` per
  * vector (min–max symmetric with the DuckDB oracle: both engines
  * evaluate the same double expression on the same float32-widened
  * inputs, so codes match bit-for-bit; the `least` guards the
  * `x = max` case where `(a·255)/a` can land an ulp above 255).
  *
  * Everything is higher-order array functions inside one narrow
  * projection — no shuffle, no UDF; at scale this runs at scan
  * speed alongside ingest.
  */
object Embeddings {

  /** Per-vector int8 codes + integer summary (n_dims, code sum/min/
    * max). The summary keeps the gate result compact while pinning
    * every code: a single flipped code moves `code_sum`.
    */
  def quantizeInt8(emb: DataFrame): DataFrame = {
    val v = col("embedding").cast("array<double>")
    emb
      .select(col("vec_id"), v.as("v"),
        array_min(v).as("mn"), array_max(v).as("mx"))
      .select(col("vec_id"),
        transform(col("v"), x =>
          when(col("mx") > col("mn"),
            least(lit(255L),
              floor((x - col("mn")) * lit(255.0) / (col("mx") - col("mn")))
                .cast("long")))
            .otherwise(lit(0L))).as("codes"))
      .select(col("vec_id"),
        size(col("codes")).as("n_dims"),
        aggregate(col("codes"), lit(0L), (acc, c) => acc + c).as("code_sum"),
        array_min(col("codes")).as("code_min"),
        array_max(col("codes")).as("code_max"))
      .orderBy(col("vec_id"))
  }

  /** Per-vector statistics through the full higher-order-function
    * surface — `transform` (square), `aggregate` (fold-sum),
    * `filter` (positive count), `array_max` — everything a narrow
    * codegen projection (the other way to express these, exploding
    * 60k×dim element rows and re-grouping, would shuffle the whole
    * corpus for per-row arithmetic). Doubles are pinned by
    * floor-scaling to integers at 1e6 (same both engines: the fold
    * order over the list is left-to-right in Spark's `aggregate` and
    * DuckDB's `list_sum`, so the bits agree — the same contract the
    * cosine oracles already rely on).
    */
  def vectorStats(emb: DataFrame): DataFrame = {
    val v = col("embedding").cast("array<double>")
    emb
      .select(col("vec_id"), v.as("v"))
      .select(col("vec_id"),
        size(col("v")).as("n_dims"),
        floor(aggregate(transform(col("v"), x => x * x), lit(0.0),
          (acc, x) => acc + x) * lit(1000000.0) + lit(0.5))
          .cast("long").as("norm2_x1e6"),
        size(filter(col("v"), x => x > 0)).as("n_pos"),
        floor(array_max(col("v")) * lit(1000000.0) + lit(0.5))
          .cast("long").as("max_x1e6"))
      .orderBy(col("vec_id"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "emb_quantize_int8" -> ((s, d) => quantizeInt8(Tables.embeddings(s, d))),
    "emb_vector_stats" -> ((s, d) => vectorStats(Tables.embeddings(s, d)))
  )

  val oracles: Map[String, String] = Map(
    "emb_quantize_int8" ->
      """WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
        |           FROM embeddings),
        |m AS (SELECT vec_id, v, list_min(v) AS mn, list_max(v) AS mx FROM v),
        |c AS (SELECT vec_id,
        |        [CASE WHEN mx > mn
        |              THEN least(255, CAST(floor((x - mn) * 255.0 / (mx - mn)) AS BIGINT))
        |              ELSE 0 END FOR x IN v] AS codes
        |      FROM m)
        |SELECT vec_id,
        |       CAST(len(codes) AS INTEGER) AS n_dims,
        |       CAST(list_aggregate(codes, 'sum') AS BIGINT) AS code_sum,
        |       CAST(list_aggregate(codes, 'min') AS BIGINT) AS code_min,
        |       CAST(list_aggregate(codes, 'max') AS BIGINT) AS code_max
        |FROM c ORDER BY vec_id""".stripMargin,
    "emb_vector_stats" ->
      """WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
        |           FROM embeddings)
        |SELECT vec_id,
        |       CAST(len(v) AS INTEGER) AS n_dims,
        |       CAST(floor(list_sum([x * x FOR x IN v]) * 1000000.0 + 0.5)
        |            AS BIGINT) AS norm2_x1e6,
        |       CAST(len(list_filter(v, x -> x > 0)) AS INTEGER) AS n_pos,
        |       CAST(floor(list_max(v) * 1000000.0 + 0.5) AS BIGINT) AS max_x1e6
        |FROM v ORDER BY vec_id""".stripMargin
  )
}
