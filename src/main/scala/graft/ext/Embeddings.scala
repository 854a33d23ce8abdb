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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "emb_quantize_int8" -> ((s, d) => quantizeInt8(Tables.embeddings(s, d)))
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
        |FROM c ORDER BY vec_id""".stripMargin
  )
}
