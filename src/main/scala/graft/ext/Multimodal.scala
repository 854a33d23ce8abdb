package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Multimodal-column plumbing for a training-data pipeline.
  *
  * Media (image/audio/video) is carried as an opaque `BINARY` payload
  * column plus a typed metadata struct — the layout every large-scale
  * multimodal corpus uses (payload stays a byte blob until a compute
  * stage needs to decode it; metadata is columnar and prunable, so
  * queries that only touch metadata never read payload bytes —
  * parquet column pruning does the 1000× I/O saving at 100 TB).
  *
  * The actual codec step is STUBBED (this container has no image/audio
  * libraries): [[FakeCodec.decode]] is a clearly-marked deterministic
  * fake. Everything around it — schema, batch iteration, partition
  * shape, typed Dataset surface — is real and tested, so swapping the
  * fake for libjpeg/ffmpeg bindings changes one function.
  *
  * Scala equivalent of the pandas-UDF/`mapInPandas` pattern: a typed
  * `Dataset.mapPartitions`, which gives the same whole-partition batch
  * iteration (amortized per-batch setup — exactly what a real decoder
  * needs for codec-context reuse).
  */
object Multimodal {

  /** One media row: payload + typed metadata. */
  final case class MediaRow(
      media_id: Long,
      payload: Array[Byte],
      format: String,
      width: Int,
      height: Int,
      n_frames: Int)

  final case class MediaFeatures(
      media_id: Long,
      format: String,
      byte_len: Long,
      features: Array[Float])

  final case class Frame(
      media_id: Long,
      frame_idx: Int,
      frame_bytes: Array[Byte])

  /** STUB codec — deterministic fake standing in for a real decoder.
    * Replace `decode` with real bindings (libjpeg/ffmpeg) when
    * available; signatures and dataflow stay unchanged.
    */
  object FakeCodec {
    /** "Decode" payload bytes to a feature vector: 8 floats derived
      * from a rolling hash of the bytes. Deterministic, pure.
      */
    def decode(payload: Array[Byte]): Array[Float] = {
      var h = 1125899906842597L
      val acc = new Array[Long](8)
      var i = 0
      while (i < payload.length) {
        h = 31 * h + (payload(i) & 0xff)
        acc(i % 8) ^= h
        i += 1
      }
      acc.map(v => ((v >>> 11).toDouble / (1L << 53).toDouble).toFloat)
    }
  }

  /** Multiplicative-hash stand-in metadata: `(id mod m)·p mod m` with
    * an odd constant `p` (a bijection on Z_m — hash-like variety,
    * overflow-safe, and expressible identically in ANSI SQL so the
    * metadata-math queries are DuckDB-oracle-checkable; xxhash64 has
    * no SQL twin).
    */
  private def mhash(c: org.apache.spark.sql.Column, p: Long, m: Int) =
    pmod(pmod(c, lit(m)) * lit(p), lit(m))

  /** Build a deterministic media table from `documents`: payload =
    * UTF-8 bytes of the text (a stand-in blob), metadata derived
    * columnar-side. In production this is `spark.read.format("binaryFile")`
    * or a parquet corpus with the same schema.
    */
  def mediaTable(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir).select(
      col("doc_id").as("media_id"),
      encode(col("text"), "UTF-8").as("payload"),
      element_at(array(lit("image/png"), lit("audio/wav"), lit("video/mp4")),
        (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("format"),
      (lit(64) + mhash(col("doc_id"), 2654435761L, 1024)).cast("int").as("width"),
      (lit(64) + mhash(col("doc_id"), 2246822519L, 1024)).cast("int").as("height"),
      (lit(1) + mhash(col("doc_id"), 3266489917L, 30)).cast("int").as("n_frames"))

  /** Feature extraction over media payloads: typed mapPartitions —
    * the Scala analogue of `mapInPandas` (whole-partition batches, no
    * per-row codec setup). The decode call is the [[FakeCodec]] stub.
    */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // per-partition codec context would be initialized HERE (once),
      // then reused across the batch — the point of partition batching.
      rows.map { r =>
        MediaFeatures(r.media_id, r.format, r.payload.length.toLong,
          FakeCodec.decode(r.payload))
      }
    }
  }

  final case class ResizedMedia(
      media_id: Long,
      width: Int,
      height: Int,
      payload: Array[Byte])

  /** Resize for image rows: longest side clamped to `maxSide`, aspect
    * preserved (integer math). The pixel resample itself is the STUB
    * (`FakeCodec`-style deterministic fake: payload passed through) —
    * the real implementation swaps ONE line for an imaging library
    * call. Metadata math, typed batch iteration, and partition shape
    * are real.
    */
  def resize(media: Dataset[MediaRow], maxSide: Int = 256): Dataset[ResizedMedia] = {
    import media.sparkSession.implicits._
    media.filter(_.format == "image/png").mapPartitions { rows =>
      // per-partition image codec context would initialize here
      rows.map { r =>
        val long = math.max(r.width, r.height)
        val (w, h) =
          if (long <= maxSide) (r.width, r.height)
          else (r.width * maxSide / long, r.height * maxSide / long)
        // STUB: real code resamples r.payload to (w, h) here
        ResizedMedia(r.media_id, w, h, r.payload)
      }
    }
  }

  /** Frame sampling for video rows: every `stride`-th frame index,
    * payload sliced per frame — pure columnar explode, no UDF.
    */
  def sampleFrames(media: DataFrame, stride: Int = 10): DataFrame =
    media.filter(col("format") === "video/mp4")
      .select(col("media_id"), col("payload"), col("n_frames"),
        explode(sequence(lit(0), col("n_frames") - 1, lit(stride))).as("frame_idx"))
      .select(col("media_id"), col("frame_idx"),
        // fake per-frame byte range: a real demuxer seeks; we slice
        substring(base64(col("payload")), 1, 16).as("frame_token"))

  // ------------------------------------------------------------ queries

  /** Exact media dedup by PAYLOAD BYTES — the multimodal twin of
    * [[Dedup.exact]]: one kept representative (min media_id) per
    * distinct binary content, across formats (a re-encoded mimetype
    * label does not make a new asset; identical bytes do not become
    * distinct by being called audio). Same collision discipline as
    * the text form: the md5 spreads the shuffle key, keeping the
    * payload in the key preserves exactness under hash collisions,
    * and map-side combine collapses duplicates before they shuffle.
    */
  def mediaExactDedup(media: DataFrame): DataFrame =
    media.groupBy(md5(col("payload")).as("payload_md5"), col("payload"))
      .agg(min(col("media_id")).as("keep_media_id"),
        count(lit(1)).as("dup_count"))
      .select(col("keep_media_id"), col("dup_count"),
        octet_length(col("payload")).cast("long").as("n_bytes"))

  /** The fixture's texts are all distinct, so the gate synthesizes
    * duplicate payloads the way the line-dedup gate synthesizes
    * lines: every doc_id ≡ 0 (mod 7) carries the SAME placeholder
    * bytes — the default-thumbnail/missing-asset pattern every real
    * media crawl exhibits — so the dedup measurably bites (one
    * ~1/7-of-corpus group) while the rest stay unique. The DuckDB
    * oracle builds the identical bytes.
    */
  private def dupAnnotatedPayload: org.apache.spark.sql.Column =
    when(col("media_id") % 7 === 0,
      encode(lit("placeholder: asset unavailable"), "UTF-8"))
      .otherwise(col("payload"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm_exact_dedup" -> ((s, d) =>
      mediaExactDedup(mediaTable(s, d)
          .withColumn("payload", dupAnnotatedPayload))
        .orderBy(col("keep_media_id"))),
    // metadata-only plumbing: oracle-checkable (no codec involved)
    "mm_media_meta" -> ((s, d) =>
      mediaTable(s, d)
        .select(col("media_id"), col("format"),
          octet_length(col("payload")).cast("long").as("byte_len"))
        .orderBy(col("media_id"))),
    // full decode path (stub codec) — deterministic, rows-only
    "mm_features" -> ((s, d) => {
      val spark = s
      import spark.implicits._
      extractFeatures(mediaTable(s, d).as[MediaRow])
        .select(col("media_id"), col("format"), col("byte_len"))
        .orderBy(col("media_id"))
    }),
    "mm_frame_sample" -> ((s, d) =>
      sampleFrames(mediaTable(s, d))
        .select(col("media_id"), col("frame_idx").cast("long").as("frame_idx"))
        .orderBy(col("media_id"), col("frame_idx"))),
    "mm_resize" -> ((s, d) => {
      val spark = s
      import spark.implicits._
      resize(mediaTable(s, d).as[MediaRow])
        .select(col("media_id"), col("width").cast("long").as("width"),
          col("height").cast("long").as("height"))
        .orderBy(col("media_id"))
    })
  )

  /** Oracles cover every metadata/plumbing query: byte lengths,
    * format assignment, resize integer math, frame-index explosion —
    * all reproduced in ANSI SQL over `documents` (the [[mhash]]
    * metadata derivation is SQL-expressible by design). `mm_features`
    * runs THROUGH the stub decode but projects the metadata columns,
    * so its output is oracle-checkable too; only the feature VECTOR
    * itself (stub codec, no SQL equivalent) stays untested here — its
    * determinism and shape are asserted in ExtSpec.
    */
  val oracles: Map[String, String] = Map(
    // groups by the payload BYTES themselves (DuckDB encode -> BLOB),
    // ignoring the md5 shuffle spreader entirely
    "mm_exact_dedup" ->
      """WITH m AS (
        |  SELECT doc_id AS media_id,
        |         CASE WHEN doc_id % 7 = 0
        |              THEN encode('placeholder: asset unavailable')
        |              ELSE encode(text) END AS payload
        |  FROM documents)
        |SELECT min(media_id) AS keep_media_id,
        |       count(*) AS dup_count,
        |       CAST(octet_length(payload) AS BIGINT) AS n_bytes
        |FROM m GROUP BY payload ORDER BY keep_media_id""".stripMargin,
    "mm_media_meta" ->
      """SELECT doc_id AS media_id,
        |       CASE doc_id % 3 WHEN 0 THEN 'image/png'
        |                       WHEN 1 THEN 'audio/wav'
        |                       ELSE 'video/mp4' END AS format,
        |       CAST(octet_length(encode(text)) AS BIGINT) AS byte_len
        |FROM documents ORDER BY media_id""".stripMargin,
    "mm_features" ->
      """SELECT doc_id AS media_id,
        |       CASE doc_id % 3 WHEN 0 THEN 'image/png'
        |                       WHEN 1 THEN 'audio/wav'
        |                       ELSE 'video/mp4' END AS format,
        |       CAST(octet_length(encode(text)) AS BIGINT) AS byte_len
        |FROM documents ORDER BY media_id""".stripMargin,
    "mm_resize" ->
      """WITH m AS (
        |  SELECT doc_id AS media_id,
        |         64 + (doc_id % 1024 * 2654435761) % 1024 AS w,
        |         64 + (doc_id % 1024 * 2246822519) % 1024 AS h
        |  FROM documents WHERE doc_id % 3 = 0)
        |SELECT media_id,
        |       CAST(CASE WHEN GREATEST(w, h) <= 256 THEN w
        |                 ELSE w * 256 // GREATEST(w, h) END AS BIGINT) AS width,
        |       CAST(CASE WHEN GREATEST(w, h) <= 256 THEN h
        |                 ELSE h * 256 // GREATEST(w, h) END AS BIGINT) AS height
        |FROM m ORDER BY media_id""".stripMargin,
    "mm_frame_sample" ->
      """WITH m AS (
        |  SELECT doc_id AS media_id,
        |         1 + (doc_id % 30 * 3266489917) % 30 AS n_frames
        |  FROM documents WHERE doc_id % 3 = 2)
        |SELECT media_id,
        |       CAST(unnest(range(0, n_frames, 10)) AS BIGINT) AS frame_idx
        |FROM m ORDER BY media_id, frame_idx""".stripMargin
  )
}
