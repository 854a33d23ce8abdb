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

  /** STUB perceptual hash — the dHash shape (gradient bits over a
    * decoded luma grid) with the decode step faked, exactly like
    * [[FakeCodec.decode]]: real dHash resamples the decoded image to a
    * 9×8 grid and emits one bit per horizontal luma gradient; the stub
    * derives 65 "luma" values with a BLOCK-LOCAL hash (each value
    * depends only on its own contiguous byte range), so the defining
    * perceptual-hash property — a localized content change flips only
    * the adjacent gradient bits — holds by construction: editing bytes
    * inside block j changes luma(j) only, hence at most bits j−1 and
    * j. A real decoder swaps [[gridLuma]] for pixel resampling; the
    * signature and every consumer stay unchanged.
    */
  object FakePHash {
    val GridCells = 65

    /** Block-local "luma": FNV-1a over each of the 65 contiguous byte
      * ranges `[j·len/65, (j+1)·len/65)`. Empty ranges (payload
      * shorter than 65 bytes) hash to the FNV offset constant.
      */
    def gridLuma(payload: Array[Byte]): Array[Long] = {
      val luma = new Array[Long](GridCells)
      val len = payload.length
      var j = 0
      while (j < GridCells) {
        val from = (j.toLong * len / GridCells).toInt
        val until = ((j + 1).toLong * len / GridCells).toInt
        var h = 0xcbf29ce484222325L
        var i = from
        while (i < until) {
          h = (h ^ (payload(i) & 0xff)) * 0x100000001b3L
          i += 1
        }
        luma(j) = h
        j += 1
      }
      luma
    }

    /** 64 gradient bits: bit b set iff luma(b) < luma(b+1) unsigned. */
    def dhash64(payload: Array[Byte]): Long = {
      val luma = gridLuma(payload)
      var bits = 0L
      var b = 0
      while (b < 64) {
        if (java.lang.Long.compareUnsigned(luma(b), luma(b + 1)) < 0)
          bits |= 1L << b
        b += 1
      }
      bits
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

  final case class MediaHash(media_id: Long, phash: Long)

  /** Per-asset perceptual hash through the stub codec path: typed
    * mapPartitions like [[extractFeatures]] (whole-partition batches —
    * where a real decoder amortizes codec-context setup). One narrow
    * (media_id, phash) row per asset.
    */
  def perceptualHash(media: Dataset[MediaRow]): Dataset[MediaHash] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // per-partition codec context would initialize here (once)
      rows.map(r => MediaHash(r.media_id, FakePHash.dhash64(r.payload)))
    }
  }

  /** Perceptual NEAR-dup pairs — the multimodal twin of
    * [[Dedup.simhashPairs]], catching what [[mediaExactDedup]] cannot:
    * re-encoded/resized assets whose BYTES differ but whose decoded
    * content is near-identical. Per-asset [[FakePHash.dhash64]]
    * through the codec path, then the shared quarter-blocked Hamming
    * join ([[Dedup.hammingBlockedPairs]]): exact for maxHamming < 4 by
    * pigeonhole, banded — never all-pairs, so the pair derivation is
    * O(bucket²) on 16-bit-quarter buckets, not O(corpus²). At 100 TB
    * the phash scan reads payloads once (codec-batch mapPartitions)
    * and everything after is a 16-byte-row equi-join.
    */
  def mediaNearDupPairs(media: Dataset[MediaRow],
      maxHamming: Int = 3): DataFrame =
    Dedup.hammingBlockedPairs(perceptualHash(media).toDF(),
        "media_id", "phash", maxHamming)
      .withColumnRenamed("media_id_a", "media_a")
      .withColumnRenamed("media_id_b", "media_b")

  /** Canonical asset selection over the perceptual near-dup graph —
    * the multimodal twin of entity canonicalization
    * ([[graft.queries.ExtraQueries]]'s ER gate): near-dup pairs
    * cluster via the gated [[Dedup.connectedComponents]] (transitive:
    * A≈B≈C is one family even when A and C sit beyond the radius),
    * and every family member maps to its min-id canonical — the
    * dedup verdict a training pipeline applies to re-encoded asset
    * families. Inherits the components machinery's scale shape
    * (16-byte edges, adaptive pointer-jumping).
    */
  def mediaCanonicalAssets(media: Dataset[MediaRow],
      maxHamming: Int = 3): DataFrame =
    Dedup.connectedComponents(
        mediaNearDupPairs(media, maxHamming), "media_a", "media_b")
      .select(col("node").as("media_id"), col("component").as("canonical_id"))
      .orderBy(col("media_id"))

  /** The fixture's payloads are all-distinct bytes, so the near-dup
    * gate synthesizes RE-ENCODED variants the way [[mm_exact_dedup]]
    * synthesizes placeholder duplicates: every media_id ≡ 0 (mod 9)
    * gains a twin asset (id + 1,000,000) whose payload differs by ONE
    * byte (position and flip deterministic in media_id) — the
    * re-encode/metadata-touch pattern a real crawl exhibits. A one-
    * byte edit lands in one luma block, so the twin's dhash differs
    * in ≤ 2 bits: inside the Hamming-3 radius while unrelated assets
    * sit ~32 bits apart.
    */
  def withReencodedVariants(media: Dataset[MediaRow], every: Long = 9L,
      idOffset: Long = 1000000L): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    val variants = media.filter(_.media_id % every == 0L).map { r =>
      val p = r.payload.clone()
      if (p.nonEmpty) {
        val i = java.lang.Math.floorMod(r.media_id * 37L, p.length.toLong).toInt
        p(i) = (p(i) ^ 0x5a).toByte
      }
      r.copy(media_id = r.media_id + idOffset, payload = p)
    }
    media.union(variants)
  }

  /** The near-dup gate's input: the media table plus re-encoded
    * variants (shared by the gate query AND the `mm_phash` aux dump,
    * so the oracle re-derives pairs from the query's own signatures).
    */
  def nearDupFixture(spark: SparkSession, dir: String): Dataset[MediaRow] = {
    import spark.implicits._
    withReencodedVariants(mediaTable(spark, dir).as[MediaRow])
  }

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
    }),
    "mm_near_dedup" -> ((s, d) =>
      mediaNearDupPairs(nearDupFixture(s, d))
        .select(col("media_a"), col("media_b"),
          col("hamming").cast("int").as("hamming"))
        .orderBy(col("media_a"), col("media_b"))),
    "mm_canonical_assets" -> ((s, d) =>
      mediaCanonicalAssets(nearDupFixture(s, d)))
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
    // Re-derives the near-dup pair set ALL-PAIRS from the Verify-
    // materialized per-asset hashes (`.aux/mm_phash` — the same
    // perceptualHash output the gate query consumes, the minhash/
    // simhash aux split): an exhaustive bit_count(xor) join that also
    // proves the engine's quarter-banding lost nothing (pigeonhole
    // exactness checked, not assumed). The dhash computation itself
    // is property-tested in ExtSpec (block-locality: a one-byte edit
    // flips ≤ 2 bits).
    "mm_near_dedup" ->
      """WITH ph AS (
        |  SELECT * FROM read_parquet('__OUTDIR__/.aux/mm_phash/*.parquet'))
        |SELECT a.media_id AS media_a, b.media_id AS media_b,
        |       CAST(bit_count(xor(a.phash, b.phash)) AS INT) AS hamming
        |FROM ph a JOIN ph b ON a.media_id < b.media_id
        |WHERE bit_count(xor(a.phash, b.phash)) <= 3
        |ORDER BY media_a, media_b""".stripMargin,
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
    // the same aux hashes closed transitively: recursive min-label
    // closure over the all-pairs edge set (the dedup_components
    // oracle discipline)
    "mm_canonical_assets" ->
      """WITH RECURSIVE ph AS (
        |  SELECT * FROM read_parquet('__OUTDIR__/.aux/mm_phash/*.parquet')),
        |pairs AS (
        |  SELECT a.media_id AS u, b.media_id AS v
        |  FROM ph a JOIN ph b ON a.media_id < b.media_id
        |  WHERE bit_count(xor(a.phash, b.phash)) <= 3),
        |edges AS (SELECT u, v FROM pairs UNION ALL SELECT v, u FROM pairs),
        |reach(a, b) AS (
        |  SELECT u, v FROM edges
        |  UNION
        |  SELECT r.a, e.v FROM reach r JOIN edges e ON r.b = e.u WHERE e.v != r.a)
        |SELECT a AS media_id, least(a, min(b)) AS canonical_id
        |FROM reach GROUP BY a ORDER BY media_id""".stripMargin,
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
