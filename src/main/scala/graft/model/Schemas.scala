package graft.model

import org.apache.spark.sql.types._

/** Typed models + schemas for the engine's data surface.
  *
  * `Order` mirrors the reference's one fact table `user_behavior`
  * (reference: `doc/temp.md:293-312`, generator
  * `code/project/entryTask/src/main/entryTask/__init__.py:6-25`):
  * seven primitive columns, JSON on the wire, schema-on-read.
  *
  * The driver fixture tables (TPC-H-ish star schema + `events` +
  * `documents`/`embeddings`, see TESTDATA.md) are read straight from
  * parquet footers — we only declare case classes where a typed
  * `Dataset[T]` surface is useful.
  */
object Schemas {

  /** The reference's `user_behavior` event (`doc/temp.md:294-300`). */
  final case class Order(
      order_id: Long,
      user_id: Long,
      order_tz: String,
      amount: Long,
      currency: String,
      channel_id: Long,
      order_time: Long // epoch SECONDS (`__init__.py:21`)
  )

  /** Explicit schema for schema-on-read JSON parsing (`from_json`),
    * matching the Flink DDL (`doc/temp.md:293-300`). Declared rather
    * than inferred: at 100 TB, schema inference is a full extra scan.
    */
  val orderSchema: StructType = StructType(Seq(
    StructField("order_id", LongType, nullable = false),
    StructField("user_id", LongType, nullable = false),
    StructField("order_tz", StringType, nullable = false),
    StructField("amount", LongType, nullable = false),
    StructField("currency", StringType, nullable = false),
    StructField("channel_id", LongType, nullable = false),
    StructField("order_time", LongType, nullable = false)
  ))

  /** Driver fixture `events` table — our streaming-replay stand-in for
    * the Kafka order stream (FIXTURES.md §B).
    */
  final case class Event(
      event_id: Long,
      ts: java.sql.Timestamp,
      user_id: Long,
      event_type: String,
      value: Double,
      props: String
  )

  val eventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)
  ))

  /** `props` JSON payload schema (`{"k": <int>}`), for `from_json`. */
  val propsSchema: StructType = StructType(Seq(
    StructField("k", LongType)
  ))

  final case class Document(
      doc_id: Long,
      text: String,
      lang: String,
      source: String,
      n_chars: Long
  )

  final case class Embedding(
      vec_id: Long,
      embedding: Array[Float],
      label: Int
  )
}
