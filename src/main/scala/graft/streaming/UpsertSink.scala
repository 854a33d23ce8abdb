package graft.streaming

import java.util.concurrent.ConcurrentHashMap

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery}

/** Streaming upsert sink — the reference's Flink→MySQL
  * `PRIMARY KEY ... NOT ENFORCED` upsert surface
  * (`doc/temp.md:317-371`) rebuilt as `foreachBatch` (SURVEY.md §7.4:
  * Spark has no native JDBC upsert).
  *
  * `foreachBatch` gives the producer side: a micro-batch DataFrame +
  * monotonically increasing `epochId`. Idempotence contract: a key's
  * row is REPLACED (last write wins per key), and a replayed epoch
  * (failure recovery re-runs the last batch) applies the same
  * key→row pairs again — a no-op. That is exactly-once *effective*
  * semantics over an at-least-once channel, the same contract the
  * MySQL PK gives the reference.
  *
  * '''TEST DOUBLE — not a production sink and not on any gate
  * path.''' The store is an in-JVM map with a driver-side
  * `collect()`, which only StreamingSpec uses to make upsert
  * semantics observable synchronously. Every gate replay and any
  * real deployment goes through [[JdbcUpsertSink]] — the
  * executor-side `foreachPartition` prepared-statement path with the
  * same epoch-idempotence contract and none of the driver collect.
  */
final class UpsertSink(keyCols: Seq[String]) extends Serializable {

  private val store = new ConcurrentHashMap[Seq[Any], Row]()
  @volatile private var lastEpoch: Long = -1L
  @volatile private var rowSchema: org.apache.spark.sql.types.StructType = _

  def apply(df: DataFrame, epochId: Long): Unit = {
    rowSchema = df.schema
    // collect() is safe here BY DESIGN: an update-mode micro-batch
    // carries only changed aggregate keys (small by construction),
    // never raw events. A JDBC sink would instead df.foreachPartition
    // and batch-execute upserts executor-side.
    val rows = df.collect()
    rows.foreach { r =>
      val key = keyCols.map(c => r.getAs[Any](c))
      store.put(key, r)
    }
    lastEpoch = epochId
  }

  /** Attach this sink to a streaming result. */
  def writeTo(writer: DataStreamWriter[Row]): StreamingQuery =
    writer.foreachBatch((df: DataFrame, epoch: Long) => apply(df, epoch)).start()

  def snapshot: Map[Seq[Any], Row] = store.asScala.toMap
  def size: Int = store.size()
  def epoch: Long = lastEpoch

  /** Materialize the sink's final state as a DataFrame (the "query
    * the MySQL table" step of the reference's verification flow).
    * A stream that produced no micro-batch yields an empty frame,
    * not an NPE.
    */
  def toDF(spark: org.apache.spark.sql.SparkSession): DataFrame =
    if (rowSchema == null) spark.emptyDataFrame
    else spark.createDataFrame(store.values().asScala.toSeq.asJava, rowSchema)
}
