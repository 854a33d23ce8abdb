package graft.ops

import java.util.concurrent.{ConcurrentHashMap, TimeUnit}

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** Zero-cost pipeline observability via `Dataset.observe`: named
  * metric expressions (counts, sums, invariant violations) evaluate
  * INSIDE the job — an accumulator piggybacking on the existing pass,
  * not an extra action — and surface through the
  * `QueryExecutionListener` when the job finishes.
  *
  * The operational shape every production pipeline needs: row-count
  * reconciliation (rows in vs rows out), quality counters (nulls,
  * range violations) and freshness bounds recorded per run without
  * re-scanning anything. At 100 TB a separate audit `count()` is a
  * full extra job; an observation is free.
  */
object Observe {

  /** Run `action` on `df` instrumented with observation `name` over
    * `metrics`; returns the action's result and the observed metric
    * row (None if the listener saw no successful execution within
    * `timeoutMs` — listener delivery is asynchronous).
    */
  def withMetrics[T](df: DataFrame, name: String, metrics: Seq[Column],
      timeoutMs: Long = 10000L)(action: DataFrame => T): (T, Option[Row]) = {
    val spark = df.sparkSession
    val seen = new ConcurrentHashMap[String, Row]()
    val listener = new QueryExecutionListener {
      override def onSuccess(funcName: String, qe: QueryExecution,
          durationNs: Long): Unit =
        qe.observedMetrics.get(name).foreach(seen.put(name, _))
      override def onFailure(funcName: String, qe: QueryExecution,
          exception: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      val result = action(df.observe(name, metrics.head, metrics.tail: _*))
      // listener delivery is async: poll with a deadline
      val deadline = System.nanoTime() + TimeUnit.MILLISECONDS.toNanos(timeoutMs)
      while (!seen.containsKey(name) && System.nanoTime() < deadline) {
        Thread.sleep(20L)
      }
      (result, Option(seen.get(name)))
    } finally spark.listenerManager.unregister(listener)
  }
}
