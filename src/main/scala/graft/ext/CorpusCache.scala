package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Run-scoped registry for persisted corpus frames — the cache
  * lifecycle contract for the dedup/similarity operators.
  *
  * Those operators persist a featurized corpus (shingle hashes,
  * normalized vectors) because one call makes several passes over it
  * (quantizer seed collect, Lloyd updates, radii, both join sides) —
  * and Spark's CacheManager keys entries by LOGICAL PLAN, so repeated
  * calls over the same corpus share one entry (measured: eager
  * checkpoint-and-unpersist per call costs 7×; a warm bench pass
  * depends on exactly this sharing). What that design left open was
  * the release: a long-lived session sweeping many distinct corpora
  * accumulated one MEMORY_AND_DISK entry per corpus.
  *
  * Every such persist now registers here, and run entry points
  * (Verify, Bench, ScaleRehearsal, test suites) call [[releaseAll]]
  * at their run boundary — intra-run sharing is preserved, nothing
  * outlives the run. Library users embedding these operators own the
  * same handle: call [[releaseAll]] whenever a corpus sweep ends
  * (idempotent; unpersist on an already-released frame is a no-op).
  */
object CorpusCache {
  private val tracked = scala.collection.mutable.ArrayBuffer.empty[DataFrame]

  /** Persist `df` at MEMORY_AND_DISK and track it for release.
    * Idempotent per logical plan: CacheManager keys by plan, so a
    * frame whose plan is already cached (a second operator sharing
    * the same featurized corpus) is neither re-persisted (silences
    * the "already cached" warning) nor double-tracked.
    */
  def cache(df: DataFrame): DataFrame = synchronized {
    if (df.storageLevel == StorageLevel.NONE) {
      df.persist(StorageLevel.MEMORY_AND_DISK)
      tracked += df
    }
    df
  }

  /** Unpersist every tracked frame; returns how many were released. */
  def releaseAll(blocking: Boolean = false): Int = synchronized {
    val n = tracked.size
    tracked.foreach(_.unpersist(blocking))
    tracked.clear()
    n
  }

  /** Tracked frames still holding a storage level (for tests). */
  def lingering: Seq[DataFrame] = synchronized {
    tracked.filter(_.storageLevel != StorageLevel.NONE).toSeq
  }
}
