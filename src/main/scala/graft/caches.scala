package graft

import org.apache.spark.sql.Dataset

/** Registry of the engine's internal persisted relations.
  *
  * A few operators persist an intermediate relation that their plan reads
  * from several branches (the LSH set/signature relation, the simhash
  * fingerprint relation, the ANN sketch relations). The returned plan is
  * lazy, so there is no post-action unpersist point INSIDE an operator —
  * the entry must outlive the call. Every such persist registers here, and
  * a library caller embedding these operators in a long-lived session
  * calls [[unpersistAll]] between jobs — unlike
  * `spark.catalog.clearCache()` this drops ONLY the engine's own entries,
  * never the caller's. The Bench/Verify harnesses call it between queries.
  *
  * Entries are deduplicated by identity: re-invoking an operator re-tracks
  * the same logical plan, but Spark's CacheManager already dedupes by
  * canonicalized plan, so double-unpersist is a no-op rather than an error.
  */
object InternalCaches {
  private val entries = scala.collection.mutable.ArrayBuffer.empty[Dataset[_]]

  /** Persist `ds` at MEMORY_AND_DISK and record it for [[unpersistAll]]. */
  private[graft] def persistTracked[T](ds: Dataset[T]): Dataset[T] =
    synchronized {
      val p = ds.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      entries += p
      p
    }

  /** Drop every engine-internal cache entry registered since the last call.
    * Safe to call at any time — in-flight queries recompute from source.
    */
  def unpersistAll(blocking: Boolean = false): Unit = synchronized {
    entries.foreach(_.unpersist(blocking))
    entries.clear()
  }

  /** Number of live tracked entries (diagnostics / tests). */
  def trackedCount: Int = synchronized(entries.size)
}
