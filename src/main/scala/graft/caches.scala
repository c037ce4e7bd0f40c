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
  * The registry is APPEND-ONLY between unpersistAll calls: re-invoking an
  * operator appends another (equivalent-plan) entry. That is deliberate —
  * Spark's CacheManager dedupes cache storage by canonicalized plan, so
  * the duplicate entry costs a registry slot, not a second cache copy,
  * and unpersist is idempotent (an operator that eagerly unpersists an
  * intermediate itself, as dedup_clusters does per round, leaves a stale
  * registry entry whose later unpersist is a no-op).
  */
object InternalCaches {
  private val entries = scala.collection.mutable.ArrayBuffer.empty[Dataset[_]]

  /** Persist `ds` at MEMORY_AND_DISK and record it for [[unpersistAll]].
    *
    * `eager = true` materializes the entry with a scalar count before
    * returning — REQUIRED when the consumer reads the relation from
    * several branches of one stage: an unpopulated cache entry is
    * computed once per branch (k-fold recompute of the whole upstream
    * pipeline), because no branch sees the others' blocks until they are
    * written. Lazy (the default) is right when the first reader is a
    * single-branch action that populates the cache for everyone after.
    */
  private[graft] def persistTracked[T](ds: Dataset[T],
                                       eager: Boolean = false): Dataset[T] = {
    val p = synchronized {
      val q = ds.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      entries += q
      q
    }
    if (eager) p.count(): Unit
    p
  }

  /** [[persistTracked]] with eager materialization, surfacing the
    * materializing count — for iterative drivers whose loop condition is
    * the row count (BFS frontiers, CC convergence): eager + a separate
    * isEmpty/count probe was two Spark jobs per round for one number.
    */
  private[graft] def persistTrackedCounted[T](ds: Dataset[T])
      : (Dataset[T], Long) = {
    val p = persistTracked(ds)
    (p, p.count())
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

  /** Data-adaptive partition count for a corpus-sized cached relation,
    * derived from its SOURCE parquet bytes (an O(1) filesystem listing —
    * no job, no sampling): max(defaultParallelism,
    * ⌈sourceBytes / bytesPerPart⌉).
    *
    * Why this exists (r13, the fourth capacity wall): a corpus-sized
    * cache laid out at `defaultParallelism` partitions makes BOTH of the
    * engine's per-partition resident costs Θ(n/32) — the columnar unroll
    * chunk a cache write holds in storage memory (UNEVICTABLE while
    * unrolling: 32 concurrent ~300 MB unrolls zero out the execution
    * pool, and any same-stage aggregate's first page ask dies — the
    * measured "Unable to acquire 262144 bytes, got 0" signature), and
    * the state of every partial aggregate / hash build co-partitioned
    * with the cache (which shuffle-partition sizing can never reach —
    * measured byte-identical failures at 32 and 256 shuffle
    * partitions). Scaling the CACHE layout with the data bounds both at
    * the source: per-partition chunks stay ~bytesPerPart of input
    * whatever the corpus, exactly the "size partitions to the data"
    * contract a production cluster runs under. Below the threshold the
    * count stays defaultParallelism, so toy-scale plans (and every
    * committed sf≤10 bench map) are bit-identical.
    *
    * `bytesPerPart` is per-call-site: it encodes that site's
    * input→cached expansion (a KB-per-row shingle+signature relation
    * inflates its parquet ~20×; a narrow edge projection deflates its
    * fact table). Callers pass the calibrated constant and cite the
    * measurement.
    */
  private[graft] def adaptiveParts(s: org.apache.spark.sql.SparkSession,
                                   path: String, bytesPerPart: Long): Int = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    val bytes = fs.getContentSummary(p).getLength
    math.max(s.sparkContext.defaultParallelism,
      math.ceil(bytes.toDouble / bytesPerPart).toInt)
  }
}
