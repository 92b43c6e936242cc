package graft.index

import org.apache.spark.sql.Dataset

/**
 * Memory-accounted LRU over persisted session artifacts — the Spark analogue
 * of the reference's sparse-index cache tier:
 *  - cache/AbstractLruCache.java — an access-recency map with
 *    `evict(ramBytesToRelease)` looping least-recent-first until enough
 *    bytes are freed or the cache is empty;
 *  - cache/MemoryUsageManager.java + cache/RamBytesRecorder.java — byte
 *    accounting against a fixed limit, recorded once at admission so the
 *    release always matches what was charged;
 *  - cache/CircuitBreakerManager.java — admission asks the breaker and
 *    returns FALSE instead of throwing when the charge would trip it;
 *  - cache/CacheGatedPostingsReader.java — the two-tier read: cache first,
 *    underlying storage on miss, populate after; a refused admission still
 *    serves the read from storage.
 *
 * Spark-side the "cache" is `persist()` and the "storage" is the artifact's
 * lineage: an evicted entry unpersists (its blocks are dropped, the plan
 * stays valid), and a breaker-refused admission returns the UNPERSISTED
 * Dataset — every read still succeeds, it just recomputes from source,
 * exactly the gated reader's fallback. This bound matters at scale: the
 * per-field / semantic-chunk artifacts this guards are each a meaningful
 * fraction of executor storage memory, and an unbounded cache map defers to
 * Spark's own storage-memory eviction, which drops the wrong BLOCKS
 * (per-partition, no artifact-level recency) instead of whole cold
 * artifacts. The LRU decision has to live at the layer that knows the
 * artifact boundaries and their access order.
 *
 * Accounting follows the reference's Accountable pattern — bytes are
 * recorded once at admission so release always matches the charge
 * (RamBytesRecorder's contract). The charge is MEASURED, not estimated:
 * the artifact materializes first and its actual cached block bytes (the
 * storage-info delta across the persist) are weighed, like ramBytesUsed on
 * a built structure. An artifact that alone exceeds the limit is
 * un-persisted again and counted as a breaker rejection — the same
 * discover-mid-write-and-release path the reference's cacheable writers
 * take when the breaker trips partway through. (A plan-statistics estimate
 * would be cheaper but degrades to Long.MaxValue whenever any operator in
 * the artifact's plan cannot be estimated, which would silently reject
 * every admission.) Tests and deterministic entries pass an explicit
 * weigher. All operations are synchronized; the artifact count is
 * session-scale (tens), never data-scale.
 */
class BoundedCache[K](val limitBytes: Long,
                      weigher: Option[Dataset[_] => Long] = None) {
  require(limitBytes > 0, "limitBytes must be positive")

  private case class Entry(ds: Dataset[_], bytes: Long)
  // accessOrder=true: iteration is least-recently-used first, the same
  // recency order AbstractLruCache keeps in its ConcurrentLinkedHashMap
  private val entries = new java.util.LinkedHashMap[K, Entry](16, 0.75f, true)
  private var usedBytes = 0L
  private var hitN, missN, evictN, rejectN = 0L

  /** Two-tier read (CacheGatedPostingsReader): cached Dataset on hit;
   *  on miss, `build` runs and the result is admitted if the breaker
   *  allows — evicting least-recent entries first — else returned
   *  unpersisted (the read-from-storage fallback). */
  def get[T](key: K)(build: => Dataset[T]): Dataset[T] = synchronized {
    val hit = entries.get(key)
    if (hit != null) { hitN += 1; hit.ds.asInstanceOf[Dataset[T]] }
    else {
      missN += 1
      val ds = build
      val sc = ds.sparkSession.sparkContext
      val before = sc.getRDDStorageInfo.map(_.id).toSet
      val p = ds.persist()
      p.count()
      val bytes = weigher match {
        case Some(w) => math.max(w(p), 0L)
        case None => sc.getRDDStorageInfo.filterNot(r => before(r.id))
          .map(r => r.memSize + r.diskSize).sum
      }
      if (bytes > limitBytes) {
        // even an empty cache cannot hold it: the breaker refuses
        // (CircuitBreakerManager.addMemoryUsage -> false), the blocks are
        // released again, and the caller reads through to the lineage
        rejectN += 1
        scala.util.Try(p.unpersist())
        ds
      } else {
        evict(bytes - (limitBytes - usedBytes))
        entries.put(key, Entry(p, bytes))
        usedBytes += bytes
        p
      }
    }
  }

  /** Evict least-recently-used entries until at least `ramBytesToRelease`
   *  bytes are freed or the cache is empty (AbstractLruCache.evict). Evicted
   *  artifacts unpersist; a dead SparkContext (session cycling) only needs
   *  the accounting dropped, so unpersist failures are swallowed. */
  def evict(ramBytesToRelease: Long): Long = synchronized {
    var released = 0L
    val it = entries.entrySet().iterator()
    while (released < ramBytesToRelease && it.hasNext) {
      val e = it.next()
      scala.util.Try(e.getValue.ds.unpersist())
      released += e.getValue.bytes
      usedBytes -= e.getValue.bytes
      evictN += 1
      it.remove()
    }
    released
  }

  /** Drop everything — the clear-cache action
   *  (rest/RestNeuralSparseClearCacheHandler.java's transport chain). */
  def clear(): Unit = synchronized { evict(Long.MaxValue) }

  /** Drop entries whose key fails the predicate WITHOUT unpersisting —
   *  for artifacts bound to an already-stopped SparkContext, whose blocks
   *  died with it (IndexCache.evictOthers semantics). */
  def retainKeys(keep: K => Boolean): Unit = synchronized {
    val it = entries.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      if (!keep(e.getKey)) { usedBytes -= e.getValue.bytes; it.remove() }
    }
  }

  /** (stat_name, value) rows — the cache slice of the reference's stats
   *  surface (cache/MemMonitoredCache + stats managers). */
  def stats: Seq[(String, Long)] = synchronized {
    Seq(
      "cache_hits" -> hitN,
      "cache_misses" -> missN,
      "cache_evictions" -> evictN,
      "cache_breaker_rejections" -> rejectN,
      "cache_ram_bytes_used" -> usedBytes,
      "cache_entries" -> entries.size().toLong)
  }
}

