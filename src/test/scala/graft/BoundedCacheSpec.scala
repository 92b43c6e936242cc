package graft

import org.apache.spark.storage.StorageLevel
import graft.index.BoundedCache

/** Memory-accounted LRU artifact cache (reference: sparse cache/ package —
 *  AbstractLruCache eviction order, MemoryUsageManager accounting,
 *  CircuitBreakerManager refusals, CacheGatedPostingsReader read-through). */
class BoundedCacheSpec extends SparkSpec {
  import spark.implicits._

  private def art(n: Int) = (1 to 10).map(i => (i.toLong * n, n)).toDF("id", "n")

  test("hit returns the same persisted instance; miss admits and materializes") {
    val c = new BoundedCache[String](1000L, Some(_ => 10L))
    val a1 = c.get("a")(art(1))
    assert(a1.storageLevel != StorageLevel.NONE, "admitted artifact is persisted")
    val a2 = c.get("a")(sys.error("hit must not rebuild"): org.apache.spark.sql.DataFrame)
    assert(a1 eq a2, "hit returns the cached instance")
    assert(c.stats.toMap == Map("cache_hits" -> 1L, "cache_misses" -> 1L,
      "cache_evictions" -> 0L, "cache_breaker_rejections" -> 0L,
      "cache_ram_bytes_used" -> 10L, "cache_entries" -> 1L))
  }

  test("LRU eviction: least-recent entry unpersists; access refreshes recency") {
    val c = new BoundedCache[String](100L, Some(_ => 40L))
    val a = c.get("a")(art(1))
    val b = c.get("b")(art(2))
    c.get("a")(art(1)) // hit: b becomes LRU
    val d = c.get("d")(art(3)) // 120 > 100: evicts b, not a
    assert(a.storageLevel != StorageLevel.NONE, "recently-used entry survives")
    assert(b.storageLevel == StorageLevel.NONE, "LRU entry is unpersisted")
    assert(d.storageLevel != StorageLevel.NONE)
    // the evicted key still READS correctly — it just recomputes + readmits
    assert(c.get("b")(art(2)).count() == 10L)
    val m = c.stats.toMap
    assert(m("cache_evictions") == 2L, s"b evicted, then a evicted on b's readmission: $m")
    assert(m("cache_ram_bytes_used") == 80L && m("cache_entries") == 2L)
  }

  test("breaker refusal: an artifact over the whole limit is served unpersisted") {
    val c = new BoundedCache[String](100L, Some(ds => 200L))
    val big = c.get("big")(art(1))
    assert(big.storageLevel == StorageLevel.NONE, "refused admission left no blocks")
    assert(big.count() == 10L, "the read still computes from lineage")
    val m = c.stats.toMap
    assert(m("cache_breaker_rejections") == 1L && m("cache_entries") == 0L
      && m("cache_ram_bytes_used") == 0L)
  }

  test("clear unpersists everything; retainKeys drops accounting only") {
    val c = new BoundedCache[String](1000L, Some(_ => 10L))
    val a = c.get("a")(art(1))
    c.clear()
    assert(a.storageLevel == StorageLevel.NONE && c.stats.toMap.apply("cache_entries") == 0L)
    val b = c.get("app1#b")(art(2))
    c.retainKeys(!_.startsWith("app1"))
    assert(b.storageLevel != StorageLevel.NONE,
      "retainKeys (dead-app cleanup) must not touch the blocks")
    assert(c.stats.toMap.apply("cache_entries") == 0L
      && c.stats.toMap.apply("cache_ram_bytes_used") == 0L)
    b.unpersist()
  }

  test("default weigher measures the actual cached bytes of the admission") {
    val c = new BoundedCache[String](Long.MaxValue / 2)
    c.get("m")(art(1))
    val m = c.stats.toMap
    assert(m("cache_ram_bytes_used") > 0L,
      s"measured storage-info delta must see the cached blocks: $m")
    c.clear()
    assert(c.stats.toMap.apply("cache_ram_bytes_used") == 0L)
  }
}
