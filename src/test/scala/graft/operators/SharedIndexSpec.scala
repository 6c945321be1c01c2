package graft.operators

import org.apache.spark.storage.StorageLevel

/** Pins the session index cache's memory contract: bounded LRU where
  * eviction really unpersists (no cached-block leak however many input
  * dirs a long-lived service cycles through) and access refreshes
  * recency. In the same package because SharedIndex is
  * private[operators] by design.
  */
class SharedIndexSpec extends graft.SparkSpec {

  test("LRU eviction unpersists the oldest entry and access refreshes recency") {
    val dir = "/tmp/shared-index-spec"
    // start from a known-empty cache for this (shared) session; other
    // suites' indexes rebuild lazily on their next access
    SharedIndex.invalidate(spark)

    val e0 = SharedIndex(spark, dir, "e0") { spark.range(0, 1).toDF("v") }
    val e1 = SharedIndex(spark, dir, "e1") { spark.range(1, 2).toDF("v") }
    assert(e0.storageLevel != StorageLevel.NONE)
    // touch e0: it must now be more recent than e1
    val e0Again = SharedIndex(spark, dir, "e0") {
      fail("e0 must come from the cache, not rebuild")
    }
    assert(e0Again eq e0)

    // fill to one past capacity: exactly one eviction, and it must be
    // e1 (the least recently used), not the refreshed e0
    // distinct plans per entry: identical plans would share one
    // CacheManager slot and a single unpersist would clear them all
    (2 to 32).foreach { i =>
      SharedIndex(spark, dir, s"e$i") { spark.range(i, i + 1L).toDF("v") }
    }
    assert(e1.storageLevel == StorageLevel.NONE, "evicted entry must be unpersisted")
    assert(e0.storageLevel != StorageLevel.NONE, "refreshed entry must survive")

    // rebuilding an evicted entry works (fresh persist, new frame)
    val e1Rebuilt = SharedIndex(spark, dir, "e1") { spark.range(1, 2).toDF("v") }
    assert(e1Rebuilt.storageLevel != StorageLevel.NONE)

    // drop this test's junk so later suites start from a clean cache
    SharedIndex.invalidate(spark)
  }
}
