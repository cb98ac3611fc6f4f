package graft

import org.apache.spark.storage.StorageLevel

class CacheRegistrySpec extends SparkTestBase {

  test("cached: one persisted frame per key, builder runs once") {
    var builds = 0
    val a = CacheRegistry.cached(spark, "spec:a") {
      builds += 1; spark.range(10).toDF()
    }
    val b = CacheRegistry.cached(spark, "spec:a") {
      builds += 1; spark.range(99).toDF()
    }
    assert(a eq b)
    assert(builds == 1)
    assert(a.storageLevel == StorageLevel.MEMORY_AND_DISK)
    CacheRegistry.clear(spark)
  }

  test("cached: nested builds (dependent caches) are safe") {
    // signatures/jaccard-pairs/simhash all call cached() for the shingle
    // frame from INSIDE their own build thunk; computeIfAbsent on one
    // shared map threw IllegalStateException("Recursive update") when the
    // two keys collided in a bin. Drive many nested pairs so a collision
    // is overwhelmingly likely under the old scheme; assert both frames
    // land and builders ran once each.
    var innerBuilds = 0
    (0 until 64).foreach { i =>
      val outer = CacheRegistry.cached(spark, s"spec:outer:$i") {
        val inner = CacheRegistry.cached(spark, s"spec:inner:$i") {
          innerBuilds += 1; spark.range(3).toDF()
        }
        inner.select(inner.col("id") * 2 as "id")
      }
      assert(outer.count() == 3)
    }
    assert(innerBuilds == 64)
    assert(CacheRegistry.liveCount(spark) == 128)
    CacheRegistry.clear(spark)
    assert(CacheRegistry.liveCount(spark) == 0)
  }

  test("clear unpersists and drops all session entries") {
    val a = CacheRegistry.cached(spark, "spec:x") { spark.range(5).toDF() }
    CacheRegistry.cached(spark, "spec:y") { spark.range(6).toDF() }
    a.count()
    assert(CacheRegistry.liveCount(spark) >= 2)
    CacheRegistry.clear(spark)
    assert(CacheRegistry.liveCount(spark) == 0)
    assert(a.storageLevel == StorageLevel.NONE)
  }
}
