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
