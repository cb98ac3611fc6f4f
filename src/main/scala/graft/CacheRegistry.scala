package graft

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.scheduler.{SparkListener, SparkListenerApplicationEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.storage.StorageLevel

/** Session-scoped registry for shared persisted intermediates (shingle
  * arrays, MinHash signatures, jaccard pairs, normalized embeddings).
  *
  * Several operators derive from the same expensive intermediate; in a
  * one-session run (bench, Verify, a user notebook) building it once and
  * persisting it is the single biggest throughput win. The registry
  * centralizes three things the ad-hoc per-object maps did not:
  *
  *  - ONE persisted frame per (session, key) — no duplicate `.cache()`
  *    of the same plan from two queries ("Asked to cache already cached
  *    data" warnings);
  *  - lifecycle: `clear(session)` unpersists and drops every entry the
  *    session built, and an ApplicationEnd listener calls it
  *    automatically, so a long-lived JVM hosting many sessions does not
  *    accumulate dead storage;
  *  - MEMORY_AND_DISK everywhere: a corpus that outgrows executor memory
  *    spills instead of OOMing.
  */
object CacheRegistry {
  private val entries =
    new ConcurrentHashMap[(SparkSession, String), DataFrame]()
  private val hooked = ConcurrentHashMap.newKeySet[SparkSession]()

  /** The frame for `key`, built and persisted on first request. */
  def cached(s: SparkSession, key: String)(build: => DataFrame): DataFrame =
    entries.computeIfAbsent((s, key), { _ =>
      if (hooked.add(s))
        s.sparkContext.addSparkListener(new SparkListener {
          override def onApplicationEnd(e: SparkListenerApplicationEnd): Unit =
            clear(s)
        })
      build.persist(StorageLevel.MEMORY_AND_DISK)
    })

  /** Unpersist and drop every entry built under `s`. */
  def clear(s: SparkSession): Unit = {
    val it = entries.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      if (e.getKey._1 eq s) {
        e.getValue.unpersist()
        it.remove()
      }
    }
    hooked.remove(s)
  }

  /** Number of live entries for `s` (test hook). */
  private[graft] def liveCount(s: SparkSession): Int = {
    var n = 0
    entries.forEach((k, _) => if (k._1 eq s) n += 1)
    n
  }
}
