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
  *    session built. An ApplicationEnd listener calls it as a last
  *    resort, but that fires ONCE, when the shared SparkContext stops —
  *    NOT per session. A long-lived JVM hosting many short-lived
  *    sessions must call `clear(session)` when each session is done,
  *    or the registry holds strong refs to dead sessions and their
  *    persisted frames for the application's lifetime. Weak session
  *    keys are NOT a fix and are deliberately not used: every cached
  *    DataFrame strongly references its owning session
  *    (`df.sparkSession`), so a WeakHashMap's values would pin its
  *    keys and nothing would ever collect — explicit `clear` (or
  *    context stop) IS the session lifecycle contract here;
  *  - MEMORY_AND_DISK everywhere: a corpus that outgrows executor memory
  *    spills instead of OOMing.
  */
object CacheRegistry {
  private val entries =
    new ConcurrentHashMap[(SparkSession, String), DataFrame]()
  private val hooked = ConcurrentHashMap.newKeySet[SparkSession]()

  /** The frame for `key`, built and persisted on first request.
    *
    * The build runs OUTSIDE the map's lock (probe-then-putIfAbsent, not
    * computeIfAbsent): cache builds nest — signatures/jaccard-pairs/
    * simhash all call back into `cached` for the shingle frame — and a
    * nested computeIfAbsent on one ConcurrentHashMap throws
    * IllegalStateException("Recursive update") when the two keys land in
    * the same bin. The putIfAbsent race (two threads building the same
    * frame) is benign ONLY because the loser does NOT unpersist: both
    * builds produce the same canonicalized plan, so CacheManager holds
    * ONE shared cache entry for them — an unpersist here would evict the
    * winner's entry too and silently de-cache the registry's frame. The
    * loser's persist was a no-op on the shared entry, so dropping its
    * local reference leaks nothing. (In practice the driver is
    * single-threaded anyway.) */
  /** Observation hook for tests and lifecycle audits: when non-null,
    * every `cached` call (hit or build) reports its key. Bench's
    * release-plan spec uses it to derive each key's true last consumer
    * from the real query definitions instead of trusting a hand-written
    * list. Process-global by construction — arm it ONLY through
    * [[withAccessHook]], which fails fast on nesting/concurrency so two
    * derivations (or a parallel test suite) can never silently
    * attribute each other's accesses. */
  @volatile private[graft] var onAccess: String => Unit = null

  /** Run `body` with the access hook armed, failing fast if some other
    * derivation already holds it (the hook is process-global: silent
    * sharing would attribute the other caller's `cached` accesses to
    * this one's collector). Always disarms, even on throw. */
  private[graft] def withAccessHook[T](hook: String => Unit)(body: => T): T = {
    synchronized {
      require(onAccess == null,
        "CacheRegistry.onAccess is already armed: access-hook derivations " +
          "must not nest or run concurrently")
      onAccess = hook
    }
    try body finally { onAccess = null }
  }

  def cached(s: SparkSession, key: String)(build: => DataFrame): DataFrame = {
    val cb = onAccess
    if (cb != null) cb(key)
    val k = (s, key)
    val hit = entries.get(k)
    if (hit != null) hit
    else {
      if (hooked.add(s))
        s.sparkContext.addSparkListener(new SparkListener {
          override def onApplicationEnd(e: SparkListenerApplicationEnd): Unit =
            clear(s)
        })
      val built = build.persist(StorageLevel.MEMORY_AND_DISK)
      val prev = entries.putIfAbsent(k, built)
      if (prev == null) built else prev
    }
  }

  /** Unpersist and drop every live entry whose key starts with `prefix`
    * — the scoped-release half of the lifecycle: a long single-session
    * run (Bench) releases each shared frame right after its LAST
    * consumer instead of holding every frame to session end, so the
    * peak resident cache is the frames still ahead of their consumers,
    * not the union of everything ever built. */
  def releaseByPrefix(s: SparkSession, prefix: String): Unit = {
    // match up to the ':' boundary (keys are "<prefix>:<qualifier>"),
    // NOT raw startsWith: a future key extending an existing prefix
    // ("sess-cooc-agg:…" vs "sess-cooc:…") must not be swept up by the
    // shorter prefix's release — the derive/declare spec compares
    // before-':' prefixes, so a raw startsWith here could release a
    // frame the plan never scheduled without any spec failing.
    val p = if (prefix.endsWith(":")) prefix else prefix + ":"
    val it = entries.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      if ((e.getKey._1 eq s) && e.getKey._2.startsWith(p)) {
        safeUnpersist(s, e.getValue)
        it.remove()
      }
    }
  }

  /** Unpersist and drop every entry built under `s`; also drops the
    * session's memoized table resolutions (one teardown entry point —
    * both registries would otherwise pin the dead session). */
  def clear(s: SparkSession): Unit = {
    val it = entries.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      if (e.getKey._1 eq s) {
        safeUnpersist(s, e.getValue)
        it.remove()
      }
    }
    hooked.remove(s)
    Tables.invalidate(s)
  }

  /** Unpersist that cannot crash teardown: the ApplicationEnd listener
    * fires while the context is stopping, where `Dataset.unpersist`
    * throws (observed in the r9 shutdown log) — skip it once the
    * context is gone and swallow the inherently-racy remainder (the
    * blocks die with the context anyway; dropping the map entry is the
    * part that must still happen). */
  private def safeUnpersist(s: SparkSession, df: DataFrame): Unit =
    if (!s.sparkContext.isStopped)
      try df.unpersist() catch { case _: Throwable => () }

  /** Number of live entries for `s` (test hook). */
  private[graft] def liveCount(s: SparkSession): Int = {
    var n = 0
    entries.forEach((k, _) => if (k._1 eq s) n += 1)
    n
  }
}
