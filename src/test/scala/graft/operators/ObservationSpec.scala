package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Pins [[Stores.awaitObserved]]'s two paths and the r19-advice leak
  * closure: Spark 4 tracks registered observations in a per-session
  * ObservationManager map (one shared listener, not a listener per
  * observation), so a metrics row that never arrives used to pin its
  * map entry for the session's lifetime — one dead entry per store
  * write on a Spark build that stopped observing write commands. The
  * timeout path now drops the entry through
  * [[org.apache.spark.sql.graft.Bridge.dropObservation]]; this spec
  * also guards the reflection contract that fix rests on (the private
  * `observations` field), so a Spark upgrade that renames it fails
  * HERE, loudly, instead of silently reverting to the leak. */
class ObservationSpec extends SparkTestBase {
  import spark.implicits._

  private def entriesFor(obs: org.apache.spark.sql.Observation): Int =
    org.apache.spark.sql.graft.Bridge.observationEntries(spark, obs)

  test("awaitObserved returns the metrics row once the action runs") {
    val obs = org.apache.spark.sql.Observation()
    val df = Seq(1L, 2L, 3L).toDF("x")
      .observe(obs, count(lit(1)).cast("long").as("n"))
    df.count()
    assert(Stores.awaitObserved(spark, obs).map(_.getLong(0))
      .contains(3L))
  }

  test("a timed-out observation is dropped from the session's " +
      "manager map (the r19 leak, closed)") {
    val obs = org.apache.spark.sql.Observation()
    // observe() registers; the action never runs, so the metrics
    // future never completes — the pre-fix permanent-entry shape
    Seq(1L).toDF("x").observe(obs, count(lit(1)).as("n"))
    assert(entriesFor(obs) == 1,
      "observe() must register with the manager — if THIS fails, " +
        "Spark's ObservationManager internals changed and " +
        "Bridge.dropObservation has degraded to its documented no-op")
    assert(Stores.awaitObserved(spark, obs, timeoutMs = 200L).isEmpty)
    assert(entriesFor(obs) == 0,
      "the timed-out observation must be dropped from the manager map")
  }
}
