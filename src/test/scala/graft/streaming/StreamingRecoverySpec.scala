package graft.streaming

import java.sql.Timestamp
import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.StreamingQuery

import graft.SparkTestBase
import graft.streaming.StreamingOps._

/** Kill/restart recovery for the stateful streaming operators: stop a
  * query mid-stream and restart it from a REAL `checkpointLocation`,
  * then prove the verdict stream continues EXACTLY — state survives
  * (post-restart docs still collide with pre-restart residents; a
  * half-filled drift window keeps its counts), committed output is not
  * re-emitted, and nothing is lost. This is the production property
  * the replay-equivalence specs in StreamingOpsSpec cannot see: they
  * replay through ONE query lifetime, so a state store that silently
  * restarted empty would still pass them.
  *
  * Sink choice: the memory sink REFUSES checkpoint recovery
  * ("this query does not support recovering from checkpoint
  * location"), so these tests collect through `foreachBatch` — the
  * recovery-capable sink a production deployment of these operators
  * would use anyway (idempotent upsert / transactional write per
  * batch).
  *
  * Recovery contract (documented on the operators' scaladoc): both
  * ingestDedup and driftMonitor are pure flatMapGroupsWithState
  * pipelines over a replayable source, so under a checkpointed restart
  * Spark restores (source offsets, watermark, state store) from the
  * last committed batch and the emitted stream is the same as an
  * uninterrupted run — exactly-once with an idempotent or
  * transactional sink, at-least-once re-emission only for a final
  * uncommitted batch (standard Structured Streaming semantics). */
class StreamingRecoverySpec extends SparkTestBase {
  import spark.implicits._
  private implicit lazy val sqlCtx: org.apache.spark.sql.SQLContext =
    spark.sqlContext

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 ${10 + minute / 60}%02d:${minute % 60}%02d:00")

  private def withQuery[T](q: StreamingQuery)(body: => T): T =
    try body finally q.stop()

  test("ingestDedup restarts from its checkpoint: residents survive, " +
      "committed collisions are not re-emitted") {
    val ckpt = java.nio.file.Files.createTempDirectory("graft-rec1")
      .resolve("ckpt").toString
    val a = Doc(1L, "the quick brown fox jumps over the lazy dog")
    val b = Doc(2L, "the quick brown fox jumps over the lazy dog")
    val c = Doc(3L, "completely unrelated text about spark executors")
    val d = Doc(4L, "the quick brown fox jumps over the lazy dog")
    val in = MemoryStream[Doc]
    def start(sink: ConcurrentLinkedQueue[BandCollision]): StreamingQuery =
      ingestDedup(in.toDS()).writeStream
        .foreachBatch { (ds: Dataset[BandCollision], _: Long) =>
          ds.collect().foreach(sink.add)
        }
        .outputMode("update").option("checkpointLocation", ckpt).start()

    val sink1 = new ConcurrentLinkedQueue[BandCollision]()
    val q1 = start(sink1)
    withQuery(q1) {
      in.addData(a, c) // batch 1: A and C become resident
      q1.processAllAvailable()
      in.addData(b)    // batch 2: B collides with resident A
      q1.processAllAvailable()
    } // q1 stopped = the kill; both batches are committed
    import scala.jdk.CollectionConverters._
    assert(sink1.asScala.map(x => (x.doc_id, x.resident_id)).toSet ==
      Set((2L, 1L)), "pre-kill: B rejects against resident A only")

    val sink2 = new ConcurrentLinkedQueue[BandCollision]()
    val q2 = start(sink2)
    val after = withQuery(q2) {
      in.addData(d)    // batch 3, post-restart: a third twin arrives
      q2.processAllAvailable()
      sink2.asScala.toSeq
    }
    // state recovered: D collides with BOTH pre-restart twins — a state
    // store that restarted empty would emit nothing here
    assert(after.map(x => (x.doc_id, x.resident_id)).toSet ==
      Set((4L, 1L), (4L, 2L)),
      s"post-restart twin must reject against recovered residents: $after")
    // nothing duplicated: the committed (B → A) verdict is not replayed
    // through the restarted query
    assert(!after.exists(_.doc_id == 2L),
      "committed batch-2 collisions must not re-emit after restart")
  }

  test("driftMonitor restarts mid-window: counts merge across the kill " +
      "and the window emits exactly once") {
    val ckpt = java.nio.file.Files.createTempDirectory("graft-rec2")
      .resolve("ckpt").toString
    val ref = Map("a" -> 4L, "b" -> 2L, "c" -> 2L) // N = 8
    def kl(counts: Map[String, Long]): Double = {
      val ns = counts.values.sum.toDouble
      counts.toSeq.sortBy(_._1).foldLeft(0.0) { case (acc, (w, cnt)) =>
        val p = cnt / ns
        acc + p * math.log(p / (ref(w) / 8.0))
      }
    }
    val in = MemoryStream[TimedDoc]
    val sink = new ConcurrentLinkedQueue[DriftCell]()
    def start(): StreamingQuery =
      driftMonitor(in.toDS(), ref, windowMs = 60000L).writeStream
        .foreachBatch { (ds: Dataset[DriftCell], _: Long) =>
          ds.collect().foreach(sink.add)
        }
        .outputMode("append").option("checkpointLocation", ckpt).start()

    val q1 = start()
    withQuery(q1) {
      in.addData(TimedDoc(1, ts(0), "s1", "a a b")) // half of window ts(0)
      q1.processAllAvailable()
      assert(sink.isEmpty,
        "window still open at the kill — nothing emitted yet")
    } // killed with a half-filled window in state

    val q2 = start()
    import scala.jdk.CollectionConverters._
    val got = withQuery(q2) {
      in.addData(TimedDoc(2, ts(0), "s1", "b c x")) // other half + one OOV
      q2.processAllAvailable()
      // advance the watermark past the window end, then one more batch
      // so the event-time timeout fires (same pattern as the replay spec)
      in.addData(TimedDoc(3, ts(200), "s9", "qq"))
      q2.processAllAvailable()
      in.addData(TimedDoc(4, ts(201), "s9", "qq"))
      q2.processAllAvailable()
      sink.asScala.toSeq
    }
    val cells = got.filter(_.source == "s1")
    assert(cells.length == 1,
      s"the recovered window must emit EXACTLY once: $got")
    assert(cells.head == DriftCell("s1", ts(0), 5L, 1L,
      kl(Map("a" -> 2L, "b" -> 2L, "c" -> 1L))),
      "counts from both sides of the kill fold into one exact cell")
  }
}
