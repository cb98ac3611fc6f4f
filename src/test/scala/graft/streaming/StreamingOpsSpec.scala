package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.StreamingQuery

import graft.SparkTestBase
import graft.streaming.StreamingOps._

/** Drives the streaming pipelines through real micro-batches via
  * MemoryStream (streaming has no DuckDB oracle — this suite is its
  * correctness coverage, per SURVEY.md §7 slice 3). */
class StreamingOpsSpec extends SparkTestBase {
  import spark.implicits._
  private implicit lazy val sqlCtx: org.apache.spark.sql.SQLContext =
    spark.sqlContext

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 ${10 + minute / 60}%02d:${minute % 60}%02d:00")

  private def ev(id: Long, minute: Int, user: Long = 1L,
      typ: String = "click", v: Double = 1.0): Event =
    Event(id, ts(minute), user, typ, v)

  private def withQuery[T](q: StreamingQuery)(body: => T): T =
    try body finally q.stop()

  test("tumbling window with watermark emits closed windows, drops late data") {
    val in = MemoryStream[Event]
    val q = tumblingCounts(in.toDF(), lateness = "30 minutes", size = "1 hour")
      .writeStream.format("memory").queryName("tumbling")
      .outputMode("append").start()
    withQuery(q) {
      in.addData(ev(1, 5), ev(2, 10), ev(3, 65))
      q.processAllAvailable()
      // watermark = 11:05-0:30 = 10:35 < 11:00 → nothing final yet
      assert(spark.table("tumbling").count() == 0)
      in.addData(ev(4, 95))           // 11:35 → watermark 11:05 ≥ 11:00
      q.processAllAvailable()
      val rows = spark.table("tumbling")
        .select("w_start", "n").as[(Timestamp, Long)].collect().toMap
      assert(rows(ts(0)) == 2)        // [10:00,11:00) closed with 2 events
      in.addData(ev(5, 12))           // behind watermark → dropped
      in.addData(ev(6, 185))          // 13:05 → closes the 11:00 window
      q.processAllAvailable()
      val rows2 = spark.table("tumbling")
        .select("w_start", "n").as[(Timestamp, Long)].collect().toMap
      assert(rows2(ts(60)) == 2)      // late ev(5) did NOT land in [10,11)
      assert(rows2(ts(0)) == 2)
    }
  }

  test("dropDuplicatesWithinWatermark emits each event_id once") {
    val in = MemoryStream[Event]
    val q = dedupWithinWatermark(in.toDF(), lateness = "30 minutes")
      .writeStream.format("memory").queryName("dedup")
      .outputMode("append").start()
    withQuery(q) {
      in.addData(ev(1, 0), ev(1, 1), ev(2, 2))
      q.processAllAvailable()
      in.addData(ev(2, 3), ev(3, 4))   // dup id 2 in a later batch
      q.processAllAvailable()
      val ids = spark.table("dedup").select("event_id").as[Long].collect().sorted
      assert(ids.toSeq == Seq(1L, 2L, 3L))
    }
  }

  test("built-in session window groups by inactivity gap") {
    val in = MemoryStream[Event]
    val q = sessionAgg(in.toDF(), lateness = "30 minutes", gap = "10 minutes")
      .writeStream.format("memory").queryName("sessions")
      .outputMode("append").start()
    withQuery(q) {
      // user 1: two sessions (gap at minute 5→40); user 2: one session
      in.addData(ev(1, 0), ev(2, 5), ev(3, 40), ev(4, 0, user = 2))
      q.processAllAvailable()
      in.addData(ev(5, 180))           // advance watermark far past all ends
      q.processAllAvailable()
      val rows = spark.table("sessions")
        .select("user_id", "w_start", "n").as[(Long, Timestamp, Long)]
        .collect().toSet
      assert(rows.contains((1L, ts(0), 2L)))   // [10:00, 10:15) n=2
      assert(rows.contains((1L, ts(40), 1L)))
      assert(rows.contains((2L, ts(0), 1L)))
    }
  }

  test("update mode emits refined aggregates before the watermark closes") {
    val in = MemoryStream[Event]
    val q = tumblingCounts(in.toDF(), lateness = "30 minutes", size = "1 hour")
      .writeStream.format("memory").queryName("upd")
      .outputMode("update").start()
    withQuery(q) {
      in.addData(ev(1, 5))
      q.processAllAvailable()
      in.addData(ev(2, 10))   // same window → refined row emitted again
      q.processAllAvailable()
      val ns = spark.table("upd").filter($"w_start" === ts(0))
        .select("n").as[Long].collect().sorted.toSeq
      assert(ns == Seq(1L, 2L))   // update mode: both refinements visible
    }
  }

  test("streaming parquet file sink + checkpoint round-trips") {
    val dir = java.nio.file.Files.createTempDirectory("fsink").toString
    val in = MemoryStream[Event]
    val q = dedupWithinWatermark(in.toDF())
      .writeStream.format("parquet")
      .option("path", s"$dir/out")
      .option("checkpointLocation", s"$dir/ckpt")
      .outputMode("append").start()
    withQuery(q) {
      in.addData(ev(1, 0), ev(1, 1), ev(2, 2))
      q.processAllAvailable()
    }
    val back = spark.read.parquet(s"$dir/out")
    assert(back.select("event_id").as[Long].collect().sorted.toSeq
      == Seq(1L, 2L))
  }

  test("stream-stream interval join matches within the window only") {
    val clicks = MemoryStream[Event]
    val purchases = MemoryStream[Event]
    val q = clickPurchaseJoin(clicks.toDF(), purchases.toDF(),
      window = "10 minutes")
      .writeStream.format("memory").queryName("ssjoin")
      .outputMode("append").start()
    withQuery(q) {
      clicks.addData(ev(1, 0), ev(2, 0, user = 2))
      purchases.addData(ev(10, 5, v = 9.5),  // u1, in window → match
        ev(11, 20, v = 1.0))                  // u1, outside window
      q.processAllAvailable()
      val rows = spark.table("ssjoin")
        .select("user_id", "click_id", "purchase_id")
        .as[(Long, Long, Long)].collect().toSet
      assert(rows == Set((1L, 1L, 10L)))
    }
  }

  test("flatMapGroupsWithState sessionizer closes on gap and on timeout") {
    val in = MemoryStream[Event]
    val q = sessionize(in.toDS()).writeStream.format("memory")
      .queryName("fmgws").outputMode("append").start()
    withQuery(q) {
      in.addData(ev(1, 0), ev(2, 4))
      q.processAllAvailable()
      in.addData(ev(3, 30))            // same user, gap >10m → closes s1
      q.processAllAvailable()
      val s1 = spark.table("fmgws")
        .select("user_id", "start", "end", "n", "total")
        .as[(Long, Timestamp, Timestamp, Int, Double)].collect()
      assert(s1.toSeq == Seq((1L, ts(0), ts(14), 2, 2.0)))
      // advance watermark way past 10:40 (=30m ev + 10m gap + 30m lateness)
      in.addData(ev(4, 200, user = 2))
      q.processAllAvailable()
      in.addData(ev(5, 210, user = 2)) // extra batch lets the timeout fire
      q.processAllAvailable()
      val users = spark.table("fmgws").select("user_id").as[Long]
        .collect().toSeq
      assert(users.count(_ == 1L) == 2)  // second u1 session closed by timeout
    }
  }

  test("stateful sessionizer equals batch q122 on an in-order two-batch replay") {
    val sf = "/root/testdata/sf0.001"
    val uids = Seq(0L, 1L, 2L)
    // q122 sessionizes on unix_timestamp SECONDS — feed the stream the
    // same floored-second time base so the gap comparisons are identical
    val evs = graft.Tables(spark, sf, "events")
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value")
      .as[Event].collect()
      .filter(e => uids.contains(e.user_id))
      .map(e => e.copy(ts =
        new Timestamp(Math.floorDiv(e.ts.getTime, 1000L) * 1000L)))
      .sortBy(e => (e.ts.getTime, e.event_id))
    assert(evs.length > 20, "need a real series per user")
    val (b1, b2) = evs.splitAt(evs.length / 2)
    val maxT = evs.map(_.ts.getTime).max
    val gapMs = 1800 * 1000L

    val in = MemoryStream[Event]
    val q = sessionize(in.toDS(), gapMs = gapMs).writeStream.format("memory")
      .queryName("sess122").outputMode("append").start()
    val got = withQuery(q) {
      in.addData(b1.toSeq)
      q.processAllAvailable()
      in.addData(b2.toSeq)
      q.processAllAvailable()
      // a sentinel user advances the watermark past every open session's
      // timeout; the second sentinel batch lets those timeouts fire
      in.addData(Event(900001L, new Timestamp(maxT + 4 * gapMs), 999L, "x", 0.0))
      q.processAllAvailable()
      in.addData(Event(900002L, new Timestamp(maxT + 5 * gapMs), 999L, "x", 0.0))
      q.processAllAvailable()
      spark.table("sess122").filter($"user_id".isin(uids: _*))
        .select("user_id", "start", "end", "n")
        .as[(Long, Timestamp, Timestamp, Int)].collect()
    }
    // map the stream's (start, last+gap) sessions onto q122's schema:
    // end_s = last event second; session ordinal by start per user
    val gotMapped = got.groupBy(_._1).toSeq.flatMap { case (u, ss) =>
      ss.sortBy(_._2.getTime).zipWithIndex.map { case ((_, st, en, n), i) =>
        val startS = st.getTime / 1000L
        val endS = (en.getTime - gapMs) / 1000L
        (u, i, n, startS, endS, endS - startS)
      }
    }.sortBy(r => (r._1, r._2))
    val want = graft.SparkEntry.queries("q122_sessionize_gap")(spark, sf)
      .filter($"user_id".isin(uids: _*))
      .as[(Long, Int, Int, Long, Long, Long)].collect().toSeq
      .sortBy(r => (r._1, r._2))
    assert(gotMapped.nonEmpty && gotMapped == want,
      s"stream sessions ${gotMapped.take(5)}... != batch ${want.take(5)}...")
  }

  test("streaming ingest dedup equals batch q156 on a resident-then-ingest replay") {
    val sf = "/root/testdata/sf0.001"
    def bk(id: Long): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(15), 16) % 100
    }
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select($"doc_id", $"text").as[Doc].collect()
    val (ingest, resident) = docs.partition(d => bk(d.doc_id) >= 95)
    assert(ingest.nonEmpty && resident.nonEmpty)

    val in = MemoryStream[Doc]
    val q = ingestDedup(in.toDS()).writeStream.format("memory")
      .queryName("ingest156").outputMode("update").start()
    val collisions = withQuery(q) {
      in.addData(resident.toSeq)   // batch 1: the resident corpus
      q.processAllAvailable()
      assert(spark.table("ingest156").count() == 0,
        "first batch has no earlier residents to collide with")
      in.addData(ingest.toSeq)     // batch 2: the ingest
      q.processAllAvailable()
      spark.table("ingest156").as[BandCollision].collect()
    }
    // verdict per q156's rule; batch-2 docs never match each other, so
    // every collision must point at a resident
    assert(collisions.forall(c => bk(c.resident_id) < 95))
    val nDups = collisions.groupBy(_.doc_id)
      .map { case (d, cs) => d -> cs.map(_.resident_id).distinct.size }
    val want = graft.SparkEntry.queries("q156_incremental_dedup")(spark, sf)
      .select("doc_id", "n_dups").as[(Long, Int)].collect().toMap
    assert(want.nonEmpty)
    want.foreach { case (d, n) =>
      assert(nDups.getOrElse(d, 0) == n,
        s"doc $d: stream says ${nDups.getOrElse(d, 0)} dups, batch says $n")
    }
    // no collision for a doc the batch op does not know (sub-3-word docs
    // are unsigned on both sides)
    assert(nDups.keySet.subsetOf(want.keySet))
  }

  test("ingest dedup: at-least-once redelivery two batches late never self-rejects") {
    // Three micro-batches; doc A is redelivered in batch 3 (the
    // at-least-once replay case the batch q156 split cannot produce).
    // A's redelivery collides with OTHER residents that share a bucket
    // (its verbatim twin B) but NEVER with itself — a self-collision
    // would flip A's verdict to reject against its own earlier arrival.
    val a = Doc(1L, "the quick brown fox jumps over the lazy dog")
    val b = Doc(2L, "the quick brown fox jumps over the lazy dog") // A's twin
    val c = Doc(3L, "completely unrelated text about spark executors")
    val in = MemoryStream[Doc]
    val q = ingestDedup(in.toDS()).writeStream.format("memory")
      .queryName("ingest_redeliver").outputMode("update").start()
    val (after2, after3) = withQuery(q) {
      in.addData(a, c)          // batch 1: A and C become resident
      q.processAllAvailable()
      in.addData(b)             // batch 2: B collides with resident A
      q.processAllAvailable()
      val snap2 = spark.table("ingest_redeliver").as[BandCollision].collect()
      in.addData(a)             // batch 3: A redelivered two batches late
      q.processAllAvailable()
      (snap2, spark.table("ingest_redeliver").as[BandCollision].collect())
    }
    assert(after2.map(c0 => (c0.doc_id, c0.resident_id)).distinct.toSet ==
      Set((2L, 1L)), "B rejects against resident A only")
    val batch3 = after3.diff(after2)
    assert(batch3.nonEmpty && batch3.forall(_.doc_id == 1L))
    assert(batch3.forall(_.resident_id != 1L),
      s"redelivered A must not collide with itself: ${batch3.toSeq}")
    assert(batch3.map(_.resident_id).toSet == Set(2L),
      "redelivered A still collides with its genuine twin B")
  }

  test("ingest dedup intraBatch surfaces same-batch twins once, low id first") {
    // default semantics: two dups landing in ONE batch are both admitted
    // (strictly-earlier rule, q156 replay parity); intraBatch = true is
    // the production switch that surfaces them — as (higher → lower), so
    // the keep-lowest verdict rule is unchanged — without double-counting
    // pairs already covered by the arrived×resident product.
    val a = Doc(1L, "the quick brown fox jumps over the lazy dog")
    val b = Doc(2L, "the quick brown fox jumps over the lazy dog")
    val c = Doc(3L, "totally different words in this one here now")
    val in = MemoryStream[Doc]
    val q = ingestDedup(in.toDS(), intraBatch = true).writeStream
      .format("memory").queryName("ingest_intra").outputMode("update").start()
    val (batch1, all) = withQuery(q) {
      in.addData(a, b, c)          // twins A and B in the SAME batch
      q.processAllAvailable()
      val first = spark.table("ingest_intra").as[BandCollision].collect()
      in.addData(Doc(4L, "the quick brown fox jumps over the lazy dog"))
      q.processAllAvailable()
      (first, spark.table("ingest_intra").as[BandCollision].collect())
    }
    assert(batch1.map(x => (x.doc_id, x.resident_id)).distinct.toSet ==
      Set((2L, 1L)), "same-batch twins collide exactly once, higher→lower")
    // batch 2: the new twin rejects against BOTH residents, and the
    // batch-1 intra pair is not re-emitted as a resident collision
    val batch2 = all.diff(batch1)
    assert(batch2.map(x => (x.doc_id, x.resident_id)).distinct.toSet ==
      Set((4L, 1L), (4L, 2L)))
  }

  test("ingest dedup with a TTL keeps q156 semantics inside the horizon") {
    // TTL arms ProcessingTimeTimeout; inside the horizon behavior is
    // identical to the unbounded form (the timeout path only drops
    // buckets after `ttl` of silence — not reachable in-test without
    // wall-clock games, so this pins the armed-but-unexpired path).
    // NOTE: with ProcessingTimeTimeout armed the engine keeps
    // scheduling micro-batches to re-check timeouts, so
    // processAllAvailable never observes the "no more work" state and
    // HANGS (documented on ingestDedup); the test polls the sink with a
    // deadline instead — the same pattern a production smoke-check uses.
    val a = Doc(1L, "alpha beta gamma delta epsilon zeta")
    val b = Doc(2L, "alpha beta gamma delta epsilon zeta")
    val in = MemoryStream[Doc]
    val q = ingestDedup(in.toDS(), ttl = Some(java.time.Duration.ofDays(1)))
      .writeStream.format("memory")
      .queryName("ingest_ttl").outputMode("update").start()
    def awaitUntil(what: String)(cond: => Boolean): Unit = {
      val deadline = System.nanoTime() + 60L * 1000 * 1000 * 1000
      while (!cond) {
        assert(System.nanoTime() < deadline, s"timed out waiting for $what")
        Thread.sleep(50)
      }
    }
    val got = withQuery(q) {
      in.addData(a)
      awaitUntil("batch 1 consumed") {
        q.recentProgress.map(_.numInputRows).sum >= 1
      }
      in.addData(b)
      awaitUntil("the A~B collision") {
        spark.table("ingest_ttl").count() >= 1
      }
      spark.table("ingest_ttl").as[BandCollision].collect()
    }
    assert(got.map(c0 => (c0.doc_id, c0.resident_id)).distinct.toSet ==
      Set((2L, 1L)))
  }

  test("streaming EWMA equals batch q140 on an in-order two-batch replay") {
    val sf = "/root/testdata/sf0.001"
    val uids = Seq(0L, 1L, 2L)
    val evs = graft.Tables(spark, sf, "events")
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value")
      .as[Event].collect()
      .filter(e => uids.contains(e.user_id))
      .sortBy(e => (e.ts.getTime, e.event_id))
    assert(evs.length > 20, "need a real series per user")
    val (b1, b2) = evs.splitAt(evs.length / 2)

    val in = MemoryStream[Event]
    val q = ewmaSmooth(in.toDS()).writeStream.format("memory")
      .queryName("ewma").outputMode("append").start()
    val got = withQuery(q) {
      in.addData(b1.toSeq)
      q.processAllAvailable()
      in.addData(b2.toSeq)
      q.processAllAvailable()
      spark.table("ewma").select("user_id", "event_id", "ewma8")
        .as[(Long, Long, Double)].collect()
    }
    val want = graft.SparkEntry.queries("q140_ewma_smooth")(spark, sf)
      .filter($"user_id".isin(uids: _*))
      .as[(Long, Long, Double)].collect()
    assert(got.length == want.length)
    // bit-identical, not approximately equal: same fold, same rounding
    assert(got.sortBy(r => (r._1, r._2)).toSeq ==
      want.sortBy(r => (r._1, r._2)).toSeq)
  }

  test("driftMonitor: final per-window KL equals a driver recompute") {
    val ref = Map("a" -> 4L, "b" -> 2L, "c" -> 2L) // N = 8
    // the exact fold the operator documents: matched tokens in
    // ASCENDING order, p·ln(p/q) against the fixed reference
    def kl(counts: Map[String, Long]): Double = {
      val ns = counts.values.sum.toDouble
      counts.toSeq.sortBy(_._1).foldLeft(0.0) { case (acc, (w, c)) =>
        val p = c / ns
        acc + p * math.log(p / (ref(w) / 8.0))
      }
    }
    val in = MemoryStream[TimedDoc]
    val q = driftMonitor(in.toDS(), ref, windowMs = 60000L).writeStream
      .format("memory").queryName("drift").outputMode("append").start()
    withQuery(q) {
      in.addData(TimedDoc(1, ts(0), "s1", "a a b"),
        TimedDoc(2, ts(0), "s2", "b b c"))
      q.processAllAvailable()
      // second batch: a LATE row refines s1's first window (inside the
      // 30 min lateness), a new window opens, an all-OOV source arrives
      in.addData(TimedDoc(3, ts(0), "s1", "a c x"),
        TimedDoc(4, ts(1), "s1", "c c c a"),
        TimedDoc(5, ts(0), "s3", "zz yy"))
      q.processAllAvailable()
      assert(spark.table("drift").count() == 0,
        "append mode: nothing emits before the watermark closes a window")
      // advance the watermark far past every window end, then one more
      // batch so the event-time timeouts fire
      in.addData(TimedDoc(6, ts(200), "s9", "qq"))
      q.processAllAvailable()
      in.addData(TimedDoc(7, ts(201), "s9", "qq"))
      q.processAllAvailable()
      val got = spark.table("drift")
        .as[(String, Timestamp, Long, Long, Double)].collect()
        .map(r => (r._1, r._2) -> ((r._3, r._4, r._5))).toMap
      assert(got.keySet == Set("s1" -> ts(0), "s1" -> ts(1), "s2" -> ts(0),
        "s3" -> ts(0)), "every closed window emits exactly once; s9 open")
      assert(got("s1" -> ts(0)) ==
        ((5L, 1L, kl(Map("a" -> 3L, "b" -> 1L, "c" -> 1L)))),
        "late row folded in; x counted as OOV")
      assert(got("s2" -> ts(0)) == ((3L, 0L, kl(Map("b" -> 2L, "c" -> 1L)))))
      assert(got("s1" -> ts(1)) == ((4L, 0L, kl(Map("a" -> 1L, "c" -> 3L)))))
      assert(got("s3" -> ts(0)) == ((0L, 2L, 0.0)),
        "all-OOV window scores zero KL with the OOV count as the signal")
    }
  }
}
