package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured-Streaming pipelines (SURVEY.md §2B streaming row): the same
  * window expressions as operators.StreamWindows, wired to an unbounded
  * source with watermark-bounded state, plus watermarked dedup and a
  * custom-state sessionizer via flatMapGroupsWithState.
  *
  * Every builder takes the source DataFrame (MemoryStream in tests,
  * readStream.parquet/kafka in production) — stream/batch agnostic where
  * Spark allows it, so the scalatest suite drives real micro-batches.
  *
  * Scale notes (100 TB/day posture):
  *  - all state stores are keyed and watermark-bounded: tumbling state
  *    evicts one window past the watermark, session state closes on gap
  *    timeout — no unbounded growth;
  *  - dropDuplicatesWithinWatermark keeps one key per event inside the
  *    horizon (the streaming twin of q40's exact dedup);
  *  - flatMapGroupsWithState partitions by key across executors — custom
  *    state scales horizontally exactly like the built-in session window.
  */
object StreamingOps {

  /** Watermarks require TIMESTAMP (with local TZ), not TIMESTAMP_NTZ —
    * [EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE] otherwise. The test tables
    * carry NTZ event time; under the UTC session this cast is a pure
    * metadata change (same instant, same wall clock). */
  private def normalizeEventTime(events: DataFrame): DataFrame =
    events.schema("ts").dataType match {
      case org.apache.spark.sql.types.TimestampNTZType =>
        events.withColumn("ts", col("ts").cast("timestamp"))
      case _ => events
    }

  /** Tumbling-window counts/sums per event type with a watermark: late
    * rows beyond `lateness` are dropped and their window's state evicted. */
  def tumblingCounts(events: DataFrame, lateness: String = "30 minutes",
      size: String = "1 hour"): DataFrame =
    normalizeEventTime(events)
      .withWatermark("ts", lateness)
      .groupBy(window(col("ts"), size), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("total"))
      .select(col("window.start").as("w_start"), col("window.end").as("w_end"),
        col("event_type"), col("n"), col("total"))

  /** Built-in session windows per user (10-minute gap) under watermark. */
  def sessionAgg(events: DataFrame, lateness: String = "30 minutes",
      gap: String = "10 minutes"): DataFrame =
    normalizeEventTime(events)
      .withWatermark("ts", lateness)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n"))
      .select(col("user_id"), col("session_window.start").as("w_start"),
        col("session_window.end").as("w_end"), col("n"))

  /** Exact dedup on event_id within the watermark horizon — the streaming
    * form of exact deduplication (state holds ids only inside the horizon). */
  def dedupWithinWatermark(events: DataFrame,
      lateness: String = "30 minutes"): DataFrame =
    normalizeEventTime(events)
      .withWatermark("ts", lateness)
      .dropDuplicatesWithinWatermark("event_id")

  /** Stream-stream interval join: each click joined to purchases by the
    * same user within [click_ts, click_ts + window]. Watermarks on BOTH
    * sides + the time-range condition bound the join state: rows are
    * dropped from state once the other side's watermark passes the range
    * — the only way a stream-stream join stays finite at 100 TB/day. */
  def clickPurchaseJoin(clicks: DataFrame, purchases: DataFrame,
      window: String = "10 minutes",
      lateness: String = "30 minutes"): DataFrame = {
    val c = normalizeEventTime(clicks)
      .withWatermark("ts", lateness)
      .select(col("user_id"), col("event_id").as("click_id"),
        col("ts").as("click_ts"))
    val p = normalizeEventTime(purchases)
      .withWatermark("ts", lateness)
      .select(col("user_id").as("p_user_id"), col("event_id").as("purchase_id"),
        col("ts").as("purchase_ts"), col("value").as("purchase_value"))
    c.join(p,
      col("user_id") === col("p_user_id")
        && col("purchase_ts") >= col("click_ts")
        && col("purchase_ts") <= col("click_ts") + expr(s"INTERVAL $window"))
      .select("user_id", "click_id", "click_ts", "purchase_id", "purchase_ts",
        "purchase_value")
  }

  // ── custom state: sessionization via flatMapGroupsWithState ──────────

  final case class Event(event_id: Long, ts: Timestamp, user_id: Long,
      event_type: String, value: Double)

  final case class SessionState(start: Long, lastTs: Long, n: Int,
      total: Double)

  final case class SessionOut(user_id: Long, start: Timestamp, end: Timestamp,
      n: Int, total: Double)

  /** Per-user sessionizer with explicit state: emits a SessionOut each
    * time a session closes (either a new event past the gap, or
    * event-time timeout once the watermark passes last+gap).
    * Demonstrates arbitrary stateful processing where the built-in
    * session_window aggregation is not expressive enough (e.g. emitting
    * mid-session markers or non-associative session summaries).
    *
    * This is the stateful-streaming twin of the batch `q122` gap
    * sessionizer and uses its exact boundary rule: a session CLOSES only
    * when the silence EXCEEDS the gap (an event at exactly last+gap
    * still continues the session — q122's `diff > gap` break test), and
    * in-batch ties on ts order by event_id, the same sort key as the
    * batch window. StreamingOpsSpec proves session-for-session equality
    * with q122 on a two-batch replay of real table data. */
  def sessionize(events: Dataset[Event],
      gapMs: Long = 10 * 60 * 1000L): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", "30 minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, it: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(SessionOut(userId, new Timestamp(s.start),
              new Timestamp(s.lastTs + gapMs), s.n, s.total))
          } else {
            val sorted = it.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
            var cur = state.getOption
            val closed = Seq.newBuilder[SessionOut]
            sorted.foreach { e =>
              val t = e.ts.getTime
              cur match {
                case Some(s) if t <= s.lastTs + gapMs =>
                  cur = Some(s.copy(lastTs = math.max(s.lastTs, t), n = s.n + 1,
                    total = s.total + e.value))
                case Some(s) =>
                  closed += SessionOut(userId, new Timestamp(s.start),
                    new Timestamp(s.lastTs + gapMs), s.n, s.total)
                  cur = Some(SessionState(t, t, 1, e.value))
                case None =>
                  cur = Some(SessionState(t, t, 1, e.value))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.lastTs + gapMs)
            }
            closed.result().iterator
          }
      }
  }

  final case class Doc(doc_id: Long, text: String)

  final case class BandCollision(doc_id: Long, resident_id: Long)

  /** Streaming ingest dedup — the stateful twin of batch
    * q156_incremental_dedup: every arriving doc is MinHash-signed (the
    * same native WordShingles → MinHashSig pass as the batch operator,
    * docs under 3 words pass through unsigned exactly as they are
    * absent from the batch signature store) and checked against the
    * resident corpus one LSH band bucket at a time. Emits one
    * [[BandCollision]] per (new doc, resident doc) band collision; the
    * consumer's admit/reject verdict is
    * `countDistinct(resident_id) > 0` per doc — q156's rule.
    *
    * Semantics: a doc matches residents from STRICTLY EARLIER
    * micro-batches only — docs of the same batch never match each
    * other, mirroring q156's static new-vs-resident split (batch 1 =
    * the resident corpus, batch 2 = the ingest). Emission order within
    * a batch is undefined; the collision SET is deterministic.
    *
    * At-least-once sources can re-deliver a doc_id in a LATER batch (a
    * case the batch q156 disjoint new/resident split can never
    * produce); a redelivered doc is already resident in its own
    * buckets, so self-collisions are filtered — a doc never rejects
    * against itself, only against OTHER residents.
    *
    * State-growth contract: state is keyed by (band, band-value) — the
    * same partitioning as the batch band join, horizontally scalable —
    * and each bucket holds a SET of doc ids (hash lookups, no O(n)
    * membership scan; the 9-column signature store stays in the batch
    * layer). Without a TTL, state grows with the distinct bucket count
    * of the resident corpus — the deliberate default, because q156's
    * semantics dedup against ALL history and the replay-equivalence
    * spec needs exactly that. Deployments with a bounded dedup horizon
    * pass `ttl` (processing-time): a bucket untouched for `ttl` is
    * dropped whole, i.e. residents age out once nothing hashes near
    * them for the horizon — after which a re-ingest of an old doc
    * admits (the standard horizon-dedup tradeoff, stated rather than
    * hidden). Caveat: an armed ProcessingTimeTimeout makes the engine
    * schedule micro-batches continuously to re-check deadlines, so
    * `processAllAvailable()` never reaches its no-more-work state and
    * blocks — pace TTL'd deployments with a real trigger interval and
    * test them by polling the sink (see StreamingOpsSpec).
    *
    * Recovery contract: run with a `checkpointLocation` and a kill/
    * restart resumes from the last committed batch with the resident
    * state, source offsets, and watermark restored — post-restart docs
    * still collide with pre-kill residents and committed collisions are
    * not re-emitted (exactly-once with an idempotent/transactional
    * sink; the final uncommitted batch may replay). Proven against a
    * real checkpoint dir in StreamingRecoverySpec.
    *
    * `intraBatch = true` additionally emits collisions between two docs
    * of the SAME micro-batch (as doc_id = the HIGHER id, resident_id =
    * the lower — the earlier-by-id doc plays resident, so the
    * keep-lowest verdict rule is unchanged). The default is
    * false — the strictly-earlier semantics above, which the q156
    * replay-equivalence spec pins — but a production ingest whose
    * micro-batches hold thousands of docs wants true: with exactly-once
    * delivery, two duplicates landing in one batch would otherwise BOTH
    * be admitted and never re-compared. */
  def ingestDedup(docs: Dataset[Doc],
      ttl: Option[java.time.Duration] = None,
      intraBatch: Boolean = false): Dataset[BandCollision] = {
    import docs.sparkSession.implicits._
    val sig = graft.plans.MinHashSig.minhashSig(
      graft.plans.WordShingles.wordShingles(col("text"), 3))
    val bands = docs.toDF()
      .filter(size(split(col("text"), " ")) >= 3)
      .select(col("doc_id"), sig.as("ms"))
      .select(col("doc_id"), explode(array((0 until 4).map(b =>
        concat_ws(":", lit(b), col("ms").getItem(2 * b),
          col("ms").getItem(2 * b + 1))): _*)).as("bucket"))
      .select(col("bucket"), col("doc_id")).as[(String, Long)]
    val timeoutConf =
      if (ttl.isDefined) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    bands
      .groupByKey(_._1)
      .flatMapGroupsWithState[Set[Long], BandCollision](
        OutputMode.Update, timeoutConf) {
        (_: String, it: Iterator[(String, Long)],
            state: GroupState[Set[Long]]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val resident = state.getOption.getOrElse(Set.empty[Long])
            val arrived = it.map(_._2).toList.distinct
            state.update(resident ++ arrived)
            ttl.foreach(d => state.setTimeoutDuration(d.toMillis))
            val vsResident = for { d <- arrived; r <- resident; if r != d }
              yield BandCollision(d, r)
            val within =
              if (!intraBatch) Nil
              else for {
                d <- arrived; r <- arrived
                if d > r && !resident.contains(d) && !resident.contains(r)
              } yield BandCollision(d, r)
            (vsResident ++ within).iterator
          }
      }
  }

  final case class TimedDoc(
      doc_id: Long, ts: Timestamp, source: String, text: String)

  final case class DriftCell(source: String, window_start: Timestamp,
      n_matched: Long, n_oov: Long, kl: Double)

  /** Streaming per-(source, window) KL drift monitor — the stateful twin
    * of batch q172's drift timeline, recast for a stream: q172 scores
    * each (source, ingest-batch) token distribution against the WHOLE
    * corpus model (computable only in batch); the streaming form scores
    * each (source, tumbling event-time window) against a FIXED
    * `reference` unigram model — the corpus the source was admitted
    * into, which is exactly what a production drift alarm compares
    * against. kl = Σ over matched tokens (c/ns)·ln((c/ns)/(g/N)),
    * folded in ASCENDING token order (deterministic float association —
    * the replay spec recomputes the identical fold); tokens outside the
    * reference vocab are counted as `n_oov`, not scored (open-vocab
    * caveat as q103/q105; a rising OOV count is itself the strongest
    * drift signal).
    *
    * Emission: APPEND mode, one FINAL [[DriftCell]] per (source,
    * window), emitted when the event-time watermark passes the window
    * end — so a replayed stream produces exactly the batch computation
    * over the same rows (spec-proven). Windows tumble on `windowMs`
    * epoch-aligned boundaries.
    *
    * State-growth contract: state per live (source, window) key is the
    * matched-token count map — bounded by |reference| (a curated vocab,
    * e.g. top-100k tokens, NOT the stream's open vocabulary) — plus one
    * OOV counter; the watermark closes windows, so live keys are
    * bounded by sources × (lateness/windowMs + 1). Both bounds are
    * independent of stream length — the property that lets this run
    * forever. Keyed by (source, window): the same partitioning a batch
    * (source, batch) cell agg shuffles on, horizontally scalable.
    *
    * Recovery contract: with a `checkpointLocation`, a kill mid-window
    * restores the half-filled count map, watermark, and offsets on
    * restart — the window's single final [[DriftCell]] folds counts
    * from both sides of the kill and emits exactly once (proven in
    * StreamingRecoverySpec). */
  def driftMonitor(docs: Dataset[TimedDoc], reference: Map[String, Long],
      windowMs: Long = 3600000L,
      lateness: String = "30 minutes"): Dataset[DriftCell] = {
    import docs.sparkSession.implicits._
    require(reference.nonEmpty, "driftMonitor needs a reference model")
    // strictly positive: a 0-count entry (easy to produce from an outer
    // join building the vocab) would yield p*ln(p/0) = Infinity in the
    // emitted KL — fail loudly at construction, not silently per window
    require(reference.values.forall(_ > 0),
      "driftMonitor reference counts must all be > 0 — a zero-count " +
        "token makes the KL term infinite; drop or floor such entries")
    require(windowMs > 0, "windowMs must be positive")
    // broadcast, don't closure-capture: the reference is a real vocab
    // (the scaladoc's top-100k example is multi-MB) and the state
    // function ships with EVERY stateful task of EVERY micro-batch for
    // the stream's lifetime — a broadcast deserializes once per executor
    val refBc = docs.sparkSession.sparkContext.broadcast(reference)
    val refTotal = reference.values.map(_.toDouble).sum
    docs
      .withWatermark("ts", lateness)
      .groupByKey(d =>
        (d.source, Math.floorDiv(d.ts.getTime, windowMs) * windowMs))
      .flatMapGroupsWithState[DriftState, DriftCell](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key: (String, Long), it: Iterator[TimedDoc],
            state: GroupState[DriftState]) =>
          val (source, wStart) = key
          val ref = refBc.value
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            val ns = s.counts.values.sum.toDouble
            val kl = s.counts.toSeq.sortBy(_._1).foldLeft(0.0) {
              case (acc, (w, c)) =>
                val p = c / ns
                acc + p * math.log(p / (ref(w) / refTotal))
            }
            Iterator(DriftCell(source, new Timestamp(wStart),
              s.counts.values.sum, s.oov, kl))
          } else {
            val s0 = state.getOption.getOrElse(DriftState(Map.empty, 0L))
            var counts = s0.counts
            var oov = s0.oov
            it.foreach(_.text.split(" ").foreach { w =>
              if (ref.contains(w))
                counts = counts.updated(w, counts.getOrElse(w, 0L) + 1L)
              else oov += 1L
            })
            state.update(DriftState(counts, oov))
            // fire once the watermark passes the window end (never in
            // the past: Spark rejects a timeout at/under the watermark)
            state.setTimeoutTimestamp(math.max(wStart + windowMs,
              state.getCurrentWatermarkMs() + 1))
            Iterator.empty
          }
      }
  }

  final case class DriftState(counts: Map[String, Long], oov: Long)

  final case class EwmaState(recent: List[Double])

  final case class SmoothOut(user_id: Long, event_id: Long, ewma8: Double)

  /** Per-user streaming EWMA smoother — the streaming twin of the batch
    * q140 operator (α = 0.5, window 8, pandas ewm-adjusted weights,
    * rounded to 4 dp). State per key is the last 7 observed values in
    * event order: O(1) memory per user regardless of stream length,
    * which is the whole point of the stateful form — the batch version
    * needs the full history partition, the stream carries 7 doubles.
    *
    * Each micro-batch's events are sorted by (ts, event_id) and folded
    * against the carried history with the SAME left-to-right float
    * association as the batch SQL, so for an in-order stream (per-key
    * event time monotone across batches — the replay contract) the
    * emitted values are bit-identical to `q140_ewma_smooth`;
    * StreamingOpsSpec proves the equality on a two-batch replay of real
    * table data. */
  def ewmaSmooth(events: Dataset[Event]): Dataset[SmoothOut] = {
    import events.sparkSession.implicits._
    val weights = (0 to 7).map(k => math.pow(0.5, k))
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[EwmaState, SmoothOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (userId: Long, it: Iterator[Event], state: GroupState[EwmaState]) =>
          val sorted = it.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
          var recent = state.getOption.map(_.recent).getOrElse(Nil)
          val out = Seq.newBuilder[SmoothOut]
          sorted.foreach { e =>
            val window = e.value :: recent // most recent first, ≤ 8 terms
            var num = 0.0
            var den = 0.0
            window.zip(weights).foreach { case (x, w) =>
              num += x * w
              den += w
            }
            out += SmoothOut(userId, e.event_id,
              BigDecimal(num / den)
                .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
            recent = (e.value :: recent).take(7)
          }
          state.update(EwmaState(recent))
          out.result().iterator
      }
  }
}
