package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types.DecimalType

/** Structured Streaming over the events table: tumbling-window
  * aggregation with a watermark, and gap-based sessionization as
  * custom state over `flatMapGroupsWithState`.
  *
  * These are the streaming twins of the batch queries q23 (windowed
  * agg) and q22 (sessionize) — same semantics, verified against each
  * other in EventStreamSpec. The reference has no streaming surface
  * (SURVEY.md §2.12); this is the Spark-native extension a streaming
  * claims/events feed would use.
  *
  * Scale notes: state is partitioned by the group key (user), so the
  * stateful operator shuffles once on user_id and each task owns a
  * bounded per-user state (one open session + a counter). The
  * watermark bounds state retention; without it, open-ended event-time
  * aggregation state grows without limit.
  */
object EventStream {

  final case class Event(event_id: Long, ts: java.sql.Timestamp,
      user_id: Long, event_type: String, value: Double)

  final case class SessionState(sessionId: Long, startUs: Long, endUs: Long, n: Long)

  final case class SessionSummary(user_id: Long, session_id: Long,
      n_events: Long, session_start_us: Long, session_end_us: Long)

  /** Tumbling event-time window counts per event type. Append-mode
    * compatible: the watermark lets Spark finalize windows and drop
    * their state. */
  def windowedCounts(events: DataFrame, windowLength: String, watermark: String): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLength).as("w"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(28, 9))).cast("double").as("total_value"))
      .select(
        date_format(col("w.start"), "yyyy-MM-dd HH:mm").as("window_start"),
        col("event_type"), col("n_events"), col("total_value"))

  final case class UserRunning(user_id: Long, n_events: Long, total_micros: Long)

  /** Running per-user totals via Spark 4's ARBITRARY-STATE API
    * (`transformWithState` + [[RunningTotalsProcessor]]) — the
    * successor to `flatMapGroupsWithState` used by [[sessionize]]:
    * typed named state handles (`ValueState`/`ListState`/`MapState`),
    * explicit `TimeMode`, per-state TTL, and a RocksDB-backed store
    * (the session sets the provider; HDFS-backed stores don't support
    * this operator). Emits each user's updated cumulative
    * (n_events, total_micros) once per micro-batch in which the user
    * appears; state is one 2-long record per user, partitioned by the
    * grouping key like every stateful operator here. */
  def runningTotals(spark: SparkSession, events: Dataset[Event]): Dataset[UserRunning] = {
    import spark.implicits._
    events.groupByKey(_.user_id)
      .transformWithState(new RunningTotalsProcessor(),
        org.apache.spark.sql.streaming.TimeMode.None(),
        OutputMode.Update())
  }

  final case class DedupKey(user_id: Long, event_type: String, day: String)

  final case class KeyedEvent(event_id: Long, us: Long, user_id: Long,
      event_type: String, day: String)

  final case class FirstSeen(user_id: Long, event_type: String, day: String,
      event_id: Long, us: Long)

  /** Streaming first-occurrence dedup WARM-STARTED from history — the
    * production day-2 shape a fresh stream cannot express: the job
    * restarts (new checkpoint, new cluster, replayed source), but
    * "already seen" must include every key the PREVIOUS runs emitted.
    * `transformWithState`'s initial-state overload seeds the state
    * store from a BATCH frame of historical keys before the first
    * micro-batch: a key present in `historyKeys` never emits; a novel
    * key emits exactly once — its first event by (us, event_id) — and
    * is marked seen. The batch-side twin of the seeding frame is a
    * signature-store scan ([[graft.operators.Dedup.readSignatureStore]]
    * prices the same pattern for content digests).
    *
    * Scale notes: state is one boolean per distinct key, partitioned
    * by the grouping key like every stateful operator; the initial
    * state is shuffled once on the same key at query start (history
    * is never rescanned after batch 0). TimeMode.None — dedup keys
    * here include the civil day, so state is day-bounded by key
    * design; a TTL config is the knob when it isn't. */
  def bootstrapDedup(spark: SparkSession, stream: DataFrame,
      historyKeys: Dataset[DedupKey],
      outputMode: OutputMode = OutputMode.Update()): Dataset[FirstSeen] = {
    import spark.implicits._
    val keyed = stream.select(
        col("event_id"), unix_micros(col("ts")).as("us"), col("user_id"),
        col("event_type"), to_date(col("ts")).cast("string").as("day"))
      .as[KeyedEvent]
    // Update and Append are both sound here: every emission is final
    // (a key emits at most once ever), so the mode only needs to
    // match the sink's (memory/update for the one-shot gate, the
    // exactly-once parquet sink needs Append for the restart gate).
    keyed.groupByKey(e => DedupKey(e.user_id, e.event_type, e.day))
      .transformWithState(new BootstrapDedupProcessor(),
        org.apache.spark.sql.streaming.TimeMode.None(),
        outputMode,
        historyKeys.groupByKey(identity).mapValues(_ => true))
  }

  final case class TopKEvent(event_type: String, event_id: Long, value: Double)

  final case class TopKState(n_seen: Long, ids: Array[Long], values: Array[Double])

  final case class TopKRow(event_type: String, n_seen: Long, rank: Long,
    event_id: Long, value: Double)

  /** STREAMING running top-k: per key, the k largest values seen so
    * far (value desc, event id as the total-order tiebreak) kept as
    * `transformWithState` stream state — the live-leaderboard shape
    * (current best-quality docs per source, highest-value events per
    * type). Top-k-of-union under a TOTAL order is associative and
    * commutative, so the final emission equals the batch ranking
    * exactly however the stream was chunked — the q170 oracle's
    * check, and the same mergeable-summary argument as the KMV
    * sketch ([[kmvSketchStream]]): per-key state is O(k) entries
    * regardless of corpus size. Emits the current top-k (with the
    * running `n_seen`) once per (batch, key); the final rows per key
    * are the n_seen-argmax. */
  def topKStream(spark: SparkSession, stream: DataFrame,
      k: Int): Dataset[TopKRow] = {
    import spark.implicits._
    stream.select(col("event_type"), col("event_id").cast("long"), col("value"))
      .as[TopKEvent]
      .groupByKey(_.event_type)
      .transformWithState(new TopKProcessor(k),
        org.apache.spark.sql.streaming.TimeMode.None(),
        OutputMode.Update())
  }

  final case class KmvEvent(event_type: String, h: Long)

  final case class KmvState(n_seen: Long, mins: Array[Long])

  final case class KmvSketch(event_type: String, n_seen: Long, sketch: String)

  /** STREAMING maintenance of the K-minimum-values sketch
    * ([[graft.operators.Sketches.kMinValues]]'s state-machine twin):
    * per key, the k smallest distinct hashes seen so far plus the
    * running row count, updated per micro-batch through
    * `transformWithState`. Bottom-k-of-union is associative and
    * commutative, so the final emission equals the batch sketch
    * EXACTLY however the stream was chunked — which is what the q149
    * oracle checks. State is O(k) longs per key (the mergeable-sketch
    * property is precisely what makes per-key stream state bounded at
    * 100 TB: the corpus grows, the state doesn't). Emits the updated
    * sketch once per (batch, key); the final row per key is the
    * n_seen-argmax. */
  def kmvSketchStream(spark: SparkSession, stream: DataFrame,
      k: Int): Dataset[KmvSketch] = {
    import spark.implicits._
    stream.select(col("event_type"),
        graft.operators.TextFunctions.hash60(
          col("event_id").cast("string")).as("h"))
      .as[KmvEvent]
      .groupByKey(_.event_type)
      .transformWithState(new KmvSketchProcessor(k),
        org.apache.spark.sql.streaming.TimeMode.None(),
        OutputMode.Update())
  }

  /** Gap-based sessionization via the NATIVE `session_window`
    * aggregation — the declarative twin of [[sessionize]]'s
    * `flatMapGroupsWithState`: Spark owns the session-merge state
    * machine (UpdatingSessions / MergingSessions physical operators)
    * instead of user code. Works on batch and streaming inputs
    * identically (streaming requires the watermark so closed sessions
    * finalize and state drops).
    *
    * Boundary semantics (and the q100 oracle's): a session extends
    * while the next event arrives strictly inside `last_ts + gap`;
    * a gap of EXACTLY `gap` starts a new session (session windows are
    * half-open `[start, last+gap)`), and `session_end_us` is
    * `last_ts + gap` — the horizon, not the last event. Note this
    * differs from q22's `>` rule at the exact-gap boundary.
    *
    * Scale: one shuffle on the grouping key; per-task state is the
    * open sessions of its users — bounded by the watermark. */
  def sessionWindowAgg(events: DataFrame, gap: String,
      watermark: Option[String]): DataFrame = {
    val in = watermark.fold(events)(w => events.withWatermark("ts", w))
    in.groupBy(col("user_id"), session_window(col("ts"), gap).as("sw"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        unix_micros(col("sw.start")).as("session_start_us"),
        unix_micros(col("sw.end")).as("session_end_us"),
        col("n_events"))
  }

  /** Stream-stream interval join: pair each `typeA` event with the
    * same user's `typeB` events that follow within `withinSeconds`.
    * On streaming inputs both sides are watermarked, so Spark bounds
    * the join state to the interval + watermark horizon and expires
    * it as the watermark advances (the canonical stream-stream join
    * discipline); on batch inputs `withWatermark` is a no-op and this
    * is a plain interval equi-join — the batch twin used by the q54
    * oracle. One shuffle on user_id for each side; state per user is
    * bounded by event rate × horizon. */
  def correlate(events: DataFrame, typeA: String, typeB: String,
      withinSeconds: Long, watermark: String): DataFrame =
    correlateImpl(events, typeA, typeB, withinSeconds, watermark, "inner")

  /** LEFT OUTER stream-stream interval join: like [[correlate]], but a
    * `typeA` event with NO `typeB` match in its window still emits —
    * `b_id`/`gap_us` null — the "clicks that never converted" shape an
    * inner join silently drops. On a stream the null row for a given
    * click is emitted only once the WATERMARK passes the end of its
    * match window (before that, a matching purchase could still
    * arrive) — so rows inside the current horizon are pending, not
    * lost; EventStreamSpec pins exactly which rows a stopped stream
    * has emitted vs still owes. State stays bounded exactly as in the
    * inner case: interval + watermark horizon per side. */
  def correlateOuter(events: DataFrame, typeA: String, typeB: String,
      withinSeconds: Long, watermark: String): DataFrame =
    correlateImpl(events, typeA, typeB, withinSeconds, watermark, "leftOuter")

  /** FULL OUTER stream-stream interval join: [[correlateOuter]] plus
    * the `typeB` events no `typeA` window covers (`a_id`/`gap_us`
    * null) — purchases with no attributable click in one pass with
    * clicks that never converted. Same watermark-closed-window
    * emission discipline on both null sides. */
  def correlateFull(events: DataFrame, typeA: String, typeB: String,
      withinSeconds: Long, watermark: String): DataFrame =
    correlateImpl(events, typeA, typeB, withinSeconds, watermark, "fullOuter")

  private def correlateImpl(events: DataFrame, typeA: String, typeB: String,
      withinSeconds: Long, watermark: String, joinType: String): DataFrame = {
    val a = events.filter(col("event_type") === typeA)
      .select(col("event_id").as("a_id"), col("user_id").as("a_user"), col("ts").as("a_ts"))
      .withWatermark("a_ts", watermark)
    val b = events.filter(col("event_type") === typeB)
      .select(col("event_id").as("b_id"), col("user_id").as("b_user"), col("ts").as("b_ts"))
      .withWatermark("b_ts", watermark)
    a.join(b,
        col("a_user") === col("b_user") &&
          col("b_ts") >= col("a_ts") &&
          col("b_ts") <= col("a_ts") + expr(s"INTERVAL $withinSeconds SECONDS"),
        joinType)
      // b-only rows of a full outer carry a null a_user
      .select(coalesce(col("a_user"), col("b_user")).as("user_id"),
        col("a_id"), col("b_id"),
        (unix_micros(col("b_ts")) - unix_micros(col("a_ts"))).as("gap_us"))
  }

  /** Exactly-once-per-id ingestion: drop duplicate `idCols` arrivals
    * within the watermark horizon. Uses
    * `dropDuplicatesWithinWatermark`, so the per-id state expires once
    * the watermark passes the first-seen event time + delay — bounded
    * state, unlike a plain streaming `dropDuplicates` whose id set
    * grows forever. The dedup state shuffles once on the id columns;
    * at 100 TB the delay chooses the state size (ids seen within one
    * horizon), not the corpus size. */
  def dedupedStream(events: DataFrame, watermark: String, idCols: Seq[String]): DataFrame =
    events.withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark(idCols.head, idCols.tail: _*)

  private def tsUs(e: Event): Long = e.ts.getTime * 1000 + (e.ts.getNanos / 1000) % 1000

  /** Gap-based sessionization: events within `gapSeconds` of the
    * session's end extend it; otherwise the session closes and is
    * emitted. Open sessions close via event-time timeout once the
    * watermark passes their gap horizon.
    *
    * Semantics notes:
    *  - after a timeout closes a session, a TOMBSTONE state (n = 0)
    *    retains the per-user session counter so later sessions never
    *    reuse an emitted (user_id, session_id); tombstones expire
    *    after 10 further gaps of inactivity;
    *  - late-but-within-watermark events that sort before the open
    *    session's start MERGE into it (extending `session_start_us`
    *    backward) — a batch recomputation with global ordering might
    *    instead call them a separate earlier session. Streaming
    *    cannot retroactively renumber emitted sessions; choose the
    *    watermark delay no larger than the session gap if this
    *    distinction matters;
    *  - timeout timestamps are clamped above the current watermark.
    *    Spark 4.1 drops late rows before this operator (pinned in
    *    EventStreamSpec via numRowsDroppedByWatermark), so surviving
    *    rows always produce a valid timeout — the clamp is defense
    *    against versions/configs where a boundary row reaches the
    *    function and an unclamped setTimeoutTimestamp would throw
    *    IllegalArgumentException and kill the query. */
  def sessionize(spark: SparkSession, events: Dataset[Event],
      gapSeconds: Long, watermark: String): Dataset[SessionSummary] = {
    import spark.implicits._
    val gapUs = gapSeconds * 1000000L

    def fn(userId: Long, batch: Iterator[Event],
        state: GroupState[SessionState]): Iterator[SessionSummary] = {
      // EventTimeTimeout requires a timestamp strictly beyond the
      // current watermark; clamp so no input pattern can make
      // setTimeoutTimestamp throw and kill the query (see scaladoc).
      def setTimeout(atMs: Long): Unit =
        state.setTimeoutTimestamp(math.max(state.getCurrentWatermarkMs + 1, atMs))
      if (state.hasTimedOut) {
        val s = state.get
        if (s.n == 0) { // tombstone expired: user idle for 10+ gaps
          state.remove()
          Iterator.empty
        } else {
          state.update(s.copy(n = 0)) // keep the counter as a tombstone
          setTimeout(state.getCurrentWatermarkMs + gapSeconds * 10 * 1000)
          Iterator(SessionSummary(userId, s.sessionId, s.n, s.startUs, s.endUs))
        }
      } else {
        val sorted = batch.toVector.sortBy(e => (tsUs(e), e.event_id))
        var closed = Vector.empty[SessionSummary]
        var cur = state.getOption
        sorted.foreach { e =>
          val us = tsUs(e)
          cur = cur match {
            case Some(s) if s.n == 0 => // revive from tombstone: next id
              Some(SessionState(s.sessionId + 1, us, us, 1))
            case Some(s) if us - s.endUs <= gapUs =>
              Some(s.copy(startUs = math.min(s.startUs, us),
                endUs = math.max(s.endUs, us), n = s.n + 1))
            case Some(s) =>
              closed :+= SessionSummary(userId, s.sessionId, s.n, s.startUs, s.endUs)
              Some(SessionState(s.sessionId + 1, us, us, 1))
            case None =>
              Some(SessionState(1, us, us, 1))
          }
        }
        cur.foreach { s =>
          state.update(s)
          if (s.n > 0) // close the session once event time passes its gap horizon
            setTimeout(s.endUs / 1000 + gapSeconds * 1000)
        }
        closed.iterator
      }
    }

    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(fn)
  }
}

/** The [[EventStream.kmvSketchStream]] state machine: per key, the
  * running (n_seen, k smallest distinct hashes). The merge —
  * distinct-union then take-k-smallest — is order- and
  * batching-independent, so the final state equals the batch
  * bottom-k whatever the chunking. Top-level class — Spark
  * serializes the processor to every task. */
/** The [[EventStream.topKStream]] state machine: per key, the k
  * largest (value, id) entries under the total order (value desc, id
  * asc). Merging a batch is entries ∪ rows → sort → take k —
  * batching-independent because top-k of a union under a total order
  * is associative. State is two parallel k-arrays (a Product
  * encoder); values pass through EXACTLY (no arithmetic), so emitted
  * doubles hash-match the source parquet. Top-level class — Spark
  * serializes the processor to every task. */
final class TopKProcessor(k: Int)
    extends org.apache.spark.sql.streaming.StatefulProcessor[
      String, EventStream.TopKEvent, EventStream.TopKRow] {
  import org.apache.spark.sql.streaming.{OutputMode => OM, TimeMode, TimerValues, TTLConfig, ValueState}

  @transient private var st: ValueState[EventStream.TopKState] = _

  override def init(outputMode: OM, timeMode: TimeMode): Unit =
    st = getHandle.getValueState[EventStream.TopKState]("topk",
      org.apache.spark.sql.Encoders.product[EventStream.TopKState],
      TTLConfig.NONE)

  override def handleInputRows(key: String,
      rows: Iterator[EventStream.TopKEvent],
      timerValues: TimerValues): Iterator[EventStream.TopKRow] = {
    val prev = if (st.exists()) st.get()
      else EventStream.TopKState(0L, Array.empty[Long], Array.empty[Double])
    val incoming = rows.map(e => (e.value, e.event_id)).toArray
    val merged = (prev.values.zip(prev.ids) ++ incoming)
      .sortBy { case (v, id) => (-v, id) }.take(k)
    val next = EventStream.TopKState(prev.n_seen + incoming.length,
      merged.map(_._2), merged.map(_._1))
    st.update(next)
    merged.iterator.zipWithIndex.map { case ((v, id), i) =>
      EventStream.TopKRow(key, next.n_seen, i + 1L, id, v)
    }
  }
}

final class KmvSketchProcessor(k: Int)
    extends org.apache.spark.sql.streaming.StatefulProcessor[
      String, EventStream.KmvEvent, EventStream.KmvSketch] {
  import org.apache.spark.sql.streaming.{OutputMode => OM, TimeMode, TimerValues, TTLConfig, ValueState}

  @transient private var st: ValueState[EventStream.KmvState] = _

  override def init(outputMode: OM, timeMode: TimeMode): Unit =
    st = getHandle.getValueState[EventStream.KmvState]("kmv",
      org.apache.spark.sql.Encoders.product[EventStream.KmvState],
      TTLConfig.NONE)

  override def handleInputRows(key: String,
      rows: Iterator[EventStream.KmvEvent],
      timerValues: TimerValues): Iterator[EventStream.KmvSketch] = {
    val prev = if (st.exists()) st.get()
      else EventStream.KmvState(0L, Array.empty[Long])
    val hs = rows.map(_.h).toArray
    val next = EventStream.KmvState(prev.n_seen + hs.length,
      (prev.mins ++ hs).distinct.sorted.take(k))
    st.update(next)
    Iterator.single(EventStream.KmvSketch(
      key, next.n_seen, next.mins.mkString("_")))
  }
}

/** The [[EventStream.bootstrapDedup]] state machine: one boolean
  * `ValueState` per dedup key. `handleInitialState` runs BEFORE any
  * input — every historical key is marked seen, so the stream's
  * replay of pre-cut content cannot re-emit. Within one micro-batch
  * the first occurrence is chosen by (us, event_id) — batch-split
  * independent, because files are staged in strict time order so a
  * key's global first occurrence is in the earliest batch where the
  * key appears. Top-level class — Spark serializes the processor to
  * every task. */
final class BootstrapDedupProcessor
    extends org.apache.spark.sql.streaming.StatefulProcessorWithInitialState[
      EventStream.DedupKey, EventStream.KeyedEvent, EventStream.FirstSeen, Boolean] {
  import org.apache.spark.sql.streaming.{OutputMode => OM, TimeMode, TimerValues, TTLConfig, ValueState}

  @transient private var seen: ValueState[Boolean] = _

  override def init(outputMode: OM, timeMode: TimeMode): Unit =
    seen = getHandle.getValueState[Boolean]("seen",
      org.apache.spark.sql.Encoders.scalaBoolean, TTLConfig.NONE)

  override def handleInitialState(key: EventStream.DedupKey,
      initialState: Boolean, timerValues: TimerValues): Unit =
    seen.update(true)

  override def handleInputRows(key: EventStream.DedupKey,
      rows: Iterator[EventStream.KeyedEvent],
      timerValues: TimerValues): Iterator[EventStream.FirstSeen] = {
    if (seen.exists()) Iterator.empty
    else {
      val first = rows.minBy(e => (e.us, e.event_id))
      seen.update(true)
      Iterator.single(EventStream.FirstSeen(
        key.user_id, key.event_type, key.day, first.event_id, first.us))
    }
  }
}

/** The [[EventStream.runningTotals]] state machine: one named
  * `ValueState` holding the user's cumulative (count, micro-sum).
  * Values quantize to micros (the q89 discipline) so the running sum
  * is exact however the batches split. Top-level class — Spark
  * serializes the processor to every task. */
final class RunningTotalsProcessor
    extends org.apache.spark.sql.streaming.StatefulProcessor[
      Long, EventStream.Event, EventStream.UserRunning] {
  import org.apache.spark.sql.streaming.{OutputMode => OM, TimeMode, TimerValues, TTLConfig, ValueState}

  @transient private var totals: ValueState[(Long, Long)] = _

  override def init(outputMode: OM, timeMode: TimeMode): Unit =
    totals = getHandle.getValueState[(Long, Long)]("totals",
      org.apache.spark.sql.Encoders.tuple(
        org.apache.spark.sql.Encoders.scalaLong,
        org.apache.spark.sql.Encoders.scalaLong),
      TTLConfig.NONE)

  override def handleInputRows(key: Long,
      rows: Iterator[EventStream.Event],
      timerValues: TimerValues): Iterator[EventStream.UserRunning] = {
    val (n0, s0) = if (totals.exists()) totals.get() else (0L, 0L)
    var n = n0
    var s = s0
    rows.foreach { e =>
      n += 1
      s += math.round(e.value * 1000000d)
    }
    totals.update((n, s))
    Iterator.single(EventStream.UserRunning(key, n, s))
  }
}
