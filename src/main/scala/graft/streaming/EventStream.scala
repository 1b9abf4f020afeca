package graft.streaming

import graft.functions.Fns._
import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode, StatefulProcessor, TimeMode, TimerValues, ValueState}

/** Streaming analytics over an event stream: watermarked tumbling
  * windows. The aggregation body is identical to the batch
  * `Analytics2.q14TumblingWindow`, so a batch replay of the stream
  * produces the batch answer — the property the spec asserts. */
object EventStream {

  /** 1-hour tumbling window counts/sums with a late-data watermark.
    * Works on both batch and streaming DataFrames. */
  def windowedAgg(events: DataFrame, watermark: String = "2 hours"): DataFrame = {
    val src =
      if (events.isStreaming) events.withWatermark("ts", watermark) else events
    src.groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
      .select(col("window.start").as("w_start"), col("event_type"),
        col("n"), col("sum_value"))
  }

  /** Running HISTOGRAM counters over an arriving event stream — the
    * streaming twin of qa08's sketch build and the third streaming
    * sketch beside stream_cms/stream_hll: one Complete-mode groupBy
    * whose state is PROVABLY bounded at |types| × 256 (event_type,
    * bin) rows by the sketch geometry — no watermark or TTL (the
    * stream_staleness class of safe unbounded-stream aggregations).
    * `geometry` is the per-type [min, max] frame computed at corpus
    * freeze ([[graft.operators.Analytics3.histGeometry]] — the
    * BloomStream/SemStream frozen-index rule: bins must not shift as
    * data arrives); the bin projection + counter build are LITERALLY
    * shared with the oracle-gated batch sketch
    * ([[graft.operators.Analytics3.histogramOf]]). A deployment
    * snapshots the bounded table per trigger and merges snapshots
    * across streams/days by bin-wise addition; quantile lookups run
    * against any snapshot without touching the events again. */
  def histogramCounters(evStream: DataFrame, geometry: DataFrame): DataFrame =
    graft.operators.Analytics3.histogramOf(
      evStream.select(col("event_type"), col("value")), geometry)

  /** Stream-stream interval join: clicks matched to the same user's
    * purchases within the next 10 minutes. Watermarks on both sides
    * bound the join state; the event-time range condition lets Spark
    * evict rows once the other side's watermark passes. Works on
    * batch DataFrames too (same rows as the banded q15 operator). */
  def clickPurchaseJoin(events: DataFrame, watermark: String = "1 hour"): DataFrame = {
    def side(t: String, idCol: String, tsCol: String): DataFrame = {
      val s = events.filter(col("event_type") === t)
        .select(col("event_id").as(idCol), col("user_id"), col("ts").as(tsCol))
      if (s.isStreaming) s.withWatermark(tsCol, watermark) else s
    }
    val clicks = side("click", "a_id", "a_ts")
    val purchases = side("purchase", "b_id", "b_ts").withColumnRenamed("user_id", "b_user")
    clicks.join(purchases,
        col("user_id") === col("b_user") &&
        col("b_ts") > col("a_ts") &&
        col("b_ts") <= col("a_ts") + expr("INTERVAL 10 MINUTES"))
      .select(col("a_id"), col("b_id"), col("user_id"),
        ((unix_micros(col("b_ts")) - unix_micros(col("a_ts"))) / lit(1000000.0)).as("gap_s"))
  }

  case class SessEvent(user_id: Long, event_id: Long,
                       ts: java.sql.Timestamp, event_type: String)

  /** `types` is the session's distinct event-type set (sorted for
    * determinism) — downstream composites (e.g. the q27 funnel) read
    * their stage flags straight off the closed session, no second
    * pass over raw events. */
  case class SessionRow(user_id: Long, sess_id: Long, n_events: Long,
                        n_types: Long, dur_s: Double, types: Seq[String])

  private val GapUs = 30L * 60 * 1000000 // 30-minute session gap
  private def micros(t: java.sql.Timestamp): Long =
    // floorDiv, not /: getTime truncates toward zero for pre-1970
    // instants while getNanos stays non-negative, so -0.5s would
    // otherwise encode as +0.5s — mis-sorting the batch and
    // corrupting every µs round-trip (same defect class as the
    // JdbcUpsertSink.keyHash fix)
    Math.floorDiv(t.getTime, 1000) * 1000000 + t.getNanos / 1000

  /** A buffered event of a not-yet-closable session. */
  private[streaming] case class BufEvent(us: Long, event_id: Long,
                                         event_type: String)

  /** The shared GAP-WINDOW machinery (review r9: it was duplicated
    * verbatim between the sessionize and windowed-dedup processors —
    * a one-sided fix to the lateness/timer logic would silently
    * diverge the twins): events are only BUFFERED in
    * `handleInputRows` (keyed ListState), and windows close
    * exclusively in `handleExpiredTimer` once the watermark proves no
    * in-flight event can extend OR MERGE them — an eager in-batch
    * close would mis-split when a late-but-on-time event later lands
    * in an apparent gap and bridges two windows. A window with last
    * event L is closable iff L + gap < watermark: any still-possible
    * event has t ≥ watermark, hence t − L > gap. Closable windows
    * always form a time-prefix of the buffer, so the buffer is
    * rewritten to the open tail and state stays O(events within
    * gap+lateness of the frontier) per key — plus the cumulative
    * per-key window counter, which must OUTLIVE each close (batch
    * sess_id/win numbering is cumulative over the key's history; a
    * restart at 1 would collide with already-emitted rows). A timer
    * made stale by an extension is ignored via the watermark guard
    * rather than deleted (one fewer state-store round trip).
    * Subclasses supply the gap, the state names (checkpoint
    * identity) and the closed-window row. */
  private[streaming] abstract class GapCloseProcessor[K, R](
      gapUs: Long, bufName: String, seqName: String)
      extends StatefulProcessor[K, SessEvent, R] {
    @transient private var buf: org.apache.spark.sql.streaming.ListState[BufEvent] = _
    @transient private var seqState: ValueState[Long] = _

    /** Build the emitted row for a closed window (`seq` is the
      * cumulative per-key window number; `events` arrive sorted by
      * (us, event_id)). */
    protected def closeRow(key: K, seq: Long, events: Seq[BufEvent]): R

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      buf = getHandle.getListState(bufName, Encoders.product[BufEvent],
        org.apache.spark.sql.streaming.TTLConfig.NONE)
      seqState = getHandle.getValueState(seqName, Encoders.scalaLong,
        org.apache.spark.sql.streaming.TTLConfig.NONE)
    }

    private def close(key: K, events: Seq[BufEvent]): R = {
      val seq = (if (seqState.exists()) seqState.get() else 0L) + 1
      seqState.update(seq)
      closeRow(key, seq, events)
    }

    override def handleInputRows(key: K, rows: Iterator[SessEvent],
                                 timerValues: TimerValues): Iterator[R] = {
      var maxUs = Long.MinValue
      var minUs = Long.MaxValue
      rows.foreach { e =>
        val us = micros(e.ts)
        maxUs = math.max(maxUs, us)
        minUs = math.min(minUs, us)
        buf.appendValue(BufEvent(us, e.event_id, e.event_type))
      }
      // +1 ms: closable is STRICT (an event exactly at the watermark
      // with t − L == gap still extends the window)
      if (maxUs != Long.MinValue) {
        getHandle.registerTimer(Math.floorDiv(maxUs, 1000) + gapUs / 1000 + 1)
        // ALSO fire at the batch's earliest possible close point: a
        // batch spanning several windows would otherwise hold its
        // closable prefix until the watermark passes the LAST
        // window's end+gap — correct but with emission latency (and
        // buffered-state residency) growing with the key's in-batch
        // time span
        if (minUs != maxUs)
          getHandle.registerTimer(Math.floorDiv(minUs, 1000) + gapUs / 1000 + 1)
      }
      Iterator.empty
    }

    override def handleExpiredTimer(key: K, timerValues: TimerValues,
                                    expired: ExpiredTimerInfo): Iterator[R] = {
      val wmUs = timerValues.getCurrentWatermarkInMs * 1000
      val events = {
        val it = buf.get()
        val b = Seq.newBuilder[BufEvent]
        while (it.hasNext) b += it.next()
        b.result()
      }.sortBy(e => (e.us, e.event_id))
      if (events.isEmpty) return Iterator.empty
      // split into windows on the gap
      val windows = Seq.newBuilder[Seq[BufEvent]]
      var cur = Seq.newBuilder[BufEvent]
      var last = events.head.us
      events.foreach { e =>
        if (e.us - last > gapUs) { windows += cur.result(); cur = Seq.newBuilder }
        cur += e
        last = math.max(last, e.us)
      }
      windows += cur.result()
      val all = windows.result()
      // closable windows form a prefix (ordered by time)
      val (closed, open) = all.partition(s => s.last.us + gapUs < wmUs)
      if (closed.nonEmpty) {
        buf.clear()
        if (open.nonEmpty) buf.put(open.flatten.toArray)
        closed.iterator.map(close(key, _))
      } else Iterator.empty
    }
  }

  /** Event-time sessionization — the streaming twin of the batch
    * `Analytics.q09Sessionize` (30-minute gap) on the shared
    * [[GapCloseProcessor]] machinery. */
  private[streaming] class SessionizeProcessor
      extends GapCloseProcessor[Long, SessionRow](GapUs, "buf", "seq") {
    override protected def closeRow(user: Long, seq: Long,
                                    events: Seq[BufEvent]): SessionRow = {
      val ts = events.map(_.event_type).distinct.sorted
      SessionRow(user, seq, events.size.toLong, ts.size.toLong,
        (events.last.us - events.head.us) / 1000000.0, ts)
    }
  }

  /** Sessionize an event stream: emits each CLOSED session (append
    * semantics). `watermark` bounds lateness; a session closes when
    * the watermark passes its last event + 30 min. Batch inputs
    * should use the batch q09 operator instead. */
  def sessionize(events: DataFrame, watermark: String = "0 seconds"): Dataset[SessionRow] = {
    val spark = events.sparkSession
    import spark.implicits._
    MaillogStream.useRocksDbStateStore(spark)
    events.withWatermark("ts", watermark)
      .select(col("user_id").cast("long").as("user_id"),
        col("event_id").cast("long").as("event_id"),
        col("ts"), col("event_type"))
      .as[SessEvent]
      .groupByKey(_.user_id)
      .transformWithState(new SessionizeProcessor,
        TimeMode.EventTime(), OutputMode.Append())
  }

  /** A closed suppression window of the streaming horizon dedup —
    * exactly one batch q34 row. */
  case class WinDedupRow(user_id: Long, event_type: String, win: Long,
                         keep_event_id: Long, n_copies: Long, span_s: Double)

  private val DedupGapUs = 600L * 1000000 // q34's 10-minute horizon

  /** Horizon-windowed dedup — the streaming twin of batch
    * `Analytics3.q34WindowedDedup` on the shared
    * [[GapCloseProcessor]] machinery, keyed by the DEDUP key
    * (user, type) with q34's 10-minute gap: per closed window the
    * opening keeper, copies absorbed, and span (the bridging-late-
    * copy hazard and the cumulative `win` numbering are the base
    * class's contract, shared with sessionization by construction). */
  private[streaming] class WindowDedupProcessor
      extends GapCloseProcessor[(Long, String), WinDedupRow](
        DedupGapUs, "wbuf", "wseq") {
    override protected def closeRow(key: (Long, String), seq: Long,
                                    events: Seq[BufEvent]): WinDedupRow =
      WinDedupRow(key._1, key._2, seq, events.head.event_id,
        events.size.toLong, (events.last.us - events.head.us) / 1000000.0)
  }

  /** Streaming horizon dedup over an event stream: emits each CLOSED
    * suppression window (append semantics); replay with the
    * watermark past the last event equals batch q34 row-for-row
    * (spec-asserted). Batch inputs should use the batch operator. */
  def windowedDedup(events: DataFrame,
                    watermark: String = "0 seconds"): Dataset[WinDedupRow] = {
    val spark = events.sparkSession
    import spark.implicits._
    MaillogStream.useRocksDbStateStore(spark)
    events.withWatermark("ts", watermark)
      .select(col("user_id").cast("long").as("user_id"),
        col("event_id").cast("long").as("event_id"),
        col("ts"), col("event_type"))
      .as[SessEvent]
      .groupByKey(e => (e.user_id, e.event_type))
      .transformWithState(new WindowDedupProcessor,
        TimeMode.EventTime(), OutputMode.Append())
  }

  /** A closed SCD2 validity interval (valid_to = the next state's
    * start — exactly the batch q32 rows whose valid_to is non-null). */
  case class ScdRow(user_id: Long, version: Long, state: String,
                    valid_from: java.sql.Timestamp, valid_to: java.sql.Timestamp)

  /** Open interval per user: version counter rides in the same state
    * value — unlike sessionization there is no timer-close, so the
    * counter and the payload share a lifetime. */
  case class OpenScd(version: Long, state: String, startUs: Long)

  private def tsOfMicros(us: Long): java.sql.Timestamp = {
    val t = new java.sql.Timestamp(Math.floorDiv(us, 1000000) * 1000)
    t.setNanos((Math.floorMod(us, 1000000) * 1000).toInt)
    t
  }

  /** Incremental SCD2 (type-2 dimension maintenance) — the streaming
    * twin of the batch `Analytics3.q32Scd2`: per user, consecutive
    * same-type events merge into one open interval; a state CHANGE
    * closes the previous interval (emitted, append semantics) and
    * opens the next. The currently-open interval lives only in keyed
    * state — it is not emittable under Append until its close
    * arrives, which is the CDC contract (emit on change).
    *
    * Correct under ALLOWED LATENESS, same discipline as
    * [[SessionizeProcessor]]: events are only BUFFERED in
    * `handleInputRows` (an eager apply would emit an inverted
    * interval — valid_to < valid_from — and wrong versions when a
    * later micro-batch delivers an earlier-timestamped event), and
    * transitions are applied exclusively in `handleExpiredTimer` for
    * the buffer prefix the watermark has passed: an event at t is
    * applied only once t < watermark, when no in-flight event can
    * sort before it (future events all have t' ≥ watermark, and the
    * (us, event_id) tie-break needs t strictly below). Buffered
    * state is O(events within lateness of the frontier) per user;
    * the applied-state tuple is O(1). Emission latency for a closed
    * interval is the watermark delay past its closing event. */
  private[streaming] class Scd2Processor
      extends StatefulProcessor[Long, SessEvent, ScdRow] {
    @transient private var buf: org.apache.spark.sql.streaming.ListState[BufEvent] = _
    @transient private var open: ValueState[OpenScd] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      buf = getHandle.getListState("scdbuf", Encoders.product[BufEvent],
        org.apache.spark.sql.streaming.TTLConfig.NONE)
      open = getHandle.getValueState("open", Encoders.product[OpenScd],
        org.apache.spark.sql.streaming.TTLConfig.NONE)
    }

    override def handleInputRows(user: Long, rows: Iterator[SessEvent],
                                 timerValues: TimerValues): Iterator[ScdRow] = {
      var maxUs = Long.MinValue
      var minUs = Long.MaxValue
      rows.foreach { e =>
        val us = micros(e.ts)
        maxUs = math.max(maxUs, us)
        minUs = math.min(minUs, us)
        buf.appendValue(BufEvent(us, e.event_id, e.event_type))
      }
      // +1 ms: applicable is STRICT (us < watermark); fire at the
      // batch min too so an early prefix flushes as soon as the
      // watermark allows, not only after it passes the batch max
      if (maxUs != Long.MinValue) {
        getHandle.registerTimer(Math.floorDiv(maxUs, 1000) + 1)
        if (minUs != maxUs)
          getHandle.registerTimer(Math.floorDiv(minUs, 1000) + 1)
      }
      Iterator.empty
    }

    override def handleExpiredTimer(user: Long, timerValues: TimerValues,
                                    expired: ExpiredTimerInfo): Iterator[ScdRow] = {
      val wmUs = timerValues.getCurrentWatermarkInMs * 1000
      val events = {
        val it = buf.get()
        val b = Seq.newBuilder[BufEvent]
        while (it.hasNext) b += it.next()
        b.result()
      }.sortBy(e => (e.us, e.event_id))
      if (events.isEmpty) return Iterator.empty
      val (apply, hold) = events.partition(_.us < wmUs)
      if (apply.isEmpty) return Iterator.empty
      var cur = Option(open.get())
      val out = Seq.newBuilder[ScdRow]
      apply.foreach { e =>
        cur match {
          case Some(s) if s.state == e.event_type => () // consecutive dup
          case Some(s) =>
            out += ScdRow(user, s.version, s.state,
              tsOfMicros(s.startUs), tsOfMicros(e.us))
            cur = Some(OpenScd(s.version + 1, e.event_type, e.us))
          case None =>
            cur = Some(OpenScd(1L, e.event_type, e.us))
        }
      }
      cur.foreach(open.update)
      buf.clear()
      if (hold.nonEmpty) buf.put(hold.toArray)
      out.result().iterator
    }
  }

  /** ORDERED-INPUT SCD2: applies transitions eagerly with no
    * buffering. Cross-batch event-time order is a HARD PRECONDITION
    * (a CDC source emitting per-key ordered changes); an event older
    * than the open interval's start is DROPPED — never applied — so
    * a contract violation degrades to a lost transition, not an
    * inverted interval (valid_to < valid_from) with corrupted
    * versions. Runs in TimeMode.None: no watermark floor, so
    * pre-1970 instants work (Spark's event-time path drops any row
    * below the initial epoch-0 watermark, which makes [[scd2]]
    * unusable for sub-epoch data). Prefer [[scd2]] for sources with
    * bounded disorder. */
  private[streaming] class Scd2OrderedProcessor
      extends StatefulProcessor[Long, SessEvent, ScdRow] {
    @transient private var open: ValueState[OpenScd] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      open = getHandle.getValueState("open", Encoders.product[OpenScd],
        org.apache.spark.sql.streaming.TTLConfig.NONE)

    override def handleInputRows(user: Long, rows: Iterator[SessEvent],
                                 timerValues: TimerValues): Iterator[ScdRow] = {
      val sorted = rows.toSeq.sortBy(e => (micros(e.ts), e.event_id))
      var cur = Option(open.get())
      val out = Seq.newBuilder[ScdRow]
      sorted.foreach { e =>
        val us = micros(e.ts)
        cur match {
          case Some(s) if us < s.startUs => () // stale: drop, never invert
          case Some(s) if s.state == e.event_type => () // consecutive dup
          case Some(s) =>
            out += ScdRow(user, s.version, s.state,
              tsOfMicros(s.startUs), tsOfMicros(us))
            cur = Some(OpenScd(s.version + 1, e.event_type, us))
          case None =>
            cur = Some(OpenScd(1L, e.event_type, us))
        }
      }
      cur.foreach(open.update)
      out.result().iterator
    }
  }

  /** [[Scd2OrderedProcessor]] as a query — ordered sources / pre-1970
    * data only; see its contract note. */
  def scd2Ordered(events: DataFrame): Dataset[ScdRow] = {
    val spark = events.sparkSession
    import spark.implicits._
    MaillogStream.useRocksDbStateStore(spark)
    events
      .select(col("user_id").cast("long").as("user_id"),
        col("event_id").cast("long").as("event_id"),
        col("ts"), col("event_type"))
      .as[SessEvent]
      .groupByKey(_.user_id)
      .transformWithState(new Scd2OrderedProcessor,
        TimeMode.None(), OutputMode.Append())
  }

  /** Maintain a type-2 dimension from an event stream: emits each
    * interval as it CLOSES, once the watermark passes the closing
    * event. Replaying a stream (with the watermark advanced past the
    * final transition) yields exactly the batch q32 rows with
    * non-null valid_to (spec-asserted). */
  def scd2(events: DataFrame, watermark: String = "0 seconds"): Dataset[ScdRow] = {
    val spark = events.sparkSession
    import spark.implicits._
    MaillogStream.useRocksDbStateStore(spark)
    events.withWatermark("ts", watermark)
      .select(col("user_id").cast("long").as("user_id"),
        col("event_id").cast("long").as("event_id"),
        col("ts"), col("event_type"))
      .as[SessEvent]
      .groupByKey(_.user_id)
      .transformWithState(new Scd2Processor,
        TimeMode.EventTime(), OutputMode.Append())
  }

  case class EwmaEvent(user_id: Long, event_id: Long,
                       ts: java.sql.Timestamp, value: Double)
  case class EwmaRow(user_id: Long, event_id: Long, value: Double,
                     ewma: Double, is_spike: Boolean)
  private[streaming] case class BufVal(us: Long, event_id: Long, value: Double)
  /** Last ≤ 7 values, NEWEST FIRST — the whole per-user applied
    * state of the EWMA (7 doubles, O(1) per key). */
  private[streaming] case class EwmaRing(vals: Seq[Double])

  /** STREAMING EWMA spike detector — the twin of batch q35: per
    * user in event-time order, the α = ½ exponentially-weighted mean
    * of the current + previous 7 values, spike = value > 2×
    * baseline. The arithmetic is the SAME fixed left-to-right sum of
    * exact binary-fraction products as the batch operator, so replay
    * equals q35 bit-for-bit (spec-asserted).
    *
    * Same allowed-lateness discipline as [[Scd2Processor]]: events
    * only BUFFER in `handleInputRows` (an eager apply would compute
    * baselines over a wrong 7-window when a later micro-batch
    * delivers an earlier event) and apply in `handleExpiredTimer`
    * for the prefix the watermark has passed. Applied state is the
    * O(1) 7-value ring; buffered state is O(events within lateness
    * of the frontier) per user. */
  private[streaming] class EwmaProcessor
      extends StatefulProcessor[Long, EwmaEvent, EwmaRow] {
    @transient private var buf: org.apache.spark.sql.streaming.ListState[BufVal] = _
    @transient private var ring: ValueState[EwmaRing] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      buf = getHandle.getListState("ewmabuf", Encoders.product[BufVal],
        org.apache.spark.sql.streaming.TTLConfig.NONE)
      ring = getHandle.getValueState("ring", Encoders.product[EwmaRing],
        org.apache.spark.sql.streaming.TTLConfig.NONE)
    }

    override def handleInputRows(user: Long, rows: Iterator[EwmaEvent],
                                 timerValues: TimerValues): Iterator[EwmaRow] = {
      var maxUs = Long.MinValue
      var minUs = Long.MaxValue
      rows.foreach { e =>
        val us = micros(e.ts)
        maxUs = math.max(maxUs, us)
        minUs = math.min(minUs, us)
        buf.appendValue(BufVal(us, e.event_id, e.value))
      }
      if (maxUs != Long.MinValue) {
        getHandle.registerTimer(Math.floorDiv(maxUs, 1000) + 1)
        if (minUs != maxUs)
          getHandle.registerTimer(Math.floorDiv(minUs, 1000) + 1)
      }
      Iterator.empty
    }

    override def handleExpiredTimer(user: Long, timerValues: TimerValues,
                                    expired: ExpiredTimerInfo): Iterator[EwmaRow] = {
      val wmUs = timerValues.getCurrentWatermarkInMs * 1000
      val events = {
        val it = buf.get()
        val b = Seq.newBuilder[BufVal]
        while (it.hasNext) b += it.next()
        b.result()
      }.sortBy(e => (e.us, e.event_id))
      if (events.isEmpty) return Iterator.empty
      val (apply, hold) = events.partition(_.us < wmUs)
      if (apply.isEmpty) return Iterator.empty
      var r = Option(ring.get()).map(_.vals).getOrElse(Seq.empty)
      val out = Seq.newBuilder[EwmaRow]
      apply.foreach { e =>
        if (r.length == 7) {
          // identical term order to Analytics3.q35EwmaSpikes: the
          // lag-1 product adds first, so the float sum is bit-equal
          val num = (1 to 7).foldLeft(e.value)((acc, k) =>
            acc + r(k - 1) * graft.operators.Analytics3.EwmaWeights(k - 1))
          val ewma = num / graft.operators.Analytics3.EwmaDen
          out += EwmaRow(user, e.event_id, e.value, ewma, e.value > ewma * 2.0)
        }
        r = (e.value +: r).take(7)
      }
      ring.update(EwmaRing(r))
      buf.clear()
      if (hold.nonEmpty) buf.put(hold.toArray)
      out.result().iterator
    }
  }

  /** Streaming EWMA spikes over an event stream — emits each
    * full-window baseline once the watermark passes its event;
    * replay with the watermark advanced past the last event yields
    * exactly the batch q35 rows (spec-asserted, bit-for-bit). */
  def ewmaSpikes(events: DataFrame, watermark: String = "0 seconds"): Dataset[EwmaRow] = {
    val spark = events.sparkSession
    import spark.implicits._
    MaillogStream.useRocksDbStateStore(spark)
    events.withWatermark("ts", watermark)
      .select(col("user_id").cast("long").as("user_id"),
        col("event_id").cast("long").as("event_id"),
        col("ts"), col("value").cast("double").as("value"))
      .as[EwmaEvent]
      .groupByKey(_.user_id)
      .transformWithState(new EwmaProcessor,
        TimeMode.EventTime(), OutputMode.Append())
  }

  case class TransEvent(user_id: Long, event_id: Long,
                        ts: java.sql.Timestamp, event_type: String)
  private[streaming] case class TransBuf(us: Long, event_id: Long, event_type: String)
  /** The ENTIRE applied per-user state of the transition stream: the
    * last applied event — the lag-1 window reduced to O(1). */
  private[streaming] case class LastEvt(us: Long, event_id: Long, event_type: String)
  case class TransRow(user_id: Long, event_id: Long,
                      from_type: String, to_type: String)

  /** STREAMING first-order transitions — the twin of batch q39's lag
    * window: per user in event-time order, each applied event beyond
    * the first emits its (previous type → this type) edge. Grouping
    * the emitted rows by (from_type, to_type) reproduces q39's
    * transition counts exactly (spec-asserted); the probability
    * column is the same single division downstream.
    *
    * Applied state is ONE (ts, event_id, type) tuple per user — the
    * smallest state of the stateful-processor family (sessionize
    * holds O(events-in-session), SCD2 one open interval, EWMA a
    * 7-value ring). Lateness discipline is [[Scd2Processor]]'s:
    * buffer in handleInputRows, apply the watermark-passed prefix in
    * handleExpiredTimer — an eager apply would thread the lag chain
    * through a wrong predecessor when a late event lands between two
    * already-applied neighbors. */
  private[streaming] class TransitionProcessor
      extends StatefulProcessor[Long, TransEvent, TransRow] {
    @transient private var buf: org.apache.spark.sql.streaming.ListState[TransBuf] = _
    @transient private var last: ValueState[LastEvt] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      buf = getHandle.getListState("transbuf", Encoders.product[TransBuf],
        org.apache.spark.sql.streaming.TTLConfig.NONE)
      last = getHandle.getValueState("lastevt", Encoders.product[LastEvt],
        org.apache.spark.sql.streaming.TTLConfig.NONE)
    }

    override def handleInputRows(user: Long, rows: Iterator[TransEvent],
                                 timerValues: TimerValues): Iterator[TransRow] = {
      var maxUs = Long.MinValue
      var minUs = Long.MaxValue
      rows.foreach { e =>
        val us = micros(e.ts)
        maxUs = math.max(maxUs, us)
        minUs = math.min(minUs, us)
        buf.appendValue(TransBuf(us, e.event_id, e.event_type))
      }
      if (maxUs != Long.MinValue) {
        getHandle.registerTimer(Math.floorDiv(maxUs, 1000) + 1)
        if (minUs != maxUs)
          getHandle.registerTimer(Math.floorDiv(minUs, 1000) + 1)
      }
      Iterator.empty
    }

    override def handleExpiredTimer(user: Long, timerValues: TimerValues,
                                    expired: ExpiredTimerInfo): Iterator[TransRow] = {
      val wmUs = timerValues.getCurrentWatermarkInMs * 1000
      val events = {
        val it = buf.get()
        val b = Seq.newBuilder[TransBuf]
        while (it.hasNext) b += it.next()
        b.result()
      }.sortBy(e => (e.us, e.event_id))
      if (events.isEmpty) return Iterator.empty
      val (apply, hold) = events.partition(_.us < wmUs)
      if (apply.isEmpty) return Iterator.empty
      var prev = Option(last.get())
      val out = Seq.newBuilder[TransRow]
      apply.foreach { e =>
        prev.foreach(p => out += TransRow(user, e.event_id, p.event_type, e.event_type))
        prev = Some(LastEvt(e.us, e.event_id, e.event_type))
      }
      prev.foreach(last.update)
      buf.clear()
      if (hold.nonEmpty) buf.put(hold.toArray)
      out.result().iterator
    }
  }

  /** Streaming transition edges over an event stream; replay with
    * the watermark past the last event, grouped by (from, to),
    * equals batch q39's counts (spec-asserted). */
  def transitions(events: DataFrame, watermark: String = "0 seconds"): Dataset[TransRow] = {
    val spark = events.sparkSession
    import spark.implicits._
    MaillogStream.useRocksDbStateStore(spark)
    events.withWatermark("ts", watermark)
      .select(col("user_id").cast("long").as("user_id"),
        col("event_id").cast("long").as("event_id"),
        col("ts"), col("event_type").cast("string").as("event_type"))
      .as[TransEvent]
      .groupByKey(_.user_id)
      .transformWithState(new TransitionProcessor,
        TimeMode.EventTime(), OutputMode.Append())
  }
}
