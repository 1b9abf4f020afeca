package graft.streaming

import graft.functions.TextFns._
import graft.operators.Dedup
import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** Streaming twin of d18's incremental semantic screen — vectors
  * ARRIVE as a stream and each is screened against the FROZEN corpus
  * through the corpus's own IVF cells, completing the streaming
  * symmetry of the incremental family (near-dup/exact d15 →
  * NearDupStream, verbatim spans d17 → SpanStream, embeddings d18 →
  * here).
  *
  * Design — one stateless routing stage + one stateful argmax:
  *  - ROUTING: the frozen bounded-k centroids are shipped INTO the
  *    query plan as literals ([[frozenCentroids]] collects the ≤64
  *    rows once at stream build — the FAISS pattern of distributing
  *    the coarse quantizer to every worker; this is a bounded
  *    quantizer constant, not a driver-side data loop). Each arriving
  *    vector's cell is then pure per-row Column algebra: 64 codegen'd
  *    LongArrayDot cosines + an array_max over (cos, −c_id) structs —
  *    max cosine, min c_id on exact ties, exactly the batch
  *    assignment rule. No shuffle, no state.
  *  - SCREEN: a stream-static LEFT join keys the routed arrival
  *    against the frozen cell-assigned corpus (the static side of
  *    [[Dedup.semFrozenIndex]]); the per-pair cosine is computed in
  *    the join projection (codegen — arrays never enter state); a
  *    `transformWithState` keyed by vec_id takes the argmax over the
  *    arrival's matches (max cos, min corp_id on ties) and emits the
  *    d18 verdict row. An arrival's matches ride one micro-batch (the
  *    join fans out one row), so state is only a replay-guard bit —
  *    effectively exactly-once, like SpanStream. The left join keeps
  *    empty-cell arrivals (NULL corpus side → verdict keep), matching
  *    batch d18's left join.
  */
object SemStream {

  /** One frozen coarse-quantizer centroid (quantized vector + norm). */
  case class Centroid(c_id: Long, c_qv: Seq[Long], c_nrm: Long)

  case class Match(vec_id: Long, cell: Long,
                   corp_id: java.lang.Long, cos: java.lang.Double)
  case class SemVerdict(vec_id: Long, cell: Long,
                        nearest_corp: java.lang.Long,
                        nearest_cos: java.lang.Double, verdict: String)

  /** Collect the frozen bounded-k centroids for literal shipping —
    * ≤ k rows by construction (the [[graft.operators.Similarity]]
    * id-range stride), collected ONCE at stream build, never per
    * batch. */
  def frozenCentroids(cents: DataFrame): Seq[Centroid] = {
    import cents.sparkSession.implicits._
    cents.select(col("c_id"), col("c_qv"), col("c_nrm"))
      .as[(Long, Seq[Long], Long)].collect().toSeq
      .sortBy(_._1).map(c => Centroid(c._1, c._2, c._3))
  }

  /** The shared routing core: quantize + ≤k literal-centroid
    * cosines + lexicographic array_max — (vec_id, qv, nrm, best)
    * where best = (cos, −c_id) of the winning centroid. */
  private def bestCell(vecs: DataFrame, cents: Seq[Centroid]): DataFrame = {
    require(cents.nonEmpty, "frozen centroid set is empty")
    val qv = quantize(col("embedding"))
    val withQ = vecs.select(col("vec_id"), qv.as("qv"))
      .withColumn("nrm", qnorm2(col("qv")))
    val cands = array(cents.map { c =>
      struct(
        qcos(qdot(col("qv"), typedLit(c.c_qv)), col("nrm"), lit(c.c_nrm)).as("cos"),
        lit(-c.c_id).as("negid"))
    }: _*)
    withQ.withColumn("best", array_max(cands))
  }

  /** Stateless per-row routing: output (vec_id, qv, nrm, cell).
    * Works on streaming AND batch frames (pure projection). */
  def routed(vecs: DataFrame, cents: Seq[Centroid]): DataFrame =
    bestCell(vecs, cents)
      .select(col("vec_id"), col("qv"), col("nrm"),
        (lit(0L) - col("best.negid")).as("cell"))

  /** [[routed]] keeping the WINNING cosine — (vec_id, cell, cos).
    * `cos` is bit-identical to batch [[Dedup.cellFit]]'s (same
    * exact-integer dot, same double division). */
  def routedFit(vecs: DataFrame, cents: Seq[Centroid]): DataFrame =
    bestCell(vecs, cents)
      .select(col("vec_id"),
        (lit(0L) - col("best.negid")).as("cell"),
        col("best.cos").as("cos"))

  /** Streaming twin of qa04's INCREMENT side — the continuous drift
    * dashboard a deployment watches between re-freezes: per frozen
    * cell, RUNNING arrival occupancy (`n_inc`) and the exact
    * floored micro-cosine fit sum (`inc_cos_sum`, batch qa04's
    * integer-mean rule). Stateless per-row routing (the literal
    * quantizer) feeds one streaming groupBy(cell) in Complete mode —
    * the rare unbounded-stream aggregation whose state is PROVABLY
    * bounded with no watermark: at most one row per frozen cell
    * (≤ k by the bounded-stride construction), regardless of how
    * many vectors ever arrive. Join the emitted counters against
    * the corpus-side baselines (batch qa04's corp columns, static
    * at freeze time) to produce the skew/drift report continuously;
    * re-freeze when it trips. SemStreamSpec pins two-checkpoint
    * replay totals == batch qa04's increment columns. */
  def stalenessCounters(vecs: DataFrame, cents: Seq[Centroid]): DataFrame =
    routedFit(vecs, cents)
      .select(col("cell"), floor(col("cos") * 1000000.0).as("cm"))
      .groupBy("cell")
      .agg(count(lit(1)).as("n_inc"), sum("cm").as("inc_cos_sum"))

  /** Replay-guarded per-arrival argmax: max cosine, min corp_id on
    * exact-double ties (the batch two-phase rule), verdict at the
    * threshold; NULL corpus side (empty cell) → keep. The replay
    * guard is one bit per vec_id FOREVER with no TTL — bounded on a
    * replayed fixture, unbounded on a long-running stream — so
    * deployments pass a TTL (the NearDupStream knob): expiring a
    * guard narrows the replay window to the TTL (a recovery replay
    * older than it re-emits that vec_id's verdict) in exchange for
    * bounded state. */
  private[streaming] class ScreenProcessor(minCos: Double, stateTtlMs: Long)
      extends StatefulProcessor[Long, Match, SemVerdict] {
    @transient private var done: ValueState[Boolean] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      val ttl =
        if (stateTtlMs > 0) TTLConfig(java.time.Duration.ofMillis(stateTtlMs))
        else TTLConfig.NONE
      done = getHandle.getValueState("done", Encoders.scalaBoolean, ttl)
    }

    override def handleInputRows(key: Long, rows: Iterator[Match],
                                 timerValues: TimerValues): Iterator[SemVerdict] = {
      if (done.exists()) return Iterator.empty
      done.update(true)
      var cell = 0L
      var bestCos: java.lang.Double = null
      var bestId: java.lang.Long = null
      rows.foreach { m =>
        cell = m.cell
        if (m.corp_id != null) {
          val c: Double = m.cos
          if (bestCos == null || c > bestCos ||
              (c == bestCos.doubleValue() && m.corp_id < bestId)) {
            bestCos = c
            bestId = m.corp_id
          }
        }
      }
      val verdict =
        if (bestCos != null && bestCos >= minCos) "drop_near" else "keep"
      Iterator.single(SemVerdict(key, cell, bestId, bestCos, verdict))
    }
  }

  /** Streaming verdicts from a stream of (vec_id, embedding) against
    * the frozen index — `corpusIdx` is [[Dedup.semFrozenIndex]]'s
    * cell-assigned corpus (corp_id, cell, qv_c, nc), `cents` its
    * collected centroids. Output rows match batch d18's schema
    * (minus its presentation order).
    *
    * `stateTtlMs > 0` bounds the replay-guard state (the TTL evicts
    * guards, narrowing the exactly-once replay window to the TTL)
    * and makes the stream PERMANENTLY non-quiescent: TTL forces
    * processing-time mode, whose eviction timers keep scheduling
    * empty micro-batches for the query's whole life — a
    * `Trigger.AvailableNow` replay never terminates (measured:
    * 4000+ empty commits) and `processAllAvailable()` never returns
    * (measured: ~2 empty batches/s). Bounded replays (recovery,
    * backfill, tests) therefore run with `stateTtlMs = 0`;
    * long-running deployments set the TTL, use a continuous trigger
    * with a sane interval, and stop by signal. SemStreamSpec pins
    * both modes. */
  def verdicts(vecs: DataFrame, corpusIdx: DataFrame, cents: Seq[Centroid],
               minCos: Double = 0.3, stateTtlMs: Long = 0L): Dataset[SemVerdict] = {
    import vecs.sparkSession.implicits._
    MaillogStream.useRocksDbStateStore(vecs.sparkSession)
    val mode =
      if (stateTtlMs > 0) TimeMode.ProcessingTime() else TimeMode.None()
    routed(vecs, cents)
      .join(corpusIdx, Seq("cell"), "left")
      .select(col("vec_id"), col("cell"), col("corp_id"),
        qcos(qdot(col("qv"), col("qv_c")), col("nrm"), col("nc")).as("cos"))
      .as[Match]
      .groupByKey(_.vec_id)
      .transformWithState(new ScreenProcessor(minCos, stateTtlMs), mode,
        OutputMode.Append())
  }
}
