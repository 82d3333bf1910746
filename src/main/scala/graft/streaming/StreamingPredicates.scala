package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming ingestion for event-stream predicate processing —
  * the incremental path the reference lacks (its "streaming" is
  * stream-shaped data, batch execution; SURVEY.md §2.10 marks this as the
  * post-parity extension).
  *
  * Two building blocks:
  *   - [[windowedCounts]]: watermarked tumbling-window predicate counts —
  *     the streaming analogue of the same-instant collapse + temporal
  *     bucketing. Late events beyond the watermark are dropped; state is
  *     bounded by (watermark horizon × subjects-per-window).
  *   - [[cumulativeCounts]]: per-subject running predicate totals via
  *     `flatMapGroupsWithState` — the streaming analogue of
  *     `cumsum_over_subject`, with explicit state eviction on inactivity.
  *
  * For a full streaming cohort extractor, the watermark must cover the
  * task's maximum lookback/lookahead (max window span in the tree), after
  * which each arriving trigger can be evaluated against closed windows.
  *
  * State-size claims in this file quote the LOGICAL payload per key (the
  * bytes the operator design puts in state). The default HDFS-backed
  * state store carries an additional ~180 B/key of fixed object
  * scaffolding (UnsafeRow headers + map entries + version maps) on top,
  * independent of payload — measured, constant from 1× to 50× corpus
  * growth, by `graft.tools.StreamStateProbe` (numbers in BENCH_NOTES §10,
  * alongside the state-ROWS-equal-key-population check per operator).
  */
object StreamingPredicates {

  /** Saturating micros add — uncapped horizons/TTLs use Long.MaxValue as
    * +infinity, so `t + ttl` must clamp instead of wrapping. Shared by
    * every TTL-bounded state operator in this file (one definition: the
    * eviction-clock math must never diverge between the dedup streams).
    */
  private def satAdd(a: Long, b: Long): Long =
    if (b >= Long.MaxValue - math.max(a, 0L)) Long.MaxValue else a + b

  /** TTL/latch entry decisions shared by the near-dup stream operators
    * (minhash / embedding / phash) so the eviction clock can never
    * diverge between them: returns (stillSaturated, live entry indexes).
    * A saturated latch holds `ts = [lastArrival]` and clears — fresh
    * bucket — once the watermark passes lastArrival + TTL; otherwise an
    * entry is live while its arrival + TTL is ahead of the watermark.
    */
  private def ttlSurvivors(
      prevTs: Array[Long],
      prevSaturated: Boolean,
      n: Int,
      ttlMicros: Long,
      wmMicros: Long): (Boolean, Seq[Int]) = {
    val saturated = prevSaturated &&
      !(prevTs.nonEmpty && satAdd(prevTs(0), ttlMicros) <= wmMicros)
    val liveIdx =
      if (saturated) Seq.empty
      else (0 until n).filter(j => satAdd(prevTs(j), ttlMicros) > wmMicros)
    (saturated, liveIdx)
  }

  /** State-finalize tail shared by the near-dup stream operators: drop
    * empty unlatched state, otherwise persist `build` and (for finite
    * TTLs) arm the event-time timeout at the earliest possible eviction
    * instant (never behind the current watermark).
    */
  private def finishTtlState[S](
      state: GroupState[S],
      empty: Boolean,
      saturated: Boolean,
      ts: scala.collection.Seq[Long],
      ttlMicros: Long,
      wmMicros: Long)(build: => S): Unit = {
    if (empty && !saturated) state.remove()
    else {
      state.update(build)
      if (ttlMicros < Long.MaxValue && ts.nonEmpty)
        state.setTimeoutTimestamp(
          math.max(satAdd(ts.min, ttlMicros) / 1000L + 1L, wmMicros / 1000L + 1L))
    }
  }

  /** Tumbling-window per-subject predicate counts.
    *
    * @param events    streaming frame with `subject_id`, `timestamp`, and
    *                  whatever columns the predicate expressions read.
    * @param preds     (name, boolean expression) per predicate.
    * @param window    tumbling window size, e.g. "1 hour".
    * @param watermark allowed lateness, e.g. "2 hours".
    */
  def windowedCounts(
      events: DataFrame,
      preds: Seq[(String, Column)],
      window: String,
      watermark: String
  ): DataFrame = {
    val aggs = preds.map { case (n, c) => sum(c.cast("long")).as(n) }
    events
      .withWatermark("timestamp", watermark)
      .groupBy(
        col("subject_id"),
        org.apache.spark.sql.functions.window(col("timestamp"), window).as("win"))
      .agg(aggs.head, aggs.tail: _*)
      .select(
        col("subject_id") +: col("win.start").as("window_start") +:
          col("win.end").as("window_end") +: preds.map { case (n, _) => col(n) }: _*)
  }

  /** Streaming gap-sessionization — the incremental face of
    * [[graft.operators.Sessionize]]: Spark's native `session_window`
    * merges per-subject events into gap-delimited sessions, and each
    * session row is emitted exactly once when the event-time watermark
    * proves no further event can extend it. State per subject is the
    * open session only (merged by the session-window operator itself —
    * no custom state code), bounded by watermark × event rate.
    *
    * Semantics match the batch operator EXACTLY, boundary included:
    * batch starts a new session when the gap is STRICTLY greater than
    * `gapMicros`, while `session_window`'s half-open `[ts, ts+gap)`
    * interval would split at an exact-`gapMicros` gap — so the window
    * gap is `gapMicros + 1` µs. Output columns are the batch summary's
    * (subject, session_start, session_end, duration_us, n_events);
    * the batch 0-based per-subject `session_id` ordinal is inherently
    * retrospective (it counts ALL earlier sessions) and is not emitted —
    * StreamingSpec asserts parity on the summary key instead.
    */
  def sessionizeStream(
      events: DataFrame,
      gapMicros: Long,
      watermark: String,
      subjectCol: String = "subject_id",
      tsCol: String = "timestamp"
  ): DataFrame = {
    require(gapMicros >= 0, s"gapMicros must be >= 0, got $gapMicros")
    events
      .withWatermark(tsCol, watermark)
      .groupBy(
        col(subjectCol),
        session_window(col(tsCol), s"${gapMicros + 1} microseconds").as("sw"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col(tsCol)).as("session_start"),
        max(col(tsCol)).as("session_end"))
      .select(
        col(subjectCol),
        col("session_start"),
        col("session_end"),
        (unix_micros(col("session_end")) - unix_micros(col("session_start")))
          .as("duration_us"),
        col("n_events"))
  }

  final case class SubjectEvent(subject_id: Long, tsMicros: Long, counts: Array[Long])
  final case class SubjectTotals(subject_id: Long, lastTsMicros: Long, totals: Array[Long])

  /** Input row for [[triggerWindowCounts]] — keeps the watermarked
    * `timestamp` column (event-time timeout requires it to survive into
    * the stateful operator's input).
    */
  final case class TimedEvent(
      subject_id: Long,
      timestamp: java.sql.Timestamp,
      counts: Array[Long]) {
    def tsMicros: Long = (timestamp.getTime / 1000L) * 1000000L + timestamp.getNanos / 1000L
  }

  final case class TriggerWindow(
      subject_id: Long,
      triggerTsMicros: Long,
      windowEndMicros: Long,
      counts: Array[Long])

  /** Flat state (primitive arrays only — nested collection encoders break
    * codegen; must be public for the same reason): `bufferedCounts` is
    * row-major with stride nPreds.
    */
  final case class TriggerState(
      pendingTriggers: Array[Long],
      bufferedTs: Array[Long],
      bufferedCounts: Array[Long])

  /** Streaming trigger-window evaluation — the incremental analogue of the
    * batch engine's trigger + temporal-lookahead window: every event where
    * `counts(triggerIdx) > 0` opens a window `(trigger, trigger+horizon]`;
    * its predicate sums are emitted exactly once, when the event-time
    * watermark passes the window end (so the window is provably closed).
    *
    * State per subject = pending triggers + events still inside some
    * pending-or-future window; both are pruned on every watermark advance,
    * so state is bounded by (horizon + allowed lateness) × event rate.
    * Rows older than the watermark are dropped at entry (the same
    * discipline `withWatermark` applies to windowed aggregates).
    */
  def triggerWindowCounts(
      events: Dataset[TimedEvent],
      nPreds: Int,
      triggerIdx: Int,
      horizonMicros: Long
  ): Dataset[TriggerWindow] = {
    implicit val outEnc = Encoders.product[TriggerWindow]
    implicit val stateEnc = Encoders.product[TriggerState]
    events
      .groupByKey(_.subject_id)(Encoders.scalaLong)
      .flatMapGroupsWithState[TriggerState, TriggerWindow](
        OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout()) {
        (subject: Long, rows: Iterator[TimedEvent], state: GroupState[TriggerState]) =>
          val wmMicros = state.getCurrentWatermarkMs() * 1000L
          val prev = state.getOption.getOrElse(
            TriggerState(Array.empty, Array.empty, Array.empty))

          // Ingest on-time rows; events double as triggers when flagged.
          val triggers = scala.collection.mutable.ArrayBuffer(prev.pendingTriggers: _*)
          val bufTs = scala.collection.mutable.ArrayBuffer(prev.bufferedTs: _*)
          val bufCounts = scala.collection.mutable.ArrayBuffer(prev.bufferedCounts: _*)
          rows.foreach { e =>
            if (e.tsMicros > wmMicros) {
              bufTs += e.tsMicros
              bufCounts ++= e.counts
              if (e.counts(triggerIdx) > 0) triggers += e.tsMicros
            }
          }

          // Close every window whose end the watermark has passed.
          val (due, stillPending) = triggers.partition(t => t + horizonMicros <= wmMicros)
          val emissions = due.sorted.map { t =>
            val sums = Array.fill(nPreds)(0L)
            var r = 0
            while (r < bufTs.length) {
              val ts = bufTs(r)
              if (ts > t && ts <= t + horizonMicros) {
                var i = 0
                while (i < nPreds) { sums(i) += bufCounts(r * nPreds + i); i += 1 }
              }
              r += 1
            }
            TriggerWindow(subject, t, t + horizonMicros, sums)
          }

          // Prune events no pending or future trigger can reach: windows
          // are (t, t+h], pending triggers all have t >= min(pending), and
          // future triggers have t > wm — so an event is dead once
          // ts_e <= min(wm, earliest pending trigger).
          val pruneBelow = stillPending.foldLeft(wmMicros)(math.min)
          val keepIdx = (0 until bufTs.length).filter(r => bufTs(r) > pruneBelow)
          val keepTs = keepIdx.map(bufTs).toArray
          val keepCounts = keepIdx.flatMap(r =>
            (0 until nPreds).map(i => bufCounts(r * nPreds + i))).toArray

          if (stillPending.isEmpty && keepTs.isEmpty) state.remove()
          else {
            state.update(TriggerState(stillPending.toArray, keepTs, keepCounts))
            val nextDeadline =
              (stillPending.map(_ + horizonMicros) ++ keepTs.map(_ + horizonMicros)).min
            state.setTimeoutTimestamp(nextDeadline / 1000L + 1L)
          }
          emissions.iterator
      }
  }

  /** One window of a streaming cohort task, anchored at the trigger.
    *
    *   - Temporal window (`endPredIdx = -1`): spans
    *     `(trigger + startOffsetMicros, trigger + endOffsetMicros]`.
    *   - Event-bound window (`endPredIdx >= 0`): spans from
    *     `start = trigger + startOffsetMicros` to the FIRST event with
    *     `counts(endPredIdx) > 0` strictly after `start` (end event
    *     included). The search is capped at `start + maxHorizonMicros`;
    *     a trigger whose bound event does not arrive within the cap is
    *     dropped (same outcome as the batch null-bound drop, provided the
    *     cap covers the data's real gaps). Pass `Long.MaxValue` for an
    *     UNCAPPED window — the batch engine's true unbounded
    *     `start -> pred` lookahead ("wait for discharge") — which then
    *     requires a finite `stateTtlMicros` on [[cohortWindows]] so state
    *     stays bounded: the trigger waits for its bound event
    *     indefinitely-up-to-TTL, and is evicted (no emission) once the
    *     watermark passes `trigger + TTL`.
    *
    * `minCounts`/`maxCounts`: per-predicate constraint bounds over the
    * window's sums (`Long.MinValue`/`Long.MaxValue` = unconstrained) —
    * the streaming analogue of the batch `has:` constraints.
    */
  final case class StreamWindowSpec(
      name: String,
      startOffsetMicros: Long,
      endOffsetMicros: Long,
      endPredIdx: Int,
      maxHorizonMicros: Long,
      minCounts: Array[Long],
      maxCounts: Array[Long])

  /** One emitted cohort row: `counts` is row-major `[window][predicate]`
    * with stride nPreds; `windowEndsMicros` carries each window's resolved
    * end. (Flat primitive arrays — see [[TriggerState]].)
    */
  final case class CohortRow(
      subject_id: Long,
      triggerTsMicros: Long,
      windowEndsMicros: Array[Long],
      counts: Array[Long])

  /** Streaming MULTI-window cohort evaluation — the incremental analogue
    * of the batch `Query` window tree for trigger-anchored window chains
    * (e.g. the flagship's gap + event-bound target): every event with
    * `counts(triggerIdx) > 0` opens one candidate cohort row; the row is
    * emitted exactly once, when the event-time watermark has closed EVERY
    * window (so sums are provably complete), and only if every window's
    * constraints pass — StreamingSpec asserts output parity with the
    * batch `Query` on the same data.
    *
    * State per subject = pending triggers + events some pending-or-future
    * window could still read; both pruned on every watermark advance, so
    * state is bounded by (max window deadline + allowed lateness) × rate.
    *
    * @param stateTtlMicros eviction deadline for unresolved triggers,
    *        measured from the trigger event time: once the watermark
    *        passes `trigger + TTL`, a still-open trigger is dropped
    *        without emission (the batch null-bound drop). Mandatory when
    *        any event-bound window is uncapped
    *        (`maxHorizonMicros = Long.MaxValue`) — it is then the ONLY
    *        state bound, giving per-subject state
    *        ≈ (TTL + allowed lateness) × event rate.
    */
  def cohortWindows(
      events: Dataset[TimedEvent],
      nPreds: Int,
      triggerIdx: Int,
      windows: Seq[StreamWindowSpec],
      stateTtlMicros: Long = Long.MaxValue
  ): Dataset[CohortRow] = {
    implicit val outEnc = Encoders.product[CohortRow]
    implicit val stateEnc = Encoders.product[TriggerState]
    val specs = windows.toArray
    val uncapped = specs.filter(w => w.endPredIdx >= 0 && w.maxHorizonMicros == Long.MaxValue)
    require(
      uncapped.isEmpty || stateTtlMicros < Long.MaxValue,
      s"event-bound window(s) [${uncapped.map(_.name).mkString(", ")}] are uncapped " +
        "(maxHorizonMicros = Long.MaxValue) but no stateTtlMicros was given: an unbounded " +
        "'start -> pred' lookahead cannot be streamed with finite state. Either cap the " +
        "window (maxHorizonMicros >= the data's largest trigger-to-bound gap) or pass a " +
        "finite stateTtlMicros T; per-subject state is then bounded by " +
        "(T + watermark allowed lateness) x event rate, and a trigger whose bound event " +
        "has not arrived once the watermark passes trigger + T is dropped — the same " +
        "outcome as the batch engine's null-bound row drop.")
    val minStartOffset = specs.map(_.startOffsetMicros).min
    events
      .groupByKey(_.subject_id)(Encoders.scalaLong)
      .flatMapGroupsWithState[TriggerState, CohortRow](
        OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout()) {
        (subject: Long, rows: Iterator[TimedEvent], state: GroupState[TriggerState]) =>
          val wmMicros = state.getCurrentWatermarkMs() * 1000L
          val prev = state.getOption.getOrElse(
            TriggerState(Array.empty, Array.empty, Array.empty))

          val triggers = scala.collection.mutable.ArrayBuffer(prev.pendingTriggers: _*)
          val bufTs = scala.collection.mutable.ArrayBuffer(prev.bufferedTs: _*)
          val bufCounts = scala.collection.mutable.ArrayBuffer(prev.bufferedCounts: _*)
          rows.foreach { e =>
            if (e.tsMicros > wmMicros) {
              bufTs += e.tsMicros
              bufCounts ++= e.counts
              if (e.counts(triggerIdx) > 0) triggers += e.tsMicros
            }
          }

          val emissions = scala.collection.mutable.ArrayBuffer.empty[CohortRow]
          val stillPending = scala.collection.mutable.ArrayBuffer.empty[Long]
          // Earliest event-time at which some pending window could newly
          // close — the next wake-up. Waking at the worst-case deadline
          // (trigger + maxDeadlineOffset) instead would delay emission of
          // an already-resolvable row by up to the full horizon when the
          // subject receives no further events of its own.
          var nextWake = Long.MaxValue
          triggers.sorted.foreach { t =>
            var allClosed = true
            var failed = false
            val ttlDeadline = satAdd(t, stateTtlMicros)
            val ends = new Array[Long](specs.length)
            var wi = 0
            while (wi < specs.length && allClosed && !failed) {
              val w = specs(wi)
              val start = t + w.startOffsetMicros
              if (w.endPredIdx < 0) {
                val end = t + w.endOffsetMicros
                if (wmMicros >= end) ends(wi) = end
                else { allClosed = false; nextWake = math.min(nextWake, end) }
              } else {
                // First end-predicate event strictly after start. Events at
                // or below the watermark are final (later arrivals would be
                // late and dropped), so a found bound <= wm is THE bound.
                val capEnd = satAdd(start, w.maxHorizonMicros)
                var best = Long.MaxValue
                var r = 0
                while (r < bufTs.length) {
                  val ts0 = bufTs(r)
                  if (ts0 > start && ts0 <= capEnd && ts0 < best &&
                      bufCounts(r * nPreds + w.endPredIdx) > 0) best = ts0
                  r += 1
                }
                if (best != Long.MaxValue && best <= wmMicros) ends(wi) = best
                else if (wmMicros >= capEnd) failed = true
                else {
                  allClosed = false
                  // Candidate close: the buffered bound event (if one is
                  // already known), the horizon cap, or the TTL eviction
                  // point (whichever the watermark reaches first).
                  nextWake = math.min(nextWake,
                    math.min(best, math.min(capEnd, ttlDeadline)))
                }
              }
              wi += 1
            }
            // TTL eviction: still unresolved once the watermark passes
            // trigger + TTL -> drop without emission (batch null-bound
            // drop). This is the state bound for uncapped windows.
            if (!allClosed && wmMicros >= ttlDeadline) failed = true
            if (!allClosed && !failed) stillPending += t
            else if (!failed) {
              val counts = new Array[Long](specs.length * nPreds)
              var pass = true
              wi = 0
              while (wi < specs.length) {
                val w = specs(wi)
                val start = t + w.startOffsetMicros
                val end = ends(wi)
                var r = 0
                while (r < bufTs.length) {
                  val ts0 = bufTs(r)
                  if (ts0 > start && ts0 <= end) {
                    var i = 0
                    while (i < nPreds) { counts(wi * nPreds + i) += bufCounts(r * nPreds + i); i += 1 }
                  }
                  r += 1
                }
                var i = 0
                while (i < nPreds) {
                  val c = counts(wi * nPreds + i)
                  if (c < w.minCounts(i) || c > w.maxCounts(i)) pass = false
                  i += 1
                }
                wi += 1
              }
              if (pass) emissions += CohortRow(subject, t, ends, counts)
            }
            // failed => trigger resolved with no emission (batch drops the
            // row when an event bound is missing / a constraint fails)
          }

          // Prune events nothing can read anymore: pending triggers all
          // have window starts >= min(pending) + minStartOffset; future
          // triggers arrive > wm, so their starts are > wm + min(0, off).
          val pendingFloor =
            if (stillPending.isEmpty) Long.MaxValue else stillPending.min + minStartOffset
          val pruneBelow = math.min(pendingFloor, wmMicros + math.min(0L, minStartOffset))
          val keepIdx = (0 until bufTs.length).filter(r => bufTs(r) > pruneBelow)
          val keepTs = keepIdx.map(bufTs).toArray
          val keepCounts = keepIdx.flatMap(r =>
            (0 until nPreds).map(i => bufCounts(r * nPreds + i))).toArray

          if (stillPending.isEmpty && keepTs.isEmpty) state.remove()
          else {
            state.update(TriggerState(stillPending.toArray, keepTs, keepCounts))
            val nextDeadlineMs =
              if (stillPending.nonEmpty) math.max(nextWake / 1000L + 1L, wmMicros / 1000L + 1L)
              // Events retained only for future triggers: wake on any
              // watermark advance so the prune floor keeps moving.
              else wmMicros / 1000L + 1L
            state.setTimeoutTimestamp(nextDeadlineMs)
          }
          emissions.iterator
      }
  }

  /** Project streamed cohort rows ([[cohortWindows]] output, live or from
    * a sink table) onto the batch `Query` label surface:
    * `(subject_id, index_timestamp, label, trigger)` — `label` is the
    * label predicate's count over its window and `index_timestamp` the
    * resolved end of the index window, both already carried by
    * [[CohortRow]]. With this projection a streaming deployment emits the
    * same label rows the batch engine writes (StreamingSpec asserts
    * full-row equality), so a consumer can swap sinks without remapping.
    *
    * @param labelWindowIdx index into the `windows` spec seq of the window
    *                       whose `label:` predicate defines the label.
    * @param labelPredIdx   predicate index of the label predicate.
    * @param indexWindowIdx window whose resolved end is the
    *                       `index_timestamp` (reference: the window
    *                       carrying `index_timestamp: end`).
    */
  def labelRows(
      cohort: DataFrame,
      nPreds: Int,
      labelWindowIdx: Int,
      labelPredIdx: Int,
      indexWindowIdx: Int
  ): DataFrame =
    cohort.select(
      col("subject_id"),
      timestamp_micros(element_at(col("windowEndsMicros"), indexWindowIdx + 1))
        .as("index_timestamp"),
      element_at(col("counts"), labelWindowIdx * nPreds + labelPredIdx + 1).as("label"),
      timestamp_micros(col("triggerTsMicros")).as("trigger"))

  /** Streaming exact dedup on the ingest path: keep the FIRST arrival of
    * each distinct text (by 64-bit exact hash + length, the
    * [[graft.operators.Dedup.exactByHash]] key — 16 bytes of state per
    * distinct doc, never the text), drop every duplicate arriving within
    * the watermark of the original. This is the streaming face of the
    * batch exact-dedup operator — the "don't ingest the same boilerplate
    * twice" step of a continuous pipeline.
    *
    * State is bounded by the watermark delay (`dropDuplicatesWithin
    * Watermark` evicts keys once the watermark passes their event time +
    * delay): a duplicate arriving AFTER that horizon is re-admitted, the
    * documented trade for finite state — batch [[graft.operators.Dedup]]
    * over the persisted corpus catches those.
    *
    * @param docs streaming frame with `timestamp` (watermarked by the
    *             caller), a `textCol` and arbitrary other columns.
    * @return the input rows minus within-watermark exact duplicates.
    */
  def dedupExactStream(
      docs: DataFrame,
      textCol: String = "text"
  ): DataFrame =
    docs
      .withColumn("__ehash", xxhash64(col(textCol)))
      .withColumn("__elen", length(col(textCol)).cast("long"))
      .dropDuplicatesWithinWatermark("__ehash", "__elen")
      .drop("__ehash", "__elen")

  /** Streaming URL-level dedup on the ingest path: keep the FIRST arrival
    * per canonical URL key ([[graft.operators.UrlCuration.normalizeUrl]]
    * — tracking params out, params sorted, host/port/fragment
    * canonicalized), drop re-crawls of the same page arriving within the
    * watermark. The streaming face of
    * [[graft.operators.UrlCuration.dedupByUrl]], and the cheapest dedup
    * a continuous crawl pipeline runs — it fires before any text is
    * tokenized. State per distinct url is the 16-byte
    * `(xxhash64(url_norm), length(url_norm))` compound key (the
    * [[dedupExactStream]] pattern), never the url string; a bare 64-bit
    * collision alone cannot conflate two distinct urls. Duplicates
    * arriving after watermark eviction are re-admitted (the documented
    * finite-state trade) — the persisted-index batch path
    * ([[graft.operators.UrlCuration.dedupByUrlIncremental]]) catches
    * those.
    */
  def urlDedupStream(
      docs: DataFrame,
      urlCol: String = "url"
  ): DataFrame =
    docs
      .withColumn("__unorm", graft.operators.UrlCuration.normalizeUrl(col(urlCol)))
      .withColumn("__uhash", xxhash64(col("__unorm")))
      .withColumn("__ulen", length(col("__unorm")).cast("long"))
      .dropDuplicatesWithinWatermark("__uhash", "__ulen")
      .drop("__unorm", "__uhash", "__ulen")

  /** Fail fast on a non-integral id column: the state encoders cast it to
    * long, and a string/decimal id silently becoming null would kill the
    * streaming query mid-run with an opaque non-nullable-field encoder
    * error instead of naming the actual contract violation.
    */
  private def requireIntegralId(docs: DataFrame, idCol: String, op: String): Unit = {
    import org.apache.spark.sql.types._
    docs.schema(idCol).dataType match {
      case ByteType | ShortType | IntegerType | LongType => ()
      case other =>
        throw new IllegalArgumentException(
          s"$op requires an integral '$idCol' column (doc ids must be unique " +
            s"integers — they key the dedup state); got ${other.simpleString}")
    }
  }

  /** One (band, bucket)-routed copy of an incoming document for
    * [[minhashNearDupStream]]: carries the FULL bucket vector (all bands)
    * so any two colliding docs can agree on the lowest band they share —
    * the exactly-once emission rule — plus the packed distinct-shingle
    * set for exact-Jaccard verification in state.
    */
  final case class BandedDoc(
      band: Int,
      bucket: Long,
      doc_id: Long,
      timestamp: java.sql.Timestamp,
      buckets: Array[Long],
      packed: String) {
    def tsMicros: Long = (timestamp.getTime / 1000L) * 1000000L + timestamp.getNanos / 1000L
  }

  /** Per-bucket state for [[minhashNearDupStream]]: parallel flat arrays,
    * one entry per live doc (`buckets` row-major with stride = bands —
    * nested collections break state encoders, see [[TriggerState]]).
    * `saturated` latches once the live population exceeds the bucket cap:
    * the stored docs are dropped and the bucket emits nothing more until
    * its state expires (the streaming face of the batch skew guard).
    */
  final case class BucketDocsState(
      ids: Array[Long],
      ts: Array[Long],
      packed: Array[String],
      buckets: Array[Long],
      saturated: Boolean)

  /** One verified near-duplicate pair (doc_a < doc_b, exact Jaccard). */
  final case class NearDupPair(doc_a: Long, doc_b: Long, jaccard: Double)

  /** Streaming MinHash near-dup detection on the ingest path — the
    * banding-with-TTL analogue of batch
    * [[graft.operators.Dedup.minhashLshIncremental]], for the pipeline
    * stage AFTER [[dedupExactStream]] (exact duplicates never reach
    * banding — the same division of labor as the batch pre-pass, which is
    * a no-op on an exact-dedup'd stream).
    *
    * Shape: each doc computes its signature + band buckets map-side (the
    * SAME xxhash64 values as the batch band rows, so stream and batch
    * agree bucket-for-bucket), then routes one copy per band to a
    * `(band, bucket)` state group holding the bucket's live docs. An
    * arriving doc pairs against the live docs, verifies with EXACT
    * Jaccard over the packed distinct-shingle sets, and is appended.
    *
    * Exactly-once pairs without cross-group state: every doc carries its
    * full bucket vector, so both sides of a collision can compute the
    * LOWEST band they share — only that band's group emits the pair.
    * (Divergence from batch at the cap: if that lowest band's bucket is
    * saturated the pair is lost even when a higher band's bucket is
    * small; the batch cap lets any surviving band report it. Size caps
    * are a skew guard — parity holds whenever buckets stay under the
    * cap.)
    *
    * State: live docs per bucket, evicted once the watermark passes
    * `arrival + ttlMicros` — a duplicate arriving after its original
    * expired is NOT paired (finite-state trade, same as
    * [[dedupExactStream]]; the persisted-corpus batch pass catches it).
    * `ttlMicros = Long.MaxValue` keeps state forever (tests/backfills
    * only). Doc ids must be unique across the stream.
    *
    * @param docs streaming frame with a `timestamp` column (watermarked
    *             by the caller — required for eviction), `textCol`,
    *             `idCol`. Docs too short to shingle are passed through
    *             unbanded (never paired), as in batch.
    * @return one row per verified pair: (doc_a, doc_b, jaccard).
    */
  def minhashNearDupStream(
      docs: DataFrame,
      threshold: Double,
      numHashes: Int = 64,
      bands: Int = 16,
      shingleN: Int = 3,
      maxBucketSize: Int = 64,
      ttlMicros: Long = Long.MaxValue,
      textCol: String = "text",
      idCol: String = "doc_id"
  ): Dataset[NearDupPair] = {
    require(numHashes % bands == 0, "numHashes must be divisible by bands")
    requireIntegralId(docs, idCol, "minhashNearDupStream")
    val sep = "\u0000"

    // Banding runs as ONE compiled-Scala UDF call per doc (shingles +
    // numHashes minhashes + band buckets in a single pass) instead of
    // the batch path's expression forms: Catalyst evaluates higher-order
    // array lambdas interpreted per element, which a thread-dump showed
    // dominating ingest at ~400× this loop's cost. Bit-parity with the
    // expressions is asserted in ExtensionsSpec (minhashBandRow) and
    // end-to-end vs batch in StreamingSpec; a UDF projection (unlike a
    // typed flatMap) PRESERVES the caller's event-time watermark.
    val bandRow = udf((text: String) =>
      graft.operators.Dedup.minhashBandRow(text, numHashes, bands, shingleN, sep))
    implicit val bandedEnc = Encoders.product[BandedDoc]
    // No isNotNull filter on __b: predicate pushdown would rewrite it to
    // udf(text) IS NOT NULL BELOW the projection and evaluate the whole
    // banding twice per doc. A null struct yields null buckets and the
    // posexplode below drops the row — same outcome, one evaluation.
    val banded = docs
      .withColumn("__b", bandRow(col(textCol)))
      .select(
        col(idCol).cast("long").as("doc_id"),
        col("timestamp"),
        col("__b._1").as("packed"),
        col("__b._2").as("buckets"))
      .select(
        col("doc_id"), col("timestamp"), col("packed"), col("buckets"),
        posexplode(col("buckets")).as(Seq("band", "bucket")))
      .select("band", "bucket", "doc_id", "timestamp", "buckets", "packed")
      .as[BandedDoc]

    implicit val pairEnc = Encoders.product[NearDupPair]
    implicit val stateEnc = Encoders.product[BucketDocsState]
    banded
      .groupByKey(d => (d.band, d.bucket))(
        Encoders.tuple(Encoders.scalaInt, Encoders.scalaLong))
      .flatMapGroupsWithState[BucketDocsState, NearDupPair](
        OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout()) {
        (key: (Int, Long), rows: Iterator[BandedDoc], state: GroupState[BucketDocsState]) =>
          val wmMicros = state.getCurrentWatermarkMs() * 1000L
          val band = key._1
          val prev = state.getOption.getOrElse(
            BucketDocsState(Array.empty, Array.empty, Array.empty, Array.empty, saturated = false))

          val (saturated0, liveIdx) =
            ttlSurvivors(prev.ts, prev.saturated, prev.ids.length, ttlMicros, wmMicros)
          var saturated = saturated0
          val ids = scala.collection.mutable.ArrayBuffer(liveIdx.map(prev.ids): _*)
          val ts = scala.collection.mutable.ArrayBuffer(
            (if (saturated) prev.ts.toSeq else liveIdx.map(prev.ts)): _*)
          val packed = scala.collection.mutable.ArrayBuffer(liveIdx.map(prev.packed): _*)
          val bkts = scala.collection.mutable.ArrayBuffer(
            liveIdx.flatMap(j => (0 until bands).map(i => prev.buckets(j * bands + i))): _*)

          val out = scala.collection.mutable.ArrayBuffer.empty[NearDupPair]
          rows.toSeq.sortBy(d => (d.tsMicros, d.doc_id)).foreach { d =>
            if (d.tsMicros > wmMicros) {
              if (saturated) {
                // Dark bucket: arrivals only refresh the latch's clock.
                ts(0) = math.max(ts(0), d.tsMicros)
              } else if (ids.length + 1 > maxBucketSize) {
                // Skew guard: this bucket's live population blew the cap —
                // drop its docs and go dark until the latch expires.
                saturated = true
                ids.clear(); packed.clear(); bkts.clear()
                ts.clear(); ts += d.tsMicros
              } else {
                val dSet = d.packed.split(sep).toSet
                var j = 0
                while (j < ids.length) {
                  if (ids(j) != d.doc_id) {
                    // Lowest shared band: the one group allowed to emit.
                    var mb = -1
                    var i = 0
                    while (mb < 0 && i < bands) {
                      if (bkts(j * bands + i) == d.buckets(i)) mb = i
                      i += 1
                    }
                    if (mb == band) {
                      val eSet = packed(j).split(sep).toSet
                      val inter = dSet.intersect(eSet).size
                      val uni = dSet.size + eSet.size - inter
                      val jac = if (uni == 0) 0.0 else inter.toDouble / uni
                      if (jac >= threshold)
                        out += NearDupPair(
                          math.min(ids(j), d.doc_id), math.max(ids(j), d.doc_id), jac)
                    }
                  }
                  j += 1
                }
                ids += d.doc_id; ts += d.tsMicros; packed += d.packed
                bkts ++= d.buckets
              }
            }
          }

          finishTtlState(state, ids.isEmpty, saturated, ts, ttlMicros, wmMicros)(
            BucketDocsState(
              ids.toArray, ts.toArray, packed.toArray, bkts.toArray, saturated))
          out.iterator
      }
  }

  /** One (band, bucket)-routed copy of an incoming vector for
    * [[embeddingNearDupStream]]: carries the FULL bucket vector (all
    * bands) for the lowest-shared-band exactly-once emission rule, plus
    * the embedding itself for exact-cosine verification in state.
    */
  final case class HplaneDoc(
      band: Int,
      bucket: Long,
      doc_id: Long,
      timestamp: java.sql.Timestamp,
      buckets: Array[Long],
      vec: Array[Float]) {
    def tsMicros: Long = (timestamp.getTime / 1000L) * 1000000L + timestamp.getNanos / 1000L
  }

  /** Per-bucket state for [[embeddingNearDupStream]]: parallel flat
    * arrays, one entry per live vector (`vecs` row-major with stride =
    * the embedding dim, `buckets` row-major with stride = bands — nested
    * collections break state encoders). `saturated` latches as in
    * [[BucketDocsState]].
    */
  final case class BucketVecsState(
      ids: Array[Long],
      ts: Array[Long],
      vecs: Array[Float],
      buckets: Array[Long],
      saturated: Boolean)

  /** One verified embedding near-duplicate pair (doc_a < doc_b). */
  final case class EmbNearDupPair(doc_a: Long, doc_b: Long, cos: Double)

  /** Streaming embedding-cosine near-dup detection on the ingest path —
    * the hyperplane-LSH analogue of [[minhashNearDupStream]] for the
    * embedding modality (batch counterparts:
    * [[graft.operators.Dedup.embeddingNearDup]] /
    * [[graft.operators.Dedup.embeddingNearDupIncremental]]).
    *
    * The hyperplane signatures are DETERMINISTIC functions of the vector
    * (xxhash64-seeded planes, [[graft.operators.Similarity]] — no fitted
    * state), so streaming needs no persisted index at all: each arriving
    * vector computes its per-band bucket keys map-side with the SAME
    * plane bits as the batch path (shared `bandBucketArray` expression,
    * so stream and batch agree bucket-for-bucket), routes one copy per
    * band to a `(band, bucket)` state group, pairs against the group's
    * live vectors, and verifies with EXACT cosine (double accumulation in
    * element order — the same arithmetic as the batch codegen cosine, so
    * emitted `cos` values are bit-identical to batch).
    *
    * Exactly-once pairs, TTL-bounded state, and the `maxBucketSize`
    * saturation latch all work as in [[minhashNearDupStream]] (lowest
    * shared band emits; watermark-driven eviction; a blown bucket goes
    * dark until its latch expires). Parity with the batch shard-ingest
    * loop is asserted in StreamingSpec.
    *
    * State sizing: each live doc is held once per band group (band-local
    * state needs no cross-group lookups — the same trade as
    * [[minhashNearDupStream]]'s per-band shingle copies), so live state ≈
    * `bands · (4·dim + 8·bands + 16)` bytes per doc within the TTL window
    * (~17 KB/doc at dim=64, bands=32 — StreamStateProbe measures 17.2,
    * within 2% of the formula, and shows the `maxBucketSize` latch
    * capping growth once hot buckets saturate). Size `ttlMicros` to the dedup
    * horizon × ingest rate; the persisted-corpus batch pass
    * ([[graft.operators.Dedup.embeddingNearDupIncremental]]) catches
    * pairs beyond the horizon.
    *
    * @param vectors streaming frame with a `timestamp` column
    *                (watermarked by the caller), `idCol`, `vecCol`.
    * @return one row per verified pair: (doc_a, doc_b, cos) with
    *         doc_a < doc_b, cos ≥ threshold.
    */
  def embeddingNearDupStream(
      vectors: DataFrame,
      threshold: Double,
      bands: Int = 32,
      bitsPerBand: Int = 4,
      maxBucketSize: Int = 256,
      ttlMicros: Long = Long.MaxValue,
      idCol: String = "vec_id",
      vecCol: String = "embedding"
  ): Dataset[EmbNearDupPair] = {
    requireIntegralId(vectors, idCol, "embeddingNearDupStream")
    implicit val hplaneEnc = Encoders.product[HplaneDoc]
    // Compiled banding (Similarity.hplaneBandRow) for the same reason as
    // minhashNearDupStream's UDF: the expression form's hyperplane dots
    // are interpreted per element; a UDF projection keeps the caller's
    // watermark.
    val bandUdf = udf((v: Seq[java.lang.Double]) =>
      graft.operators.Similarity.hplaneBandRowBoxed(v, bands, bitsPerBand))
    val banded = vectors
      .select(
        col(idCol).cast("long").as("doc_id"),
        col("timestamp"),
        col(vecCol).cast("array<float>").as("vec"),
        // Buckets from the ORIGINAL dtype (double-widened — the
        // expression form's arithmetic); null vectors → null buckets →
        // the posexplode drops the row instead of an NPE killing the
        // stream.
        bandUdf(col(vecCol).cast("array<double>")).as("buckets"))
      .select(
        col("doc_id"), col("timestamp"), col("vec"), col("buckets"),
        posexplode(col("buckets")).as(Seq("band", "bucket")))
      .select("band", "bucket", "doc_id", "timestamp", "buckets", "vec")
      .as[HplaneDoc]

    // Exact cosine over flat state arrays — double accumulation in
    // element order, matching FloatVectorCosine (VectorExpressions) so
    // streamed `cos` values equal the batch expression's bit for bit.
    def cosineAt(vecs: Array[Float], off: Int, dim: Int, q: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      val n = math.min(dim, q.length)
      while (i < n) {
        val xv = vecs(off + i).toDouble
        val yv = q(i).toDouble
        dot += xv * yv; na += xv * xv; nb += yv * yv; i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }

    implicit val pairEnc = Encoders.product[EmbNearDupPair]
    implicit val stateEnc = Encoders.product[BucketVecsState]
    banded
      .groupByKey(d => (d.band, d.bucket))(
        Encoders.tuple(Encoders.scalaInt, Encoders.scalaLong))
      .flatMapGroupsWithState[BucketVecsState, EmbNearDupPair](
        OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout()) {
        (key: (Int, Long), rows: Iterator[HplaneDoc], state: GroupState[BucketVecsState]) =>
          val wmMicros = state.getCurrentWatermarkMs() * 1000L
          val band = key._1
          val prev = state.getOption.getOrElse(
            BucketVecsState(Array.empty, Array.empty, Array.empty, Array.empty, saturated = false))
          // The state stride: every stored vector's length. Established by
          // the first append; a later arrival with a DIFFERENT length is a
          // contract violation (embeddings must share one dim) and is
          // skipped below — indexing state with the arrival's length would
          // read across vector boundaries or out of bounds.
          var dim = if (prev.ids.isEmpty) 0 else prev.vecs.length / prev.ids.length

          val (saturated0, liveIdx) =
            ttlSurvivors(prev.ts, prev.saturated, prev.ids.length, ttlMicros, wmMicros)
          var saturated = saturated0
          val ids = scala.collection.mutable.ArrayBuffer(liveIdx.map(prev.ids): _*)
          val ts = scala.collection.mutable.ArrayBuffer(
            (if (saturated) prev.ts.toSeq else liveIdx.map(prev.ts)): _*)
          val vecs = scala.collection.mutable.ArrayBuffer(
            liveIdx.flatMap(j => (0 until dim).map(i => prev.vecs(j * dim + i))): _*)
          val bkts = scala.collection.mutable.ArrayBuffer(
            liveIdx.flatMap(j => (0 until bands).map(i => prev.buckets(j * bands + i))): _*)
          if (ids.isEmpty) dim = 0 // fully evicted: next arrival re-establishes

          val out = scala.collection.mutable.ArrayBuffer.empty[EmbNearDupPair]
          rows.toSeq.sortBy(d => (d.tsMicros, d.doc_id)).foreach { d =>
            if (d.tsMicros > wmMicros) {
              if (saturated) {
                ts(0) = math.max(ts(0), d.tsMicros)
              } else if (ids.length + 1 > maxBucketSize) {
                saturated = true
                ids.clear(); vecs.clear(); bkts.clear()
                ts.clear(); ts += d.tsMicros
              } else if (dim != 0 && d.vec.length != dim) {
                // Mixed-dim arrival: cannot be compared against (or stored
                // beside) the bucket's vectors — drop it.
                ()
              } else {
                if (dim == 0) dim = d.vec.length
                // One flat snapshot per arrival (not per pair) for the
                // unboxed cosine loop; offsets use the STATE stride `dim`
                // (== d.vec.length here, enforced above).
                val vecsArr = vecs.toArray
                var j = 0
                while (j < ids.length) {
                  if (ids(j) != d.doc_id) {
                    // Lowest shared band: the one group allowed to emit.
                    var mb = -1
                    var i = 0
                    while (mb < 0 && i < bands) {
                      if (bkts(j * bands + i) == d.buckets(i)) mb = i
                      i += 1
                    }
                    if (mb == band) {
                      val c = cosineAt(vecsArr, j * dim, dim, d.vec)
                      if (c >= threshold)
                        out += EmbNearDupPair(
                          math.min(ids(j), d.doc_id), math.max(ids(j), d.doc_id), c)
                    }
                  }
                  j += 1
                }
                ids += d.doc_id; ts += d.tsMicros
                vecs ++= d.vec; bkts ++= d.buckets
              }
            }
          }

          finishTtlState(state, ids.isEmpty, saturated, ts, ttlMicros, wmMicros)(
            BucketVecsState(
              ids.toArray, ts.toArray, vecs.toArray, bkts.toArray, saturated))
          out.iterator
      }
  }

  /** One (chunk, key)-routed copy of an incoming image signature for
    * [[phashNearDupStream]]. Unlike the minhash/embedding streams, no
    * bucket vector rides along: all four 16-bit chunk keys are pure
    * functions of the 8-byte signature, so both sides of a collision
    * recompute the lowest shared chunk from the two sigs alone.
    */
  final case class PhashDoc(
      chunk: Int,
      key: Long,
      doc_id: Long,
      timestamp: java.sql.Timestamp,
      sig: Long) {
    def tsMicros: Long = (timestamp.getTime / 1000L) * 1000000L + timestamp.getNanos / 1000L
  }

  /** Per-bucket state for [[phashNearDupStream]]: 24 bytes per live doc
    * (id, arrival, signature) — parallel flat arrays as in
    * [[BucketDocsState]], with the same saturation latch.
    */
  final case class BucketSigsState(
      ids: Array[Long],
      ts: Array[Long],
      sigs: Array[Long],
      saturated: Boolean)

  /** One verified image near-duplicate pair (doc_a < doc_b). */
  final case class ImageNearDupPair(doc_a: Long, doc_b: Long, hamming: Int)

  /** Streaming image near-dup detection on the ingest path — the
    * perceptual-hash face of [[minhashNearDupStream]] /
    * [[embeddingNearDupStream]], completing the streaming dedup triad
    * (text / embedding / image). Each arriving image dHashes map-side
    * ([[graft.operators.PerceptualHash.dhash]] — the SAME signature as
    * batch, so stream and batch agree bucket-for-bucket), routes one
    * 24-byte copy per 16-bit chunk to a `(chunk, key)` state group, and
    * pairs against the group's live signatures with exact Hamming
    * verification. Payloads never enter state — only (id, ts, sig).
    *
    * Exactly-once pairs: the lowest chunk the two signatures share is
    * recomputable from the sigs alone, and only that chunk's group emits.
    * Banding guarantees full recall for `maxHamming < 4` (pigeonhole over
    * 4 chunks), as in batch. TTL eviction and the `maxBucketSize`
    * saturation latch work as in [[minhashNearDupStream]]. Divergence
    * from batch on IDENTICAL-hash clusters: batch collapses them to
    * min-id star pairs, the stream emits all live pairwise pairs — the
    * same transitive closure, more edges; parity is exact whenever
    * hashes are distinct (asserted in StreamingSpec). Undecodable and
    * sub-9×8 payloads produce no signature and are never paired.
    *
    * @param media streaming frame with a `timestamp` column, `idCol`,
    *              binary `payloadCol`. Unlike the expression-only streams,
    *              the decode step is a typed flatMap (object
    *              round-trip), which DROPS any caller watermark — so this
    *              operator applies its own AFTER decoding
    *              (`watermarkDelay`); don't bother watermarking upstream.
    * @return one row per verified pair: (doc_a, doc_b, hamming).
    */
  def phashNearDupStream(
      media: DataFrame,
      maxHamming: Int = 2,
      maxBucketSize: Int = 256,
      ttlMicros: Long = Long.MaxValue,
      watermarkDelay: String = "1 hour",
      idCol: String = "media_id",
      payloadCol: String = "payload"
  ): Dataset[ImageNearDupPair] = {
    requireIntegralId(media, idCol, "phashNearDupStream")
    sigNearDupStream(media, graft.operators.PerceptualHash.dhash(_),
      maxHamming, maxBucketSize, ttlMicros, watermarkDelay, idCol, payloadCol)
  }

  /** Streaming AUDIO near-dup — [[phashNearDupStream]] with the decode
    * step swapped for [[graft.operators.AudioFingerprint.fingerprint]]
    * (Haitsma–Kalker spectral fingerprints over PCM-WAV): the banding,
    * bucket state, TTL and saturation semantics are the SAME shared
    * 64-bit signature core, so every contract documented there holds
    * here verbatim.
    */
  def afpNearDupStream(
      media: DataFrame,
      maxHamming: Int = 2,
      maxBucketSize: Int = 256,
      ttlMicros: Long = Long.MaxValue,
      watermarkDelay: String = "1 hour",
      idCol: String = "media_id",
      payloadCol: String = "payload"
  ): Dataset[ImageNearDupPair] = {
    requireIntegralId(media, idCol, "afpNearDupStream")
    sigNearDupStream(media, graft.operators.AudioFingerprint.fingerprint(_),
      maxHamming, maxBucketSize, ttlMicros, watermarkDelay, idCol, payloadCol)
  }

  /** The shared 64-bit-signature streaming near-dup core: decode each
    * arriving payload to a signature (`decode` — dHash for images, HK
    * fingerprint for audio; None = never paired), band into 4×16-bit
    * chunk buckets, and pair inside `flatMapGroupsWithState` bucket
    * state with the lowest-shared-chunk dedup rule.
    */
  private def sigNearDupStream(
      media: DataFrame,
      decode: Array[Byte] => Option[Long],
      maxHamming: Int,
      maxBucketSize: Int,
      ttlMicros: Long,
      watermarkDelay: String,
      idCol: String,
      payloadCol: String
  ): Dataset[ImageNearDupPair] = {
    implicit val rowEnc =
      Encoders.tuple(Encoders.scalaLong, Encoders.TIMESTAMP, Encoders.BINARY)
    implicit val phashEnc = Encoders.product[PhashDoc]
    val banded = media
      .select(col(idCol).cast("long"), col("timestamp"), col(payloadCol))
      .as[(Long, java.sql.Timestamp, Array[Byte])]
      .flatMap { case (id, ts, payload) =>
        decode(payload).toSeq.flatMap { sig =>
          (0 until 4).map(c => PhashDoc(c, (sig >>> (c * 16)) & 0xffffL, id, ts, sig))
        }
      }
      .withWatermark("timestamp", watermarkDelay)
      .as[PhashDoc]

    def lowestSharedChunk(a: Long, b: Long): Int = {
      var c = 0
      while (c < 4) {
        if (((a >>> (c * 16)) & 0xffffL) == ((b >>> (c * 16)) & 0xffffL)) return c
        c += 1
      }
      -1
    }

    implicit val pairEnc = Encoders.product[ImageNearDupPair]
    implicit val stateEnc = Encoders.product[BucketSigsState]
    banded
      .groupByKey(d => (d.chunk, d.key))(
        Encoders.tuple(Encoders.scalaInt, Encoders.scalaLong))
      .flatMapGroupsWithState[BucketSigsState, ImageNearDupPair](
        OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout()) {
        (key: (Int, Long), rows: Iterator[PhashDoc], state: GroupState[BucketSigsState]) =>
          val wmMicros = state.getCurrentWatermarkMs() * 1000L
          val chunk = key._1
          val prev = state.getOption.getOrElse(
            BucketSigsState(Array.empty, Array.empty, Array.empty, saturated = false))

          val (saturated0, liveIdx) =
            ttlSurvivors(prev.ts, prev.saturated, prev.ids.length, ttlMicros, wmMicros)
          var saturated = saturated0
          val ids = scala.collection.mutable.ArrayBuffer(liveIdx.map(prev.ids): _*)
          val ts = scala.collection.mutable.ArrayBuffer(
            (if (saturated) prev.ts.toSeq else liveIdx.map(prev.ts)): _*)
          val sigs = scala.collection.mutable.ArrayBuffer(liveIdx.map(prev.sigs): _*)

          val out = scala.collection.mutable.ArrayBuffer.empty[ImageNearDupPair]
          rows.toSeq.sortBy(d => (d.tsMicros, d.doc_id)).foreach { d =>
            if (d.tsMicros > wmMicros) {
              if (saturated) {
                ts(0) = math.max(ts(0), d.tsMicros)
              } else if (ids.length + 1 > maxBucketSize) {
                saturated = true
                ids.clear(); sigs.clear()
                ts.clear(); ts += d.tsMicros
              } else {
                var j = 0
                while (j < ids.length) {
                  if (ids(j) != d.doc_id && lowestSharedChunk(sigs(j), d.sig) == chunk) {
                    val hamming = java.lang.Long.bitCount(sigs(j) ^ d.sig)
                    if (hamming <= maxHamming)
                      out += ImageNearDupPair(
                        math.min(ids(j), d.doc_id), math.max(ids(j), d.doc_id), hamming)
                  }
                  j += 1
                }
                ids += d.doc_id; ts += d.tsMicros; sigs += d.sig
              }
            }
          }

          finishTtlState(state, ids.isEmpty, saturated, ts, ttlMicros, wmMicros)(
            BucketSigsState(ids.toArray, ts.toArray, sigs.toArray, saturated))
          out.iterator
      }
  }

  /** One (frame-signature)-routed copy of an arriving clip for
    * [[videoNearDupStream]]: the clip's FULL sorted distinct signature
    * set rides along (one copy per distinct frame signature), so both
    * sides of a bucket collision can compute the exact shared count and
    * the lowest shared signature from the two sets alone — the
    * [[PhashDoc]] recompute-from-payload discipline, set-valued.
    */
  final case class VfpDoc(
      fp: Long,
      doc_id: Long,
      timestamp: java.sql.Timestamp,
      fps: Array[Long]) {
    def tsMicros: Long = (timestamp.getTime / 1000L) * 1000000L + timestamp.getNanos / 1000L
  }

  /** Per-frame-signature bucket state for [[videoNearDupStream]]: the
    * live clips holding this signature, each with its full sorted
    * signature set (8 bytes × frames-per-clip per entry — bounded by the
    * saturation latch exactly like the scalar-signature buckets).
    */
  final case class VfpBucketState(
      ids: Array[Long],
      ts: Array[Long],
      fps: Array[Array[Long]],
      saturated: Boolean)

  /** One clip near-dup pair (doc_a < doc_b) with its exact distinct
    * shared-frame-signature count. */
  final case class ClipNearDupPair(doc_a: Long, doc_b: Long, shared_frames: Long)

  /** Streaming VIDEO near-dup — the clip face of the perceptual family,
    * completing the multimodal streaming triad (image
    * [[phashNearDupStream]] / audio [[afpNearDupStream]] / video). Each
    * arriving clip slices + dHashes map-side via
    * [[graft.operators.VideoFingerprint.clipSignatures]] (the SAME
    * lattice and hash as batch, so stream and batch agree
    * signature-for-signature), routes one copy per DISTINCT frame
    * signature to that signature's state group, and pairs against the
    * group's live clips by exact distinct-shared-signature count — a
    * pair emits iff `shared ≥ minShared`, from the LOWEST shared
    * signature's group only (both full sets are in hand, so the
    * exactly-once rule is recomputable on both sides, the
    * lowest-shared-chunk discipline generalized to sets).
    *
    * Divergence from batch [[graft.operators.VideoFingerprint.dedup]]:
    * batch drops signatures held by more than `maxBucketSize` clips
    * BEFORE counting (the ubiquity cap — mass-shared frames carry no
    * dedup signal), while the stream's saturation latch stops a
    * saturated group from PAIRING but each live pair's `shared_frames`
    * still counts its full set intersection. On a corpus with no
    * capped signatures (the fixture, and any corpus where title cards /
    * black frames stay under the cap) the two agree exactly; parity is
    * asserted in StreamingSpec. TTL eviction, the saturation latch, and
    * the decode-drops-watermark caveat are [[phashNearDupStream]]'s,
    * verbatim.
    *
    * Cost bound to size for: each routed copy carries the clip's FULL
    * set, so per-clip shuffle volume is ~8·F² bytes for F distinct
    * sampled frames (the fixture's F = 6 is trivial; ~8 MB at
    * F = 1000) — use `stride` to bound F at ingest rate. The batch
    * operator stays 8 bytes per frame and is the corpus-scale re-run
    * path.
    *
    * @return one row per near-dup pair: (doc_a, doc_b, shared_frames).
    */
  def videoNearDupStream(
      media: DataFrame,
      frameBytes: Int,
      minShared: Long = 2L,
      stride: Int = 1,
      maxBucketSize: Int = 256,
      ttlMicros: Long = Long.MaxValue,
      watermarkDelay: String = "1 hour",
      idCol: String = "media_id",
      payloadCol: String = "payload"
  ): Dataset[ClipNearDupPair] = {
    requireIntegralId(media, idCol, "videoNearDupStream")
    require(frameBytes > 0, s"frameBytes must be positive, got $frameBytes")
    require(minShared >= 1, s"minShared must be >= 1, got $minShared")
    implicit val rowEnc =
      Encoders.tuple(Encoders.scalaLong, Encoders.TIMESTAMP, Encoders.BINARY)
    implicit val vfpEnc = Encoders.product[VfpDoc]
    val routed = media
      .select(col(idCol).cast("long"), col("timestamp"), col(payloadCol))
      .as[(Long, java.sql.Timestamp, Array[Byte])]
      .flatMap { case (id, ts, payload) =>
        val fps = graft.operators.VideoFingerprint
          .clipSignatures(payload, frameBytes, stride)
        fps.toSeq.map(f => VfpDoc(f, id, ts, fps))
      }
      .withWatermark("timestamp", watermarkDelay)
      .as[VfpDoc]

    // (count, lowest) of the intersection of two sorted distinct sets.
    def shared(a: Array[Long], b: Array[Long]): (Long, Long) = {
      var i = 0; var j = 0; var n = 0L; var lowest = Long.MinValue
      while (i < a.length && j < b.length) {
        if (a(i) == b(j)) { if (n == 0L) lowest = a(i); n += 1; i += 1; j += 1 }
        else if (a(i) < b(j)) i += 1
        else j += 1
      }
      (n, lowest)
    }

    implicit val pairEnc = Encoders.product[ClipNearDupPair]
    implicit val stateEnc = Encoders.product[VfpBucketState]
    routed
      .groupByKey(_.fp)(Encoders.scalaLong)
      .flatMapGroupsWithState[VfpBucketState, ClipNearDupPair](
        OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout()) {
        (fp: Long, rows: Iterator[VfpDoc], state: GroupState[VfpBucketState]) =>
          val wmMicros = state.getCurrentWatermarkMs() * 1000L
          val prev = state.getOption.getOrElse(
            VfpBucketState(Array.empty, Array.empty, Array.empty, saturated = false))

          val (saturated0, liveIdx) =
            ttlSurvivors(prev.ts, prev.saturated, prev.ids.length, ttlMicros, wmMicros)
          var saturated = saturated0
          val ids = scala.collection.mutable.ArrayBuffer(liveIdx.map(prev.ids): _*)
          val ts = scala.collection.mutable.ArrayBuffer(
            (if (saturated) prev.ts.toSeq else liveIdx.map(prev.ts)): _*)
          val sets = scala.collection.mutable.ArrayBuffer(liveIdx.map(prev.fps): _*)

          val out = scala.collection.mutable.ArrayBuffer.empty[ClipNearDupPair]
          rows.toSeq.sortBy(d => (d.tsMicros, d.doc_id)).foreach { d =>
            if (d.tsMicros > wmMicros) {
              if (saturated) {
                ts(0) = math.max(ts(0), d.tsMicros)
              } else if (ids.length + 1 > maxBucketSize) {
                saturated = true
                ids.clear(); sets.clear()
                ts.clear(); ts += d.tsMicros
              } else {
                var j = 0
                while (j < ids.length) {
                  if (ids(j) != d.doc_id) {
                    val (n, lowest) = shared(sets(j), d.fps)
                    if (n >= minShared && lowest == fp)
                      out += ClipNearDupPair(
                        math.min(ids(j), d.doc_id), math.max(ids(j), d.doc_id), n)
                  }
                  j += 1
                }
                ids += d.doc_id; ts += d.tsMicros; sets += d.fps
              }
            }
          }

          finishTtlState(state, ids.isEmpty, saturated, ts, ttlMicros, wmMicros)(
            VfpBucketState(ids.toArray, ts.toArray, sets.toArray, saturated))
          out.iterator
      }
  }

  /** One occurrence of a k-token window on the stream: routed to its
    * `(wk, wl)` compound-key state group ([[graft.operators.Dedup]]'s
    * hashed-window collision contract), carrying the doc position for hit
    * emission.
    */
  final case class WindowOcc(
      wk: Long,
      wl: Int,
      doc_id: Long,
      timestamp: java.sql.Timestamp,
      pos: Int) {
    def tsMicros: Long = (timestamp.getTime / 1000L) * 1000000L + timestamp.getNanos / 1000L
  }

  /** Per-window-key state for [[substringDupStream]]: occurrences seen so
    * far and the last arrival (the TTL clock) — 16 bytes per distinct
    * live window, never a position list, so a boilerplate window repeated
    * millions of times costs the same state as one seen twice.
    */
  final case class WinKeyState(count: Long, lastTs: Long)

  /** One duplicated-window hit: token position `pos` of the arriving doc
    * starts a k-token window that has now been seen >= 2 times. */
  final case class SubstringHit(doc_id: Long, pos: Int)

  /** Streaming exact duplicate-SPAN detection — the ingest face of batch
    * [[graft.operators.Dedup.duplicateSpansIncremental]]: every k-token
    * window of an arriving doc checks (and increments) the running
    * occurrence count of its hashed window key; if corpus-so-far +
    * this-batch occurrences reach 2, ALL of the key's occurrences in the
    * batch emit as hits (a key first seen in an EARLIER batch is not
    * retro-reported — exactly the incremental-batch contract, so shard
    * sequences agree with `duplicateSpansIncremental` against the
    * accumulated `substringIndex`; parity asserted in StreamingSpec via
    * [[substringHitSummary]]).
    *
    * State: `(count, lastTs)` per distinct live window key, evicted once
    * the watermark passes `lastArrival + ttlMicros` (an expired key's
    * count restarts — the finite-state trade shared by the other dedup
    * streams; the persisted-index batch pass catches cross-horizon
    * duplication). Windows are assembled with array expressions
    * (interpreted per element — fine at ingest rate; the batch operator
    * keeps the codegen explode path for corpus-scale re-runs).
    *
    * @return one [[SubstringHit]] per duplicated window occurrence; merge
    *         to spans/coverage with [[substringHitSummary]].
    */
  def substringDupStream(
      docs: DataFrame,
      k: Int,
      ttlMicros: Long = Long.MaxValue,
      textCol: String = "text",
      idCol: String = "doc_id"
  ): Dataset[SubstringHit] = {
    require(k >= 1, s"window size must be >= 1, got $k")
    requireIntegralId(docs, idCol, "substringDupStream")
    implicit val occEnc = Encoders.product[WindowOcc]
    val occ = docs
      .select(col(idCol).cast("long").as("doc_id"), col("timestamp"),
        split(lower(col(textCol)), "\\s+").as("__toks"))
      .withColumn("__nt", size(col("__toks")))
      .filter(col("__nt") >= k)
      .select(col("doc_id"), col("timestamp"),
        posexplode(transform(sequence(lit(0), col("__nt") - lit(k)),
          i => concat_ws(" ", slice(col("__toks"), i + lit(1), lit(k)))))
          .as(Seq("pos", "__w")))
      .select(xxhash64(col("__w")).as("wk"), length(col("__w")).as("wl"),
        col("doc_id"), col("timestamp"), col("pos"))
      .as[WindowOcc]

    implicit val hitEnc = Encoders.product[SubstringHit]
    implicit val stateEnc = Encoders.product[WinKeyState]
    occ
      .groupByKey(o => (o.wk, o.wl))(Encoders.tuple(Encoders.scalaLong, Encoders.scalaInt))
      .flatMapGroupsWithState[WinKeyState, SubstringHit](
        OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout()) {
        (_: (Long, Int), rows: Iterator[WindowOcc], state: GroupState[WinKeyState]) =>
          val wmMicros = state.getCurrentWatermarkMs() * 1000L
          val live = state.getOption.filter(s => satAdd(s.lastTs, ttlMicros) > wmMicros)
          val fresh = rows.toSeq.filter(_.tsMicros > wmMicros)
          if (fresh.isEmpty) {
            // Timeout tick (or an all-late batch): evict or keep as-is.
            live match {
              case None => if (state.exists) state.remove()
              case Some(s) =>
                state.update(s)
                if (ttlMicros < Long.MaxValue)
                  state.setTimeoutTimestamp(
                    math.max(satAdd(s.lastTs, ttlMicros) / 1000L + 1L, wmMicros / 1000L + 1L))
            }
            Iterator.empty
          } else {
            val total = live.map(_.count).getOrElse(0L) + fresh.length
            val lastTs = math.max(
              live.map(_.lastTs).getOrElse(Long.MinValue), fresh.map(_.tsMicros).max)
            state.update(WinKeyState(total, lastTs))
            if (ttlMicros < Long.MaxValue)
              state.setTimeoutTimestamp(
                math.max(satAdd(lastTs, ttlMicros) / 1000L + 1L, wmMicros / 1000L + 1L))
            if (total >= 2)
              fresh.sortBy(o => (o.doc_id, o.pos))
                .map(o => SubstringHit(o.doc_id, o.pos)).iterator
            else Iterator.empty
          }
      }
  }

  /** Per-doc span rollup over [[SubstringHit]] rows (a batch of stream
    * output), via the closed forms over the sorted hit positions:
    * `covered = k + Σ min(gap, k)` and `spans = 1 + #{gap >= k}` —
    * algebraically identical to the batch gaps-and-islands merge.
    *
    * @return (doc_id, dup_windows, dup_spans, covered_tokens) for docs
    *         with at least one hit.
    */
  def substringHitSummary(hits: DataFrame, k: Int): DataFrame = {
    val ps = col("__ps")
    val gaps = when(size(ps) > 1,
      zip_with(slice(ps, lit(2), size(ps) - 1), slice(ps, lit(1), size(ps) - 1),
        (a, b) => a - b))
      .otherwise(array().cast("array<int>"))
    hits
      .groupBy("doc_id")
      .agg(sort_array(collect_list(col("pos"))).as("__ps"))
      .select(col("doc_id"),
        size(ps).cast("long").as("dup_windows"),
        (lit(1) + size(filter(gaps, g => g >= lit(k)))).cast("long").as("dup_spans"),
        aggregate(gaps, lit(k), (acc, g) => acc + least(g, lit(k)))
          .cast("long").as("covered_tokens"))
  }

  /** Streaming model-based quality scoring — σ(w·x) under a FITTED
    * [[graft.operators.QualityClassifier.train]] model frame for every
    * arriving doc, STATELESS (the batch scorer's explode + distinct +
    * window normalization are all stateful plan shapes a stream can't
    * run; here the hashed feature set is built IN-ROW — array_distinct
    * over the hashed grams — and the margin is one codegen'd `aggregate`
    * fold over it against the broadcast weight map, divided by √n_d for
    * the same unit-L2 normalization). The ingest-path face of the
    * GPT-3-style quality filter: train offline on a labeled reference
    * corpus, tag every arriving doc with its quality score, threshold
    * downstream.
    *
    * Scores equal the batch [[graft.operators.QualityClassifier.score]]
    * up to summation order (the batch path sums w·x per feature row, this
    * one folds Σw then scales — asserted ≤5e-5 in StreamingSpec, well
    * inside the batch scorer's own 1e-4 rounding grain). Docs with no
    * tokens get a NULL quality (the batch scorer omits them entirely).
    *
    * @param model a [[graft.operators.QualityClassifier.train]] frame
    *              (or its parquet round-trip): (feat, w) with bias at −1.
    * @return the input rows plus `quality` — unrounded; callers
    *         threshold, they don't hash-compare.
    */
  /** Streaming benchmark decontamination — exact matched-n-gram counts
    * for every arriving doc against a static probe frame (the eval set),
    * the ingest-time face of [[graft.operators.Decontaminate.matches]]:
    * in-row distinct shingles explode (codegen generator) → broadcast
    * hash join against the probe shingle set (stream-static, stateless)
    * → per-doc count keyed on (event-time, doc id), emitted exactly once
    * when the watermark passes the doc's timestamp. A doc's shingles all
    * arrive in its own micro-batch, so the aggregation state is only the
    * in-flight docs inside the watermark window.
    *
    * `docs` must already carry `withWatermark(tsCol, …)` (the
    * [[dedupExactStream]] contract). Only docs with ≥1 hit emit — batch
    * parity on (doc_id, matched_ngrams) is asserted in StreamingSpec.
    */
  def decontaminateStream(
      docs: DataFrame,
      probes: DataFrame,
      shingleN: Int = 3,
      textCol: String = "text",
      idCol: String = "doc_id",
      tsCol: String = "timestamp",
      probeTextCol: String = "text"
  ): DataFrame = {
    val probeShingles = probes
      .select(explode(
        graft.functions.Texts.distinctShingles(col(probeTextCol), shingleN)).as("s"))
      .distinct()
    docs
      .select(col(idCol), col(tsCol),
        explode(graft.functions.Texts.distinctShingles(col(textCol), shingleN)).as("s"))
      .join(broadcast(probeShingles), Seq("s"))
      .groupBy(col(tsCol), col(idCol))
      .agg(count(lit(1)).as("matched_ngrams"))
      .select(col(idCol), col(tsCol), col("matched_ngrams"))
  }

  def qualityScoreStream(
      docs: DataFrame,
      model: DataFrame,
      textCol: String = "text"
  ): DataFrame = {
    require(model.columns.sorted.sameElements(Array("feat", "w")),
      s"not a QualityClassifier model frame (columns ${model.columns.mkString(",")}) — " +
        "fit with QualityClassifier.train")
    // Driver-side scalars (the model is a batch frame): width + bias.
    val dim = model.filter(col("feat") >= 0).count()
    val bias = model.filter(col("feat") === -1).head().getDouble(1)
    val wRow = model.filter(col("feat") >= 0).agg(
      map_from_entries(collect_list(struct(col("feat"), col("w")))).as("__wmap"))

    // In-row mirror of QualityClassifier.hashedFeatures: unigrams +
    // bigrams, xxhash64(gram, "qc") mod dim, distinct.
    val toks = filter(split(lower(col(textCol)), " "), t => t =!= "")
    val grams = concat(
      toks,
      when(size(toks) >= 2,
        zip_with(slice(toks, lit(1), size(toks) - 1), slice(toks, lit(2), size(toks) - 1),
          (a, b) => concat_ws(" ", a, b)))
        .otherwise(array().cast("array<string>")))
    val feats = array_distinct(transform(grams,
      g => pmod(xxhash64(g, lit("qc")), lit(dim)).cast("int")))
    val sumW = aggregate(feats, lit(0.0d),
      (acc, f) => acc + coalesce(element_at(col("__wmap"), f), lit(0.0d)))
    val margin = sumW / sqrt(size(feats)) + bias
    docs
      .crossJoin(broadcast(wRow))
      .withColumn("quality",
        when(size(feats) > 0, lit(1.0) / (lit(1.0) + exp(-margin))))
      .drop("__wmap")
  }

  /** Streaming LM quality scoring — perplexity under a FITTED
    * [[graft.operators.Vocabulary.unigramLm]] frame for every arriving
    * doc, STATELESS (each doc scores within its own row: no
    * aggregation, no state store, any output mode). The ingest-path
    * quality filter that pairs with the dedup streams: one pass tags
    * arriving docs with ppl and the caller thresholds.
    *
    * The LM is vocab-bounded by construction, so it rides along as one
    * broadcast map column (built relationally — `map_from_entries` over
    * the LM rows, one row crossJoined in; the per-doc score is a single
    * codegen'd `aggregate` fold over the token array, and the map is
    * projected away in the same stage, so it is never copied per row
    * into the output).
    *
    * Scores are bit-identical to batch [[graft.operators.Vocabulary
    * .perplexity]] up to summation order (asserted ≤1e-9 in
    * StreamingSpec; the batch path averages in arrival order, this one
    * folds left over the token array).
    *
    * @param lm a [[graft.operators.Vocabulary.unigramLm]] frame (or its
    *           parquet round-trip).
    * @return the input rows plus (n_tokens, avg_nll, ppl) — unrounded;
    *         callers threshold, they don't hash-compare.
    */
  def perplexityStream(
      docs: DataFrame,
      lm: DataFrame,
      textCol: String = "text"
  ): DataFrame = {
    // Exact-columns gate (same contract as the batch scorer): a
    // bigramLm frame also carries (tok, logp) but would die mid-stream
    // with an opaque duplicate-map-key error here.
    require(lm.columns.sorted.sameElements(Array("logp", "tok")),
      s"not a unigramLm frame (columns ${lm.columns.mkString(",")}) — " +
        "fit the corpus with unigramLm")
    val lmRow = lm.agg(
      map_from_entries(collect_list(
        when(col("tok").isNotNull, struct(col("tok"), col("logp"))))).as("__lmmap"),
      max(when(col("tok").isNull, col("logp"))).as("__oov"))
    val toks = split(lower(col(textCol)), "\\s+")
    val sumLp = aggregate(toks, lit(0.0d),
      (acc, t) => acc + coalesce(element_at(col("__lmmap"), t), col("__oov")))
    docs
      .crossJoin(broadcast(lmRow))
      .withColumn("n_tokens", size(toks).cast("long"))
      .withColumn("avg_nll", -sumLp / col("n_tokens"))
      .withColumn("ppl", exp(col("avg_nll")))
      .drop("__lmmap", "__oov")
  }

  /** Per-subject running totals with stateful processing. Emits one update
    * per micro-batch per active subject. State here is unbounded by design
    * (a running total never expires); a production deployment bounding
    * state would add an event-time timeout keyed off the watermark and
    * emit a final record on eviction.
    */
  def cumulativeCounts(
      events: Dataset[SubjectEvent],
      nPreds: Int
  ): Dataset[SubjectTotals] = {
    implicit val enc = Encoders.product[SubjectTotals]
    events
      .groupByKey(_.subject_id)(Encoders.scalaLong)
      .flatMapGroupsWithState[SubjectTotals, SubjectTotals](
        OutputMode.Append(),
        GroupStateTimeout.NoTimeout()) {
        (subject: Long, rows: Iterator[SubjectEvent], state: GroupState[SubjectTotals]) =>
          val prev = state.getOption.getOrElse(SubjectTotals(subject, 0L, Array.fill(nPreds)(0L)))
          var lastTs = prev.lastTsMicros
          val totals = prev.totals.clone()
          var any = false
          rows.foreach { e =>
            any = true
            lastTs = math.max(lastTs, e.tsMicros)
            var i = 0
            while (i < nPreds) { totals(i) += e.counts(i); i += 1 }
          }
          val updated = SubjectTotals(subject, lastTs, totals)
          state.update(updated)
          if (any) Iterator(updated) else Iterator.empty
      }
  }
}
