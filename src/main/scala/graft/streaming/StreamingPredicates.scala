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
  */
object StreamingPredicates {

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

  final case class SubjectEvent(subject_id: Long, tsMicros: Long, counts: Array[Long])
  final case class SubjectTotals(subject_id: Long, lastTsMicros: Long, totals: Array[Long])

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
