package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization of per-subject event streams: a new session
  * starts whenever the gap since the subject's previous event exceeds
  * `gapMicros` — the classic event-stream operator (user sessions, care
  * episodes, training-log runs).
  *
  * Formulation: a session id is the running count of gap-exceeding
  * boundaries — `sum(gap > threshold) over (partition by subject order by
  * ts rows unbounded preceding..current)` — a GROWING frame (incremental,
  * O(n) per partition) over the engine's standard hash(subject_id)
  * clustering: zero exchanges above the canonical frame, same as every
  * other per-subject operator (PlanAudit-compatible shape).
  */
object Sessionize {

  /** @return input rows + `session_id` (0-based per subject, ordered by
    *         time) + `is_session_start` (1 on each session's first event).
    */
  def assign(
      events: DataFrame,
      gapMicros: Long,
      subjectCol: String = "subject_id",
      tsCol: String = "timestamp"
  ): DataFrame = {
    val wLag = Window.partitionBy(subjectCol).orderBy(tsCol)
    val wCum = Window.partitionBy(subjectCol).orderBy(tsCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val gap = unix_micros(col(tsCol)) - unix_micros(lag(col(tsCol), 1).over(wLag))
    events
      .withColumn("is_session_start",
        when(gap.isNull || gap > gapMicros, 1L).otherwise(0L))
      .withColumn("session_id", sum(col("is_session_start")).over(wCum) - 1L)
  }

  /** Per-session summary: event count, start/end timestamps, duration. */
  def sessions(
      events: DataFrame,
      gapMicros: Long,
      subjectCol: String = "subject_id",
      tsCol: String = "timestamp"
  ): DataFrame =
    assign(events, gapMicros, subjectCol, tsCol)
      .groupBy(col(subjectCol), col("session_id"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col(tsCol)).as("session_start"),
        max(col(tsCol)).as("session_end"),
        (unix_micros(max(col(tsCol))) - unix_micros(min(col(tsCol)))).as("duration_us"))
}
