package graft.model

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Closed-endpoint semantics shared by both window kinds.
  * (reference: src/aces/types.py:126-133, 300-307)
  */
object Closed extends Enumeration {
  val Both, Left, Right, None = Value

  def of(leftInclusive: Boolean, rightInclusive: Boolean): Closed.Value =
    if (leftInclusive && rightInclusive) Both
    else if (leftInclusive) Left
    else if (rightInclusive) Right
    else None
}

sealed trait EndpointBounds {
  def offsetMicros: Long
  def withAddedOffset(extraMicros: Long): EndpointBounds
}

/** Temporal (fixed-duration) window bounds.
  *
  * (reference: src/aces/types.py:25-143 `TemporalWindowBounds`)
  *
  * The window relative to each anchor row at time `t` spans
  * `[t + offset, t + offset + window]` (window may be negative, in which
  * case the span is `[t + offset + window, t + offset]`), with endpoint
  * inclusivity given by `leftInclusive`/`rightInclusive` *in temporal
  * order* (left = earliest endpoint).
  */
final case class TemporalBounds(
    leftInclusive: Boolean,
    windowMicros: Long,
    rightInclusive: Boolean,
    offsetMicros: Long = 0L
) extends EndpointBounds {

  def closed: Closed.Value = Closed.of(leftInclusive, rightInclusive)

  /** Normalized frame endpoints relative to the row timestamp, in micros,
    * lo <= hi, before inclusivity adjustment.
    * (reference: src/aces/types.py:135-143 — negative windows flip)
    */
  def frameLoHi: (Long, Long) =
    if (windowMicros < 0) (offsetMicros + windowMicros, offsetMicros)
    else (offsetMicros, offsetMicros + windowMicros)

  /** Inclusive range-frame endpoints for Spark's `rangeBetween` (which is
    * always closed-closed), emulating open endpoints by shrinking 1 µs —
    * valid because all timestamps are µs-quantized; the reference relies
    * on the same epsilon trick (src/aces/aggregate.py:1012-1017).
    */
  def inclusiveFrame: (Long, Long) = {
    val (lo, hi) = frameLoHi
    val loAdj = if (closed == Closed.Both || closed == Closed.Left) lo else lo + 1
    val hiAdj = if (closed == Closed.Both || closed == Closed.Right) hi else hi - 1
    (loAdj, hiAdj)
  }

  def withAddedOffset(extraMicros: Long): TemporalBounds =
    copy(offsetMicros = offsetMicros + extraMicros)
}

/** Event-bound window bounds: the far endpoint is the nearest prior/next
  * row where a boundary predicate holds.
  *
  * (reference: src/aces/types.py:146-325 `ToEventWindowBounds`)
  *
  * `endEvent` uses the reference's string syntax: a leading `-` means the
  * bound is *before* the row (mode `bound_to_row`); `_RECORD_START` /
  * `_RECORD_END` refer to each subject's first/last event.
  */
final case class EventBounds(
    leftInclusive: Boolean,
    endEvent: String,
    rightInclusive: Boolean,
    offsetMicros: Long = 0L
) extends EndpointBounds {
  import EventBounds._

  require(endEvent.nonEmpty, "The 'end_event' must be a non-empty string.")
  require(
    endEvent != StartOfRecord,
    s"It doesn't make sense to have the start of the record $StartOfRecord be an end event."
  )
  require(
    endEvent != s"-$EndOfRecord",
    s"It doesn't make sense to have the end of the record $EndOfRecord be a start event."
  )

  def mode: String = if (endEvent.startsWith("-")) "bound_to_row" else "row_to_bound"

  def boundEventName: String = if (endEvent.startsWith("-")) endEvent.drop(1) else endEvent

  def closed: Closed.Value = Closed.of(leftInclusive, rightInclusive)

  /** Boolean column marking rows that may serve as the bound endpoint.
    * (reference: src/aces/types.py:313-318)
    */
  def boundaryExpr: Column = boundEventName match {
    case StartOfRecord =>
      col("timestamp") === min("timestamp").over(Window.partitionBy("subject_id"))
    case EndOfRecord =>
      col("timestamp") === max("timestamp").over(Window.partitionBy("subject_id"))
    case other => col(other) > 0
  }

  def withAddedOffset(extraMicros: Long): EventBounds =
    copy(offsetMicros = offsetMicros + extraMicros)
}

object EventBounds {
  val StartOfRecord = "_RECORD_START"
  val EndOfRecord = "_RECORD_END"
  val AnyEvent = "_ANY_EVENT"
}
