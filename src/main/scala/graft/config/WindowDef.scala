package graft.config

import graft.model.{EndpointBounds, EventBounds, TemporalBounds}
import graft.operators.Constraints
import graft.time.Timedelta

/** One window of the task config, with the reference's boundary string
  * language. (reference: src/aces/config.py:319-838 `WindowConfig`)
  *
  * Boundary grammar (config.py:326-349):
  *   - `null`: start/end of the patient record;
  *   - `$REF -> pred` / `$REF <- pred`: closest event satisfying `pred`
  *     after/before the referenced event;
  *   - `$REF + td` / `$REF - td`: fixed offset from the referenced event;
  *   - `$REF`: the referenced event itself.
  *   `$REF` is `trigger`, `other_window.start|end`, or this window's own
  *   `start`/`end`.
  */
final case class WindowDef(
    start: Option[String],
    end: Option[String],
    startInclusive: Boolean,
    endInclusive: Boolean,
    has: Map[String, Constraints.Range] = Map.empty,
    label: Option[String] = None,
    indexTimestamp: Option[String] = None
) {
  import WindowDef._

  require(
    start.nonEmpty || end.nonEmpty,
    "Window cannot progress from the start of the record to the end of the record.")

  private[config] val parsedStart: Boundary = start match {
    case None    => Boundary("end", None, Some(s"-${EventBounds.StartOfRecord}"), Some(true))
    case Some(s) => parseBoundary(s)
  }
  private[config] val parsedEnd: Boundary = end match {
    case None    => Boundary("start", None, Some(EventBounds.EndOfRecord), Some(false))
    case Some(e) => parseBoundary(e)
  }

  val startReferencesEnd: Boolean =
    (parsedStart.referenced == "end", parsedEnd.referenced == "start") match {
      case (true, true) | (false, false) =>
        throw new IllegalArgumentException(
          "Exactly one of the start or end of the window must reference the other. " +
            s"Got: ${start.orNull} -> ${end.orNull}")
      case (true, _) =>
        if (parsedStart.occursBefore.contains(false))
          throw new IllegalArgumentException(
            s"Window start will not occur before window end! Got: ${start.orNull} -> ${end.orNull}")
        true
      case _ =>
        if (parsedEnd.occursBefore.contains(true))
          throw new IllegalArgumentException(
            s"Window start will not occur before window end! Got: ${start.orNull} -> ${end.orNull}")
        false
    }

  /** `"end"` if start references end, else `"start"` — the node of this
    * window anchored to the parent. (reference: config.py:754-757)
    */
  def rootNode: String = if (startReferencesEnd) "end" else "start"

  /** `("trigger")` or `(window, "start"|"end")`. (reference: config.py:759-764) */
  def referencedEvent: Seq[String] =
    (if (startReferencesEnd) parsedEnd.referenced else parsedStart.referenced).split("\\.").toSeq

  def constraintPredicates: Set[String] = has.keySet

  /** All predicate names this window references (constraints + event
    * bounds, minus record markers). (reference: config.py:771-780)
    */
  def referencedPredicates: Set[String] = {
    val bounds = Seq(parsedStart.eventBound, parsedEnd.eventBound).flatten
      .map(_.replace("-", ""))
    (has.keySet ++ bounds) -- Set(EventBounds.StartOfRecord, EventBounds.EndOfRecord)
  }

  /** (reference: config.py:782-809) */
  def startEndpointExpr: Option[EndpointBounds] = {
    val (li, ri) = if (startReferencesEnd) (startInclusive, endInclusive) else (false, false)
    endpointOf(parsedStart, li, ri)
  }

  /** (reference: config.py:811-838) */
  def endEndpointExpr: Option[EndpointBounds] = {
    val (li, ri) = if (startReferencesEnd) (false, false) else (startInclusive, endInclusive)
    endpointOf(parsedEnd, li, ri)
  }

  private def endpointOf(b: Boundary, li: Boolean, ri: Boolean): Option[EndpointBounds] =
    b.eventBound
      .map(eb => EventBounds(li, eb, ri, 0L): EndpointBounds)
      .orElse(b.offset.map(off =>
        TemporalBounds(li, Timedelta.parseMicros(off), ri, 0L): EndpointBounds))
}

object WindowDef {

  /** Parsed boundary: the referenced event plus either an offset string
    * (sign included) or an event bound (leading `-` = before).
    */
  final case class Boundary(
      referenced: String,
      offset: Option[String],
      eventBound: Option[String],
      occursBefore: Option[Boolean]
  )

  private val refErr = (r: String) =>
    "Window boundary reference must be either a valid alphanumeric/'_' string or a reference " +
      "to another window's start or end event, formatted as a valid alphanumeric/'_' string, " +
      s"followed by '.start' or '.end'. Got: '$r'"

  private def checkReference(ref: String): Unit =
    if (ref.contains(".")) {
      val parts = ref.split("\\.")
      if (ref.count(_ == '.') > 1 || parts.length != 2 ||
        !Set("start", "end").contains(parts(1)) || !parts(0).matches("^\\w+$"))
        throw new IllegalArgumentException(refErr(ref))
    } else if (!ref.matches("^\\w+$"))
      throw new IllegalArgumentException(refErr(ref))

  /** (reference: config.py:647-689) */
  def parseBoundary(boundary: String): Boundary =
    if (boundary.contains("->") || boundary.contains("<-")) {
      if (boundary.contains("->") && boundary.contains("<-"))
        throw new IllegalArgumentException(
          "Window boundary cannot contain both '->' and '<-' operators.")
      val (ref, pred) =
        if (boundary.contains("->")) {
          val Array(r, p) = boundary.split("->").map(_.trim)
          (r, p)
        } else {
          val Array(r, p) = boundary.split("<-").map(_.trim)
          (r, "-" + p)
        }
      checkReference(ref)
      Boundary(ref, None, Some(pred), Some(pred.contains("-")))
    } else if (boundary.contains("+") || boundary.contains("-")) {
      if (boundary.contains("+") && boundary.contains("-"))
        throw new IllegalArgumentException(
          "Window boundary cannot contain both '+' and '-' operators.")
      val (ref, off) =
        if (boundary.contains("+")) {
          val Array(r, o) = boundary.split("\\+").map(_.trim)
          (r, o)
        } else {
          val Array(r, o) = boundary.split("-", 2).map(_.trim)
          (r, "-" + o)
        }
      checkReference(ref)
      val parsed =
        try Timedelta.parseMicros(off)
        catch {
          case e: IllegalArgumentException =>
            throw new IllegalArgumentException(
              s"Failed to parse timedelta from window offset for '${off.stripPrefix("-")}'", e)
        }
      if (parsed == 0L) Boundary(ref, None, None, None)
      else Boundary(ref, Some(off), None, Some(off.startsWith("-")))
    } else {
      val ref = boundary.trim
      checkReference(ref)
      Boundary(ref, None, None, None)
    }

  /** Parse a `"(min, max)"` constraint string. (reference: config.py:691-704) */
  def parseConstraint(name: String, s: String): Constraints.Range = {
    val parts = s.stripPrefix("(").stripSuffix(")").split(",", -1).map(_.trim)
    if (parts.length != 2)
      throw new IllegalArgumentException(
        s"Invalid constraint format: $name. Expected format: '(min, max)'. Got: '$s'")
    def p(x: String): Option[Long] =
      if (x == "None" || x.isEmpty || x == "null") None else Some(x.toLong)
    (p(parts(0)), p(parts(1)))
  }
}
