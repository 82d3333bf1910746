package graft

import org.apache.spark.sql.functions._

import graft.model.{Closed, EventBounds}
import graft.operators.EventBoundAgg

/** Golden tests ported from the reference doctests of
  * `aggregate_event_bound_window` (reference: src/aces/aggregate.py:372-471)
  * plus the full `boolean_expr_bound_sum` truth table (:523-541).
  */
class EventBoundAggSpec extends SparkSpec {

  private val D = 86400000000L

  private def df8 = predicatesDf(
    Seq("is_A", "is_B", "is_C"),
    Seq(
      (1L, "1989-12-01 12:03", Seq(1L, 0L, 0L)),
      (1L, "1989-12-03 13:14", Seq(0L, 1L, 1L)), // HAS EVENT BOUND
      (1L, "1989-12-05 15:17", Seq(1L, 0L, 0L)),
      (2L, "1989-12-02 12:03", Seq(1L, 1L, 0L)),
      (2L, "1989-12-04 13:14", Seq(1L, 0L, 0L)),
      (2L, "1989-12-06 15:17", Seq(1L, 1L, 1L)), // HAS EVENT BOUND
      (2L, "1989-12-08 16:22", Seq(0L, 1L, 0L)),
      (2L, "1989-12-10 03:07", Seq(0L, 1L, 1L)) // HAS EVENT BOUND
    )
  )

  test("to is_C, closed both (aggregate.py:392-407)") {
    val out = EventBoundAgg(df8, EventBounds(true, "is_C", true, 0L))
    assert(
      snap(out) == Seq(
        "1|1989-12-01 12:03:00|1989-12-01 12:03:00|1989-12-03 13:14:00|1|1|1",
        "1|1989-12-03 13:14:00|1989-12-03 13:14:00|1989-12-03 13:14:00|0|1|1",
        "1|1989-12-05 15:17:00|null|null|0|0|0",
        "2|1989-12-02 12:03:00|1989-12-02 12:03:00|1989-12-06 15:17:00|3|2|1",
        "2|1989-12-04 13:14:00|1989-12-04 13:14:00|1989-12-06 15:17:00|2|1|1",
        "2|1989-12-06 15:17:00|1989-12-06 15:17:00|1989-12-06 15:17:00|1|1|1",
        "2|1989-12-08 16:22:00|1989-12-08 16:22:00|1989-12-10 03:07:00|0|2|1",
        "2|1989-12-10 03:07:00|1989-12-10 03:07:00|1989-12-10 03:07:00|0|1|1"
      ).sorted
    )
  }

  test("to is_C, left-closed (aggregate.py:408-423)") {
    val out = EventBoundAgg(df8, EventBounds(true, "is_C", false, 0L))
    assert(
      snap(out) == Seq(
        "1|1989-12-01 12:03:00|1989-12-01 12:03:00|1989-12-03 13:14:00|1|0|0",
        "1|1989-12-03 13:14:00|null|null|0|0|0",
        "1|1989-12-05 15:17:00|null|null|0|0|0",
        "2|1989-12-02 12:03:00|1989-12-02 12:03:00|1989-12-06 15:17:00|2|1|0",
        "2|1989-12-04 13:14:00|1989-12-04 13:14:00|1989-12-06 15:17:00|1|0|0",
        "2|1989-12-06 15:17:00|1989-12-06 15:17:00|1989-12-10 03:07:00|1|2|1",
        "2|1989-12-08 16:22:00|1989-12-08 16:22:00|1989-12-10 03:07:00|0|1|0",
        "2|1989-12-10 03:07:00|null|null|0|0|0"
      ).sorted
    )
  }

  test("to is_C, right-closed (aggregate.py:424-439)") {
    val out = EventBoundAgg(df8, EventBounds(false, "is_C", true, 0L))
    assert(
      snap(out) == Seq(
        "1|1989-12-01 12:03:00|1989-12-01 12:03:00|1989-12-03 13:14:00|0|1|1",
        "1|1989-12-03 13:14:00|1989-12-03 13:14:00|1989-12-03 13:14:00|0|0|0",
        "1|1989-12-05 15:17:00|null|null|0|0|0",
        "2|1989-12-02 12:03:00|1989-12-02 12:03:00|1989-12-06 15:17:00|2|1|1",
        "2|1989-12-04 13:14:00|1989-12-04 13:14:00|1989-12-06 15:17:00|1|1|1",
        "2|1989-12-06 15:17:00|1989-12-06 15:17:00|1989-12-06 15:17:00|0|0|0",
        "2|1989-12-08 16:22:00|1989-12-08 16:22:00|1989-12-10 03:07:00|0|1|1",
        "2|1989-12-10 03:07:00|1989-12-10 03:07:00|1989-12-10 03:07:00|0|0|0"
      ).sorted
    )
  }

  test("to is_C, closed both, offset 3d (aggregate.py:440-455)") {
    val out = EventBoundAgg(df8, EventBounds(true, "is_C", true, 3 * D))
    assert(
      snap(out) == Seq(
        "1|1989-12-01 12:03:00|null|null|0|0|0",
        "1|1989-12-03 13:14:00|null|null|0|0|0",
        "1|1989-12-05 15:17:00|null|null|0|0|0",
        "2|1989-12-02 12:03:00|1989-12-05 12:03:00|1989-12-06 15:17:00|1|1|1",
        "2|1989-12-04 13:14:00|1989-12-07 13:14:00|1989-12-10 03:07:00|0|2|1",
        "2|1989-12-06 15:17:00|1989-12-09 15:17:00|1989-12-10 03:07:00|0|1|1",
        "2|1989-12-08 16:22:00|null|null|0|0|0",
        "2|1989-12-10 03:07:00|null|null|0|0|0"
      ).sorted
    )
  }

  // --- Truth table (aggregate.py:523-541) -----------------------------------
  // Rows 0..6, boundary expression [F, T, F, T, T, F, F]; each row carries
  // value 2^i so the sum uniquely identifies the aggregated row set.

  private def truthDf = predicatesDf(
    Seq("v", "is_b"),
    Seq(
      (1L, "2000-01-01 00:00", Seq(1L, 0L)),
      (1L, "2000-01-02 00:00", Seq(2L, 1L)),
      (1L, "2000-01-03 00:00", Seq(4L, 0L)),
      (1L, "2000-01-04 00:00", Seq(8L, 1L)),
      (1L, "2000-01-05 00:00", Seq(16L, 1L)),
      (1L, "2000-01-06 00:00", Seq(32L, 0L)),
      (1L, "2000-01-07 00:00", Seq(64L, 0L))
    )
  )

  private def vSums(mode: String, closed: Closed.Value): Seq[Long] =
    EventBoundAgg
      .boolExprBoundSum(truthDf, col("is_b") > 0, mode, closed)
      .orderBy("timestamp")
      .select("v")
      .collect()
      .map(_.getLong(0))
      .toSeq

  // NOTE on the two `closed=left` rows: the reference's *prose* truth table
  // (aggregate.py:533-541) disagrees with its *executable* doctests
  // (aggregate.py:642-662 and :726-746) for boundary rows under closed=left.
  // The implementation (which the doctests pin) resolves a boundary row's
  // own bound as: bound_to_row/left and row_to_bound/right → itself (empty
  // window, sum 0); row_to_bound/left → the *next* boundary. We match the
  // executable behavior, not the prose.
  test("truth table: bound_to_row") {
    assert(vSums("bound_to_row", Closed.Both) == Seq(0L, 2L, 6L, 8L, 16L, 48L, 112L))
    assert(vSums("bound_to_row", Closed.Left) == Seq(0L, 0L, 2L, 0L, 0L, 16L, 48L))
    assert(vSums("bound_to_row", Closed.Right) == Seq(0L, 0L, 4L, 12L, 16L, 32L, 96L))
    assert(vSums("bound_to_row", Closed.None) == Seq(0L, 0L, 0L, 4L, 0L, 0L, 32L))
  }

  test("truth table: row_to_bound") {
    assert(vSums("row_to_bound", Closed.Both) == Seq(3L, 2L, 12L, 8L, 16L, 0L, 0L))
    assert(vSums("row_to_bound", Closed.Left) == Seq(1L, 6L, 4L, 8L, 0L, 0L, 0L))
    assert(vSums("row_to_bound", Closed.Right) == Seq(2L, 0L, 8L, 0L, 0L, 0L, 0L))
    assert(vSums("row_to_bound", Closed.None) == Seq(0L, 4L, 0L, 0L, 0L, 0L, 0L))
  }

  // Negative-offset doctests exercise the offset-correction join
  // (aggregate.py:835-856 and :901-922). Boundary rows are idx ∈ {1,4,7}.
  private def df8Idx = predicatesDf(
    Seq("idx", "is_A", "is_B", "is_C"),
    Seq(
      (1L, "1989-12-01 12:03", Seq(0L, 1L, 0L, 0L)),
      (1L, "1989-12-03 13:14", Seq(1L, 0L, 1L, 1L)),
      (1L, "1989-12-05 15:17", Seq(2L, 1L, 0L, 0L)),
      (2L, "1989-12-02 12:03", Seq(3L, 1L, 1L, 0L)),
      (2L, "1989-12-04 13:14", Seq(4L, 1L, 0L, 0L)),
      (2L, "1989-12-06 15:17", Seq(5L, 1L, 1L, 1L)),
      (2L, "1989-12-08 16:22", Seq(6L, 0L, 1L, 0L)),
      (2L, "1989-12-10 03:07", Seq(7L, 0L, 1L, 1L))
    )
  )

  private def negOffsetSnap(mode: String, closed: Closed.Value): Seq[String] = {
    val out = EventBoundAgg
      .boolExprBoundSum(df8Idx, col("idx").isin(1, 4, 7), mode, closed, -3 * D)
      .select("subject_id", "timestamp", "timestamp_at_start", "timestamp_at_end",
        "is_A", "is_B", "is_C")
    snap(out)
  }

  test("bound_to_row, right-closed, offset -3d (aggregate.py:835-856)") {
    assert(
      negOffsetSnap("bound_to_row", Closed.Right) == Seq(
        "1|1989-12-01 12:03:00|null|null|0|0|0",
        "1|1989-12-03 13:14:00|null|null|0|0|0",
        "1|1989-12-05 15:17:00|null|null|0|0|0",
        "2|1989-12-02 12:03:00|null|null|0|0|0",
        "2|1989-12-04 13:14:00|null|null|0|0|0",
        "2|1989-12-06 15:17:00|null|null|0|0|0",
        "2|1989-12-08 16:22:00|1989-12-04 13:14:00|1989-12-05 16:22:00|0|0|0",
        "2|1989-12-10 03:07:00|1989-12-04 13:14:00|1989-12-07 03:07:00|1|1|1"
      ).sorted
    )
  }

  test("row_to_bound, open, offset -3d (aggregate.py:901-922)") {
    assert(
      negOffsetSnap("row_to_bound", Closed.None) == Seq(
        "1|1989-12-01 12:03:00|1989-11-28 12:03:00|1989-12-03 13:14:00|1|0|0",
        "1|1989-12-03 13:14:00|1989-11-30 13:14:00|1989-12-03 13:14:00|1|0|0",
        "1|1989-12-05 15:17:00|1989-12-02 15:17:00|1989-12-03 13:14:00|0|0|0",
        "2|1989-12-02 12:03:00|1989-11-29 12:03:00|1989-12-04 13:14:00|1|1|0",
        "2|1989-12-04 13:14:00|1989-12-01 13:14:00|1989-12-04 13:14:00|1|1|0",
        "2|1989-12-06 15:17:00|1989-12-03 15:17:00|1989-12-04 13:14:00|0|0|0",
        "2|1989-12-08 16:22:00|1989-12-05 16:22:00|1989-12-10 03:07:00|1|2|1",
        "2|1989-12-10 03:07:00|1989-12-07 03:07:00|1989-12-10 03:07:00|0|1|0"
      ).sorted
    )
  }

  test("record-start / record-end boundary expressions") {
    // start -> _RECORD_END with closed both over subject 1 of df8: every row
    // sums from itself to the subject's last event.
    val out = EventBoundAgg(df8, EventBounds(true, "_RECORD_END", true, 0L))
      .filter(col("subject_id") === 1)
      .orderBy("timestamp")
      .select("is_A")
      .collect()
      .map(_.getLong(0))
      .toSeq
    assert(out == Seq(2L, 1L, 1L))

    val out2 = EventBoundAgg(df8, EventBounds(true, "-_RECORD_START", true, 0L))
      .filter(col("subject_id") === 2)
      .orderBy("timestamp")
      .select("is_A")
      .collect()
      .map(_.getLong(0))
      .toSeq
    // bound-to-row from record start, inclusive both: cumulative is_A.
    assert(out2 == Seq(1L, 2L, 3L, 3L, 3L))
  }
}
