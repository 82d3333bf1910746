package graft

import graft.model.TemporalBounds
import graft.operators.TemporalWindowAgg
import graft.time.Timedelta

/** Golden tests ported from the reference doctests of
  * `aggregate_temporal_window` (reference: src/aces/aggregate.py:142-283)
  * and `_aggregate_singleton_temporal` (:24-60).
  */
class TemporalWindowAggSpec extends SparkSpec {

  private val D = 86400000000L // one day in micros
  private val H = 3600000000L

  private def df6 = predicatesDf(
    Seq("is_A", "is_B", "is_C"),
    Seq(
      (1L, "1989-12-01 12:03", Seq(1L, 0L, 1L)),
      (1L, "1989-12-02 05:17", Seq(0L, 1L, 1L)),
      (1L, "1989-12-02 12:03", Seq(1L, 0L, 0L)),
      (1L, "1989-12-06 11:00", Seq(0L, 1L, 0L)),
      (2L, "1989-12-01 13:14", Seq(0L, 1L, 1L)),
      (2L, "1989-12-03 15:17", Seq(0L, 0L, 0L))
    )
  )

  test("7-day window, closed both (aggregate.py:160-174)") {
    val out = TemporalWindowAgg(df6, TemporalBounds(true, 7 * D, true, 0L))
    assert(
      snap(out) == Seq(
        "1|1989-12-01 12:03:00|1989-12-01 12:03:00|1989-12-08 12:03:00|2|2|2",
        "1|1989-12-02 05:17:00|1989-12-02 05:17:00|1989-12-09 05:17:00|1|2|1",
        "1|1989-12-02 12:03:00|1989-12-02 12:03:00|1989-12-09 12:03:00|1|1|0",
        "1|1989-12-06 11:00:00|1989-12-06 11:00:00|1989-12-13 11:00:00|0|1|0",
        "2|1989-12-01 13:14:00|1989-12-01 13:14:00|1989-12-08 13:14:00|0|1|1",
        "2|1989-12-03 15:17:00|1989-12-03 15:17:00|1989-12-10 15:17:00|0|0|0"
      ).sorted
    )
  }

  test("1-day window, closed both (aggregate.py:175-189)") {
    val out = TemporalWindowAgg(df6, TemporalBounds(true, D, true, 0L))
    assert(
      snap(out) == Seq(
        "1|1989-12-01 12:03:00|1989-12-01 12:03:00|1989-12-02 12:03:00|2|1|2",
        "1|1989-12-02 05:17:00|1989-12-02 05:17:00|1989-12-03 05:17:00|1|1|1",
        "1|1989-12-02 12:03:00|1989-12-02 12:03:00|1989-12-03 12:03:00|1|0|0",
        "1|1989-12-06 11:00:00|1989-12-06 11:00:00|1989-12-07 11:00:00|0|1|0",
        "2|1989-12-01 13:14:00|1989-12-01 13:14:00|1989-12-02 13:14:00|0|1|1",
        "2|1989-12-03 15:17:00|1989-12-03 15:17:00|1989-12-04 15:17:00|0|0|0"
      ).sorted
    )
  }

  test("1-day window, left-closed (aggregate.py:190-204)") {
    val out = TemporalWindowAgg(df6, TemporalBounds(true, D, false, 0L))
    assert(
      snap(out) == Seq(
        "1|1989-12-01 12:03:00|1989-12-01 12:03:00|1989-12-02 12:03:00|1|1|2",
        "1|1989-12-02 05:17:00|1989-12-02 05:17:00|1989-12-03 05:17:00|1|1|1",
        "1|1989-12-02 12:03:00|1989-12-02 12:03:00|1989-12-03 12:03:00|1|0|0",
        "1|1989-12-06 11:00:00|1989-12-06 11:00:00|1989-12-07 11:00:00|0|1|0",
        "2|1989-12-01 13:14:00|1989-12-01 13:14:00|1989-12-02 13:14:00|0|1|1",
        "2|1989-12-03 15:17:00|1989-12-03 15:17:00|1989-12-04 15:17:00|0|0|0"
      ).sorted
    )
  }

  test("1-day window, open (aggregate.py:205-219)") {
    val out = TemporalWindowAgg(df6, TemporalBounds(false, D, false, 0L))
    assert(
      snap(out) == Seq(
        "1|1989-12-01 12:03:00|1989-12-01 12:03:00|1989-12-02 12:03:00|0|1|1",
        "1|1989-12-02 05:17:00|1989-12-02 05:17:00|1989-12-03 05:17:00|1|0|0",
        "1|1989-12-02 12:03:00|1989-12-02 12:03:00|1989-12-03 12:03:00|0|0|0",
        "1|1989-12-06 11:00:00|1989-12-06 11:00:00|1989-12-07 11:00:00|0|0|0",
        "2|1989-12-01 13:14:00|1989-12-01 13:14:00|1989-12-02 13:14:00|0|0|0",
        "2|1989-12-03 15:17:00|1989-12-03 15:17:00|1989-12-04 15:17:00|0|0|0"
      ).sorted
    )
  }

  test("negative 1-day window, open (aggregate.py:220-234)") {
    val out = TemporalWindowAgg(df6, TemporalBounds(false, -D, false, 0L))
    assert(
      snap(out) == Seq(
        "1|1989-12-01 12:03:00|1989-12-01 12:03:00|1989-11-30 12:03:00|0|0|0",
        "1|1989-12-02 05:17:00|1989-12-02 05:17:00|1989-12-01 05:17:00|1|0|1",
        "1|1989-12-02 12:03:00|1989-12-02 12:03:00|1989-12-01 12:03:00|0|1|1",
        "1|1989-12-06 11:00:00|1989-12-06 11:00:00|1989-12-05 11:00:00|0|0|0",
        "2|1989-12-01 13:14:00|1989-12-01 13:14:00|1989-11-30 13:14:00|0|0|0",
        "2|1989-12-03 15:17:00|1989-12-03 15:17:00|1989-12-02 15:17:00|0|0|0"
      ).sorted
    )
  }

  test("12h window with 12h offset, open (aggregate.py:235-249)") {
    val out = TemporalWindowAgg(df6, TemporalBounds(false, 12 * H, false, 12 * H))
    assert(
      snap(out) == Seq(
        "1|1989-12-01 12:03:00|1989-12-02 00:03:00|1989-12-02 12:03:00|0|1|1",
        "1|1989-12-02 05:17:00|1989-12-02 17:17:00|1989-12-03 05:17:00|0|0|0",
        "1|1989-12-02 12:03:00|1989-12-03 00:03:00|1989-12-03 12:03:00|0|0|0",
        "1|1989-12-06 11:00:00|1989-12-06 23:00:00|1989-12-07 11:00:00|0|0|0",
        "2|1989-12-01 13:14:00|1989-12-02 01:14:00|1989-12-02 13:14:00|0|0|0",
        "2|1989-12-03 15:17:00|1989-12-04 03:17:00|1989-12-04 15:17:00|0|0|0"
      ).sorted
    )
  }

  test("negative window +1d offset, right-closed (aggregate.py:254-268)") {
    val out = TemporalWindowAgg(df6, TemporalBounds(false, -D, true, D))
    assert(
      snap(out) == Seq(
        "1|1989-12-01 12:03:00|1989-12-02 12:03:00|1989-12-01 12:03:00|1|1|1",
        "1|1989-12-02 05:17:00|1989-12-03 05:17:00|1989-12-02 05:17:00|1|0|0",
        "1|1989-12-02 12:03:00|1989-12-03 12:03:00|1989-12-02 12:03:00|0|0|0",
        "1|1989-12-06 11:00:00|1989-12-07 11:00:00|1989-12-06 11:00:00|0|0|0",
        "2|1989-12-01 13:14:00|1989-12-02 13:14:00|1989-12-01 13:14:00|0|0|0",
        "2|1989-12-03 15:17:00|1989-12-04 15:17:00|1989-12-03 15:17:00|0|0|0"
      ).sorted
    )
  }

  test("negative window +1d offset, left-closed (aggregate.py:269-283)") {
    val out = TemporalWindowAgg(df6, TemporalBounds(true, -D, false, D))
    assert(
      snap(out) == Seq(
        "1|1989-12-01 12:03:00|1989-12-02 12:03:00|1989-12-01 12:03:00|1|1|2",
        "1|1989-12-02 05:17:00|1989-12-03 05:17:00|1989-12-02 05:17:00|1|1|1",
        "1|1989-12-02 12:03:00|1989-12-03 12:03:00|1989-12-02 12:03:00|1|0|0",
        "1|1989-12-06 11:00:00|1989-12-07 11:00:00|1989-12-06 11:00:00|0|1|0",
        "2|1989-12-01 13:14:00|1989-12-02 13:14:00|1989-12-01 13:14:00|0|1|1",
        "2|1989-12-03 15:17:00|1989-12-04 15:17:00|1989-12-03 15:17:00|0|0|0"
      ).sorted
    )
  }

  test("singleton frame honours inclusivity (aggregate.py:35-52)") {
    val one = predicatesDf(
      Seq("is_A", "is_B", "is_C"),
      Seq((1L, "1989-12-01 12:03", Seq(1L, 0L, 1L))))
    val incl = TemporalWindowAgg(one, TemporalBounds(true, 7 * D, true, 0L))
    assert(snap(incl) ==
      Seq("1|1989-12-01 12:03:00|1989-12-01 12:03:00|1989-12-08 12:03:00|1|0|1"))
    val excl = TemporalWindowAgg(one, TemporalBounds(false, 7 * D, true, 0L))
    assert(snap(excl) ==
      Seq("1|1989-12-01 12:03:00|1989-12-01 12:03:00|1989-12-08 12:03:00|0|0|0"))
  }

  test("timedelta parsing (utils.py:26-41)") {
    assert(Timedelta.parseMicros("1 days") == D)
    assert(Timedelta.parseMicros("1 day") == D)
    assert(Timedelta.parseMicros("1 days 2 hours 3 minutes 4 seconds") == D + 2 * H + 3 * 60000000L + 4000000L)
    assert(Timedelta.parseMicros("1 day, 14:20:16") == D + 14 * H + 20 * 60000000L + 16000000L)
    assert(Timedelta.parseMicros("365 days") == 365 * D)
    assert(Timedelta.parseMicros("") == 0L)
    assert(Timedelta.parseMicros(null) == 0L)
    assert(Timedelta.parseMicros("24h") == D)
    assert(Timedelta.parseMicros("-24h") == -D)
    assert(Timedelta.parseMicros("2h32m") == 2 * H + 32 * 60000000L)
    assert(Timedelta.parseMicros("1.5 hours") == H + 30 * 60000000L)
    assert(Timedelta.parseMicros("4:13") == 4 * H + 13 * 60000000L)
    intercept[IllegalArgumentException](Timedelta.parseMicros("invalid time string."))
  }
}
