package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.AsOfJoin

/** As-of join: closed-form fixtures, brute-force parity on random data,
  * and the plan-shape contract (one exchange, no join operator).
  */
class AsOfJoinSpec extends SparkSpec {

  private def tsDf(name: String, rows: Seq[(Long, String)], extra: Seq[(String, Long)] = Nil): DataFrame = {
    import spark.implicits._
    rows.zipWithIndex.map { case ((k, ts), i) =>
      (k, ts, extra.lift(i).map(_._2).getOrElse(i.toLong))
    }.toDF("k", "ts_str", "v")
      .select(col("k"), to_timestamp(col("ts_str")).as(name), col("v").as(s"v_$name"))
  }

  private val left = Seq(
    (1L, "2020-01-01 10:00:00"),
    (1L, "2020-01-01 12:00:00"),
    (2L, "2020-01-01 10:00:00"))
  private val right = Seq(
    (1L, "2020-01-01 09:00:00"),
    (1L, "2020-01-01 11:00:00"),
    (1L, "2020-01-01 12:00:00"))

  private def l = tsDf("lt", left)
  private def r = tsDf("rt", right).withColumnRenamed("v_rt", "rv")

  test("backward inclusive matches DuckDB ASOF semantics") {
    val out = AsOfJoin.backward(l, r, Seq("k"), "lt", "rt")
    assert(snap(out.select("k", "lt", "rt", "rv")) == Seq(
      "1|2020-01-01 10:00:00|2020-01-01 09:00:00|0",
      "1|2020-01-01 12:00:00|2020-01-01 12:00:00|2",
      "2|2020-01-01 10:00:00|null|null"))
  }

  test("backward strict excludes the equal-timestamp row") {
    val out = AsOfJoin.backward(l, r, Seq("k"), "lt", "rt", strict = true)
    assert(snap(out.select("k", "lt", "rt", "rv")) == Seq(
      "1|2020-01-01 10:00:00|2020-01-01 09:00:00|0",
      "1|2020-01-01 12:00:00|2020-01-01 11:00:00|1",
      "2|2020-01-01 10:00:00|null|null"))
  }

  test("forward inclusive takes the earliest at-or-after row") {
    val out = AsOfJoin.forward(l, r, Seq("k"), "lt", "rt")
    assert(snap(out.select("k", "lt", "rt", "rv")) == Seq(
      "1|2020-01-01 10:00:00|2020-01-01 11:00:00|1",
      "1|2020-01-01 12:00:00|2020-01-01 12:00:00|2",
      "2|2020-01-01 10:00:00|null|null"))
  }

  test("forward strict skips the equal-timestamp row") {
    val out = AsOfJoin.forward(l, r, Seq("k"), "lt", "rt", strict = true)
    val row12 = snap(out.filter(col("lt") === to_timestamp(lit("2020-01-01 12:00:00")))
      .select("rt", "rv"))
    assert(row12 == Seq("null|null"))
  }

  test("tolerance nulls a match that is too old, keeps the left row") {
    // 10:00 left matches 09:00 right = 3600s away; tolerance 30min nulls it.
    val out = AsOfJoin.backward(l, r, Seq("k"), "lt", "rt",
      toleranceMicros = 30L * 60 * 1000000)
    assert(snap(out.select("k", "lt", "rt", "rv")) == Seq(
      "1|2020-01-01 10:00:00|null|null",
      "1|2020-01-01 12:00:00|2020-01-01 12:00:00|2",
      "2|2020-01-01 10:00:00|null|null"))
  }

  test("nearest picks the closer side, ties to backward") {
    // left 10:00 — backward 09:00 (60min), forward 11:00 (60min) -> tie -> backward.
    val out = AsOfJoin.nearest(l, r, Seq("k"), "lt", "rt")
    assert(snap(out.select("k", "lt", "rt", "rv")) == Seq(
      "1|2020-01-01 10:00:00|2020-01-01 09:00:00|0",
      "1|2020-01-01 12:00:00|2020-01-01 12:00:00|2",
      "2|2020-01-01 10:00:00|null|null"))
  }

  test("brute-force parity on random data, all directions") {
    val rnd = new scala.util.Random(41)
    def randRows(n: Int, keys: Int): Seq[(Long, String)] =
      // second-granularity timestamps with deliberate collisions
      (0 until n).map { _ =>
        val k = rnd.nextInt(keys).toLong
        val s = 10 * rnd.nextInt(500)
        (k, f"2020-01-01 ${s / 3600}%02d:${s % 3600 / 60}%02d:${s % 60}%02d")
      }
    val lRows = randRows(200, 5)
    val rRows = randRows(120, 5).distinct // unique (k, ts) right side
    val lDf = tsDf("lt", lRows)
    val rDf = tsDf("rt", rRows).withColumnRenamed("v_rt", "rv")
    AsOfJoin.requireUniqueRight(rDf, Seq("k"), "rt")

    val rightByKey: Map[Long, Seq[(String, Int)]] =
      rRows.zipWithIndex.map { case ((k, ts), i) => (k, ts, i) }
        .groupBy(_._1).map { case (k, g) => k -> g.map(t => (t._2, t._3)).sortBy(_._1) }

    def expected(forward: Boolean, strict: Boolean): Seq[String] =
      lRows.zipWithIndex.map { case ((k, lts), li) =>
        val cands = rightByKey.getOrElse(k, Nil).filter { case (rts, _) =>
          if (forward) { if (strict) rts > lts else rts >= lts }
          else { if (strict) rts < lts else rts <= lts }
        }
        val m = if (cands.isEmpty) None
        else Some(if (forward) cands.minBy(_._1) else cands.maxBy(_._1))
        s"$k|$lts|${m.map(_._1).getOrElse("null")}|${m.map(_._2.toString).getOrElse("null")}"
      }.sorted

    for (forward <- Seq(false, true); strict <- Seq(false, true)) {
      val out =
        if (forward) AsOfJoin.forward(lDf, rDf, Seq("k"), "lt", "rt", strict = strict)
        else AsOfJoin.backward(lDf, rDf, Seq("k"), "lt", "rt", strict = strict)
      assert(snap(out.select("k", "lt", "rt", "rv")) == expected(forward, strict),
        s"forward=$forward strict=$strict")
    }

    // nearest: closest in either direction, ties backward
    val nearExpected = lRows.map { case (k, lts) =>
      def us(ts: String): Long = java.sql.Timestamp.valueOf(ts).getTime
      val cands = rightByKey.getOrElse(k, Nil)
      val m =
        if (cands.isEmpty) None
        else Some(cands.minBy { case (rts, _) =>
          (math.abs(us(rts) - us(lts)), us(rts) >= us(lts), rts)
        })
      s"$k|$lts|${m.map(_._1).getOrElse("null")}|${m.map(_._2.toString).getOrElse("null")}"
    }.sorted
    val nearOut = AsOfJoin.nearest(lDf, rDf, Seq("k"), "lt", "rt")
    assert(snap(nearOut.select("k", "lt", "rt", "rv")) == nearExpected)
  }

  test("plan is one key exchange and no join operator") {
    val out = AsOfJoin.backward(l, r, Seq("k"), "lt", "rt")
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.toLowerCase.contains("join"), s"as-of must not plan a join:\n${plan.take(1200)}")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges == 1, s"expected exactly 1 exchange, got $exchanges:\n${plan.take(1200)}")
    // nearest shares the same single sort+exchange
    val nPlan = AsOfJoin.nearest(l, r, Seq("k"), "lt", "rt").queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(nPlan).size == 1)
    assert("Sort ".r.findAllIn(nPlan).size <= 2, s"nearest must reuse the window sort:\n${nPlan.take(1200)}")
  }

  test("collision and missing-column guards fail fast") {
    intercept[IllegalArgumentException] {
      AsOfJoin.backward(l, tsDf("rt", right), Seq("k"), "lt", "rt") // v_rt vs v_lt ok; force collision:
      AsOfJoin.backward(l.withColumnRenamed("v_lt", "rv"),
        tsDf("rt", right).withColumnRenamed("v_rt", "rv"), Seq("k"), "lt", "rt")
    }
    intercept[IllegalArgumentException] {
      AsOfJoin.backward(l, r.withColumnRenamed("rt", "other"), Seq("k"), "lt", "rt")
    }
    intercept[IllegalArgumentException] {
      AsOfJoin.requireUniqueRight(r.unionByName(r), Seq("k"), "rt")
    }
  }
}
