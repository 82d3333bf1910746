package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series as-of join: for every left row, attach the single right
  * row with the closest timestamp in the requested direction — the
  * feature-lookup join every event-stream pipeline needs (latest sensor
  * reading before a label timestamp, next error after a purchase, most
  * recent model score as of a training example). The reference expresses
  * this shape implicitly through its windowed predicate joins
  * (`aggregate.py:273-359` joins anchor rows to the latest prior
  * predicate state); this operator is the generic standalone form.
  *
  * Formulation — union + ordered window, NOT a range join: left and
  * right rows are tagged and unioned on the key, and one growing-frame
  * window per key (`last(right_payload, ignoreNulls) over (order by ts,
  * tie)`) carries the most recent right payload onto every left row.
  * That is ONE hash exchange on the key plus ONE sort — no O(|L|·|R|)
  * pair blow-up, no per-row probe, no join at all. The naive
  * `l JOIN r ON key AND r.ts <= l.ts` + argmax plan explodes to every
  * (left, earlier-right) pair per key — quadratic in events-per-key —
  * which is exactly what a 100 TB event log cannot afford; the union
  * plan's cost is the same hash+sort every per-subject window in this
  * engine already pays, and when the input is already clustered by key
  * (the canonical cached frame) the exchange vanishes.
  *
  * Skew note: a pathologically hot key serializes through one partition,
  * like any per-key ordered window. There is no order-preserving salt
  * for as-of (every row needs the full earlier history of its key), so
  * the mitigation at scale is upstream: pre-aggregate the right side to
  * one row per (key, ts) — which [[AsOfJoin]] requires anyway for a
  * deterministic match — and keep per-key event counts bounded by
  * sessionizing or time-bucketing the key space.
  *
  * Right-side contract: at most ONE right row per (key, rightTs) —
  * duplicate right timestamps make "the" as-of match ambiguous (the
  * union plan would pick the union's arrival order; DuckDB's ASOF picks
  * an unspecified one). Pre-aggregate the right side to make the match
  * well-defined; [[requireUniqueRight]] is the guard used by the tests.
  *
  * Direction semantics (µs precision, matching DuckDB `ASOF JOIN`):
  *   - backward, inclusive (default): greatest rightTs <= leftTs
  *     (`ON l.ts >= r.ts`);
  *   - backward, strict: greatest rightTs < leftTs (`ON l.ts > r.ts`);
  *   - forward, inclusive: least rightTs >= leftTs (`ON l.ts <= r.ts`);
  *   - forward, strict: least rightTs > leftTs.
  *
  * `toleranceMicros >= 0` additionally requires the matched row within
  * `|leftTs - rightTs| <= tolerance`; because the as-of match is the
  * CLOSEST eligible row, a match outside tolerance means no eligible row
  * is inside it, so the filter is exact (the match columns null out, the
  * left row survives — left-join semantics throughout).
  */
object AsOfJoin {

  /** Most recent right row at or before each left row's timestamp. */
  def backward(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTsCol: String,
      rightTsCol: String,
      toleranceMicros: Long = -1L,
      strict: Boolean = false
  ): DataFrame =
    asof(left, right, keys, leftTsCol, rightTsCol, forward = false, strict, toleranceMicros)

  /** Earliest right row at or after each left row's timestamp. */
  def forward(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTsCol: String,
      rightTsCol: String,
      toleranceMicros: Long = -1L,
      strict: Boolean = false
  ): DataFrame =
    asof(left, right, keys, leftTsCol, rightTsCol, forward = true, strict, toleranceMicros)

  /** Closest right row in EITHER direction (ties break to the earlier /
    * backward row, the pandas `merge_asof(direction="nearest")`
    * convention). Both directional lookups ride the SAME union, key
    * exchange, and sort — the backward `last` and forward `first` are
    * two frames of one window ordering, so nearest costs the same single
    * shuffle as either direction alone.
    */
  def nearest(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTsCol: String,
      rightTsCol: String,
      toleranceMicros: Long = -1L
  ): DataFrame = {
    val (unioned, rightPayloadCols, outCols) =
      unionPlan(left, right, keys, leftTsCol, rightTsCol)
    // Inclusive both ways: tie rank puts equal-timestamp rights BEFORE
    // lefts, so the backward frame sees them at distance 0 (and wins the
    // <= comparison below); the forward frame starting at the current
    // row skips them, which is harmless because distance 0 already won.
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts"), tieRank(forward = false, strict = false))
    val back = last(col("__rp"), ignoreNulls = true)
      .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    val fwd = first(col("__rp"), ignoreNulls = true)
      .over(w.rowsBetween(Window.currentRow, Window.unboundedFollowing))
    val dist = (m: Column) =>
      abs(unix_micros(col(leftTsCol)) - unix_micros(m.getField(rightTsCol)))
    val pick = {
      val b = col("__mb")
      val f = col("__mf")
      when(b.isNull, f)
        .when(f.isNull, b)
        .when(dist(b) <= dist(f), b) // tie -> backward (earlier) row
        .otherwise(f)
    }
    val matched = unioned
      .withColumn("__mb", back)
      .withColumn("__mf", fwd)
      .filter(col("__side") === 1)
      .withColumn("__m", withinTolerance(pick, leftTsCol, rightTsCol, toleranceMicros))
    unpack(matched, rightPayloadCols, outCols)
  }

  /** Fails fast when the right frame has duplicate (key, ts) rows — the
    * shape that makes an as-of match ambiguous (see class doc).
    */
  def requireUniqueRight(right: DataFrame, keys: Seq[String], rightTsCol: String): Unit = {
    val dups = right.groupBy((keys :+ rightTsCol).map(col): _*)
      .count().filter(col("count") > 1).limit(1).count()
    require(dups == 0L,
      s"as-of right side has duplicate (${keys.mkString(",")}, $rightTsCol) rows; " +
        "pre-aggregate to one row per key+timestamp for a well-defined match")
  }

  // --------------------------------------------------------------------------

  /** Build the tagged union: keys ++ (__ts, __tie, __side, __rp) ++ left
    * payload columns. `__side` is 1 on left rows, 0 on right rows;
    * `__tie` orders equal-timestamp rows (see [[tieRank]]). Returns
    * (union, right payload column names, output column order).
    */
  private def unionPlan(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTsCol: String,
      rightTsCol: String
  ): (DataFrame, Seq[String], Seq[String]) = {
    require(keys.nonEmpty, "as-of join needs at least one equality key")
    val leftCols = left.columns.toSeq
    val rightPayloadCols = right.columns.toSeq.filterNot(keys.contains)
    require(rightPayloadCols.contains(rightTsCol),
      s"right frame lacks timestamp column '$rightTsCol'")
    val collisions = rightPayloadCols.filter(leftCols.contains)
    require(collisions.isEmpty,
      s"right payload columns collide with left columns: ${collisions.mkString(", ")}; " +
        "rename (e.g. withColumnRenamed) before joining")

    val rp = struct(rightPayloadCols.map(col): _*)
    val rpType = right.select(rp.as("__rp")).schema("__rp").dataType

    val lU = left.select(
      keys.map(col) ++ Seq(
        col(leftTsCol).as("__ts"),
        lit(1).as("__side"),
        lit(null).cast(rpType).as("__rp")) ++
        leftCols.filterNot(keys.contains).map(col): _*)
    val rU = right.select(
      keys.map(col) ++ Seq(
        col(rightTsCol).as("__ts"),
        lit(0).as("__side"),
        rp.as("__rp")) ++
        leftCols.filterNot(keys.contains).map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)
    (lU.unionByName(rU), rightPayloadCols, leftCols ++ rightPayloadCols)
  }

  /** Tie rank at equal `__ts` for the ASCENDING sort: a right row the
    * current direction treats as eligible at distance 0 must sort on the
    * frame's visible side of the left row.
    *   - backward inclusive: right before left (backward frame ends at
    *     current row) → right 0, left 1;
    *   - backward strict: left before right → left 0, right 1;
    *   - forward inclusive: right AFTER left in ascending order (the
    *     forward frame starts at the current row) → left 0, right 1;
    *   - forward strict: right before left → right 0, left 1 — the
    *     forward frame then skips it.
    */
  private def tieRank(forward: Boolean, strict: Boolean): Column = {
    val rightFirst = forward == strict // see table above
    if (rightFirst) col("__side") else -col("__side")
  }

  /** Nearest-direction tolerance: keep the match only within
    * `|leftTs - rightTs| <= tolerance` (null otherwise).
    */
  private def withinTolerance(
      m: Column,
      leftTsCol: String,
      rightTsCol: String,
      toleranceMicros: Long
  ): Column =
    if (toleranceMicros < 0L) m
    else {
      val d = abs(unix_micros(col(leftTsCol)) - unix_micros(m.getField(rightTsCol)))
      when(m.isNotNull && d <= toleranceMicros, m)
    }

  private def unpack(
      matched: DataFrame,
      rightPayloadCols: Seq[String],
      outCols: Seq[String]
  ): DataFrame = {
    val withFields = rightPayloadCols.foldLeft(matched)(
      (df, c) => df.withColumn(c, col("__m").getField(c)))
    withFields.select(outCols.map(col): _*)
  }

  private def asof(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTsCol: String,
      rightTsCol: String,
      forward: Boolean,
      strict: Boolean,
      toleranceMicros: Long
  ): DataFrame = {
    val (unioned, rightPayloadCols, outCols) =
      unionPlan(left, right, keys, leftTsCol, rightTsCol)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts"), tieRank(forward, strict))
    val matchExpr =
      if (forward)
        first(col("__rp"), ignoreNulls = true)
          .over(w.rowsBetween(Window.currentRow, Window.unboundedFollowing))
      else
        last(col("__rp"), ignoreNulls = true)
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    val tolM =
      if (toleranceMicros < 0L) col("__m0")
      else {
        val d = unix_micros(col(leftTsCol)) - unix_micros(col("__m0").getField(rightTsCol))
        val signed = if (forward) -d else d
        when(col("__m0").isNotNull && signed <= toleranceMicros, col("__m0"))
      }
    val matched = unioned
      .withColumn("__m0", matchExpr)
      .filter(col("__side") === 1)
      .withColumn("__m", tolM)
    unpack(matched, rightPayloadCols, outCols)
  }
}
