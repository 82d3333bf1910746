package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.model.{Closed, EventBounds, TemporalBounds}

/** Event-bound aggregation: for every row, sum all predicate columns from
  * that row (± a fixed offset) to the nearest prior/next row of the same
  * subject where a boolean boundary expression holds.
  *
  * Semantics ported from the reference's `boolean_expr_bound_sum`
  * (reference: src/aces/aggregate.py:479-1126; truth table :523-541; public
  * wrapper `aggregate_event_bound_window` :318-476).
  *
  * Spark-first execution (no UDAF, all codegen-friendly built-ins), same
  * cumsum-difference formulation as the reference:
  *   1. per-subject running cumulative sums (one window over `subject_id`);
  *   2. project boundary rows into "phantom" rows carrying their adjusted
  *      cumsum, positioned at (boundary_ts - offset) ± ε;
  *   3. union phantoms with real rows (`unionByName` allowMissingColumns);
  *   4. forward/backward-fill the boundary cumsum & timestamp per subject;
  *   5. per-row result = difference of cumsums ± own-row counts;
  *   6. non-zero offset: correct with a `TemporalWindowAgg` over the offset
  *      span, joined back on (subject_id, timestamp).
  *
  * One deliberate improvement over the reference: instead of shifting
  * phantom timestamps ±1 µs on the µs grid (aggregate.py:1012-1017), which
  * can collide with a real row at the same instant and then depends on an
  * unstable sort, we order the union by a 2×-scaled position key in which
  * phantoms sit strictly *between* grid points (2·(b−offset) ± 1). This is
  * collision-free and deterministically realizes the truth-table semantics.
  *
  * All per-subject steps reuse the same hash partitioning on `subject_id`;
  * the only shuffle beyond it is the (narrow, co-partitioned) offset join.
  */
object EventBoundAgg {

  private val TsUs = "__ts_us"
  private val Pos = "__pos"
  private val IsReal = "__is_real"
  private val BoundaryTs = "__boundary_ts"

  def apply(df: DataFrame, bounds: EventBounds): DataFrame =
    boolExprBoundSum(df, bounds.boundaryExpr, bounds.mode, bounds.closed, bounds.offsetMicros)

  /** @param mode `"bound_to_row"` (bound precedes row) or `"row_to_bound"`. */
  def boolExprBoundSum(
      df: DataFrame,
      boundaryExpr: Column,
      mode: String,
      closed: Closed.Value,
      offsetUs: Long = 0L
  ): DataFrame = {
    require(mode == "bound_to_row" || mode == "row_to_bound", s"Mode '$mode' invalid!")
    val predCols = df.columns.filterNot(c => c == "subject_id" || c == "timestamp").toSeq
    val boundToRow = mode == "bound_to_row"

    // Offset-correction window bounds (reference: aggregate.py:969-995).
    val aggdOverOffset: Option[DataFrame] =
      if (offsetUs == 0L) None
      else {
        val (li, ri) =
          if (offsetUs > 0) {
            val r =
              if (!boundToRow) !(closed == Closed.Left || closed == Closed.Both)
              else closed == Closed.Right || closed == Closed.Both
            (false, r)
          } else {
            val l =
              if (!boundToRow) closed == Closed.Left || closed == Closed.Both
              else !(closed == Closed.Right || closed == Closed.Both)
            (l, false)
          }
        Some(TemporalWindowAgg(df, TemporalBounds(li, offsetUs, ri, 0L)))
      }

    // 1. Per-subject cumulative sums (reference: aggregate.py:997-1000).
    val wCum = Window
      .partitionBy("subject_id")
      .orderBy(TsUs)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withCum = df
      .withColumn(TsUs, unix_micros(col("timestamp")))
      .withColumn("__is_boundary", boundaryExpr)
      .select(
        Seq(col("subject_id"), col("timestamp"), col(TsUs), col("__is_boundary")) ++
          predCols.map(col) ++
          predCols.map(c => sum(col(c)).over(wCum).as(s"__cum_$c")): _*
      )

    // 2. Phantom boundary rows (reference: aggregate.py:1002-1017, 1052-1058).
    val subtractOwnAtBoundary =
      (boundToRow && (closed == Closed.Left || closed == Closed.Both)) ||
        (!boundToRow && !(closed == Closed.Right || closed == Closed.Both))
    val phantomShift: Long =
      if (boundToRow) { if (closed == Closed.Left || closed == Closed.Both) -1L else 1L }
      else { if (closed == Closed.Right || closed == Closed.Both) 1L else -1L }

    val phantoms = withCum
      .filter(col("__is_boundary"))
      .select(
        Seq(
          col("subject_id"),
          col("timestamp").as(BoundaryTs),
          (col(TsUs) * 2 - lit(2 * offsetUs) + lit(phantomShift)).as(Pos),
          lit(false).as(IsReal)
        ) ++ predCols.map { c =>
          val base = col(s"__cum_$c")
          (if (subtractOwnAtBoundary) base - col(c) else base).as(s"__bcum_$c")
        }: _*
      )

    // 3. Union with real rows (reference: diagonal concat, aggregate.py:1060-1062).
    val reals = withCum.select(
      Seq(
        col("subject_id"),
        col("timestamp"),
        col(TsUs),
        (col(TsUs) * 2).as(Pos),
        lit(true).as(IsReal)
      ) ++ predCols.map(col) ++ predCols.map(c => col(s"__cum_$c")): _*
    )
    val unioned = reals.unionByName(phantoms, allowMissingColumns = true)

    // 4. Fill boundary cumsum & timestamp per subject (reference: :1019-1045, :1066).
    val wFill =
      if (boundToRow)
        Window.partitionBy("subject_id").orderBy(Pos)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      else
        Window.partitionBy("subject_id").orderBy(Pos)
          .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    def fill(c: Column): Column =
      if (boundToRow) last(c, ignoreNulls = true).over(wFill)
      else first(c, ignoreNulls = true).over(wFill)

    // 5. Cumsum differences ± own-row counts (reference: :1020-1050).
    val adjustOwn =
      if (boundToRow)
        ((closed == Closed.Left || closed == Closed.None) && offsetUs <= 0) || offsetUs < 0
      else
        ((closed == Closed.Left || closed == Closed.Both) && offsetUs <= 0) || offsetUs < 0

    val sumCols = predCols.map { c =>
      val diff =
        if (boundToRow) col(s"__cum_$c") - fill(col(s"__bcum_$c"))
        else fill(col(s"__bcum_$c")) - col(s"__cum_$c")
      val adj =
        if (!adjustOwn) diff
        else if (boundToRow) diff - col(c)
        else diff + col(c)
      adj.as(s"__sum_$c")
    }

    val filled = unioned
      .select(
        Seq(
          col("subject_id"),
          col("timestamp"),
          col(TsUs),
          fill(col(BoundaryTs)).as(BoundaryTs),
          col(IsReal)
        ) ++ sumCols: _*
      )
      .filter(col(IsReal))

    // 6. Start/end timestamps (reference: :1074-1092).
    val rowPlusOffset = timestamp_micros(col(TsUs) + lit(offsetUs))
    val (startTs, endTs) =
      if (boundToRow)
        (col(BoundaryTs), when(col(BoundaryTs).isNotNull, rowPlusOffset))
      else
        (when(col(BoundaryTs).isNotNull, rowPlusOffset), col(BoundaryTs))

    aggdOverOffset match {
      case None =>
        filled.select(
          Seq(
            col("subject_id"),
            col("timestamp"),
            startTs.as("timestamp_at_start"),
            endTs.as("timestamp_at_end")
          ) ++ predCols.map(c => coalesce(col(s"__sum_$c"), lit(0L)).cast("long").as(c)): _*
        )
      case Some(aggd) =>
        // 7. Offset-span correction join (reference: :1094-1126). Both sides
        // share hash partitioning on subject_id — co-partitioned join.
        val addOffsetPeriod = boundToRow == (offsetUs > 0)
        val offs = aggd.select(
          Seq(col("subject_id"), col("timestamp")) ++
            predCols.map(c => col(c).as(s"__off_$c")): _*
        )
        filled
          .join(offs, Seq("subject_id", "timestamp"), "left")
          .select(
            Seq(
              col("subject_id"),
              col("timestamp"),
              startTs.as("timestamp_at_start"),
              endTs.as("timestamp_at_end")
            ) ++ predCols.map { c =>
              val combined =
                if (addOffsetPeriod) col(s"__sum_$c") + col(s"__off_$c")
                else col(s"__sum_$c") - col(s"__off_$c")
              coalesce(combined, lit(0L)).cast("long").as(c)
            }: _*
          )
    }
  }
}
