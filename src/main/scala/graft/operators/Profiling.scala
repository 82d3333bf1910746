package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Single-pass sketch-based column profiling — the corpus-QA scan a
  * training-data pipeline runs on every ingest batch before any curation
  * decision (null-rate regressions, cardinality blow-ups, length-
  * distribution drift). [[graft.harness.QueryCatalog]] `corpus_stats` is
  * the exact grouped variant; this operator is the whole-table sketch
  * pass that stays one job at any scale.
  *
  * Scale shape: ONE hash-free global aggregate over the table — every
  * statistic (row/null counts, min/max, mean, HLL++ distinct estimate,
  * quantile summaries) has a map-side partial state, so the only thing
  * that moves is one bounded sketch blob per partition (HLL registers +
  * Greenwald–Khanna/relative-error summaries, KBs per column), merged
  * into a single final row. No row-level shuffle, no second pass; the
  * long-format explode afterwards touches #columns rows. At 100 TB the
  * cost is the parquet scan itself (and column pruning keeps that to the
  * profiled columns).
  *
  * Approximate statistics are Spark's codegen'd sketch aggregates:
  * `approx_count_distinct` (HyperLogLog++, relative sd `rsd`) and
  * `percentile_approx` (bounded-error quantile summaries, `accuracy`).
  * Both are deterministic functions of the data (no RNG), but their
  * estimates are sketch-specific, so results are validated against exact
  * brute force in ProfilingSpec rather than a cross-engine SQL oracle.
  */
object Profiling {

  /** Profile `cols` (default: every column) of `df` in one aggregate
    * pass. Output is long-format, one row per profiled column, ordered
    * by column name:
    *
    * {{{
    * column | dtype | n_rows | n_nulls | null_frac | distinct_est
    *   | min_val | max_val | mean | quantiles
    * }}}
    *
    * `min_val`/`max_val` are the column's min/max rendered as strings
    * (lexicographic for strings, numeric order for numerics — Spark's
    * native `min`/`max` ordering, exact). `mean` and `quantiles` (one
    * entry per requested probability, same order) are populated for
    * numeric columns only; string columns instead report the mean and
    * quantiles of their LENGTH (the distribution that matters for a
    * text corpus). Other types (arrays, structs, binary) get null
    * mean/quantiles — counts, nulls, and distinct still apply.
    */
  def corpusProfile(
      df: DataFrame,
      cols: Seq[String] = Nil,
      quantiles: Seq[Double] = Seq(0.25, 0.5, 0.75),
      rsd: Double = 0.05,
      accuracy: Int = 10000
  ): DataFrame = {
    require(quantiles.nonEmpty && quantiles.forall(q => q >= 0.0 && q <= 1.0),
      s"quantile probabilities must be in [0,1], got $quantiles")
    val targets = if (cols.nonEmpty) cols else df.columns.toSeq
    val missing = targets.filterNot(df.columns.contains)
    require(missing.isEmpty, s"corpusProfile: no such column(s): ${missing.mkString(", ")}")

    val schema = df.schema
    val qArr = array(quantiles.map(lit): _*)

    // The numeric view of a column for mean/quantiles: numerics cast to
    // double, strings profiled by length, everything else opted out.
    def numericView(name: String): Option[Column] = schema(name).dataType match {
      case _: NumericType => Some(col(name).cast(DoubleType))
      case StringType     => Some(length(col(name)).cast(DoubleType))
      case _              => None
    }

    val aggExprs: Seq[Column] = count(lit(1)).as("__n") +: targets.flatMap { c =>
      val base = Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__nulls__$c"),
        approx_count_distinct(col(c), rsd).as(s"__distinct__$c"),
        min(col(c)).cast(StringType).as(s"__min__$c"),
        max(col(c)).cast(StringType).as(s"__max__$c")
      )
      val num = numericView(c) match {
        case Some(v) =>
          Seq(
            avg(v).as(s"__mean__$c"),
            percentile_approx(v, qArr, lit(accuracy)).as(s"__q__$c"))
        case None =>
          Seq(
            lit(null).cast(DoubleType).as(s"__mean__$c"),
            lit(null).cast(ArrayType(DoubleType)).as(s"__q__$c"))
      }
      base ++ num
    }

    val one = df.agg(aggExprs.head, aggExprs.tail: _*)

    // One row in, #columns out: explode an array of per-column structs.
    val rows = explode(array(targets.map { c =>
      struct(
        lit(c).as("column"),
        lit(schema(c).dataType.simpleString).as("dtype"),
        col("__n").as("n_rows"),
        col(s"__nulls__$c").as("n_nulls"),
        round(col(s"__nulls__$c").cast(DoubleType) / greatest(col("__n"), lit(1L)), 6)
          .as("null_frac"),
        col(s"__distinct__$c").as("distinct_est"),
        col(s"__min__$c").as("min_val"),
        col(s"__max__$c").as("max_val"),
        col(s"__mean__$c").as("mean"),
        col(s"__q__$c").as("quantiles")
      )
    }: _*))

    one.select(rows.as("p")).select("p.*").orderBy("column")
  }
}
