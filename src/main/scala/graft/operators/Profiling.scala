package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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

  // ---- shared column-capability gates (one definition: one-shot and
  // incremental profiling must never diverge on which statistics a
  // dtype supports) -------------------------------------------------

  /** The numeric view of a column for mean/quantiles: numerics cast to
    * double, strings profiled by LENGTH, everything else opted out.
    */
  private def numericView(schema: StructType, name: String): Option[Column] =
    schema(name).dataType match {
      case _: NumericType => Some(col(name).cast(DoubleType))
      case StringType     => Some(length(col(name)).cast(DoubleType))
      case _              => None
    }

  private def atomic(dt: DataType): Boolean = dt match {
    case _: NumericType => true
    case StringType | BinaryType | BooleanType | DateType | TimestampType |
        TimestampNTZType | _: DayTimeIntervalType | _: YearMonthIntervalType => true
    case _ => false
  }

  /** min/max need an ordering; maps (and variant) have none in Spark.
    * Gate rather than throw — the stat degrades to null, the scan runs.
    */
  private def orderable(dt: DataType): Boolean = dt match {
    case d if atomic(d)  => true
    case NullType        => true
    case ArrayType(e, _) => orderable(e)
    case StructType(fs)  => fs.forall(f => orderable(f.dataType))
    case _               => false // MapType, UDTs without ordering, variant
  }

  /** approx_count_distinct / xxhash64 need a hashable type; maps are not. */
  private def hashable(dt: DataType): Boolean = dt match {
    case _: MapType      => false
    case ArrayType(e, _) => hashable(e)
    case StructType(fs)  => fs.forall(f => hashable(f.dataType))
    case _               => true
  }


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
    * mean/quantiles — counts and nulls still apply, and min/max /
    * distinct_est degrade to null where Spark cannot order (maps,
    * variant) or hash (maps) the type, so profiling a table with such
    * columns never throws.
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

    val aggExprs: Seq[Column] = count(lit(1)).as("__n") +: targets.flatMap { c =>
      val dt = schema(c).dataType
      val base = Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__nulls__$c"),
        (if (hashable(dt)) approx_count_distinct(col(c), rsd)
         else lit(null).cast(LongType)).as(s"__distinct__$c"),
        (if (orderable(dt)) min(col(c)).cast(StringType)
         else lit(null).cast(StringType)).as(s"__min__$c"),
        (if (orderable(dt)) max(col(c)).cast(StringType)
         else lit(null).cast(StringType)).as(s"__max__$c")
      )
      val num = numericView(schema, c) match {
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

  /** Scalar-only view of a [[corpusProfile]] frame: the `quantiles`
    * array becomes one double column per probability (`q25`, `q50`,
    * `q75` for the defaults; `0.995` → `q99_5`). Same rows, same order —
    * this is the shape for sinks that can only hash scalars (CSV
    * reports, the driver's oracle comparator); the array form stays the
    * API for programmatic consumers. `probs` must match the profile's
    * `quantiles` argument (same order) — a #columns-row projection, free
    * at any scale.
    */
  def flattenQuantiles(
      profile: DataFrame,
      probs: Seq[Double] = Seq(0.25, 0.5, 0.75)
  ): DataFrame = {
    require(probs.nonEmpty, "flattenQuantiles needs the profile's quantile probabilities")
    def label(p: Double): String = {
      // Scale via the DECIMAL value of p's shortest representation —
      // BigDecimal(p * 100) would inherit the double artifact (0.57*100
      // = 56.99999999999999...) and emit a 50-digit column name.
      val pct = (BigDecimal(p.toString) * 100).underlying.stripTrailingZeros.toPlainString
      "q" + pct.replace(".", "_").replace("-", "m")
    }
    val keep = profile.columns.filterNot(_ == "quantiles").map(col)
    // Guard the probs/array contract: getItem past the end returns null,
    // so a mismatched probs list would silently emit all-null (or
    // mislabeled) q-columns — fail loudly instead. Null arrays (non-
    // numeric columns) legitimately flatten to null scalars.
    val checked = when(
      col("quantiles").isNotNull && size(col("quantiles")) =!= lit(probs.length),
      raise_error(concat(
        lit("flattenQuantiles: profile carries "),
        size(col("quantiles")).cast(StringType),
        lit(s" quantiles but ${probs.length} probabilities were given")))
    ).otherwise(col("quantiles"))
    val qs = probs.zipWithIndex.map { case (p, i) =>
      checked.getItem(i).as(label(p))
    }
    profile.select(keep.toSeq ++ qs: _*)
  }

  // ------------------------------------------------------------------
  // Incremental (mergeable) profiling — the shard-at-a-time form.
  // ------------------------------------------------------------------

  private def numericDtype(dtype: Column): Column =
    dtype.rlike("^(tiny|small|big)?int$|^(double|float)$|^decimal")

  /** Mergeable per-shard profile — the incremental face of
    * [[corpusProfile]]: profile every ingest shard INDEPENDENTLY (one
    * aggregate pass each, at ingest time), then fold the per-shard rows
    * with [[mergeShardProfiles]] without ever rescanning old data. Every
    * statistic carried here is a sufficient statistic under union:
    * counts and the numeric (sum, count) pair add; min/max compare;
    * distinct carries an Apache DataSketches HLL sketch over
    * `xxhash64(value)` (register-max merge — associative, commutative,
    * order-independent REGISTERS; the estimate read off a merged sketch
    * uses the composite estimator where an un-merged sketch keeps its
    * slightly-sharper HIP estimate, so fold shapes agree within the
    * sketch's error bound rather than bit-for-bit — ProfilingSpec pins
    * the tolerance; nulls are excluded before hashing to match
    * `approx_count_distinct`). Quantiles are deliberately absent —
    * they have no such finite-row sufficient statistic; pair with
    * [[logQuantileSketch]] (mergeable, bounded relative error) when the
    * ingest gate needs distribution shape.
    *
    * Output: one row per column,
    * `(column, dtype, n_rows, n_nulls, num_sum, num_cnt, min_val,
    * max_val, distinct_sketch)` — persist as parquet next to the shard.
    */
  def shardProfile(
      df: DataFrame,
      cols: Seq[String] = Nil,
      lgK: Int = 12
  ): DataFrame = {
    val targets = if (cols.nonEmpty) cols else df.columns.toSeq
    val missing = targets.filterNot(df.columns.contains)
    require(missing.isEmpty, s"shardProfile: no such column(s): ${missing.mkString(", ")}")
    val schema = df.schema

    val aggExprs: Seq[Column] = count(lit(1)).as("__n") +: targets.flatMap { c =>
      val dt = schema(c).dataType
      Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__nulls__$c"),
        (numericView(schema, c) match {
          case Some(v) => sum(v)
          case None    => lit(null).cast(DoubleType)
        }).as(s"__sum__$c"),
        (numericView(schema, c) match {
          case Some(v) => count(v)
          case None    => lit(null).cast(LongType)
        }).as(s"__cnt__$c"),
        (if (orderable(dt)) min(col(c)).cast(StringType)
         else lit(null).cast(StringType)).as(s"__min__$c"),
        (if (orderable(dt)) max(col(c)).cast(StringType)
         else lit(null).cast(StringType)).as(s"__max__$c"),
        (if (hashable(dt))
           hll_sketch_agg(when(col(c).isNotNull, xxhash64(col(c))), lit(lgK))
         else lit(null).cast(BinaryType)).as(s"__hll__$c")
      )
    }

    val one = df.agg(aggExprs.head, aggExprs.tail: _*)
    val rows = explode(array(targets.map { c =>
      struct(
        lit(c).as("column"),
        lit(schema(c).dataType.simpleString).as("dtype"),
        col("__n").as("n_rows"),
        col(s"__nulls__$c").as("n_nulls"),
        col(s"__sum__$c").as("num_sum"),
        col(s"__cnt__$c").as("num_cnt"),
        col(s"__min__$c").as("min_val"),
        col(s"__max__$c").as("max_val"),
        col(s"__hll__$c").as("distinct_sketch")
      )
    }: _*))
    one.select(rows.as("p")).select("p.*").orderBy("column")
  }

  /** Fold any number of [[shardProfile]] frames (union them first) into
    * one profile of the combined corpus — pure sufficient-statistic
    * algebra, no data rescan: counts/sums add, min/max compare (NUMERIC
    * columns compare by value via `min_by`/`max_by` on the double cast,
    * so "9" < "10"; other types lexicographic, which IS their rendered
    * ordering), HLL sketches union. Associative: fold shard-by-shard,
    * day-by-day, or all at once — identical result.
    */
  def mergeShardProfiles(shards: DataFrame): DataFrame = {
    val isNum = numericDtype(col("dtype"))
    shards
      .groupBy("column")
      .agg(
        // Schema drift across shards (int → bigint, a column retyped to
        // string) would silently mix by-value and lexicographic min/max
        // semantics under one arbitrary winning dtype — fail loudly.
        when(min("dtype") === max("dtype"), min("dtype"))
          .otherwise(raise_error(concat(
            lit("mergeShardProfiles: column '"), col("column"),
            lit("' profiled under mixed dtypes ("), min("dtype"),
            lit(" vs "), max("dtype"), lit(")"))))
          .as("dtype"),
        sum("n_rows").as("n_rows"),
        sum("n_nulls").as("n_nulls"),
        sum("num_sum").as("num_sum"),
        sum("num_cnt").as("num_cnt"),
        // try_cast: non-numeric columns' rendered min/max would throw
        // under ANSI casting; they take the lexicographic branch anyway.
        min_by(col("min_val"), expr("try_cast(min_val AS double)")).as("__min_n"),
        max_by(col("max_val"), expr("try_cast(max_val AS double)")).as("__max_n"),
        min("min_val").as("__min_s"),
        max("max_val").as("__max_s"),
        hll_union_agg(col("distinct_sketch"), lit(true)).as("distinct_sketch"))
      .select(col("column"), col("dtype"), col("n_rows"), col("n_nulls"),
        col("num_sum"), col("num_cnt"),
        when(isNum, col("__min_n")).otherwise(col("__min_s")).as("min_val"),
        when(isNum, col("__max_n")).otherwise(col("__max_s")).as("max_val"),
        col("distinct_sketch"))
      .orderBy("column")
  }

  /** Human/driver-facing scalar view of a (merged) [[shardProfile]]
    * frame — the [[corpusProfile]] shape minus quantiles: null_frac,
    * HLL distinct estimate, 4-dp mean from the (sum, count) pair.
    */
  def profileFromShards(merged: DataFrame): DataFrame =
    merged.select(
      col("column"), col("dtype"), col("n_rows"), col("n_nulls"),
      round(col("n_nulls").cast(DoubleType) / greatest(col("n_rows"), lit(1L)), 6)
        .as("null_frac"),
      when(col("distinct_sketch").isNotNull,
        hll_sketch_estimate(col("distinct_sketch")).cast(LongType))
        .as("distinct_est"),
      col("min_val"), col("max_val"),
      round(col("num_sum") / col("num_cnt"), 4).as("mean"))
      .orderBy("column")

  /** `foreachBatch` sink maintaining a standing profile on disk — the
    * streaming face of incremental profiling: each micro-batch pays one
    * [[shardProfile]] aggregate over its own rows and writes the
    * #columns-row result to `standingDir/batch=<batchId>` (mode
    * overwrite). Keying the write on the batchId makes the sink
    * IDEMPOTENT under foreachBatch's at-least-once contract: a retried
    * batch overwrites its own directory with identical rows instead of
    * re-merging into a standing copy (which would permanently inflate
    * n_rows/n_nulls/num_sum), and a crash mid-write corrupts only that
    * batch's directory, which the retry then rewrites — prior batches
    * are never touched. Wire as
    * `stream.writeStream.foreachBatch(Profiling.profileSink(dir))` —
    * after any batch,
    * `profileFromShards(mergeShardProfiles(spark.read.parquet(dir)))`
    * is the profile of everything ingested so far (the fold costs
    * #batches × #columns rows; compact long-lived streams offline by
    * replacing old batch dirs with one [[mergeShardProfiles]] output —
    * the merge is associative, so the fold result is unchanged).
    */
  def profileSink(
      standingDir: String,
      cols: Seq[String] = Nil,
      lgK: Int = 12
  ): (DataFrame, Long) => Unit = {
    // Checked once per sink instance: a standing dir written by the
    // PRE-batch layout (merged profile files at the root) must not be
    // mixed with batch=<id> subdirs — spark.read.parquet over the blend
    // fails or silently double-counts the legacy rows. Fail loudly with
    // the migration step instead.
    val legacyChecked = new java.util.concurrent.atomic.AtomicBoolean(false)
    (batch, batchId) => {
      if (legacyChecked.compareAndSet(false, true)) {
        val path = new org.apache.hadoop.fs.Path(standingDir)
        val fs = path.getFileSystem(
          batch.sparkSession.sessionState.newHadoopConf())
        if (fs.exists(path)) {
          val rootFiles = fs.listStatus(path).filter(st => st.isFile &&
            !st.getPath.getName.startsWith(".") && !st.getPath.getName.startsWith("_"))
          require(rootFiles.isEmpty,
            s"profileSink: standing dir $standingDir holds root-level data files " +
              s"(e.g. ${rootFiles.head.getPath.getName}) from the pre-batch merged " +
              "layout; mixing them with batch=<id> subdirs corrupts the fold. " +
              "Migrate first: move the legacy profile into its own NUMERIC " +
              "batch dir no resuming stream will reuse (e.g. batch=999999999 — " +
              "compaction validates labels as numeric; it is a valid " +
              "shardProfile frame) or start a fresh dir.")
        }
      }
      // A post-commit crashed compaction leaves the only complete fold
      // in _compact_tmp with some batch dirs deleted — readers of the
      // standing dir would silently lose profile mass. Checked on EVERY
      // batch (not just the instance's first — lineDedupSink/applyShard
      // discipline): the operational mistake this catches is a
      // compaction crashing WHILE a long-lived profile stream runs, and
      // a batch-0-only guard goes blind right after startup.
      {
        val path = new org.apache.hadoop.fs.Path(standingDir)
        val fs = path.getFileSystem(
          batch.sparkSession.sessionState.newHadoopConf())
        StateCompaction.requireNoWedge(fs, path, "profileSink",
          "re-run compactProfileDir to resume it before appending batches")
      }
      shardProfile(batch, cols, lgK)
        .coalesce(1)
        .write.mode("overwrite").parquet(s"$standingDir/batch=$batchId")
    }
  }

  /** Offline compaction for a [[profileSink]] standing dir: replace its
    * accumulated `batch=<id>` subdirectories with ONE merged
    * [[mergeShardProfiles]] output (a #columns-row frame), so the
    * per-read fold cost stops growing with stream lifetime. The merge is
    * associative, so the folded profile over the compacted dir is
    * row-identical to the fold over the original batch dirs — asserted
    * in ProfilingSpec.
    *
    * MUST run offline: only invoke while no stream is writing the dir,
    * and only after a CLEAN stop (all delivered batches committed). A
    * re-delivered uncommitted batch would rewrite `batch=<id>` after
    * compaction already folded those rows into the compacted dir, and
    * its rows would then double-count. The compacted dir is named
    * `batch=c<maxId>` — the `c` prefix keeps it disjoint from every
    * numeric batchId a resumed stream can produce.
    */
  def compactProfileDir(spark: SparkSession, standingDir: String): Unit =
    // Crash-safe via StateCompaction's commit-marker protocol (the fold
    // here is the profile MERGE algebra, not a plain union — shard
    // sketches combine by adding counts). Explicit leaf-dir reads carry
    // no inferred batch partition column; the defensive drop keeps the
    // fold correct either way.
    StateCompaction.compactBatchDir(spark, standingDir,
      rewrite = df => mergeShardProfiles(df.drop("batch")))

  /** Mergeable quantile sketch over log-scaled buckets (the DDSketch
    * scheme — Masson, Rim & Lee, "DDSketch: a fast and fully-mergeable
    * quantile sketch with relative-error guarantees", VLDB 2019): value
    * v maps to `(sign(v), ⌈ln|v| / ln γ⌉)` with `γ = (1+α)/(1−α)` (sign
    * kept apart from the index — sub-1 magnitudes have negative
    * indices), zero to (0, 0) — so each bucket spans a relative-error-α
    * slice of the axis and a (column, sign, bucket, cnt) frame IS the
    * sketch: shard sketches merge by adding counts
    * (associative, exact), unlike `percentile_approx` summaries which
    * cannot merge from their outputs. Numeric columns sketch their
    * value; string columns their LENGTH (the [[corpusProfile]]
    * convention); other types are skipped.
    *
    * One scan: explode to (column, value) pairs, bucket map-side, one
    * thin aggregate — output cardinality is #columns × #occupied
    * buckets (≈ ln(range)/α), corpus-size-free.
    */
  def logQuantileSketch(
      df: DataFrame,
      cols: Seq[String] = Nil,
      alpha: Double = 0.01
  ): DataFrame = {
    require(alpha > 0 && alpha < 1, s"alpha must be in (0,1), got $alpha")
    val schema = df.schema
    val targets0 = if (cols.nonEmpty) cols else df.columns.toSeq
    val missing = targets0.filterNot(df.columns.contains)
    require(missing.isEmpty, s"logQuantileSketch: no such column(s): ${missing.mkString(", ")}")
    val targets = targets0.filter(c => schema(c).dataType match {
      case _: NumericType | StringType => true
      case _                           => false
    })
    require(targets.nonEmpty, "logQuantileSketch: no numeric or string columns to sketch")
    val gamma = (1 + alpha) / (1 - alpha)
    def view(c: String): Column = schema(c).dataType match {
      case StringType => length(col(c)).cast(DoubleType)
      case _          => col(c).cast(DoubleType)
    }
    val pairs = explode(array(targets.map(c =>
      struct(lit(c).as("column"), view(c).as("v"))): _*))
    val v = col("v")
    // Sign rides separately from the log index: values in (0, 1) get
    // NEGATIVE indices (ln < 0), which a single signed bucket int would
    // conflate with negative values.
    val sign =
      when(v === 0.0, lit(0)).otherwise(signum(v).cast(IntegerType))
    val bucket =
      when(v === 0.0, lit(0))
        .otherwise(ceil(log(abs(v)) / math.log(gamma)).cast(IntegerType))
    df.select(pairs.as("p")).select("p.*")
      .filter(v.isNotNull)
      .select(col("column"), sign.as("sign"), bucket.as("bucket"))
      .groupBy("column", "sign", "bucket")
      .agg(count(lit(1)).as("cnt"))
  }

  /** Merge any number of [[logQuantileSketch]] frames (same α): counts
    * add per (column, sign, bucket) — exact, associative.
    */
  def mergeLogSketches(sketches: DataFrame): DataFrame =
    sketches.groupBy("column", "sign", "bucket").agg(sum("cnt").as("cnt"))

  /** Quantile estimates from a (merged) [[logQuantileSketch]]: for each
    * probability q, the value `sign · 2γ^b/(γ+1)` of the first bucket
    * whose cumulative count exceeds q·(n−1) — within relative error α
    * of the exact quantile for positive values (the DDSketch
    * guarantee). Output `(column, q, est)`, 4-dp, ordered. Bucket-
    * cardinality windows — driver-trivial at any corpus scale.
    */
  def quantilesFromLogSketch(
      sketch: DataFrame,
      probs: Seq[Double] = Seq(0.25, 0.5, 0.75),
      alpha: Double = 0.01
  ): DataFrame = {
    require(probs.nonEmpty && probs.forall(p => p >= 0 && p <= 1),
      s"probabilities must be in [0,1], got $probs")
    val gamma = (1 + alpha) / (1 - alpha)
    // Value order over (sign, bucket): negatives before zero before
    // positives; within sign=−1 a LARGER index is a more negative value,
    // so `sign · bucket` ascends with the value on both sides.
    val ord = col("sign") * col("bucket")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("column").orderBy(col("sign"), ord)
    val cum = sketch
      .withColumn("cum", sum("cnt").over(w))
      .withColumn("n", sum("cnt").over(
        org.apache.spark.sql.expressions.Window.partitionBy("column")))
    val est =
      when(col("sign") === 0, lit(0.0))
        .otherwise(col("sign") *
          lit(2.0) * pow(lit(gamma), col("bucket")) / lit(gamma + 1))
    val qs = probs.map { p =>
      val rank = lit(p) * (col("n") - 1)
      cum.filter(col("cum") > rank)
        .withColumn("__rk", row_number().over(w))
        .filter(col("__rk") === 1)
        .select(col("column"), lit(p).as("q"), round(est, 4).as("est"))
    }
    qs.reduce(_ unionByName _).orderBy("column", "q")
  }

  /** Drift between two [[corpusProfile]] outputs (e.g. this ingest batch
    * vs the accepted snapshot) — the comparison a pipeline alerts on
    * before promoting a batch. Joined on column name (full outer: a
    * column present on one side only still surfaces, with nulls on the
    * other), one row per column:
    *
    * {{{
    * column | dtype_old | dtype_new | rows_ratio | null_frac_old
    *   | null_frac_new | distinct_ratio | mean_old | mean_new | mean_ratio
    * }}}
    *
    * Ratios are new/old (null when the old side is 0 or missing); a
    * healthy re-ingest sits near 1.0 on every ratio, so thresholding
    * `abs(ratio - 1)` is the alert rule. Profiles are #columns-row
    * frames, so this is driver-trivial at any corpus scale — all the
    * heavy lifting already happened inside the two profile passes.
    */
  def profileDiff(oldProfile: DataFrame, newProfile: DataFrame): DataFrame = {
    def ratio(n: Column, o: Column): Column =
      when(o.isNull || o === 0.0 || n.isNull, lit(null).cast(DoubleType))
        .otherwise(round(n.cast(DoubleType) / o.cast(DoubleType), 6))
    val o = oldProfile.select(col("column"), col("dtype").as("dtype_old"),
      col("n_rows").as("rows_old"), col("null_frac").as("null_frac_old"),
      col("distinct_est").as("distinct_old"), col("mean").as("mean_old"))
    val n = newProfile.select(col("column"), col("dtype").as("dtype_new"),
      col("n_rows").as("rows_new"), col("null_frac").as("null_frac_new"),
      col("distinct_est").as("distinct_new"), col("mean").as("mean_new"))
    o.join(n, Seq("column"), "full_outer")
      .select(
        col("column"), col("dtype_old"), col("dtype_new"),
        ratio(col("rows_new"), col("rows_old")).as("rows_ratio"),
        col("null_frac_old"), col("null_frac_new"),
        ratio(col("distinct_new"), col("distinct_old")).as("distinct_ratio"),
        col("mean_old"), col("mean_new"),
        ratio(col("mean_new"), col("mean_old")).as("mean_ratio"))
      .orderBy("column")
  }
}
