package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Content-integrity manifests for standing parquet layouts — the check
  * `_SUCCESS` markers and [[StateCompaction.fsck]] cannot make: markers
  * prove a WRITE completed, not that today's bytes are yesterday's. At
  * 100 TB a release is copied between stores, retained for years, and
  * served by many readers; silent corruption (bit-rot, a partial copy,
  * a stray rewrite) must be detectable without comparing against a
  * second full copy. The manifest is a per-slice row-count + an
  * order-independent content fingerprint — verification is one columnar
  * scan, no reference copy needed.
  *
  * Fingerprint: per row, `xxhash64` over every column (column order
  * fixed by sorting names, so projection order at write time is
  * immaterial); per slice, the SUM of row hashes wrapped in Long — a
  * commutative fold, so row order, partition count and file layout are
  * all immaterial too (exactly the properties a rewrite/compaction is
  * allowed to change). Collisions are 2^-64-unlikely and an attacker is
  * out of scope (this is a SAFETY check, not an authenticity seal).
  */
object Integrity {

  /** Version of the fingerprint recipe (hash inputs, fold). BUMP on any
    * change that alters fingerprints of unchanged data — [[verify]]
    * refuses a manifest stamped under a different recipe with a
    * "re-stamp" message instead of reporting every healthy slice as
    * content_drift (the false corruption alarm this module exists to
    * prevent; the modelFormatVersion / indexFormatVersion convention).
    * v2: null-discriminating isnull interleave (round 15).
    */
  val recipeVersion = 2

  /** Gate a stamped manifest's recipe against the running code's —
    * shared by both verify faces. A manifest with no `recipe` column
    * predates versioning (the v1 era) and is equally stale.
    */
  private def requireRecipe(manifest: DataFrame, where: String): Unit = {
    // ALL rows checked, not just the first: a manifest holding mixed
    // recipe rows (a partial re-stamp, concatenated replica manifests)
    // must not pass the gate on its first row and then report healthy
    // slices as content_drift — the exact false alarm this gate exists
    // to prevent.
    // A null recipe cell (hand-spliced rows) counts as the
    // pre-versioning era — v1 — rather than NPE-ing mid-gate.
    val stamped: Seq[Int] =
      if (!manifest.columns.contains("recipe")) Seq(1)
      else manifest.select("recipe").distinct().collect()
        .map(r => if (r.isNullAt(0)) 1 else r.getInt(0)).toSeq.distinct.sorted
    require(stamped.length == 1,
      s"$where: the _integrity manifest holds rows from MIXED fingerprint " +
        s"recipes (v${stamped.mkString(", v")}) — a partial re-stamp or " +
        "concatenated replica manifests; slice statuses from different " +
        "eras are not comparable. Re-stamp the whole release " +
        "(Integrity.stamp/stampTar) after confirming its integrity by " +
        "other means")
    require(stamped.head == recipeVersion,
      s"$where: the _integrity manifest was stamped under fingerprint " +
        s"recipe v${stamped.head} but this build computes v$recipeVersion — " +
        "verifying would report every healthy slice as content_drift. " +
        "Re-stamp the release (Integrity.stamp/stampTar) after confirming " +
        "its integrity by other means (e.g. against a replica's manifest " +
        "from the same recipe era)")
  }

  private def listSlices(
      fs: org.apache.hadoop.fs.FileSystem,
      root: org.apache.hadoop.fs.Path,
      prefix: String): Seq[org.apache.hadoop.fs.Path] =
    if (!fs.exists(root)) Seq.empty
    else fs.listStatus(root)
      .filter(st => st.isDirectory && st.getPath.getName.startsWith(prefix))
      .map(_.getPath).sortBy(_.getName).toSeq

  /** The per-row content hash and its fold, in ONE place — stamp and
    * verify must agree on the recipe or every healthy release would
    * report content_drift: xxhash64 over every DATA column, column
    * order fixed by sorting names (projection order at write time is
    * immaterial). Each column is INTERLEAVED with its `isnull` flag:
    * Spark's xxhash64 skips null inputs entirely, so without the flags
    * a value migrating between two columns past a null — row `(x, null)`
    * becoming `(null, x)` — would hash identically; the never-null
    * boolean keeps the hash stream positional. Decimal(38) fold: a sum
    * of 64-bit hashes overflows Long after a handful of rows under ANSI
    * arithmetic; 38 digits carries ~1e19 worst-case rows per slice
    * without loss.
    */
  private def fpAggCols(
      dataCols: Seq[String]): Seq[org.apache.spark.sql.Column] = Seq(
    count(lit(1)).as("n_rows"),
    coalesce(sum(xxhash64(dataCols.sorted.flatMap(c =>
      Seq(col(s"`$c`"), isnull(col(s"`$c`")))): _*)
      .cast("decimal(38,0)")), lit(0).cast("decimal(38,0)")).as("fp"))

  private def sliceAgg(df: DataFrame, dataCols: Seq[String]) = {
    val aggs = fpAggCols(dataCols)
    df.agg(aggs.head, aggs.tail: _*)
  }

  /** Per-slice `(slice, n_rows, fp)` of every `<prefix><label>` subdir
    * under `dir` — the recompute half of [[stamp]]. ONE scan + one thin
    * groupBy on the slice partition column (not a scan per slice — a
    * 100 TB release has thousands of slices, and an N-deep union of
    * per-slice aggregates is both a planner and a scheduler problem),
    * left-joined against the filesystem listing so a legitimately-EMPTY
    * slice still records (0, 0) instead of vanishing from the manifest.
    */
  def fingerprint(
      spark: SparkSession, dir: String, prefix: String = "shard="): DataFrame = {
    val root = new org.apache.hadoop.fs.Path(dir)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    require(fs.exists(root), s"fingerprint: no such dir $dir")
    val slices = listSlices(fs, root, prefix)
    require(slices.nonEmpty,
      s"fingerprint: $dir holds no $prefix<label> slices")
    val partCol = prefix.stripSuffix("=")
    // Partition-type inference OFF for the window this relation resolves
    // in: labels must round-trip as raw strings ("00" is not "0", "c5"
    // must not poison a numeric column) so the grouped key rebuilds the
    // exact dir name the filesystem listing carries.
    val inferKey = "spark.sql.sources.partitionColumnTypeInference.enabled"
    val prior = spark.conf.get(inferKey, "true")
    spark.conf.set(inferKey, "false")
    val all =
      try spark.read.option("basePath", dir)
        .parquet(slices.map(_.toString): _*)
      finally spark.conf.set(inferKey, prior)
    val dataCols = all.columns.filterNot(_ == partCol).toSeq
    val aggs = fpAggCols(dataCols)
    val agg = all
      .groupBy(concat(lit(prefix), col(s"`$partCol`")).as("slice"))
      .agg(aggs.head, aggs.tail: _*)
    import spark.implicits._
    slices.map(_.getName).toDF("slice")
      .join(agg, Seq("slice"), "left")
      .select(col("slice"),
        coalesce(col("n_rows"), lit(0L)).as("n_rows"),
        coalesce(col("fp"), lit(0).cast("decimal(38,0)")).as("fp"))
  }

  /** Write the integrity manifest beside the data (`<dir>/_integrity`,
    * overwrite — hidden, so partition discovery and the slice-prefix
    * protocols all ignore it). Stamp AFTER the release is complete;
    * re-stamping is idempotent. Folds keep the manifest honest
    * automatically: compaction/purge/finalize drop a pre-fold manifest
    * before their destructive phase and re-stamp the folded layout on
    * success ([[StateCompaction.runProtocol]]), so a stamped release
    * stays stamped and a mid-fold crash leaves verify refusing with the
    * stamp-first hint instead of reporting every renamed slice as drift.
    */
  def stamp(
      spark: SparkSession, dir: String, prefix: String = "shard="): Unit =
    fingerprint(spark, dir, prefix)
      .withColumn("recipe", lit(recipeVersion))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/_integrity")

  /** Recompute and diff against the stamped manifest — one row per
    * slice, `status` ∈ `ok` | `content_drift` (fingerprint differs at
    * equal rows) | `row_count_drift` | `missing_slice` (stamped but
    * gone — a lost dir or partial copy) | `unstamped_slice` (present
    * but not in the manifest — written after the stamp) |
    * `unreadable_slice` (present but its parquet no longer reads — lost
    * part files behind a surviving `_SUCCESS`). Sorted non-`ok` first;
    * an empty non-ok set IS the integrity proof.
    *
    * FAULT-ISOLATED per slice (one small job each, driver-sequenced):
    * the classifier exists precisely for the most-damaged releases, so
    * one unreadable slice must become a row, not an exception that
    * hides every other finding — the opposite trade from [[stamp]],
    * which assumes healthy data and pays one scan total.
    */
  def verify(
      spark: SparkSession, dir: String, prefix: String = "shard="): DataFrame = {
    val root = new org.apache.hadoop.fs.Path(dir)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    require(fs.exists(new org.apache.hadoop.fs.Path(root, "_integrity")),
      s"verify: $dir carries no _integrity manifest — stamp it first " +
        "(Integrity.stamp after the release completes)")
    val manifest = spark.read.parquet(s"$dir/_integrity")
    requireRecipe(manifest, "verify")
    val stamped = manifest
      .select("slice", "n_rows", "fp").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDecimal(2))).toMap
    val present = listSlices(fs, root, prefix).map(_.getName)
    // Same inference-off window as [[fingerprint]]: a slice holding
    // NESTED partition subdirs (e.g. a stamped batch=/tb= index layout)
    // hashed those partition values as raw strings at stamp time; an
    // inferred-int read here would flip every healthy slice to
    // content_drift. Stamp and verify must read with identical types.
    val inferKey = "spark.sql.sources.partitionColumnTypeInference.enabled"
    val prior = spark.conf.get(inferKey, "true")
    spark.conf.set(inferKey, "false")
    val statuses = try (stamped.keySet ++ present).toSeq.sorted.map { slice =>
      val now =
        if (!present.contains(slice)) None
        else try {
          val df = spark.read.parquet(s"$dir/$slice")
          val r = sliceAgg(df, df.columns.toSeq).head()
          Some(Right((r.getLong(0), r.getDecimal(1))))
        } catch { case scala.util.control.NonFatal(_) => Some(Left(())) }
      val status = (stamped.get(slice), now) match {
        case (None, _)                 => "unstamped_slice"
        case (Some(_), None)           => "missing_slice"
        case (Some(_), Some(Left(_)))  => "unreadable_slice"
        case (Some((n0, fp0)), Some(Right((n1, fp1)))) =>
          if (n0 != n1) "row_count_drift"
          else if (fp0.compareTo(fp1) != 0) "content_drift"
          else "ok"
      }
      (slice, status)
    } finally spark.conf.set(inferKey, prior)
    import spark.implicits._
    statuses.sortBy { case (s, st) => (st == "ok", st, s) }
      .toDF("slice", "status")
  }

  // ----- WebDataset (tar) releases ------------------------------------

  /** Per-SHARD-FILE `(slice, n_rows, fp)` of a tar release — the member
    * walk is [[graft.sources.WebDataset.scanTar]]'s, the fold the same
    * commutative decimal sum, keyed here by the shard label (which
    * carries the `batch=<id>/` prefix in sink layouts, so every tar
    * file is its own verifiable unit). Payload bytes participate in the
    * hash: THIS is the bit-rot check the parquet face makes for column
    * data, made for the binary members a loader actually decodes.
    */
  def fingerprintTar(spark: SparkSession, dir: String): DataFrame = {
    import graft.sources.WebDataset
    import spark.implicits._
    val files = WebDataset.listTarFiles(spark, Seq(dir))
    require(files.nonEmpty, s"fingerprintTar: $dir holds no .tar shards")
    val agg = WebDataset.scanTarPaths(spark, Seq(dir))
      .groupBy(col("shard").as("slice"))
      .agg(tarAggCols.head, tarAggCols.tail: _*)
    // Filesystem listing joined back so a legitimately-EMPTY shard file
    // still records (0, 0) instead of vanishing from the manifest.
    files.map(WebDataset.shardLabelOf).toDF("slice")
      .join(agg, Seq("slice"), "left")
      .select(col("slice"),
        coalesce(col("n_rows"), lit(0L)).as("n_rows"),
        coalesce(col("fp"), lit(0).cast("decimal(38,0)")).as("fp"))
  }

  /** Member-row hash + fold for the tar face — one definition shared by
    * stamp and the per-file verify jobs (they must agree or every
    * healthy release would report content_drift).
    */
  private def tarAggCols: Seq[org.apache.spark.sql.Column] = Seq(
    count(lit(1)).as("n_rows"),
    coalesce(sum(xxhash64(
      col("key"), isnull(col("key")),
      col("ext"), isnull(col("ext")),
      col("payload"), isnull(col("payload")))
      .cast("decimal(38,0)")), lit(0).cast("decimal(38,0)")).as("fp"))

  /** [[stamp]] for a tar release: manifest under `<dir>/_integrity`. */
  def stampTar(spark: SparkSession, dir: String): Unit =
    fingerprintTar(spark, dir)
      .withColumn("recipe", lit(recipeVersion))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/_integrity")

  /** [[verify]] for a tar release — same statuses, per shard file, and
    * FAULT-ISOLATED the same way: a structurally-corrupt tar (a
    * truncated copy, the canonical event this manifest exists to catch)
    * fails ITS OWN per-file job and becomes an `unreadable_slice` row
    * instead of aborting the sweep and hiding every other finding.
    */
  def verifyTar(spark: SparkSession, dir: String): DataFrame = {
    import graft.sources.WebDataset
    val root = new org.apache.hadoop.fs.Path(dir)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    require(fs.exists(new org.apache.hadoop.fs.Path(root, "_integrity")),
      s"verifyTar: $dir carries no _integrity manifest — stamp it first " +
        "(Integrity.stampTar after the release completes)")
    val manifest = spark.read.parquet(s"$dir/_integrity")
    requireRecipe(manifest, "verifyTar")
    val stamped = manifest
      .select("slice", "n_rows", "fp").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDecimal(2))).toMap
    val presentFiles = WebDataset.listTarFiles(spark, Seq(dir))
      .map(f => WebDataset.shardLabelOf(f) -> f).toMap
    val statuses =
      (stamped.keySet ++ presentFiles.keySet).toSeq.sorted.map { slice =>
        val now = presentFiles.get(slice).map { f =>
          try {
            val r = WebDataset.scanTarFiles(spark, Seq(f))
              .agg(tarAggCols.head, tarAggCols.tail: _*).head()
            Right((r.getLong(0), r.getDecimal(1)))
          } catch { case scala.util.control.NonFatal(_) => Left(()) }
        }
        val status = (stamped.get(slice), now) match {
          case (None, _)                => "unstamped_slice"
          case (Some(_), None)          => "missing_slice"
          case (Some(_), Some(Left(_))) => "unreadable_slice"
          case (Some((n0, fp0)), Some(Right((n1, fp1)))) =>
            if (n0 != n1) "row_count_drift"
            else if (fp0.compareTo(fp1) != 0) "content_drift"
            else "ok"
        }
        (slice, status)
      }
    import spark.implicits._
    statuses.sortBy { case (s, st) => (st == "ok", st, s) }
      .toDF("slice", "status")
  }
}
