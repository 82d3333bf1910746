package graft.operators

import org.apache.spark.sql.SparkSession

/** Crash-safe folding of accumulated `batch=<id>` parquet increments
  * into ONE `batch=c<maxId>` dir — the small-files maintenance every
  * batch-keyed standing layout needs (a long-lived ingest writes one
  * tiny parquet dir per shard per stateful step; thousands of shards
  * mean thousands of listings on every prior-state read). Plain UNION
  * fold: callers guarantee union semantics (the first-wins indexes are
  * key-disjoint across batches by construction; the signature indexes
  * are per-doc unions). The `c` prefix keeps the compacted dir's label
  * ordered as `maxId`, so strictly-earlier prior reads and resumed
  * numeric batch ids stay correct.
  *
  * The same protocol also compacts RELEASE layouts: the parquet
  * `shard=<id>` slices a [[CurationPipeline.curationSink]] accumulates
  * (pass `prefix = "shard="`), and — through
  * [[graft.sources.WebDataset.compactTarRelease]]'s fold — the
  * `batch=<id>` tar slice dirs of sink_tar / sink_tokens releases.
  *
  * Offline contract: stop the writing stream/ingest CLEANLY first — a
  * re-delivered uncommitted batch would rewrite its own dir after its
  * rows were folded, and self-excluding readers would then see those
  * rows twice.
  *
  * Commit protocol (crash-safe at every point): (A) write the fold to
  * `_compact_tmp`; (B) write `_compact_commit` naming the target dir
  * and the folded batch dirs — the point of no return; (C) delete the
  * folded dirs, rename the tmp into place, drop the marker. A crash
  * before (B) leaves a tmp whose rows all still live in the batch dirs
  * (discarded on the next run); a crash during (C) leaves the marker
  * and the next run RESUMES (C) — the tmp is the complete fold.
  */
object StateCompaction {

  /** The non-throwing twin of [[labelOrd]] — the ONE place the label
    * grammar (numeric, optional single `c` compaction prefix) lives, so
    * tolerant scanners (fsck faces) and strict protocol entries cannot
    * drift apart.
    */
  private[graft] def labelOrdOption(label: String): Option[Long] =
    (if (label.startsWith("c")) label.drop(1) else label).toLongOption

  /** Strict ordinal of a batch label — anything outside the grammar is
    * a foreign dir: fail loudly rather than mis-order standing state.
    */
  def labelOrd(label: String, where: String): Long =
    labelOrdOption(label)
      .getOrElse(throw new IllegalArgumentException(
        s"$where: unrecognized batch dir label '$label' — labels must " +
          "be numeric (compacted dirs carry a single c prefix)"))

  /** Shared wedged-compaction refusal: every reader and writer of a
    * batch-keyed standing layout must refuse a dir holding an
    * unfinished compaction — a post-commit crash leaves the only
    * complete fold in `_compact_tmp` with some slice dirs already
    * deleted, so consuming (or appending beside) the survivors silently
    * loses the folded rows. One helper owns the marker name; the
    * protocol can never change it under only SOME of the guards.
    */
  def requireNoWedge(
      fs: org.apache.hadoop.fs.FileSystem,
      root: org.apache.hadoop.fs.Path,
      where: String,
      resumeHint: String): Unit =
    require(!fs.exists(new org.apache.hadoop.fs.Path(root, "_compact_commit")),
      s"$where: $root holds an unfinished compaction (_compact_commit " +
        s"present) — $resumeHint")

  /** Filesystem HEALTH CHECK for one batch-keyed standing layout (a
    * parquet/tar release root, an [[CurationPipeline.applyShard]] step
    * state dir, a profile dir): one row PER FINDING, empty frame =
    * healthy. Driver-side listings only — this is an ops check on dir
    * metadata, never a data scan — so it is safe to run against a live
    * layout (findings about in-flight writes are the point).
    *
    * Checks, in the order the protocol cares about them:
    *   - `wedge` — `_compact_commit` present: a compaction crashed
    *     after its commit point; some slice dirs are already deleted
    *     and the only complete fold sits in `_compact_tmp`. Every
    *     library reader refuses this dir ([[requireNoWedge]]); repair
    *     by re-running the owning compaction (it resumes).
    *   - `orphan_tmp` — `_compact_tmp` without a marker: a pre-commit
    *     crash leftover. The slices are intact; the next compaction
    *     discards it. Reclaimable space, not a correctness risk.
    *   - `foreign_label` — a `<prefix><label>` dir whose label is not
    *     numeric / `c`-prefixed-numeric, or a non-hidden directory that
    *     does not carry the prefix at all: the protocol would refuse
    *     the whole fold ([[labelOrd]]); name it before it wedges a
    *     maintenance window.
    *   - `missing_success` — a slice dir without a `_SUCCESS`
    *     job-completion marker: possibly a partial write
    *     (`scanTar(requireSuccess = true)` refuses tar slices in this
    *     state; parquet readers would silently read the partial part
    *     files).
    *
    * @return DataFrame (chk, item, detail), ordered by (chk, item).
    */
  def fsck(spark: SparkSession, dir: String, prefix: String = "batch="): org.apache.spark.sql.DataFrame = {
    val root = new org.apache.hadoop.fs.Path(dir)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    require(fs.exists(root), s"fsck: no such dir $dir")
    val findings = scala.collection.mutable.ArrayBuffer.empty[(String, String, String)]
    val hasMarker = fs.exists(new org.apache.hadoop.fs.Path(root, "_compact_commit"))
    if (hasMarker)
      findings += (("wedge", "_compact_commit",
        "compaction crashed after its commit point — readers refuse this " +
          "dir; re-run the owning compaction to resume and repair"))
    if (!hasMarker && fs.exists(new org.apache.hadoop.fs.Path(root, "_compact_tmp")))
      findings += (("orphan_tmp", "_compact_tmp",
        "pre-commit crash leftover; slices intact, next compaction discards it"))
    fs.listStatus(root).filter(_.isDirectory).foreach { st =>
      val name = st.getPath.getName
      if (name.startsWith(prefix)) {
        val label = name.stripPrefix(prefix)
        val ord = (if (label.startsWith("c")) label.drop(1) else label).toLongOption
        if (ord.isEmpty)
          findings += (("foreign_label", name,
            s"label '$label' is not numeric (compacted dirs carry a single " +
              "c prefix) — the compaction protocol refuses the whole fold"))
        else if (!fs.exists(new org.apache.hadoop.fs.Path(st.getPath, "_SUCCESS")))
          findings += (("missing_success", name,
            "slice has no job-completion marker — possibly a partial write"))
      } else if (!name.startsWith("_") && !name.startsWith("."))
        findings += (("foreign_label", name,
          s"directory does not carry the $prefix slice prefix"))
    }
    import spark.implicits._
    findings.sortBy(f => (f._1, f._2)).toSeq.toDF("chk", "item", "detail")
  }

  /** Append-style purge receipt: takedown/erasure runs need EVIDENCE —
    * who was purged, where, when — that survives beside the data it
    * acted on. One JSON line per pass, written as its own file under
    * `<dir>/_purge/receipt-<millis>` (underscore-hidden, so parquet
    * partition discovery, the tar member walk, and the slice-prefix
    * protocol listings all ignore it; a same-millisecond second pass
    * gets a `-1` suffix rather than clobbering). Best-effort BY DESIGN:
    * the receipt follows the crash-safe fold it documents — a crash
    * between the two loses the receipt, never the purge.
    */
  private[graft] def writePurgeReceipt(
      spark: SparkSession, dir: String, where: String,
      nKeys: Long, detail: String): Unit = {
    val root = new org.apache.hadoop.fs.Path(dir, "_purge")
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    fs.mkdirs(root)
    var p = new org.apache.hadoop.fs.Path(root, s"receipt-${System.currentTimeMillis()}")
    var n = 0
    while (fs.exists(p)) {
      n += 1
      p = new org.apache.hadoop.fs.Path(root, s"${p.getName.split("-").take(2).mkString("-")}-$n")
    }
    val out = fs.create(p, false)
    out.write(
      (s"""{"ts":${System.currentTimeMillis()},"op":"$where","keys":$nKeys,""" +
        s""""detail":"${detail.replace("\\", "\\\\").replace("\"", "\\\"")}"}""" + "\n")
        .getBytes("UTF-8"))
    out.close()
  }

  /** The one-column long key frame every purge entry point shares
    * (takedown / erasure lists are id sets, full stop): single column,
    * INTEGRAL type, cast long, nulls dropped, distinct. Shared by the
    * release, shard-state, BM25-index and ANN-index purge passes so the
    * takedown-critical guards cannot drift apart.
    */
  private[graft] def purgeKeyFrame(
      purgeIds: org.apache.spark.sql.DataFrame,
      where: String): org.apache.spark.sql.DataFrame = {
    require(purgeIds.columns.length == 1,
      s"$where: purgeIds must be a single-column id frame, got " +
        s"(${purgeIds.columns.mkString(", ")})")
    requireIntegralPurgeCol(purgeIds.schema.head.dataType,
      purgeIds.columns.head, where,
      "a lossy cast would silently purge nothing")
    purgeIds
      .select(org.apache.spark.sql.functions
        .col(purgeIds.columns.head).cast("long").as("__purge_id"))
      .na.drop().distinct()
  }

  /** Both sides of a purge anti-join must be integral: a lossy cast on
    * EITHER side turns values into nulls that never match — and a
    * takedown that silently retains rows is the worst failure mode the
    * pass can have.
    */
  private[graft] def requireIntegralPurgeCol(
      dt: org.apache.spark.sql.types.DataType,
      colName: String, where: String, consequence: String): Unit = {
    val integral = {
      import org.apache.spark.sql.types._
      dt == LongType || dt == IntegerType || dt == ShortType || dt == ByteType
    }
    require(integral,
      s"$where: column '$colName' is $dt — ids must be an integral type " +
        s"($consequence)")
  }

  /** Fold `dir`'s `batch=<id>` subdirectories into `batch=c<maxId>`.
    * `select` optionally projects the folded columns (Nil = full
    * schema); `rewrite` post-processes the union (identity for the
    * disjoint index layouts; an algebra fold for mergeable sketches);
    * `numFiles` sizes the rewrite (1 suits thin index rows); `prefix`
    * names the slice-dir convention (`batch=` for ingest state,
    * `shard=` for curationSink's parquet release slices); `minInputs`
    * is the fold floor — 2 for pure compaction (one dir needs no fold),
    * 1 when the rewrite itself is the point
    * ([[CurationPipeline.finalizeRelease]] must transform even a
    * single-slice release).
    */
  def compactBatchDir(
      spark: SparkSession,
      dir: String,
      select: Seq[String] = Nil,
      rewrite: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame =
        identity,
      numFiles: Int = 1,
      prefix: String = "batch=",
      minInputs: Int = 2
  ): Unit = {
    val restamp = runProtocol(
        spark, dir, prefix, "compactBatchDir", minInputs) { (inputs, tmp) =>
      val all = spark.read.parquet(inputs: _*)
      val projected =
        if (select.isEmpty) all else all.select(select.head, select.tail: _*)
      rewrite(projected).coalesce(numFiles).write.mode("overwrite").parquet(tmp)
    }
    // A stamped release stays stamped across folds: the protocol dropped
    // the stale manifest (slice names just changed), so re-fingerprint
    // the folded layout under the same recipe — one columnar scan,
    // bounded by the fold that just rewrote the same bytes. A crash
    // in between leaves no manifest, and verify refuses with the
    // stamp-first hint rather than reporting every renamed slice.
    if (restamp) Integrity.stamp(spark, dir, prefix)
  }

  /** The shared crash-safe commit protocol: resume/clean any prior
    * attempt, list and validate the `prefix`-keyed slice dirs, run
    * `fold(inputPaths, tmpPath)` to write the folded artifact to the
    * tmp, then commit (marker → delete inputs → rename tmp → drop
    * marker). The fold callback owns the artifact format (parquet
    * union, tar repack); everything crash-safety-critical lives here.
    *
    * A pre-fold [[Integrity]] `_integrity` manifest is DROPPED before
    * the destructive phase: the fold rewrites every slice name, so a
    * stale manifest could only make verify report healthy data as
    * missing_slice/unstamped_slice — the false corruption alarm the
    * recipe gate exists to prevent on its own axis. The delete comes
    * BEFORE the commit marker, so a crash at any later point still
    * leaves no stale manifest and a post-fold verify refuses with the
    * crisp stamp-first hint instead. Returns whether the manifest was
    * present, so format-aware callers (parquet vs tar) can re-stamp the
    * folded layout and keep a stamped release stamped across folds.
    */
  private[graft] def runProtocol(
      spark: SparkSession, dir: String, prefix: String, where: String,
      minInputs: Int = 2, targetOrd: Option[Long] = None)(
      fold: (Seq[String], String) => Unit): Boolean = {
    require(minInputs >= 1, s"$where: minInputs must be >= 1, got $minInputs")
    val root = new org.apache.hadoop.fs.Path(dir)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    require(fs.exists(root), s"$where: no such dir $dir")
    val tmp = new org.apache.hadoop.fs.Path(root, "_compact_tmp")
    val marker = new org.apache.hadoop.fs.Path(root, "_compact_commit")
    if (fs.exists(marker)) {
      // Resume a compaction that crashed after its commit point. The
      // target name can ITSELF be in the folded list (re-compacting
      // {batch=c5, batch=3} targets batch=c5 again): never delete the
      // target here — if the tmp is still present, a same-name survivor
      // is the STALE pre-fold dir and is replaced just before the
      // rename; if the tmp is gone, the target is already published.
      val in = fs.open(marker)
      val lines = new String(in.readAllBytes(), "UTF-8").split("\n")
      in.close()
      // The marker is published by atomic rename, so a readable marker
      // is a complete one — an empty/garbled body means someone wrote
      // it by hand; refuse rather than resume against garbage.
      require(lines.length >= 2 && lines.forall(_.startsWith(prefix)),
        s"$where: malformed _compact_commit marker in $dir " +
          s"(${lines.length} lines) — not written by this protocol; resolve by hand")
      val target = new org.apache.hadoop.fs.Path(root, lines.head)
      lines.tail.filterNot(_ == lines.head).foreach { name =>
        val p = new org.apache.hadoop.fs.Path(root, name)
        if (fs.exists(p)) fs.delete(p, true)
      }
      if (fs.exists(tmp)) {
        if (fs.exists(target)) fs.delete(target, true) // stale pre-fold dir
        require(fs.rename(tmp, target),
          s"$where: resume-rename of compacted output failed in $dir")
      }
      fs.delete(marker, false)
    } else if (fs.exists(tmp)) {
      // Pre-commit crash: the tmp's rows all still live in the batch
      // dirs — discard and recompact from scratch.
      fs.delete(tmp, true)
    }
    val batchDirs = fs.listStatus(root)
      .filter(st => st.isDirectory && st.getPath.getName.startsWith(prefix))
    require(batchDirs.nonEmpty,
      s"$where: $dir holds no $prefix<id> subdirectories")
    if (batchDirs.length < minInputs) return false // nothing to fold
    // Stale-manifest discipline (see the scaladoc): drop a pre-fold
    // _integrity before anything destructive happens.
    val integ = new org.apache.hadoop.fs.Path(root, "_integrity")
    val hadIntegrity = fs.exists(integ)
    if (hadIntegrity) fs.delete(integ, true)
    // Validate every label BEFORE any work — a foreign dir must refuse
    // the whole fold, not die mid-protocol.
    val dirMax = batchDirs.map(st => labelOrd(
      st.getPath.getName.stripPrefix(prefix), where)).max
    // An explicit targetOrd lets a DERIVED layout fold to its source's
    // label (the BM25 stats manifest folds to the POSTINGS' max, so the
    // two stay label-equal even when one side is mid-repair); it may
    // only ever run ahead of the dir's own labels, never behind.
    targetOrd.foreach(t => require(t >= dirMax,
      s"$where: targetOrd c$t is behind this dir's own max label c$dirMax"))
    val maxId = targetOrd.getOrElse(dirMax)
    fold(batchDirs.map(_.getPath.toString).toIndexedSeq, tmp.toString)
    val target = s"${prefix}c$maxId"
    // The marker IS the commit point, so its own write must be atomic:
    // a crash mid-write would otherwise leave a truncated marker whose
    // resume deletes fewer dirs than the tmp folded (silent
    // double-count) or cannot parse at all (wedged dir). Write-then-
    // rename gives all-or-nothing.
    val markerTmp = new org.apache.hadoop.fs.Path(root, "_compact_commit.tmp")
    val out = fs.create(markerTmp, true)
    out.write((target +: batchDirs.map(_.getPath.getName).toSeq)
      .mkString("\n").getBytes("UTF-8"))
    out.close()
    require(fs.rename(markerTmp, marker),
      s"$where: failed to publish the commit marker in $dir")
    batchDirs.foreach(st => fs.delete(st.getPath, true))
    require(fs.rename(tmp, new org.apache.hadoop.fs.Path(root, target)),
      s"$where: rename of compacted output failed in $dir")
    fs.delete(marker, false)
    hadIntegrity
  }
}
