package graft.sources

import java.io.BufferedInputStream

import org.apache.commons.compress.archivers.tar.{TarArchiveEntry, TarArchiveInputStream, TarArchiveOutputStream}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.functions._

/** WebDataset-style tar sharding (Aizman, Maltby & Breuel, "High
  * Performance I/O For Large Scale Deep Learning", IEEE Big Data 2019 —
  * the `webdataset` convention): a corpus ships as `shard-NNN.tar`
  * archives whose members are `<sample_key>.<ext>` files, grouping every
  * modality of one sample (`000123.jpg`, `000123.txt`, `000123.json`)
  * under a shared basename. Training ingest streams whole shards
  * sequentially — the I/O shape object stores and spinning disks like —
  * and one worker owns one shard, so the tar file IS the unit of
  * parallelism.
  *
  * Spark mapping:
  *   - [[scanTar]] lists shards driver-side and streams members
  *     through task-side filesystem handles
  *     (one task per shard file — the WebDataset parallelism contract)
  *     and walks tar entries with commons-compress per partition,
  *     emitting one row per member. Binary payloads stay opaque bytes
  *     (the [[graft.operators.Multimodal]] column convention).
  *   - [[writeTar]] is the release sink: shard by a deterministic key
  *     function, one tar per shard written task-side through the Hadoop
  *     filesystem (no driver involvement, any number of shards).
  *   - [[samples]] pivots member rows back to one row per sample.
  *
  * Scale note: the BATCH scan streams each tar through a buffered
  * filesystem handle one member at a time, so peak task memory is the
  * largest MEMBER, not the shard — mixed-size releases read without
  * executor sizing games. Only the STREAMING source still rides
  * `binaryFile` (Structured Streaming file sources hand whole files to
  * the batch), so size shards the way WebDataset prescribes anyway
  * (hundreds of MB, not tens of GB) where a stream will read them.
  */
object WebDataset {

  /** One tar member: the shard file's basename, the sample key and
    * extension split from `<key>.<ext>`, and the payload bytes.
    */
  final case class Member(shard: String, key: String, ext: String,
      payload: Array[Byte], n_bytes: Long)

  /** Java-serializable carrier for the SESSION Hadoop configuration
    * (`Configuration` itself is Writable, not Serializable — the same
    * wrapper shape Spark uses internally for its own task-side writers).
    * Tar tasks must see `spark.hadoop.*` session settings (object-store
    * credentials, endpoints); a bare `new Configuration()` task-side
    * silently drops them and only works for file:// and cluster-default
    * HDFS.
    */
  private[graft] final class SerializableHadoopConf(
      @transient var value: org.apache.hadoop.conf.Configuration) extends Serializable {
    private def writeObject(out: java.io.ObjectOutputStream): Unit = {
      out.defaultWriteObject()
      value.write(out)
    }
    private def readObject(in: java.io.ObjectInputStream): Unit = {
      in.defaultReadObject()
      value = new org.apache.hadoop.conf.Configuration(false)
      value.readFields(in)
    }
  }

  /** Task-side shard commit: rename an attempt-unique temp tar to its
    * final name, first committer wins. Shard bytes are a pure function
    * of the shard's rows (sorted keys, epoch mod-times), so when a
    * speculative or retried attempt loses the rename race, the
    * already-published bytes are identical to what it would have
    * written — dropping the loser's temp file is lossless.
    */
  private[graft] def commitShard(
      fs: org.apache.hadoop.fs.FileSystem, tmp: Path, dest: Path): Unit = {
    if (!fs.rename(tmp, dest)) {
      if (fs.exists(dest)) fs.delete(tmp, false) // an earlier attempt won
      else throw new java.io.IOException(
        s"writeTar: failed to commit shard $tmp -> $dest")
    }
  }

  /** Write `df` as `outDir/shard-<s>.tar` WebDataset shards.
    *
    * Each row becomes one member per `(ext, column)` in `members`
    * (binary columns; cast strings upstream), named `<key>.<ext>`.
    * Shard assignment is the closed form `key % shards` (oracle-friendly
    * and stable under re-runs); rows sort by key within a shard and
    * member mod-times pin to epoch 0, so a shard's bytes are a pure
    * function of its rows. Each shard is written by exactly one task
    * (rows repartition on the shard id) through the Hadoop filesystem —
    * works for file:// and hdfs:// alike, no driver data path. Tasks
    * follow a commit protocol (attempt-unique temp under `_temporary/`,
    * rename on close — [[commitShard]]) and the job stamps `_SUCCESS`
    * after all tasks finish, so retried/speculative attempts and mid-job
    * failures can never publish a truncated or interleaved shard.
    */
  def writeTar(
      df: DataFrame,
      outDir: String,
      shards: Int,
      keyCol: String = "doc_id",
      members: Seq[(String, String)] = Seq("txt" -> "text")
  ): Unit = {
    require(shards > 0, s"shards must be positive, got $shards")
    require(members.nonEmpty, "writeTar: no member columns given")
    members.foreach { case (_, c) => require(df.columns.contains(c),
      s"writeTar: no column '$c' (have ${df.columns.mkString(", ")})") }
    val spark = df.sparkSession
    val out = outDir
    val sel = df.select(
      col(keyCol).cast("long").as("__key") +:
        members.map { case (_, c) => col(c).cast("binary").as(c) }: _*)
      .withColumn("__shard", pmod(col("__key"), lit(shards.toLong)).cast("int"))
    val exts = members.map(_._1)
    val nMembers = members.length
    // Clear stale shards first: a re-run with fewer shards must not
    // leave orphans for scanTar to blend in.
    val rootPath = new Path(out)
    val hadoopConf = spark.sessionState.newHadoopConf()
    val fs0 = rootPath.getFileSystem(hadoopConf)
    if (fs0.exists(rootPath)) fs0.delete(rootPath, true)
    fs0.mkdirs(rootPath)
    // Session Hadoop conf (spark.hadoop.* credentials, endpoints) must
    // reach the tasks — a bare task-side `new Configuration()` only
    // resolves file:// and cluster-default HDFS.
    val serConf = new SerializableHadoopConf(hadoopConf)
    sel
      .repartition(shards, col("__shard"))
      .sortWithinPartitions("__shard", "__key")
      .foreachPartition { (it: Iterator[org.apache.spark.sql.Row]) =>
        val fs = new Path(out).getFileSystem(serConf.value)
        val attempt = Option(org.apache.spark.TaskContext.get())
          .map(_.taskAttemptId()).getOrElse(0L)
        // Task-commit protocol: write each shard to an attempt-unique
        // temp path under _temporary/ (invisible to scanTar's *.tar
        // glob AND Spark's hidden-path filter) and rename into place on
        // close — a zombie, retried, or speculative duplicate attempt
        // can never interleave bytes into a published shard.
        var current: Option[(Int, Path, Path, TarArchiveOutputStream)] = None
        def closeCurrent(): Unit = current.foreach { case (_, tmp, dest, t) =>
          t.finish(); t.close()
          commitShard(fs, tmp, dest)
          current = None
        }
        def tarFor(shard: Int): TarArchiveOutputStream = current match {
          case Some((s, _, _, t)) if s == shard => t
          case _ =>
            closeCurrent()
            val tmp = new Path(out,
              f"_temporary/shard-$shard%05d.tar.attempt-$attempt")
            val dest = new Path(out, f"shard-$shard%05d.tar")
            val t = new TarArchiveOutputStream(fs.create(tmp, true))
            t.setLongFileMode(TarArchiveOutputStream.LONGFILE_POSIX)
            current = Some((shard, tmp, dest, t))
            t
        }
        it.foreach { row =>
          val shard = row.getInt(row.fieldIndex("__shard"))
          val key = row.getLong(row.fieldIndex("__key"))
          val t = tarFor(shard)
          var i = 0
          while (i < nMembers) {
            val bytes = Option(row.getAs[Array[Byte]](members(i)._2))
              .getOrElse(Array.emptyByteArray)
            val e = new TarArchiveEntry(s"$key.${exts(i)}")
            e.setSize(bytes.length.toLong)
            e.setModTime(0L)
            t.putArchiveEntry(e)
            t.write(bytes)
            t.closeArchiveEntry()
            i += 1
          }
        }
        closeCurrent()
      }
    // Job-level commit marker: written only after every task succeeded,
    // so readers can distinguish a complete release from a partial one.
    fs0.delete(new Path(rootPath, "_temporary"), true)
    fs0.create(new Path(rootPath, "_SUCCESS"), true).close()
  }

  /** True when `dir` carries [[writeTar]]'s job-completion marker. */
  def isComplete(spark: SparkSession, dir: String): Boolean = {
    val p = new Path(dir)
    p.getFileSystem(spark.sessionState.newHadoopConf())
      .exists(new Path(p, "_SUCCESS"))
  }

  /** [[writeTar]] with the shard COUNT derived from a payload-byte
    * budget instead of fixed up front — the production release shape
    * (WebDataset prescribes shards of a few hundred MB; a corpus's byte
    * mass, not a constant, decides how many that is). One map-side-
    * combined aggregate sums the member payload bytes, then
    * `shards = ceil(total / targetShardBytes)` feeds the same
    * closed-form `key % shards` assignment — still oracle-replayable,
    * because the shard count itself is a scalar SQL aggregate. Hash
    * assignment balances EXPECTED bytes per shard (keys are
    * independent of payload size); tar framing (512 B header + padding
    * per member) is deliberately excluded from the budget — at the
    * prescribed shard sizes it is sub-percent noise.
    *
    * @return the derived shard count
    */
  def writeTarAuto(
      df: DataFrame,
      outDir: String,
      targetShardBytes: Long,
      keyCol: String = "doc_id",
      members: Seq[(String, String)] = Seq("txt" -> "text")
  ): Int = {
    require(targetShardBytes > 0,
      s"targetShardBytes must be positive, got $targetShardBytes")
    val byteCols = members.map { case (_, c) =>
      coalesce(octet_length(col(c).cast("binary")), lit(0)).cast("long") }
    val total = df.select(sum(byteCols.reduce(_ + _)).as("b"))
      .head().getAs[Any]("b") match { case null => 0L; case b: Long => b }
    val shards = math.max(1L, (total + targetShardBytes - 1) / targetShardBytes).toInt
    writeTar(df, outDir, shards, keyCol, members)
    shards
  }

  /** STREAMING release sink: append each micro-batch of a curation
    * stream as its own `batch=<id>/shard-*.tar` WebDataset subdirectory
    * — the continuous-release shape (curated docs flow in, training-
    * ready shards accumulate). Idempotent under foreachBatch's
    * at-least-once contract: a re-delivered batch overwrites ITS OWN
    * `batch=<id>` directory byte-identically (the
    * [[graft.operators.Profiling.profileSink]] convention —
    * [[writeTar]] output is a pure function of the batch rows), and
    * [[scanTar]]'s recursive lookup reads the accumulated layout as one
    * corpus with batch-qualified shard labels. Start with
    * `.option("checkpointLocation", …).start()` on the returned writer.
    */
  def tarSink(
      stream: DataFrame,
      outDir: String,
      targetShardBytes: Long = 256L << 20,
      keyCol: String = "doc_id",
      members: Seq[(String, String)] = Seq("txt" -> "text")
  ): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    stream.writeStream.outputMode("append").foreachBatch {
      (batch: DataFrame, batchId: Long) =>
        writeTarAuto(batch, s"$outDir/batch=$batchId", targetShardBytes, keyCol, members)
        ()
    }

  /** Offline compaction for a [[tarSink]] release dir: a long-lived
    * stream accumulates one `batch=<id>` subdirectory per micro-batch —
    * many small shards, each its own ingest task. Repack reads the
    * accumulated layout back ([[scanTar]] recursive + [[samples]]
    * pivot) and rewrites it as ONE flat byte-budget layout in `outDir`
    * ([[writeTarAuto]] — the [[graft.operators.Profiling.compactProfileDir]]
    * maintenance convention, tar edition). Writes to a SEPARATE
    * directory: compacting in place while the stream appends would race
    * the sink; stop-the-stream → repack → point ingestion at `outDir`.
    *
    * Sample keys must be distinct corpus-wide (tarSink batches of one
    * stream are — re-keyed repeats never reach sink_tar); duplicate keys
    * fail loudly rather than silently resolving to one member.
    *
    * @return the flat layout's shard count
    */
  def repackTar(
      spark: SparkSession,
      inDir: String,
      outDir: String,
      targetShardBytes: Long,
      exts: Seq[String] = Seq("txt")
  ): Int = {
    require(new Path(inDir).toString != new Path(outDir).toString,
      "repackTar: outDir must differ from inDir (in-place repack would race the sink)")
    repackMembers(scanTar(spark, inDir), exts, outDir, targetShardBytes, "repackTar")
  }

  /** The shared pivot-and-rewrite half of [[repackTar]] and
    * [[compactTarRelease]]: member rows → one flat byte-budget tar
    * layout at `outDir`. Refuses duplicate sample keys (the rewrite
    * would silently collapse them to one member) AND keys missing one
    * of the requested modalities (`samples` pivots a missing (key, ext)
    * to null, which [[writeTar]] would then publish as a
    * present-but-EMPTY member — a repack must move bytes, never
    * fabricate them; a release whose slices carry differing member sets
    * must be resolved before repacking).
    */
  private def repackMembers(
      members: DataFrame,
      exts: Seq[String],
      outDir: String,
      targetShardBytes: Long,
      where: String
  ): Int = {
    // Lineage cut: the pivot feeds three guard/write consumers (dup-key
    // count, missing-member count, writeTarAuto's byte-sum + write) —
    // each would otherwise re-read and re-walk every tar in the release.
    val pivoted = graft.plans.Materialize(samples(members, exts))
    val dups = pivoted.groupBy("key").count().filter(col("count") > 1).count()
    require(dups == 0,
      s"$where: $dups sample keys appear in multiple shards — the rewrite would " +
        "silently collapse them to one member; resolve duplicates first")
    val partial = pivoted
      .filter(exts.map(e => col(s"`$e`").isNull).reduce(_ || _)).count()
    require(partial == 0,
      s"$where: $partial sample keys are missing one of the ${exts.mkString("/")} " +
        "members — the rewrite would fabricate empty members for them, changing " +
        "what a loader decodes; resolve the differing member sets first")
    writeTarAuto(pivoted.withColumn("__k", col("key").cast("long")),
      outDir, targetShardBytes, "__k", exts.map(e => e -> e))
  }

  /** Walk one shard file's tar bytes into member rows (shared by the
    * batch and streaming scans — identical decode either way).
    */
  /** One-member-at-a-time walk of an open tar stream — the shared core
    * of the batch scan (filesystem handle) and the streaming scan
    * (binaryFile bytes). Does NOT close the stream; callers own it.
    */
  /** A shard file's corpus-wide label. Shards written by [[tarSink]]
    * live in batch=<id> subdirectories and reuse shard-00000.tar names
    * per batch — the batch dir rides in the label so shards stay
    * distinct corpus-wide.
    */
  private[graft] def shardLabelOf(p: String): String = {
    val segs = p.split('/')
    val base = segs.last.stripSuffix(".tar")
    if (segs.length >= 2 && segs(segs.length - 2).startsWith("batch="))
      segs(segs.length - 2) + "/" + base
    else base
  }

  private def memberIterator(
      p: String, tin: TarArchiveInputStream,
      readPayload: Boolean = true): Iterator[Member] = {
    val shard = shardLabelOf(p)
    Iterator.continually(tin.getNextEntry).takeWhile(_ != null)
      .filter(e => !e.isDirectory)
      .map { e =>
        require(e.getSize <= Int.MaxValue,
          s"scanTar: member ${e.getName} in $p is ${e.getSize} bytes — " +
            "members above 2 GiB cannot be carried as one binary cell; " +
            "chunk the sample at write time")
        // readPayload = false is the metadata-only walk (ext/key/size
        // discovery): getNextEntry SEEKS past the unread payload, so a
        // names pass costs header blocks, not release bytes. n_bytes
        // still reports the true member size either way.
        val payload =
          if (readPayload) tin.readNBytes(e.getSize.toInt)
          else Array.emptyByteArray
        val name = e.getName
        val dot = name.lastIndexOf('.')
        val (key, ext) =
          if (dot < 0) (name, "") else (name.substring(0, dot), name.substring(dot + 1))
        Member(shard, key, ext, payload,
          if (readPayload) payload.length.toLong else e.getSize)
      }
  }

  private def walkMembers(p: String, bytes: Array[Byte]): Iterator[Member] = {
    val tin = new TarArchiveInputStream(
      new BufferedInputStream(new java.io.ByteArrayInputStream(bytes)))
    // Materialized (the byte array is already in memory — this is the
    // STREAMING source's decode path, where binaryFile hands us whole
    // shard bytes per micro-batch row); the batch scan streams through
    // [[memberIterator]] over a filesystem handle instead.
    memberIterator(p, tin).toVector.iterator
  }

  /** Read every `*.tar` under `path` as member rows
    * `(shard, key, ext, payload, n_bytes)` — one binaryFile task per
    * shard, the tar walked streamingly inside it.
    *
    * `requireSuccess = true` refuses to read a layout without
    * [[writeTar]]'s job-completion marker — either `path/_SUCCESS`
    * (flat release) or `_SUCCESS` in every `batch=<id>` subdirectory
    * ([[tarSink]] layout) — so a partially-written release fails loudly
    * instead of silently training on a truncated corpus. Off by
    * default: [[tarSink]]'s CURRENT batch is legitimately unmarked
    * while the stream runs.
    */
  def scanTar(
      spark: SparkSession, path: String, requireSuccess: Boolean = false): DataFrame = {
    if (requireSuccess) {
      val root = new Path(path)
      val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
      // A post-commit compactTarRelease crash leaves the only complete
      // fold in _compact_tmp with some batch dirs already deleted — the
      // survivors all carry valid _SUCCESS markers, so without this
      // check a loader would silently train on a corpus missing the
      // folded slices. Same refusal discipline as applyShard /
      // profileSink / lineDedupSink on their standing state dirs.
      graft.operators.StateCompaction.requireNoWedge(fs, root, "scanTar",
        "re-run compactTarRelease to resume it before reading")
      if (!fs.exists(new Path(root, "_SUCCESS"))) {
        val batchDirs =
          if (!fs.exists(root)) Array.empty[org.apache.hadoop.fs.FileStatus]
          else fs.listStatus(root).filter(st =>
            st.isDirectory && st.getPath.getName.startsWith("batch="))
        require(batchDirs.nonEmpty,
          s"scanTar: $path carries no _SUCCESS marker and no batch=<id> " +
            "subdirectories — refusing to read a possibly-partial release " +
            "(pass requireSuccess = false to read anyway)")
        val missing = batchDirs.filterNot(st =>
          fs.exists(new Path(st.getPath, "_SUCCESS")))
        require(missing.isEmpty,
          s"scanTar: ${missing.length} of ${batchDirs.length} batch dirs under " +
            s"$path lack a _SUCCESS marker (${missing.take(3).map(_.getPath.getName).mkString(", ")}…) " +
            "— the release is incomplete (pass requireSuccess = false to read anyway)")
      }
    }
    scanTarPaths(spark, Seq(path))
  }

  /** Every `*.tar` under the given dirs, sorted — the listing half of
    * [[scanTarPaths]], exposed so maintenance passes (integrity verify)
    * can drive per-FILE jobs for fault isolation. Hidden-file
    * convention (`_temporary`, `_compact_tmp`, dotfiles): only segments
    * BELOW each listed root count — a release that happens to live
    * under `.corpora/` or `_work/` must still scan, so the ancestor
    * walk stops at the root itself.
    */
  private[graft] def listTarFiles(
      spark: SparkSession, paths: Seq[String]): Seq[String] = {
    val hconf = new SerializableHadoopConf(spark.sessionState.newHadoopConf())
    def hiddenBelow(p: Path, qualifiedRoot: Path): Boolean = {
      var cur = p
      while (cur != null && cur != qualifiedRoot) {
        val n = cur.getName
        if (n.startsWith("_") || n.startsWith(".")) return true
        cur = cur.getParent
      }
      false
    }
    paths.flatMap { dir =>
      val root = new Path(dir)
      val fs = root.getFileSystem(hconf.value)
      // A missing dir is a misconfiguration, not an empty release —
      // the pre-streaming binaryFile reader raised here too; silently
      // returning zero members would train on nothing.
      require(fs.exists(root), s"scanTar: path does not exist: $dir")
      val qRoot = fs.makeQualified(root)
      val it = fs.listFiles(qRoot, true)
      val buf = scala.collection.mutable.ArrayBuffer[String]()
      while (it.hasNext) {
        val st = it.next()
        if (st.isFile && st.getPath.getName.endsWith(".tar") &&
            !hiddenBelow(st.getPath, qRoot)) buf += st.getPath.toString
      }
      buf.sorted // deterministic partition assignment across runs
    }
  }

  private[graft] def scanTarPaths(
      spark: SparkSession, paths: Seq[String],
      readPayload: Boolean = true): DataFrame =
    scanTarFiles(spark, listTarFiles(spark, paths), readPayload)

  /** [[scanTarPaths]] over an explicit FILE list — one task set, the
    * member walk per file; maintenance callers pass a single file to
    * isolate faults (a truncated tar must fail ITS job, not the whole
    * sweep's).
    */
  private[graft] def scanTarFiles(
      spark: SparkSession, files: Seq[String],
      readPayload: Boolean = true): DataFrame = {
    implicit val enc = Encoders.product[Member]
    val hconf = new SerializableHadoopConf(spark.sessionState.newHadoopConf())
    val slices = math.max(1, math.min(files.size,
      spark.sparkContext.defaultParallelism * 2))
    val rows = spark.sparkContext.parallelize(files, slices).flatMap { p =>
      val path = new Path(p)
      val fs = path.getFileSystem(hconf.value)
      val tin = new TarArchiveInputStream(
        new BufferedInputStream(fs.open(path), 1 << 16))
      // Safety net for partial consumption (limit/take): the stream
      // closes at task end even when the iterator is abandoned.
      Option(org.apache.spark.TaskContext.get())
        .foreach(_.addTaskCompletionListener[Unit](_ => tin.close()))
      // One task iterates MANY tars (slices = min(files, 2×parallelism)),
      // so each handle also closes as soon as its walk drains — the
      // task-end listener alone would hold every exhausted tar's stream
      // open simultaneously (fd exhaustion on thousand-slice folds).
      val inner = memberIterator(p, tin, readPayload)
      new Iterator[Member] {
        private var closed = false
        def hasNext: Boolean = {
          val h = inner.hasNext
          if (!h && !closed) { closed = true; tin.close() }
          h
        }
        def next(): Member = inner.next()
      }
    }
    spark.createDataset(rows).toDF()
  }

  /** IN-PLACE crash-safe compaction of an accumulated `batch=<id>` tar
    * release ([[tarSink]], and the terminal sink_tar / sink_tokens
    * steps in shard-ingest mode — point it at the release root, or at
    * `<path>/shards` for a token release): folds every slice dir into
    * ONE `batch=c<maxId>` dir under the same root, so thousands of
    * micro-batches stop meaning thousands of dirs per read while
    * readers keep reading the SAME standing path (unlike [[repackTar]],
    * which rewrites to a separate flat dir). Runs
    * [[graft.operators.StateCompaction]]'s commit protocol — tmp fold,
    * atomic marker, delete + rename, resume after any crash point — so
    * the release is never left partial; the folded dir carries its own
    * `_SUCCESS` ([[writeTarAuto]] stamps it), preserving
    * [[scanTar]]`(requireSuccess = true)`'s contract, and a resumed
    * ingest keeps appending `batch=<id>` dirs beside it (`c<maxId>`
    * orders as `maxId`, so fresh numeric labels stay strictly later).
    *
    * Offline contract, like every compaction here: stop the
    * stream/ingest first. Sample keys must be distinct corpus-wide
    * (sink_tar doc ids and sink_tokens' shifted (bucket, seq) keys
    * are); duplicates fail loudly rather than silently collapsing to
    * one member.
    */
  def compactTarRelease(
      spark: SparkSession,
      dir: String,
      targetShardBytes: Long = 256L << 20
  ): Unit = {
    val restamp = graft.operators.StateCompaction.runProtocol(
      spark, dir, "batch=", "compactTarRelease") { (inputs, tmp) =>
      // Ext discovery walks tar HEADERS only (readPayload = false seeks
      // past member bytes) — the release's payload is read once, inside
      // the repack pass, not twice.
      val exts = scanTarPaths(spark, inputs, readPayload = false)
        .select("ext").distinct()
        .collect().map(_.getString(0)).sorted.toSeq
      require(exts.nonEmpty, s"compactTarRelease: no tar members under $dir")
      repackMembers(scanTarPaths(spark, inputs), exts, tmp,
        targetShardBytes, "compactTarRelease")
      ()
    }
    // A stamped tar release stays stamped across folds (the protocol
    // dropped the stale manifest — shard labels just changed); a crash
    // in between leaves no manifest and verifyTar refuses with the
    // stamp-first hint.
    if (restamp) graft.operators.Integrity.stampTar(spark, dir)
  }

  /** DELETION PROPAGATION over an accumulated `batch=<id>` TAR release —
    * the takedown / erasure pass for the WebDataset face
    * ([[graft.operators.CurationPipeline.purgeRelease]] is the parquet
    * face): fold every slice dir into ONE repacked `batch=c<maxId>` dir
    * WITHOUT the purged samples' members, under the same
    * [[graft.operators.StateCompaction]] commit protocol as
    * [[compactTarRelease]] (crash at any point preserves the raw slices
    * or resumes publishing the complete purged fold; the folded dir
    * keeps its `_SUCCESS`). `purgeKeys` is a one-column frame of sample
    * KEYS (the tar member basename — doc ids for sink_tar releases),
    * compared as strings; purging keys already absent is a no-op
    * rewrite. Purging EVERY member is refused — delete the release dir
    * instead of publishing an empty one. Token releases (`sink_tokens`)
    * do not purge row-wise: packing is corpus-shaped, re-cut them from
    * the purged parquet corpus. Offline contract: stop the ingest first.
    */
  def purgeTarRelease(
      spark: SparkSession,
      dir: String,
      purgeKeys: DataFrame,
      targetShardBytes: Long = 256L << 20
  ): Unit = {
    require(purgeKeys.columns.length == 1,
      s"purgeTarRelease: purgeKeys must be a single-column key frame, got " +
        s"(${purgeKeys.columns.mkString(", ")})")
    val keys = graft.plans.Materialize(purgeKeys
      .select(col(purgeKeys.columns.head).cast("string").as("__purge_key"))
      .na.drop().distinct())
    val restamp = graft.operators.StateCompaction.runProtocol(
      spark, dir, "batch=", "purgeTarRelease", minInputs = 1) { (inputs, tmp) =>
      // Survivor-ext discovery (the purge-would-empty guard) anti-joins
      // the HEADER-only walk — keys and exts live in tar headers, so the
      // payload is read once, in the repack pass below.
      val exts = scanTarPaths(spark, inputs, readPayload = false)
        .join(broadcast(keys), col("key") === col("__purge_key"), "left_anti")
        .select("ext").distinct()
        .collect().map(_.getString(0)).sorted.toSeq
      require(exts.nonEmpty,
        s"purgeTarRelease: purge would empty the release under $dir — " +
          "delete the release dir instead of publishing an empty fold")
      val m = scanTarPaths(spark, inputs)
        .join(broadcast(keys), col("key") === col("__purge_key"), "left_anti")
      repackMembers(m, exts, tmp, targetShardBytes, "purgeTarRelease")
      ()
    }
    // Re-stamp a previously-stamped release over the purged fold — the
    // manifest must fingerprint the POST-purge bytes, never the erased
    // members.
    if (restamp) graft.operators.Integrity.stampTar(spark, dir)
    graft.operators.StateCompaction.writePurgeReceipt(
      spark, dir, "purgeTarRelease", keys.count(), s"targetShardBytes=$targetShardBytes")
  }

  /** STREAMING ingest of a shard directory: tail `path` for newly
    * arriving `*.tar` files and emit their member rows in the
    * micro-batch each shard lands in — the continuous-crawl shape
    * (shards appear on object storage as crawlers finish them; the
    * curation pipeline consumes the directory as an unbounded source).
    * Structured Streaming's file source tracks seen files in the
    * checkpoint, so every shard is processed exactly once across
    * restarts; `maxFilesPerTrigger` bounds per-batch bytes (one shard
    * is one `binaryFile` row, so batch memory ≈ files × shard size —
    * size shards as [[writeTar]] prescribes). Decode is [[scanTar]]'s
    * tar walk, shared code path.
    */
  def streamTar(
      spark: SparkSession, path: String, maxFilesPerTrigger: Int = 16): DataFrame = {
    implicit val enc = Encoders.product[Member]
    import org.apache.spark.sql.types._
    // binaryFile's fixed schema — the streaming source requires it
    // explicitly (no inference pass over an unbounded directory).
    val binaryFileSchema = StructType(Seq(
      StructField("path", StringType), StructField("modificationTime", TimestampType),
      StructField("length", LongType), StructField("content", BinaryType)))
    spark.readStream.format("binaryFile")
      .schema(binaryFileSchema)
      .option("pathGlobFilter", "*.tar")
      .option("recursiveFileLookup", "true")
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .load(path)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])](Encoders.tuple(Encoders.STRING, Encoders.BINARY))
      .flatMap { case (p, bytes) => walkMembers(p, bytes) }
      .toDF()
  }

  /** Pivot member rows to one row per sample: `(shard, key, <ext>...)`
    * with one binary column per requested extension (null when the
    * sample lacks that modality). Deterministic: at most one member per
    * (sample, ext) in a well-formed WebDataset; duplicates resolve to
    * the bytewise max.
    */
  def samples(members: DataFrame, exts: Seq[String]): DataFrame = {
    require(exts.nonEmpty, "samples: no extensions requested")
    members
      .groupBy("shard", "key")
      .agg(
        max(when(col("ext") === exts.head, col("payload"))).as(exts.head),
        exts.tail.map(e => max(when(col("ext") === e, col("payload"))).as(e)): _*)
  }
}
