package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.config.CurationConfig
import graft.config.CurationConfig._
import graft.functions.Texts

/** Compiler from the declarative curation language
  * ([[graft.config.CurationConfig]]) to one DataFrame chain: each step
  * maps onto the already-audited operator it names, so the YAML inherits
  * every scale property the operators carry individually (zero-exchange
  * projections, map-side hash picks, thin semi-joins — nothing here adds
  * a plan shape of its own).
  *
  * Column contract: every step preserves the input columns it does not
  * explicitly produce. Filters (`langid_keep`, `quality`) compute their
  * evidence transiently and drop it; `split`/`shuffle` append their
  * assignment columns; `chunk` changes the row grain (doc → chunk) and is
  * therefore only legal as a final step.
  *
  * Execution semantics: compiling is NOT always lazy. Steps with an
  * internal fit (`dedup_semantic`, `sample_diverse`, `importance_sample`,
  * `quality_model` scoring against an eager-fit aux frame) run actions at
  * compile time, and a terminal `sink` EAGERLY writes its release path
  * (mode overwrite) inside `apply`/`fromYaml` and returns the read-back
  * frame — so merely constructing a sink-terminated pipeline performs the
  * write. Callers that build the frame repeatedly (benchmarks, plan
  * audits) should point each run's sink at its own path: concurrent
  * writers on a shared path can clobber each other mid-read.
  */
object CurationPipeline {

  def fromYaml(docs: DataFrame, yamlText: String,
      idCol: String = "doc_id", textCol: String = "text",
      aux: Map[String, DataFrame] = Map.empty): DataFrame =
    apply(docs, CurationConfig.fromYaml(yamlText), idCol, textCol, aux)

  def apply(docs: DataFrame, pipeline: Pipeline,
      idCol: String = "doc_id", textCol: String = "text",
      aux: Map[String, DataFrame] = Map.empty): DataFrame = {
    pipeline.steps.dropRight(1).foreach { s =>
      require(!s.isInstanceOf[Chunk],
        "chunk changes the row grain and must be the final step")
      require(!s.isInstanceOf[Sink],
        "sink writes the release and must be the final step")
      require(!s.isInstanceOf[SinkTar],
        "sink_tar writes the release and must be the final step")
      require(!s.isInstanceOf[SinkTokens],
        "sink_tokens writes the release and must be the final step")
    }
    // After upsample/mix_unimax the row key is (id, copy) — every
    // selection step would see duplicate ids and silently mis-count.
    // Only shuffle (which keys copies apart) and the terminal sink are
    // legal after either.
    pipeline.steps.zipWithIndex.collectFirst {
      case (u: Upsample, i) => (stepName(u), i)
      case (u: MixUnimax, i) => (stepName(u), i)
    }.foreach { case (nm, i) =>
      require(pipeline.steps.drop(i + 1)
        .forall(s => s.isInstanceOf[Shuffle] || s.isInstanceOf[Sink]),
        s"$nm duplicates ids (row key becomes (id, copy)); only " +
          "'shuffle' (and a final 'sink') may follow it")
    }
    // url_dedup is the byte-cost pre-pass: its point is to drop URL
    // refetches BEFORE any per-token work, so only other url steps may
    // precede it — a url_dedup after a text step is config that silently
    // paid tokenization on rows it was about to throw away.
    pipeline.steps.zipWithIndex.collectFirst {
      case (u: UrlDedup, i) if !pipeline.steps.take(i).forall(_.isInstanceOf[UrlDedup]) => i
    }.foreach { i =>
      throw new IllegalArgumentException(
        s"url_dedup (step #$i) must precede every text-processing step " +
          "(it exists to skip per-token work on dropped refetches)")
    }
    pipeline.steps.foldLeft(docs)((df, step) => applyStep(df, step, idCol, textCol, aux))
  }

  /** [[fromYaml]] in SHARD-INGEST mode — see [[applyShard]]. */
  def fromYamlShard(shard: DataFrame, yamlText: String,
      stateDir: String, shardLabel: String,
      idCol: String = "doc_id", textCol: String = "text",
      aux: Map[String, DataFrame] = Map.empty): DataFrame =
    applyShard(shard, CurationConfig.fromYaml(yamlText), stateDir, shardLabel,
      idCol, textCol, aux)

  /** SHARD-INGEST (incremental) compile: curate ONE new crawl shard
    * against the standing state of a release under `stateDir`, never
    * re-processing the corpus — the production topology where shards
    * arrive continuously and the release grows. Each stateful step owns
    * a state subdirectory (`stateDir/step<i>=<kind>`) holding the
    * persisted index the operator families already ship:
    *
    *   - `url_dedup`  → accumulated [[UrlCuration.urlIndex]] rows; a
    *     shard keeps only first-crawl docs of urls NEW to the index.
    *   - `dedup_lines` → the standing [[Dedup.lineIndex]]
    *     ([[Dedup.dedupLinesIncremental]] rewrite, husks dropped).
    *   - `dedup_exact` → accumulated `(hash, len, id)` first-arrival
    *     keys.
    *   - `dedup_minhash` → accumulated [[Dedup.minhashIndex]]
    *     signatures; shard pairs via [[Dedup.minhashLshIncremental]]
    *     (corpus text never re-shingled), components over the emitted
    *     pairs, non-representatives drop. Under the ingest-order
    *     invariant (shard ids follow state ids) each shard's keep
    *     decisions equal the BATCH step over (state ∪ shard) restricted
    *     to shard docs: every edge incident to a shard doc survives the
    *     pair restriction, so if a shard doc's full component holds any
    *     smaller id, a smaller id is reachable through shard-doc edges
    *     alone. Note the one first-wins asymmetry of ANY streaming
    *     near-dup ingest: an already-released doc is never retroactively
    *     dropped when a LATER arrival bridges two of its clusters — the
    *     union of shard outputs can keep a doc the one-shot batch run
    *     over everything would collapse.
    *   - `dedup_simhash` → accumulated [[Dedup.simhashIndex]]
    *     signatures, same component semantics (and the same
    *     no-retroactive-drop asymmetry) as minhash.
    *   - `substring_remove` → the standing [[Dedup.substringIndex]]
    *     window counts (additive across batches); shard docs are
    *     rewritten by [[Dedup.removeDuplicateSpansIncremental]], the
    *     corpus never re-tokenized — an already-released doc is not
    *     re-cut when the shard supplies a window's second occurrence.
    *   - `dedup_phash` → accumulated [[PerceptualHash.signatures]]
    *     (only the shard is ever decoded; the corpus contributes its
    *     8-byte signatures).
    *   - `perplexity` → the LM fits ONCE, on the first shard's frame as
    *     curated (CCNet's fit/serve split), persists at the step's
    *     state dir, and scores every later shard as served — the
    *     corpus-fit drifts only when the operator is re-bootstrapped
    *     deliberately (delete the dir).
    *
    * Stateless steps (clean/quality/gopher/c4/blocklist/redact/langid/
    * repetition/compress, probe- and model-table steps, split/shuffle/
    * chunk) apply exactly as in [[apply]]. Corpus-level mixing and
    * sampling steps (quota/temperature/token_budget/upsample/unimax/
    * dsir/weighted/diverse/rank) and the embedding-table near-dup
    * family (dedup_semantic — its IVF fit is over the LIVE corpus) are
    * REFUSED: their semantics are corpus-global and belong to a release
    * compaction run over the standing corpus, not a shard ingest. A
    * terminal `sink` writes the shard's release slice to
    * `path/shard=<label>`; a terminal `sink_tar` / `sink_tokens` writes
    * the slice as `path/batch=<label>` WebDataset tar shards /
    * `path/shards/batch=<label>` int32 token shards (the tarSink /
    * tokenSink batch-dir conventions — the accumulated layout reads as
    * one release), with the tokenizer/vocab fit ONCE on the first
    * shard's curated frame and served to every later shard.
    *
    * Idempotent under re-delivery: every state write is keyed
    * `batch=<shardLabel>` (mode overwrite) and every prior-state read is
    * restricted to STRICTLY-EARLIER labels (the
    * [[graft.operators.Profiling.profileSink]] convention, hardened for
    * the signature indexes), so re-running a shard recomputes against
    * the identical prior view and rewrites its own increments
    * byte-identically. Parity contract (asserted in
    * CurationPipelineSpec): each shard's output equals the batch
    * [[apply]] over everything ingested up to and including that shard,
    * restricted to the shard's docs. For the first-wins families
    * (url/lines/exact) the union of shard outputs therefore equals the
    * batch run over the whole corpus exactly; the near-dup families add
    * the no-retroactive-drop asymmetry documented above, and the LM
    * step's fit-once scope is the other documented divergence.
    * Pipelines are fingerprinted into `stateDir/_pipeline` — editing
    * the YAML against existing state fails loudly instead of silently
    * re-bootstrapping position-keyed indexes.
    */
  def applyShard(
      shard: DataFrame, pipeline: Pipeline,
      stateDir: String, shardLabel: String,
      idCol: String = "doc_id", textCol: String = "text",
      aux: Map[String, DataFrame] = Map.empty): DataFrame = {
    require(shardLabel.matches("[0-9]+"),
      s"applyShard: shardLabel '$shardLabel' must be numeric — labels ORDER " +
        "the prior-state view (strictly-earlier batches), and compacted " +
        "dirs reserve the c prefix; use the ingest sequence number")
    pipeline.steps.dropRight(1).foreach { s =>
      require(!s.isInstanceOf[Chunk],
        "chunk changes the row grain and must be the final step")
      require(!s.isInstanceOf[Sink],
        "sink writes the release and must be the final step")
      require(!s.isInstanceOf[SinkTar],
        "sink_tar writes the release and must be the final step")
      require(!s.isInstanceOf[SinkTokens],
        "sink_tokens writes the release and must be the final step")
    }
    // State subdirectories are keyed by STEP POSITION: an edited pipeline
    // (a step inserted, reordered, or re-parameterized) against existing
    // state would silently re-bootstrap or misread standing indexes. The
    // fingerprint makes that a loud error; change the pipeline by
    // re-ingesting into a fresh stateDir.
    val fingerprint = pipeline.steps.map(_.toString).mkString("\n")
    val fpPath = new org.apache.hadoop.fs.Path(s"$stateDir/_pipeline")
    val fpFs = fpPath.getFileSystem(shard.sparkSession.sessionState.newHadoopConf())
    if (fpFs.exists(fpPath)) {
      val in = fpFs.open(fpPath)
      val existing = new String(in.readAllBytes(), "UTF-8")
      in.close()
      require(existing == fingerprint,
        s"applyShard: pipeline differs from the one this state dir was built " +
          s"with — state subdirectories are keyed by step position, so the " +
          s"standing indexes no longer line up. Re-ingest into a fresh " +
          s"stateDir to change the pipeline.\n  state dir: " +
          s"${existing.linesIterator.mkString(" | ")}\n  this run:  " +
          s"${fingerprint.linesIterator.mkString(" | ")}")
    } else {
      val out = fpFs.create(fpPath, true)
      out.write(fingerprint.getBytes("UTF-8"))
      out.close()
    }
    pipeline.steps.zipWithIndex.foldLeft(shard) { case (df, (step, i)) =>
      applyStepShard(df, step, i, stateDir, shardLabel, idCol, textCol, aux)
    }
  }

  /** Offline compaction for an [[applyShard]] state directory: fold each
    * stateful step's accumulated `batch=<id>` increments into ONE
    * `batch=c<maxId>` dir — the small-files maintenance a long-lived
    * ingest needs (one tiny parquet dir per shard per step, times
    * thousands of shards, means thousands of listings on every
    * prior-state read). Every step family's increments union cleanly:
    * the first-wins indexes (url/lines/exact) are key-disjoint across
    * batches by construction, the signature indexes
    * (minhash/simhash/phash) are per-doc unions, and the substring
    * window-count index tolerates split counts because
    * [[Dedup.duplicateSpansIncremental]] fires on (shard occurrence +
    * ANY index row) — it never needs the per-key sum, so a plain union
    * is equivalent to the aggregated fold. The LM dir is a single fit
    * (nothing to fold)
    * and the `_pipeline` fingerprint stays in place. Same offline
    * contract and crash-safe commit protocol as
    * [[StateCompaction.compactBatchDir]] — stop the ingest cleanly
    * first. Prior-state reads order the compacted dir as `maxId`, so a
    * resumed ingest keeps deduping against it.
    */
  def compactShardState(spark: SparkSession, stateDir: String): Unit = {
    val root = new org.apache.hadoop.fs.Path(stateDir)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    require(fs.exists(root), s"compactShardState: no such dir $stateDir")
    val stepDirs = fs.listStatus(root)
      .filter(st => st.isDirectory && st.getPath.getName.matches("step\\d+=.*"))
    require(stepDirs.nonEmpty,
      s"compactShardState: $stateDir holds no step<i>=<kind> state subdirectories")
    stepDirs
      .filterNot(_.getPath.getName.endsWith("=lm")) // fit-once: no batches
      .foreach(st => StateCompaction.compactBatchDir(spark, st.getPath.toString))
  }

  /** IN-PLACE crash-safe compaction of a [[curationSink]] PARQUET
    * release dir: folds the accumulated `shard=<batchId>` slices into
    * ONE `shard=c<maxId>` dir under the same root (the
    * [[StateCompaction]] protocol with the release's slice prefix), so
    * thousands of micro-batches stop meaning thousands of dirs on every
    * `spark.read.parquet(releaseDir)` while readers keep reading the
    * same standing path. Offline contract as always: stop the stream
    * first; a resumed stream appends fresh numeric `shard=<id>` dirs
    * beside the folded one (`c<maxId>` orders as `maxId`). Releases
    * whose terminal step is sink_tar / sink_tokens compact via
    * [[graft.sources.WebDataset.compactTarRelease]] instead.
    */
  def compactRelease(
      spark: SparkSession, releaseDir: String, numFiles: Int = 8): Unit =
    StateCompaction.compactBatchDir(
      spark, releaseDir, numFiles = numFiles, prefix = "shard=")

  /** Release FINALIZATION — the corpus-global mixing pass over the
    * STANDING release that shard-ingest mode refuses step-by-step
    * (quota/temperature/token_budget/upsample/unimax/dsir/weighted/
    * diverse/rank, dedup_semantic, sample_diverse — anything whose
    * semantics need the whole corpus at once), closing the production
    * loop crawl → ingest → finalize-into-a-training-mix. Folds every
    * accumulated `shard=<id>` parquet slice of a [[curationSink]] /
    * terminal-`sink` release into ONE `shard=c<maxId>` dir whose rows
    * are `pipeline` applied (the batch [[apply]], so every step keeps
    * its audited plan shape) to the whole standing corpus — under the
    * [[StateCompaction]] crash-safe commit protocol, so a crash at any
    * point either preserves the raw slices or resumes publishing the
    * complete finalized fold, and the folded dir keeps its `_SUCCESS`.
    *
    * Contract: OFFLINE and ONCE — stop the ingest cleanly first (the
    * compaction offline contract), and finalize when the corpus is
    * complete: the pass REWRITES the release in place, so a later
    * ingest would append raw slices beside the finalized fold, and a
    * second finalize would mix the already-mixed corpus (quota twice ≠
    * quota once). Keep the raw release (cheap: parquet slices) and
    * finalize a COPY when the mix must be re-cut with different knobs.
    * Terminal sink steps are refused — this pass IS the release write.
    */
  def finalizeRelease(
      spark: SparkSession, releaseDir: String, pipeline: Pipeline,
      idCol: String = "doc_id", textCol: String = "text",
      aux: Map[String, DataFrame] = Map.empty,
      numFiles: Int = 8): Unit = {
    pipeline.steps.foreach { s =>
      require(!s.isInstanceOf[Sink] && !s.isInstanceOf[SinkTar] &&
          !s.isInstanceOf[SinkTokens],
        s"finalizeRelease: step '${stepName(s)}' writes a release, but this " +
          "pass rewrites the standing release IN PLACE — drop the sink step " +
          "(read the finalized dir directly, or copy it afterwards)")
    }
    StateCompaction.compactBatchDir(
      spark, releaseDir,
      rewrite = df => apply(df, pipeline, idCol, textCol, aux),
      numFiles = numFiles, prefix = "shard=", minInputs = 1)
  }

  /** [[finalizeRelease]] from YAML — the same declarative surface the
    * ingest takes.
    */
  def finalizeReleaseYaml(
      spark: SparkSession, releaseDir: String, yamlText: String,
      idCol: String = "doc_id", textCol: String = "text",
      aux: Map[String, DataFrame] = Map.empty,
      numFiles: Int = 8): Unit =
    finalizeRelease(spark, releaseDir, CurationConfig.fromYaml(yamlText),
      idCol, textCol, aux, numFiles)

  /** The one-column long key frame every purge entry point shares:
    * takedown / erasure lists are id sets, full stop — a multi-column
    * frame is a caller bug, refused loudly.
    */
  private def purgeKeyFrame(purgeIds: DataFrame, where: String): DataFrame =
    StateCompaction.purgeKeyFrame(purgeIds, where)

  private def requireIntegralPurgeCol(
      dt: org.apache.spark.sql.types.DataType,
      colName: String, where: String, consequence: String): Unit =
    StateCompaction.requireIntegralPurgeCol(dt, colName, where, consequence)

  /** DELETION PROPAGATION over a standing parquet release — the
    * takedown / right-to-erasure pass a production corpus needs: rewrite
    * the accumulated `shard=<id>` slices of a [[curationSink]] /
    * terminal-`sink` release into ONE `shard=c<maxId>` dir WITHOUT the
    * purged docs' rows, under the [[StateCompaction]] crash-safe commit
    * protocol (a crash at any point either preserves the raw slices or
    * resumes publishing the complete purged fold). Idempotent: purging
    * ids already absent is a no-op rewrite.
    *
    * This erases the RELEASE only. The standing ingest indexes still
    * carry the purged docs' derived rows (url keys, text hashes,
    * signatures), which keeps SUPPRESSING re-crawls of the same content
    * — the right call for a takedown (the content must not come back
    * through a mirror). For erasure (GDPR-style: derived data goes too,
    * and identical content re-submitted later is admitted fresh), also
    * run [[purgeShardState]]. Token releases (`sink_tokens`) cannot be
    * purged row-wise — packing is corpus-shaped, so removing a doc means
    * re-cutting the release from the purged parquet corpus; tar releases
    * purge via [[graft.sources.WebDataset.purgeTarRelease]].
    *
    * Offline contract as every release rewrite here: stop the ingest
    * first. Scale shape: one scan + broadcast anti-join + write — the
    * purge list is takedown-sized by nature (broadcast is the honest
    * plan; a corpus-sized "purge list" is a re-curation, not a purge).
    */
  def purgeRelease(
      spark: SparkSession, releaseDir: String, purgeIds: DataFrame,
      idCol: String = "doc_id", numFiles: Int = 8): Unit = {
    val keys = graft.plans.Materialize(purgeKeyFrame(purgeIds, "purgeRelease"))
    StateCompaction.compactBatchDir(
      spark, releaseDir,
      rewrite = df => {
        requireIntegralPurgeCol(df.schema(idCol).dataType, idCol, "purgeRelease",
          "a lossy cast on the release side would silently retain the purged rows")
        df.join(
          broadcast(keys), df(idCol).cast("long") === keys("__purge_id"), "left_anti")
      },
      numFiles = numFiles, prefix = "shard=", minInputs = 1)
    StateCompaction.writePurgeReceipt(spark, releaseDir, "purgeRelease",
      keys.count(), s"idCol=$idCol")
  }

  /** Which column carries the purgeable doc attribution in each standing
    * index layout — the derived-data inventory behind [[purgeShardState]].
    * Layouts NOT here hold only non-invertible aggregates:
    * `substring_index` stores hashed-window occurrence counts (no doc
    * attribution to erase) and `lm` is a corpus-level token-frequency
    * fit; both are retained and reported, the standard aggregate
    * boundary of erasure.
    */
  private val purgeIdColByKind: Map[String, String] = Map(
    "url_index" -> "keeper",
    "exact_index" -> "__id",
    "line_index" -> "first_doc",
    "minhash_index" -> "doc_id",
    "simhash_index" -> "doc_id",
    "ngram_index" -> "doc_id",
    "winnow_index" -> "doc_id",
    "embedding_index" -> "vec_id",
    "phash_index" -> "media_id",
    "afp_index" -> "media_id",
    "video_index" -> "media_id")

  private val purgeRetainedKinds: Set[String] = Set("substring_index", "lm")

  /** ERASURE of purged docs' DERIVED rows from an [[applyShard]] state
    * directory: for every step index that attributes rows to a doc
    * (url keys, text hashes, line first-occurrences, minhash/simhash/
    * ngram/winnow/embedding signatures, perceptual media signatures),
    * fold the accumulated `batch=<id>` increments into one purged
    * `batch=c<maxId>` dir without those rows — the [[StateCompaction]]
    * protocol per step dir, crash-safe and idempotent. Aggregate-only
    * layouts (`substring_index` window counts, the `lm` fit) hold no
    * per-doc attribution and are RETAINED; an unrecognized step dir
    * fails loudly rather than silently retaining personal data.
    *
    * Semantics flip vs release-only purge: with its index rows erased, a
    * purged doc stops suppressing future arrivals — identical content
    * re-ingested later is admitted FRESH (asserted end-to-end by the
    * curation_release_purge oracle). Prior dedup decisions already in
    * the release stand (docs dropped as duplicates of a purged doc do
    * not resurrect — erasure removes data, it never refills the corpus).
    *
    * Offline contract: stop the ingest first (the fold collapses batch
    * labels, so a re-delivered pre-purge shard would recompute against a
    * different prior view — the same rule as [[compactShardState]]).
    *
    * @return one (stepDir, action) row per step state dir: `purged on
    *         <col>` or `retained-aggregate`.
    */
  def purgeShardState(
      spark: SparkSession, stateDir: String, purgeIds: DataFrame): Seq[(String, String)] = {
    val root = new org.apache.hadoop.fs.Path(stateDir)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    require(fs.exists(root), s"purgeShardState: no such dir $stateDir")
    val keys = graft.plans.Materialize(purgeKeyFrame(purgeIds, "purgeShardState"))
    val stepDirs = fs.listStatus(root)
      .filter(st => st.isDirectory && st.getPath.getName.matches("step\\d+=.*"))
      .sortBy(_.getPath.getName)
    require(stepDirs.nonEmpty,
      s"purgeShardState: $stateDir holds no step<i>=<kind> state subdirectories")
    val report = stepDirs.toSeq.map { st =>
      val name = st.getPath.getName
      val kind = name.split("=", 2)(1)
      if (purgeRetainedKinds(kind)) name -> "retained-aggregate"
      else {
        val idc = purgeIdColByKind.getOrElse(kind, throw new IllegalArgumentException(
          s"purgeShardState: step dir '$name' has no registered purge column — " +
            "refusing to silently retain a doc-attributing index; add the " +
            "layout to purgeIdColByKind (or to the retained-aggregate set if " +
            "it provably holds no per-doc rows)"))
        StateCompaction.compactBatchDir(
          spark, st.getPath.toString,
          rewrite = df => {
            requireIntegralPurgeCol(df.schema(idc).dataType, idc,
              s"purgeShardState($name)",
              "a lossy cast on the index side would silently retain the purged rows")
            df.join(
              broadcast(keys), df(idc).cast("long") === keys("__purge_id"), "left_anti")
          },
          minInputs = 1)
        name -> s"purged on $idc"
      }
    }
    StateCompaction.writePurgeReceipt(spark, stateDir, "purgeShardState",
      keys.count(), report.map { case (d, a) => s"$d: $a" }.mkString("; "))
    report
  }

  /** [[StateCompaction.fsck]] over a whole [[applyShard]] state
    * directory: every `step<i>=<kind>` subdirectory checked with the
    * `batch=` slice convention (findings prefixed with the step dir),
    * plus the state-level contracts — a missing `_pipeline` fingerprint
    * means position-keyed indexes can silently mis-bind to an edited
    * YAML. Batch-keyed vs single-fit is detected STRUCTURALLY (batch=
    * slices or compaction artifacts present), not by kind name, so any
    * fit-once dir — the served LM today, future single fits tomorrow —
    * gets its `_SUCCESS` checked instead of silently passing an empty
    * batch sweep. Non-`step<N>=<kind>` dirs in the state root are
    * flagged foreign (a wrong-path write). Empty frame = healthy.
    */
  def fsckShardState(spark: SparkSession, stateDir: String): DataFrame = {
    import spark.implicits._
    val root = new org.apache.hadoop.fs.Path(stateDir)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    require(fs.exists(root), s"fsckShardState: no such dir $stateDir")
    val top =
      if (fs.exists(new org.apache.hadoop.fs.Path(root, "_pipeline"))) Seq.empty
      else Seq(("missing_pipeline", "_pipeline",
        "state dir carries no pipeline fingerprint — position-keyed " +
          "indexes cannot be checked against the YAML they were built with"))
    val stepRe = "^step([0-9]+)=(.+)$".r
    // The foreign-entry sweep runs over ALL non-hidden listings (files
    // AND dirs, the ivfPqIndexFsck discipline): a stray top-level FILE —
    // a misplaced marker, a wrong-path parquet part — is just as much a
    // wrong-path write as a stray dir, and a step-NAMED file is foreign
    // too (step state is always a directory). The step-dir branches stay
    // directory-only.
    val perDir = fs.listStatus(root).toSeq
      .sortBy(_.getPath.getName).flatMap { st =>
        val name = st.getPath.getName
        name match {
          case stepRe(_, _) if st.isDirectory =>
            val batchKeyed = fs.listStatus(st.getPath).exists(c =>
              c.isDirectory && c.getPath.getName.startsWith("batch=")) ||
              fs.exists(new org.apache.hadoop.fs.Path(st.getPath, "_compact_commit")) ||
              fs.exists(new org.apache.hadoop.fs.Path(st.getPath, "_compact_tmp"))
            if (batchKeyed)
              StateCompaction.fsck(spark, st.getPath.toString)
                .collect().toSeq
                .map(r => (r.getString(0), s"$name/${r.getString(1)}", r.getString(2)))
            else if (fs.exists(new org.apache.hadoop.fs.Path(st.getPath, "_SUCCESS")))
              Seq.empty
            else Seq(("missing_success", name,
              "single-fit step dir has no job-completion marker — the fit " +
                "crashed mid-write; delete the dir to re-bootstrap it"))
          case _ if name.startsWith("_") || name.startsWith(".") => Seq.empty
          case _ =>
            Seq(("foreign_entry", name,
              "not a step<N>=<kind> dir — a wrong-path write into the state root"))
        }
      }
    (top ++ perDir).toDF("chk", "item", "detail").orderBy("chk", "item")
  }

  /** STREAMING ingest for the whole curation language — the
    * foreachBatch sink: each micro-batch is one crawl shard curated by
    * [[applyShard]] against the standing state (shard label = the
    * batchId), its surviving rows appended as
    * `releaseDir/shard=<batchId>`. After any batch,
    * `spark.read.parquet(releaseDir)` is the curated release ingested
    * so far. Idempotent under foreachBatch's at-least-once contract:
    * applyShard's state increments and the release slice are all
    * batch-keyed (mode overwrite) with self-excluding prior reads, so a
    * re-delivered batch recomputes against the identical prior view and
    * overwrites itself. The pipeline must not carry a terminal sink
    * step — this sink IS the release write. Start with
    * `.writeStream.foreachBatch(curationSink(...))`.
    */
  def curationSink(
      pipeline: Pipeline, stateDir: String, releaseDir: String,
      idCol: String = "doc_id", textCol: String = "text",
      aux: Map[String, DataFrame] = Map.empty): (DataFrame, Long) => Unit = {
    // A terminal sink_tar / sink_tokens step IS a release write this
    // sink can delegate to applyShard (batch-keyed tar/token slices,
    // idempotent under re-delivery) — the continuous-crawl topology
    // ending in a WebDataset or int32-token release inside the
    // language. It must point at THIS sink's releaseDir: a second
    // release path in the YAML would silently split the corpus.
    val terminalRelease = pipeline.steps.lastOption.collect {
      case SinkTar(p, _) => p
      case SinkTokens(p, _, _, _, _, _, _, _, _) => p
    }
    terminalRelease.foreach { p =>
      require(p == releaseDir,
        s"curationSink: the terminal ${stepName(pipeline.steps.last)} step " +
          s"writes to '$p' but this sink's release dir is '$releaseDir' — " +
          "point the step at releaseDir (one release path, not two)")
    }
    pipeline.steps.dropRight(if (terminalRelease.isDefined) 1 else 0).foreach { s =>
      require(!s.isInstanceOf[Sink] && !s.isInstanceOf[SinkTar] &&
        !s.isInstanceOf[SinkTokens],
        s"curationSink IS the terminal release write — drop the '${stepName(s)}' " +
          "step (point the sink at releaseDir instead, or end the pipeline " +
          "in a terminal sink_tar/sink_tokens release step)")
    }
    (batch, batchId) => {
      // A post-commit release-compaction crash leaves the only complete
      // fold in _compact_tmp with some slice dirs deleted — appending
      // fresh slices beside the wedge buries the loss. Checked on EVERY
      // batch (the profileSink/applyShard discipline): resume the
      // compaction, then restart the stream.
      {
        val root = new org.apache.hadoop.fs.Path(releaseDir)
        val fs = root.getFileSystem(
          batch.sparkSession.sessionState.newHadoopConf())
        val hint = "re-run compactRelease (parquet) or " +
          "WebDataset.compactTarRelease (tar/token) to resume it before " +
          "appending slices"
        StateCompaction.requireNoWedge(fs, root, "curationSink", hint)
        // A sink_tokens release compacts under releaseDir/shards — the
        // top-level marker probe alone would never fire for it.
        StateCompaction.requireNoWedge(fs,
          new org.apache.hadoop.fs.Path(root, "shards"), "curationSink", hint)
      }
      val curated = applyShard(
        batch, pipeline, stateDir, batchId.toString, idCol, textCol, aux)
      if (terminalRelease.isEmpty) {
        val dest = s"$releaseDir/shard=$batchId"
        curated.write.mode("overwrite").parquet(dest)
        batch.sparkSession.catalog.refreshByPath(dest)
      }
      // else: the terminal step already wrote its batch-keyed slice
      // eagerly inside applyShard; `curated` is the decoded read-back.
    }
  }

  /** Order/layout-independent content fingerprint of a state increment
    * — the [[Integrity]] recipe (xxhash64 over name-sorted columns
    * interleaved with isnull flags, commutative decimal fold) applied
    * to the frame in memory: [[explainShard]]'s read-only replay
    * compares a recomputed increment against the persisted own-label
    * slice with it, so column order, row order and file layout never
    * produce a false mismatch.
    */
  private def incrementFp(df: DataFrame): (Long, java.math.BigDecimal) = {
    val cols = df.columns.sorted.toSeq
    val r = df.agg(
      count(lit(1)),
      coalesce(sum(xxhash64(cols.flatMap(c =>
        Seq(col(s"`$c`"), isnull(col(s"`$c`")))): _*)
        .cast("decimal(38,0)")), lit(0).cast("decimal(38,0)"))).head()
    (r.getLong(0), r.getDecimal(1))
  }

  /** The operation named by the newest `_purge/receipt-*` under a state
    * dir, if any — [[explainShard]]'s attribution for folded-away
    * shards. Receipts are tiny JSON lines written by the purge passes;
    * a plain compaction writes none (then the fold alone is the
    * answer).
    */
  private def latestFoldOp(
      fs: org.apache.hadoop.fs.FileSystem, stateDir: String): Option[String] = {
    val root = new org.apache.hadoop.fs.Path(stateDir, "_purge")
    if (!fs.exists(root)) None
    else fs.listStatus(root)
      .filter(st => st.isFile && st.getPath.getName.startsWith("receipt-"))
      .sortBy(_.getPath.getName).lastOption.flatMap { st =>
        val in = fs.open(st.getPath)
        val txt = try new String(in.readAllBytes(), "UTF-8") finally in.close()
        "\"op\":\"([^\"]+)\"".r.findFirstMatchIn(txt).map(_.group(1))
      }
  }

  private def applyStepShard(
      df: DataFrame, step: Step, stepIdx: Int,
      stateDir: String, shardLabel: String,
      idCol: String, textCol: String,
      aux: Map[String, DataFrame],
      replayVerify: Boolean = false): DataFrame = {
    val spark = df.sparkSession
    def stateSub(kind: String) = s"$stateDir/step$stepIdx=$kind"
    // Prior-state view: batch=<id> dirs with labels STRICTLY BEFORE this
    // shard's (numeric compare when both labels are numeric). Excluding
    // only the shard's own label would be enough for the first-wins
    // families (their increments are key-disjoint across batches), but
    // the signature indexes (minhash/phash) hold EVERY doc: a
    // re-delivered batch that saw LATER batches' signatures would pair
    // against the future and emit different output. Strictly-earlier
    // labels give every delivery of a shard the identical prior view.
    // A compacted dir is `batch=c<maxId>` (the StateCompaction
    // convention): it folds batches up to maxId, so it compares as
    // maxId — any live shard label must be strictly greater. Labels are
    // numeric (enforced at applyShard entry); a foreign dir fails loud.
    def labelBefore(a: String): Boolean =
      StateCompaction.labelOrd(a, "applyShard") < shardLabel.toLong
    def priorBatches(dir: String): Seq[String] = {
      val root = new org.apache.hadoop.fs.Path(dir)
      val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
      if (!fs.exists(root)) Seq.empty
      else {
        // A half-finished compaction (commit marker present) means some
        // batch dirs are already deleted and the only complete fold sits
        // in _compact_tmp: reading the survivors would silently drop
        // standing keys. Refuse; resuming the compaction repairs it.
        StateCompaction.requireNoWedge(fs, root, "applyShard",
          "re-run compactShardState to resume it before ingesting")
        fs.listStatus(root)
          .filter(st => st.isDirectory && st.getPath.getName.startsWith("batch="))
          .filter(st => labelBefore(st.getPath.getName.stripPrefix("batch=")))
          .map(_.getPath.toString)
          .toSeq
      }
    }
    def writeIncrement(dir: String, inc: DataFrame): Unit = {
      val dest = s"$dir/batch=$shardLabel"
      if (replayVerify) {
        // explainShard's READ-ONLY replay: the ingest contract says the
        // recomputed increment is byte-equivalent to the persisted
        // own-label slice — but the contract must be a CHECK, not a doc
        // line, because the caller supplies the shard frame and a
        // trimmed/edited frame would otherwise silently rewrite the
        // standing url/exact/signature indexes from wrong data and
        // corrupt every future ingest. Recompute, compare (count +
        // order-independent content fingerprint, the Integrity recipe),
        // and refuse on mismatch — nothing is ever written.
        val p = new org.apache.hadoop.fs.Path(dest)
        val dfs = p.getFileSystem(spark.sessionState.newHadoopConf())
        require(dfs.exists(p),
          s"explainShard: $dest does not exist — shard $shardLabel was " +
            "never ingested into this state dir (replay explains an " +
            "existing ingest; for a dry run use CurationPipeline.explain)")
        val existing = spark.read.parquet(dest)
        require(existing.columns.sorted.sameElements(inc.columns.sorted),
          s"explainShard: recomputed increment for $dest carries columns " +
            s"(${inc.columns.sorted.mkString(", ")}) but the persisted slice " +
            s"holds (${existing.columns.sorted.mkString(", ")}) — the state " +
            "was written by a different build; re-ingest before explaining")
        val (nNew, fpNew) = incrementFp(inc)
        val (nOld, fpOld) = incrementFp(existing)
        require(nNew == nOld && fpNew.compareTo(fpOld) == 0,
          s"explainShard: the recomputed increment for $dest does not match " +
            s"the persisted slice (rows $nNew vs $nOld) — the passed shard " +
            "frame is not the one originally ingested under label " +
            s"$shardLabel (trimmed/edited rows, or a different aux table). " +
            "Refusing: a replay from wrong data would attribute fates to " +
            "indexes the real ingest never built. Pass the original shard " +
            "frame byte-for-byte.")
      } else {
        inc.write.mode("overwrite").parquet(dest)
        // A re-delivered shard overwrites a path this session has already
        // read — drop the cached file listing or later reads in the same
        // session die on the vanished old part files.
        spark.catalog.refreshByPath(dest)
      }
    }
    def readOwn(dir: String): DataFrame =
      spark.read.parquet(s"$dir/batch=$shardLabel")
    def asIdType(c: org.apache.spark.sql.Column) =
      c.cast(df.schema(idCol).dataType).as(idCol)

    // explainShard filters sinks out before replaying; this backstop
    // keeps any future replay caller from publishing a release slice.
    require(!replayVerify || (!step.isInstanceOf[Sink] &&
      !step.isInstanceOf[SinkTar] && !step.isInstanceOf[SinkTokens]),
      "read-only replay must never reach a terminal sink step")

    step match {
      case UrlDedup(urlCol) =>
        require(df.columns.contains(urlCol),
          s"url_dedup: no '$urlCol' column on the shard frame " +
            s"(have: ${df.columns.mkString(", ")})")
        val dir = stateSub("url_index")
        val prior = priorBatches(dir)
        val shardGroups = graft.plans.Materialize(
          UrlCuration.dedupByUrl(df, urlCol, idCol))
        // Increment = groups whose url is NEW to the index (touched
        // urls keep their standing keeper — membership alone decides
        // future drops), so batch dirs stay disjoint and the union IS
        // the index. Shard-restriction: the anti-join only needs index
        // urls the shard holds, so the index side cuts to an
        // 8-byte-hash broadcast semi-join match (false positives fail
        // the exact equality) — a columnar scan, never a per-shard
        // shuffle of the standing index.
        val fresh =
          if (prior.isEmpty) shardGroups
          else shardGroups.join(
            spark.read.parquet(prior: _*).select("url_norm")
              .join(broadcast(shardGroups.select(xxhash64(col("url_norm")).as("__uh"))),
                xxhash64(col("url_norm")) === col("__uh"), "left_semi"),
            Seq("url_norm"), "left_anti")
        writeIncrement(dir, fresh)
        df.join(readOwn(dir).select(asIdType(col("keeper"))), Seq(idCol), "left_semi")

      case DedupExact =>
        val dir = stateSub("exact_index")
        val prior = priorBatches(dir)
        val keepers = graft.plans.Materialize(df
          .groupBy(xxhash64(col(textCol)).as("__h"), length(col(textCol)).as("__len"))
          .agg(min(col(idCol).cast("long")).as("__id")))
        // Shard-restriction: the key IS already a hash — broadcast the
        // shard's key set into a semi-join so the standing index
        // contributes a columnar scan, never a per-shard shuffle.
        val fresh =
          if (prior.isEmpty) keepers
          else keepers.join(
            spark.read.parquet(prior: _*).select("__h", "__len")
              .join(broadcast(keepers.select("__h", "__len")),
                Seq("__h", "__len"), "left_semi"),
            Seq("__h", "__len"), "left_anti")
        writeIncrement(dir, fresh)
        df.join(readOwn(dir).select(asIdType(col("__id"))), Seq(idCol), "left_semi")

      case DedupLines(minChars, sep) =>
        val dir = stateSub("line_index")
        val prior = priorBatches(dir) match {
          case Seq() =>
            spark.createDataFrame(
              spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
              org.apache.spark.sql.types.StructType(Seq(
                org.apache.spark.sql.types.StructField("line",
                  org.apache.spark.sql.types.StringType),
                org.apache.spark.sql.types.StructField("first_doc",
                  org.apache.spark.sql.types.LongType),
                org.apache.spark.sql.types.StructField("first_line",
                  org.apache.spark.sql.types.IntegerType))))
          case ds => spark.read.parquet(ds: _*)
            .select("line", "first_doc", "first_line")
        }
        writeIncrement(dir,
          Dedup.lineIndexIncrement(df, prior, minChars, sep, textCol, idCol).coalesce(1))
        val rewritten = Dedup
          .dedupLinesIncremental(df, prior, minChars, sep, textCol, idCol)
          .filter(col("n_kept") > 0)
          .select(asIdType(col("doc_id")), col(textCol))
        df.drop(textCol).join(rewritten, Seq(idCol))

      case DedupMinhash(threshold, numHashes, bands, shingleN) =>
        val dir = stateSub("minhash_index")
        val prior = priorBatches(dir)
        // The index holds EVERY doc reaching this step (kept or dropped)
        // — dropped near-dups still contribute edges in the full-run
        // union graph, so they must keep dropping future arrivals.
        writeIncrement(dir, Dedup.minhashIndex(df, numHashes, shingleN, textCol, idCol))
        val index =
          if (prior.isEmpty) readOwn(dir).limit(0) // bootstrap: empty standing corpus
          else spark.read.parquet(prior: _*)
        val pairs = Dedup.minhashLshIncremental(
          df, index, threshold, numHashes, bands, shingleN,
          textCol = textCol, idCol = idCol)
        val drop = Dedup.duplicateClusters(pairs)
          .filter(col("doc_id") =!= col("cluster_rep"))
          .select(asIdType(col("doc_id")))
        df.join(drop, Seq(idCol), "left_anti")

      case DedupSimhash(maxHamming, maxBucket) =>
        val dir = stateSub("simhash_index")
        val prior = priorBatches(dir)
        // Same index discipline as minhash: every doc reaching the step
        // contributes its signature (kept or dropped — it still carries
        // edges in the union graph).
        writeIncrement(dir, Dedup.simhashIndex(df, textCol, idCol))
        val index =
          if (prior.isEmpty) readOwn(dir).limit(0)
          else spark.read.parquet(prior: _*)
        val pairs = Dedup.simhashIncremental(
          df, index, maxHamming, maxBucket, textCol, idCol)
        val drop = Dedup.duplicateClusters(pairs)
          .filter(col("doc_id") =!= col("cluster_rep"))
          .select(asIdType(col("doc_id")))
        df.join(drop, Seq(idCol), "left_anti")

      case DedupEmbedding(embTable, threshold, bands, bits, maxBucket) =>
        // The hyperplanes are DETERMINISTIC hash-seeded functions of the
        // vector — no fitted state — so shard ingest needs only the
        // persisted (vec_id, embedding) rows of every doc that reached
        // this step (kept or dropped: union-graph discipline, like
        // minhash/simhash). Only dedup_semantic/sample_diverse, whose
        // fits are over the LIVE corpus, stay corpus-global.
        val dir = stateSub("embedding_index")
        val prior = priorBatches(dir)
        val emb = liveEmbeddings(df, idCol, embTable, aux, "dedup_embedding")
        writeIncrement(dir, emb.select("vec_id", "embedding"))
        val corpus =
          if (prior.isEmpty) readOwn(dir).limit(0)
          else spark.read.parquet(prior: _*).select("vec_id", "embedding")
        val pairs = Dedup.embeddingNearDupIncremental(
          emb, corpus, threshold, bands, bits, maxBucket)
        val drop = Dedup.duplicateClusters(pairs)
          .filter(col("doc_id") =!= col("cluster_rep"))
          .select(asIdType(col("doc_id")))
        df.join(drop, Seq(idCol), "left_anti")

      case DedupNgram(threshold, metric, shingleN) =>
        val dir = stateSub("ngram_index")
        val prior = priorBatches(dir)
        // The index holds EVERY doc reaching the step (kept or dropped)
        // — same union-graph discipline as minhash/simhash, and the same
        // documented no-retroactive-drop asymmetry.
        // The (doc_id, s, n, rk) index is ADDITIVE (per-doc set sizes
        // and write-time batch-local ranks — see Dedup.ngramIndex), so
        // the batch-dir union IS the standing index: no union-level df
        // or rank ever recomputes at ingest.
        writeIncrement(dir, Dedup.ngramIndex(df, shingleN, textCol, idCol))
        val index =
          if (prior.isEmpty) readOwn(dir).limit(0)
          else {
            val raw = spark.read.parquet(prior: _*)
            // Migration gate: a standing dir persisted by the
            // pre-additive (doc_id, s) format would otherwise die on an
            // opaque unresolved-column error at the select below — the
            // additive columns (n, rk) cannot be derived from old rows,
            // so the remedy is a re-index, said loudly.
            require(Seq("n", "rk").forall(raw.columns.contains),
              s"ngram_index under $dir was persisted with the " +
                "pre-additive (doc_id, s) format — delete the state " +
                "subdir and re-ingest (the additive index carries " +
                "per-doc set sizes and write-time ranks that old rows " +
                "do not hold)")
            raw.select("doc_id", "s", "n", "rk")
          }
        val pairs = metric match {
          case "jaccard" => Dedup.ngramJaccardIncremental(
            df, index, threshold, shingleN, textCol, idCol)
          case _ => Dedup.ngramContainmentIncremental(
            df, index, threshold, shingleN, textCol, idCol)
        }
        val drop = Dedup.duplicateClusters(pairs)
          .filter(col("doc_id") =!= col("cluster_rep"))
          .select(asIdType(col("doc_id")))
        df.join(drop, Seq(idCol), "left_anti")

      case DedupWinnow(minShared, k, w, maxBucket) =>
        val dir = stateSub("winnow_index")
        val prior = priorBatches(dir)
        // Selected fingerprints are doc-local, so the batch-dir union IS
        // the standing winnowIndex; the ubiquity cap re-evaluates over
        // the union inside winnowIncremental.
        writeIncrement(dir, Dedup.winnowIndex(df, k, w, textCol, idCol))
        val index =
          if (prior.isEmpty) readOwn(dir).limit(0)
          else spark.read.parquet(prior: _*).select("doc_id", "fp")
        val pairs = Dedup.winnowIncremental(
          df, index, minShared, k, w, maxBucket, textCol, idCol)
        val drop = Dedup.duplicateClusters(pairs)
          .filter(col("doc_id") =!= col("cluster_rep"))
          .select(asIdType(col("doc_id")))
        df.join(drop, Seq(idCol), "left_anti")

      case SubstringRemove(k) =>
        val dir = stateSub("substring_index")
        val prior = priorBatches(dir)
        // Window COUNTS are additive across batches, and the incremental
        // span test fires on (shard occurrences + any index occurrence),
        // so the plain batch-dir union IS the standing count index.
        writeIncrement(dir, Dedup.substringIndex(df, k, textCol, idCol))
        val index =
          if (prior.isEmpty) readOwn(dir).limit(0)
          else spark.read.parquet(prior: _*)
        val rewritten = Dedup
          .removeDuplicateSpansIncremental(df, index, k, textCol, idCol)
          .select(asIdType(col("doc_id")), col("text").as(textCol))
        df.drop(textCol).join(rewritten, Seq(idCol))

      case DedupPhash(maxHamming, payloadCol) =>
        require(df.columns.contains(payloadCol),
          s"dedup_phash: no binary payload column '$payloadCol' on the shard frame " +
            s"(have: ${df.columns.mkString(", ")})")
        val dir = stateSub("phash_index")
        val prior = priorBatches(dir)
        val media = df.select(col(idCol).cast("long").as("media_id"),
          col(payloadCol).cast("binary").as("payload"))
        // Only the shard is ever DECODED, and only ONCE: the persisted
        // state increment IS the shard's signature frame, so the pair
        // step reads it back instead of re-decoding the payloads. The
        // index holds every doc reaching the step, kept or dropped.
        writeIncrement(dir, PerceptualHash.signatures(media))
        val index =
          if (prior.isEmpty) readOwn(dir).limit(0)
          else spark.read.parquet(prior: _*)
        val pairs = PerceptualHash.dedupIncrementalSigs(readOwn(dir), index, maxHamming)
        val drop = Dedup.duplicateClusters(pairs)
          .filter(col("doc_id") =!= col("cluster_rep"))
          .select(asIdType(col("doc_id")))
        df.join(drop, Seq(idCol), "left_anti")

      case DedupAfp(maxHamming, payloadCol) =>
        require(df.columns.contains(payloadCol),
          s"dedup_afp: no binary payload column '$payloadCol' on the shard frame " +
            s"(have: ${df.columns.mkString(", ")})")
        val dir = stateSub("afp_index")
        val prior = priorBatches(dir)
        val media = df.select(col(idCol).cast("long").as("media_id"),
          col(payloadCol).cast("binary").as("payload"))
        // Only the shard is ever DECODED, and only ONCE: the persisted
        // state increment IS the shard's fingerprint frame, so the pair
        // step reads it back instead of re-running the WAV-parse + FFT
        // pass. The index holds every clip reaching the step.
        writeIncrement(dir, AudioFingerprint.signatures(media))
        val index =
          if (prior.isEmpty) readOwn(dir).limit(0)
          else spark.read.parquet(prior: _*)
        val pairs = AudioFingerprint.dedupIncrementalSigs(readOwn(dir), index, maxHamming)
        val drop = Dedup.duplicateClusters(pairs)
          .filter(col("doc_id") =!= col("cluster_rep"))
          .select(asIdType(col("doc_id")))
        df.join(drop, Seq(idCol), "left_anti")

      case DedupVideo(minShared, frameBytes, stride, payloadCol) =>
        require(df.columns.contains(payloadCol),
          s"dedup_video: no binary payload column '$payloadCol' on the shard frame " +
            s"(have: ${df.columns.mkString(", ")})")
        val dir = stateSub("video_index")
        val prior = priorBatches(dir)
        val media = df.select(col(idCol).cast("long").as("media_id"),
          col(payloadCol).cast("binary").as("payload"))
        // Only the shard is ever sliced+hashed, and only ONCE: the
        // persisted state increment IS the shard's frame-signature
        // frame, read back for the pair step. The index holds every
        // clip reaching the step (kept or dropped).
        writeIncrement(dir,
          VideoFingerprint.signatures(media, frameBytes, stride))
        val index =
          if (prior.isEmpty) readOwn(dir).limit(0)
          else spark.read.parquet(prior: _*)
        val pairs = VideoFingerprint.dedupIncrementalSigs(
          readOwn(dir), index, minShared)
        val drop = Dedup.duplicateClusters(pairs)
          .filter(col("doc_id") =!= col("cluster_rep"))
          .select(asIdType(col("doc_id")))
        df.join(drop, Seq(idCol), "left_anti")

      case PerplexityKeep(maxPpl, vocabSize) =>
        // Fit-once / serve-many (the CCNet split): the first shard's
        // frame AS CURATED fits the LM; every later shard is scored as
        // served. Delete the state dir to re-bootstrap deliberately.
        val dir = stateSub("lm")
        val root = new org.apache.hadoop.fs.Path(s"$dir/_SUCCESS")
        val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
        if (!fs.exists(root)) {
          require(!replayVerify,
            s"explainShard: the fit-once LM dir $dir is missing its " +
              "completion marker — the state was never ingested with this " +
              "pipeline (or the fit crashed); a read-only replay refuses " +
              "to fit state")
          Vocabulary.unigramLm(df, vocabSize, textCol, idCol)
            .write.mode("overwrite").parquet(dir)
        }
        val keep = Vocabulary
          .perplexity(df, spark.read.parquet(dir), textCol, idCol)
          .filter(col("ppl") <= maxPpl)
          .select(asIdType(col("doc_id")))
        df.join(keep, Seq(idCol), "left_semi")

      case Sink(path, partitionBy) =>
        // The shard's release slice: its own shard= dir (the tarSink
        // batch-dir convention) — re-delivery overwrites itself, and
        // the accumulated layout reads as one corpus.
        val dest = s"$path/shard=$shardLabel"
        val w = df.write.mode("overwrite")
        (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).parquet(dest)
        spark.catalog.refreshByPath(dest)
        spark.read.parquet(dest)

      case SinkTar(path, targetShardBytes) =>
        // Terminal WebDataset release in SHARD-INGEST mode: the shard's
        // curated docs become their own `batch=<label>/shard-*.tar`
        // slice (the tarSink layout, so scanTar reads the accumulated
        // release as one corpus with batch-qualified shard labels and
        // per-slice _SUCCESS markers). Re-delivery overwrites its own
        // batch dir byte-identically (writeTar is a pure function of
        // the slice rows); the returned frame is the OWN slice decoded
        // as a loader would read it — the batch SinkTar contract,
        // restricted to this shard.
        require(Seq(org.apache.spark.sql.types.ByteType,
          org.apache.spark.sql.types.ShortType, org.apache.spark.sql.types.IntegerType,
          org.apache.spark.sql.types.LongType).contains(df.schema(idCol).dataType),
          s"sink_tar: id column '$idCol' must be integral (member names are " +
            s"<id>.<ext>), got ${df.schema(idCol).dataType.simpleString}")
        // Appending a slice beside an unfinished release compaction
        // buries the folded slices' loss — same refusal as curationSink.
        locally {
          val root = new org.apache.hadoop.fs.Path(path)
          val rfs = root.getFileSystem(spark.sessionState.newHadoopConf())
          StateCompaction.requireNoWedge(rfs, root, "sink_tar",
            "re-run WebDataset.compactTarRelease to resume it before appending slices")
        }
        // Lineage cut before the triple consumption (null-count guard,
        // writeTarAuto's byte-sum aggregate, the tar write): without it
        // each pass re-executes the whole curated chain — every dedup
        // join upstream — three times per shard.
        val cut = graft.plans.Materialize(df)
        val hasLang = cut.columns.contains("lang")
        val members = Seq("txt" -> textCol) ++ (if (hasLang) Seq("cls" -> "lang") else Nil)
        val nNull = cut.filter(members.map { case (_, c) => col(c).isNull }
          .reduce(_ || _)).count()
        require(nNull == 0,
          s"sink_tar: $nNull rows carry null ${members.map(_._2).mkString("/")} — " +
            "tar members would decode as empty strings, silently rewriting the " +
            "corpus; drop or fill nulls upstream, or release via the parquet 'sink'")
        val dest = s"$path/batch=$shardLabel"
        graft.sources.WebDataset.writeTarAuto(cut, dest, targetShardBytes, idCol, members)
        val m = graft.sources.WebDataset.samples(
          graft.sources.WebDataset.scanTar(spark, dest), members.map(_._1))
        val stats = m.agg(count(lit(1)).as("n"),
          countDistinct(col("shard")).as("s"),
          sum(octet_length(col("txt"))).as("b")).head()
        // Slice manifest, batch-keyed beside the shards: reading
        // `$path/manifest` yields every slice's rows with a `batch`
        // partition column (scanTar's *.tar glob never sees parquet).
        writeManifest(s"$path/manifest/batch=$shardLabel", spark, Seq(
          "kind" -> "sink_tar", "n_docs" -> stats.getLong(0).toString,
          "n_shards" -> stats.getLong(1).toString,
          "n_text_bytes" -> stats.getLong(2).toString))
        val base = Seq(
          col("key").cast(df.schema(idCol).dataType).as(idCol),
          regexp_extract(col("shard"), "(\\d+)$", 1).cast("int").as("shard"),
          decode(col("txt"), "UTF-8").as(textCol))
        m.select(base ++
          (if (hasLang) Seq(decode(col("cls"), "UTF-8").as("lang")) else Nil): _*)

      case SinkTokens(path, budgetTokens, vocabSize, buckets, targetShardBytes,
          tokenizer, numMerges, maxPieceLen, byteLevel) =>
        // Terminal PRE-TOKENIZED release in SHARD-INGEST mode. The
        // tokenizer model and the frequency-ranked vocab are corpus
        // fits — on an unbounded ingest they follow the CCNet fit/serve
        // split exactly like the `perplexity` step's LM: fit ONCE on
        // the FIRST shard's frame as curated, persist beside the
        // release (`$path/tokenizer`, `$path/vocab`), and serve every
        // later shard. The vocab dir's _SUCCESS is the fit-once marker
        // (written LAST, after any tokenizer model — a crash between
        // refits both). Packed buckets shift to the shard's own range
        // (`bucket + label*buckets`, the tokenSink convention) so the
        // `(bucket, seq)` keys stay collision-free corpus-wide and
        // TokenShards.scanTokens reads the whole standing `$path/shards`
        // layout directly. Re-delivery overwrites its own batch dir
        // identically (same prior state -> same curated frame -> same
        // persisted vocab -> same pack).
        val label = shardLabel.toLongOption.getOrElse(
          throw new IllegalArgumentException(
            s"sink_tokens: shard label '$shardLabel' is not numeric — terminal " +
              "token releases key packed buckets by label*buckets, so shard-ingest " +
              "labels must be integers (every other step accepts free-form labels; " +
              "relabel the ingest, e.g. 0,1,2,... in delivery order)"))
        require(label < Int.MaxValue.toLong / buckets,
          s"sink_tokens: shard label $label overflows the bucket id range " +
            s"(buckets=$buckets)")
        val vocabDir = s"$path/vocab"
        val fitMarker = new org.apache.hadoop.fs.Path(s"$vocabDir/_SUCCESS")
        val mfs = fitMarker.getFileSystem(spark.sessionState.newHadoopConf())
        // Appending a slice beside an unfinished release compaction
        // buries the folded slices' loss — same refusal as curationSink.
        StateCompaction.requireNoWedge(mfs,
          new org.apache.hadoop.fs.Path(s"$path/shards"), "sink_tokens",
          "re-run WebDataset.compactTarRelease to resume it before appending slices")
        // Lineage cut: the curated frame feeds the tokenizer fit, the
        // vocab fit and the pack (up to three full evaluations of the
        // upstream dedup chain on the fitting shard without it).
        val cut = graft.plans.Materialize(df)
        def mkStream(d: DataFrame): DataFrame = tokenizer match {
          case "rank" => Packing.tokenStream(d, Packing.WordTokenizer, textCol, idCol)
          case "bpe" => Packing.tokenStream(d,
            Packing.BpeTokenizer(spark.read.parquet(s"$path/tokenizer"), byteLevel),
            textCol, idCol)
          case "unigram" => Packing.tokenStream(d,
            Packing.UnigramTokenizer(spark.read.parquet(s"$path/tokenizer"), maxPieceLen),
            textCol, idCol)
          case other => throw new IllegalArgumentException(
            s"sink_tokens: unknown tokenizer '$other' (expected rank, bpe, or unigram)")
        }
        if (!mfs.exists(fitMarker)) {
          tokenizer match {
            case "bpe" =>
              graft.functions.Bpe.learnMerges(cut, numMerges = numMerges,
                textCol = textCol, byteLevel = byteLevel)
                .write.mode("overwrite").parquet(s"$path/tokenizer")
            case "unigram" =>
              graft.functions.Unigram.learnPieces(
                cut, vocabSize = vocabSize, maxPieceLen = maxPieceLen, textCol = textCol)
                .write.mode("overwrite").parquet(s"$path/tokenizer")
            case _ => ()
          }
          Packing.rankVocabFromTokens(mkStream(cut), vocabSize)
            .write.mode("overwrite").parquet(vocabDir)
        }
        val vocabBack = spark.read.parquet(vocabDir)
        val packed = Packing
          .packTokenIdsFrom(mkStream(cut), vocabBack, budgetTokens, buckets)
          .withColumn("bucket", (col("bucket") + lit(label * buckets)).cast("int"))
        Packing.tokenTar(packed, s"$path/shards/batch=$shardLabel", targetShardBytes)
        val back = graft.sources.TokenShards.scanTokens(
          spark, s"$path/shards/batch=$shardLabel")
        val stats = back.agg(count(lit(1)).as("s"),
          coalesce(sum(col("n")), lit(0L)).as("t"),
          coalesce(sum(size(col("ids")) - size(array_remove(col("ids"), 0))), lit(0L))
            .as("oov")).head()
        // Words/bytes of the CURATED text ride in each shard's manifest
        // so the fertility/OOV drift gate (tokenizerDrift) reads rates
        // from manifest rows alone — never a release-sized re-scan.
        val textStats = cut.agg(
          coalesce(sum(size(filter(split(lower(col(textCol)), " "), t => t =!= ""))
            .cast("long")), lit(0L)).as("w"),
          coalesce(sum(octet_length(col(textCol)).cast("long")), lit(0L)).as("b")).head()
        writeManifest(s"$path/manifest/batch=$shardLabel", spark, Seq(
          "kind" -> "sink_tokens", "n_seqs" -> stats.getLong(0).toString,
          "n_tokens" -> stats.getLong(1).toString,
          "oov_tokens" -> stats.getLong(2).toString,
          "n_words" -> textStats.getLong(0).toString,
          "n_text_bytes" -> textStats.getLong(1).toString,
          "budget" -> budgetTokens.toString, "buckets" -> buckets.toString,
          "tokenizer" -> tokenizer, "byte_level" -> byteLevel.toString))
        back

      case s @ (Clean | NormalizeNfc | Redact | GopherQuality | StripHtml |
          DedupSoft |
          _: LangIdKeep | _: Quality | _: C4LineFilter | _: PhraseBlocklist |
          _: RepetitionFilter | _: CompressFilter | _: LangIdTrigramKeep |
          _: Decontam | _: DecontamEmbedding | _: QualityModel |
          _: ContainerMetaFilter |
          _: Split | _: Shuffle | _: Chunk) =>
        // Stateless per-document steps (and probe/model-table steps,
        // whose state is the aux frame): identical in both regimes.
        applyStep(df, s, idCol, textCol, aux)

      case other =>
        throw new IllegalArgumentException(
          s"shard-ingest mode does not support step '${stepName(other)}': " +
            "corpus-level mixing/sampling and the live-corpus embedding " +
            "fits (dedup_semantic/sample_diverse) are corpus-global — run " +
            "them over the standing release with " +
            "CurationPipeline.finalizeRelease once the ingest is complete")
    }
  }

  /** Per-step survivor counts — the curation funnel report every
    * large-scale pipeline publishes ("which step dropped 90% of the
    * corpus?"): one row per step `(step_idx, step, rows_out)` plus the
    * input row as step −1. Costs one count action per step (each a
    * map-side-combined aggregate over that prefix of the chain) — a
    * diagnostic run, not the production path; run it on a sampled corpus
    * when the full one is expensive.
    */
  def funnel(docs: DataFrame, pipeline: Pipeline,
      idCol: String = "doc_id", textCol: String = "text",
      aux: Map[String, DataFrame] = Map.empty): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val names = pipeline.steps.map(stepName)
    val counts = pipeline.steps.scanLeft(docs)(
      (df, step) => applyStep(df, step, idCol, textCol, aux))
      .map(_.count())
    (("input" +: names).zipWithIndex.map { case (nm, i) => (i - 1, nm, counts(i)) })
      .toDF("step_idx", "step", "rows_out")
  }

  /** Per-document drop PROVENANCE — the ops question "why did doc X
    * disappear from the release?": replay the pipeline ONCE, check the
    * probe ids' survival at every step boundary, and report each
    * probe's fate — the name of the step that dropped it, or `kept`.
    * Probe sets are ops-sized by contract (a takedown ticket, a user
    * complaint — never a corpus): bounded at 10k ids loudly, and
    * membership checks are broadcast semi-joins against each boundary
    * (one `Materialize` lineage cut per step, so boundary i+1 reuses
    * boundary i's frame instead of recomputing the prefix — total cost
    * ≈ one pipeline run plus N probe-sized collects). Terminal sink
    * steps are refused — an explain must never write a release.
    * Steps that duplicate ids (upsample/mix) count a probe as
    * surviving while ANY copy lives; `chunk` keeps the doc grain's id
    * column on its output, so provenance flows through it unchanged.
    *
    * @return one row per probe id: (doc_id, fate) with fate = the
    *         dropping step's name or `kept`, ordered by doc_id.
    */
  def explain(docs: DataFrame, pipeline: Pipeline, probeIds: DataFrame,
      idCol: String = "doc_id", textCol: String = "text",
      aux: Map[String, DataFrame] = Map.empty): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    pipeline.steps.foreach { s =>
      require(!s.isInstanceOf[Sink] && !s.isInstanceOf[SinkTar] &&
          !s.isInstanceOf[SinkTokens],
        s"explain: step '${stepName(s)}' writes a release — provenance " +
          "replay must never publish; drop the sink step")
    }
    require(probeIds.columns.length == 1,
      s"explain: probeIds must be a single-column id frame, got " +
        s"(${probeIds.columns.mkString(", ")})")
    val probes = probeIds
      .select(col(probeIds.columns.head).cast("long").as("__pid"))
      .na.drop().distinct().limit(10001)
      .as[Long].collect().sorted
    require(probes.length <= 10000,
      "explain: more than 10k probe ids — provenance is an ops query " +
        "over a ticket-sized id set, not a corpus pass (run the pipeline " +
        "and diff outputs instead)")
    val probeDf = probes.toSeq.toDF("__pid")
    val frames = pipeline.steps.scanLeft(docs)((df, step) =>
      graft.plans.Materialize(applyStep(df, step, idCol, textCol, aux)))
    val names = pipeline.steps.map(stepName)
    val aliveAt = frames.map { f =>
      f.join(broadcast(probeDf), f(idCol).cast("long") === col("__pid"), "left_semi")
        .select(col(idCol).cast("long")).distinct()
        .as[Long].collect().toSet
    }
    val fates = probes.map { id =>
      if (!aliveAt.head.contains(id)) (id, "absent")
      else {
        val firstGone = aliveAt.indexWhere(!_.contains(id))
        (id, if (firstGone < 0) "kept" else names(firstGone - 1))
      }
    }
    fates.toSeq.toDF("doc_id", "fate").orderBy("doc_id")
  }

  /** [[explain]] for the SHARD-INGEST face — "why did doc X vanish from
    * shard 7's slice?": replay shard `shardLabel`'s [[applyShard]] pass
    * step by step against the standing state and report each probe's
    * fate, INCLUDING drops the standing indexes caused (batch-mode
    * [[explain]] cannot see those — they come from prior shards'
    * state, not from the replayed frame).
    *
    * Replay safety: the replay is READ-ONLY. Stateful steps re-run with
    * the SAME label, and by the [[applyShard]] idempotence contract each
    * recomputed increment equals the persisted own-label slice — but
    * that contract is ENFORCED, not assumed: each increment is
    * recomputed, compared against the existing `batch=<label>` slice
    * (row count + the order/layout-independent Integrity content
    * fingerprint), and a mismatch refuses loudly having written nothing
    * — so a caller passing a trimmed or edited shard frame cannot
    * corrupt the standing indexes. Terminal sink steps are SKIPPED (they
    * drop nothing, and an explain must never write a release slice);
    * the `_pipeline` fingerprint is still checked against the FULL
    * pipeline, sink included, because that is what the state dir was
    * built with. The state dir must already carry an ingest
    * (`_pipeline` present) — provenance is an ops query over state
    * that exists, not a dry run (use batch [[explain]] for that).
    *
    * WINNER attribution: for the exact-key first-wins index families
    * the dropping row is a direct index lookup, so the report names
    * the prior doc that won — `url_dedup` (the standing keeper of the
    * probe's normalized url) and `dedup_exact` (the standing keeper of
    * its (hash, length) text key). Both read the key-disjoint index
    * slices up to and including this shard, so an intra-shard loss
    * names the shard's own keeper. Other dropping steps report a null
    * winner: the signature families drop through transitive cluster
    * election and line dedup drops a doc line-by-line to many prior
    * docs — no single index row "wins", and naming one would be false
    * precision (the fate still names the index family).
    *
    * Fold horizon: a compaction/purge that folded labels >= this
    * shard's destroyed the strictly-earlier prior view, so per-step
    * fates are unreconstructible (after an erasure purge, deliberately
    * so). Such probes get the honest layout-level answer instead:
    * fate = `folded into batch=c<k>` (plus `by <op>` when a `_purge/`
    * receipt names the pass), null winner, no replay, nothing written.
    *
    * @return one row per probe id: (doc_id, fate, winner) with fate =
    *         the dropping step's name, `kept`, `absent`, or the
    *         fold-horizon answer above, and winner = the standing
    *         keeper's id for url/exact drops (else null), ordered by
    *         doc_id.
    */
  def explainShard(shard: DataFrame, pipeline: Pipeline,
      stateDir: String, shardLabel: String, probeIds: DataFrame,
      idCol: String = "doc_id", textCol: String = "text",
      aux: Map[String, DataFrame] = Map.empty): DataFrame = {
    val spark = shard.sparkSession
    import spark.implicits._
    require(shardLabel.matches("[0-9]+"),
      s"explainShard: shardLabel '$shardLabel' must be numeric (the " +
        "applyShard label grammar)")
    val fpPath = new org.apache.hadoop.fs.Path(s"$stateDir/_pipeline")
    val fs = fpPath.getFileSystem(spark.sessionState.newHadoopConf())
    require(fs.exists(fpPath),
      s"explainShard: $stateDir carries no _pipeline fingerprint — it was " +
        "never ingested into; shard provenance replays an existing ingest " +
        "(for a dry run, use CurationPipeline.explain)")
    val in = fs.open(fpPath)
    val existing = try new String(in.readAllBytes(), "UTF-8") finally in.close()
    require(existing == pipeline.steps.map(_.toString).mkString("\n"),
      "explainShard: pipeline differs from the one this state dir was " +
        "built with — the replay would misread position-keyed indexes")
    // The replay's meaning rests on reconstructing the ORIGINAL prior
    // view (strictly-earlier labels). A compaction or purge that folded
    // labels >= this shard's into a batch=c<k> dir destroyed it: the
    // prior slices (and the shard's own slice) are gone, so the
    // recomputed increments could never verify against the fold — and
    // after an erasure purge the original view is unreconstructible by
    // design.
    val folds = fs
      .listStatus(new org.apache.hadoop.fs.Path(stateDir))
      .filter(st => st.isDirectory && st.getPath.getName.matches("step[0-9]+=.*"))
      .flatMap { st =>
        fs.listStatus(st.getPath)
          .filter(c => c.isDirectory && c.getPath.getName.startsWith("batch=c"))
          .map(c => c.getPath.getName -> StateCompaction.labelOrd(
            c.getPath.getName.stripPrefix("batch="), "explainShard"))
      }
      .filter(_._2 >= shardLabel.toLong)
    require(probeIds.columns.length == 1,
      s"explainShard: probeIds must be a single-column id frame, got " +
        s"(${probeIds.columns.mkString(", ")})")
    val probes = probeIds
      .select(col(probeIds.columns.head).cast("long").as("__pid"))
      .na.drop().distinct().limit(10001)
      .as[Long].collect().sorted
    require(probes.length <= 10000,
      "explainShard: more than 10k probe ids — provenance is an ops query " +
        "over a ticket-sized id set, not a corpus pass")
    if (folds.nonEmpty) {
      // The HONEST soft answer for a folded-away shard (instead of a
      // hard refusal): per-step fates are unreconstructible, but the
      // fold that consumed the shard's era is a fact the layout (and a
      // purge's `_purge/` receipt, when one exists) still records —
      // exactly what a takedown audit needs to hear. No replay runs and
      // nothing is written.
      val foldName = folds.maxBy(_._2)._1
      val fate = s"folded into $foldName" +
        latestFoldOp(fs, stateDir).map(op => s" by $op").getOrElse("")
      return probes.toSeq.map(id => (id, fate, Option.empty[Long]))
        .toDF("doc_id", "fate", "winner").orderBy("doc_id")
    }
    val probeDf = probes.toSeq.toDF("__pid")

    // Replay with ORIGINAL step positions (state subdirs are keyed by
    // position), sinks skipped.
    val replay = pipeline.steps.zipWithIndex.filterNot { case (s, _) =>
      s.isInstanceOf[Sink] || s.isInstanceOf[SinkTar] || s.isInstanceOf[SinkTokens]
    }
    val frames = replay.scanLeft(shard) { case (df, (step, i)) =>
      graft.plans.Materialize(
        applyStepShard(df, step, i, stateDir, shardLabel, idCol, textCol, aux,
          replayVerify = true))
    }
    val aliveAt = frames.map { f =>
      f.join(broadcast(probeDf), f(idCol).cast("long") === col("__pid"), "left_semi")
        .select(col(idCol).cast("long")).distinct()
        .as[Long].collect().toSet
    }
    // fate + the index of the dropping replay step (-1 = none).
    val fates: Seq[(Long, String, Int)] = probes.toSeq.map { id =>
      if (!aliveAt.head.contains(id)) (id, "absent", -1)
      else {
        val g = aliveAt.indexWhere(!_.contains(id))
        if (g < 0) (id, "kept", -1)
        else (id, stepName(replay(g - 1)._1), g - 1)
      }
    }

    // Winner lookups — one small job per (first-wins step with drops):
    // the probe's key from the step's INPUT frame (earlier steps may
    // have rewritten text/urls) joined against the index slices with
    // label <= this shard's (key-disjoint, so exactly one keeper row
    // per key; the replay verified the own-label slice untouched).
    def indexSlices(stepIdx: Int, kind: String): Seq[String] = {
      val root = new org.apache.hadoop.fs.Path(s"$stateDir/step$stepIdx=$kind")
      if (!fs.exists(root)) Seq.empty
      else fs.listStatus(root)
        .filter(st => st.isDirectory && st.getPath.getName.startsWith("batch="))
        .filter(st => StateCompaction.labelOrd(
          st.getPath.getName.stripPrefix("batch="), "explainShard") <= shardLabel.toLong)
        .map(_.getPath.toString).toSeq
    }
    val winners: Map[Long, Long] = fates.filter(_._3 >= 0).groupBy(_._3)
      .flatMap { case (replayIdx, dropped) =>
        val (step, stepIdx) = replay(replayIdx)
        val droppedDf = dropped.map(_._1).toDF("__pid")
        val inputF = frames(replayIdx)
        def collectWinners(keyed: DataFrame, idx: DataFrame,
            keyCols: Seq[String], winCol: String): Seq[(Long, Long)] =
          keyed.join(broadcast(droppedDf),
              col(idCol).cast("long") === col("__pid"), "left_semi")
            .join(idx, keyCols)
            .select(col(idCol).cast("long"), col(winCol).cast("long"))
            .collect().map(r => r.getLong(0) -> r.getLong(1)).toSeq
        step match {
          case UrlDedup(urlCol) =>
            val slices = indexSlices(stepIdx, "url_index")
            if (slices.isEmpty) Seq.empty
            else collectWinners(
              inputF.select(col(idCol),
                UrlCuration.normalizeUrl(col(urlCol)).as("url_norm")),
              spark.read.parquet(slices: _*).select("url_norm", "keeper"),
              Seq("url_norm"), "keeper")
          case DedupExact =>
            val slices = indexSlices(stepIdx, "exact_index")
            if (slices.isEmpty) Seq.empty
            else collectWinners(
              inputF.select(col(idCol), xxhash64(col(textCol)).as("__h"),
                length(col(textCol)).as("__len")),
              spark.read.parquet(slices: _*).select("__h", "__len", "__id"),
              Seq("__h", "__len"), "__id")
          case _ => Seq.empty
        }
      }
    fates.map { case (id, fate, _) =>
      (id, fate, winners.get(id))
    }.toDF("doc_id", "fate", "winner").orderBy("doc_id")
  }

  /** Fertility/OOV drift gate for a STANDING `sink_tokens` release —
    * the [[graft.operators.ProductQuant.servingRecall]] /
    * `bm25_index_drift` analogue for tokenization: the shard-ingest
    * token sink fits its vocab ONCE (on the first shard) and serves it
    * to every later shard, so a corpus whose language/domain mix drifts
    * tokenizes progressively worse — fertility climbs and the
    * byte-fallback/UNK mass (reserved id 0) grows — with no error
    * anywhere. This gate compares the NEWEST shard's manifest numbers
    * against the ACCEPTED baseline (all strictly-earlier shards,
    * volume-weighted by summing their raw counts), reading ONLY the
    * per-shard manifest rows the sink already wrote — never a
    * release-sized re-scan. Alert/refit on a ratio far from 1 (the
    * caller's bar), exactly how servingRecall decides an ANN refit.
    *
    * Config divergence (tokenizer kind, byte mode, budget) is an ERROR,
    * not a stat: shards packed under different configs are not
    * comparable — that release needs re-ingesting, not monitoring.
    *
    * @return one row per stat — `n_tokens_per_shard` (the accepted side
    *         averaged over its shards, so a healthy mature release reads
    *         ≈1 like every other stat), `oov_rate`, `tokens_per_kb`,
    *         `tokens_per_word` — as (stat, old_val, new_val, ratio),
    *         the indexStatsDiff shape; a stat is null when a
    *         denominator is zero or when ANY contributing shard's
    *         manifest predates its input fields (mixed-era sets must
    *         not produce a silently skewed number).
    */
  def tokenizerDrift(spark: SparkSession, releaseDir: String): DataFrame = {
    import spark.implicits._
    val root = new org.apache.hadoop.fs.Path(s"$releaseDir/manifest")
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    require(fs.exists(root),
      s"tokenizerDrift: $releaseDir carries no manifest/ batch slices — " +
        "not a shard-mode sink_tokens release")
    val labeled = fs.listStatus(root)
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("batch="))
      .map(st => StateCompaction.labelOrd(
        st.getPath.getName.stripPrefix("batch="), "tokenizerDrift") ->
        st.getPath.toString)
      .sortBy(_._1).toSeq
    require(labeled.length >= 2,
      "tokenizerDrift: needs >= 2 shard manifests — the newest shard is " +
        "judged against the accepted prior shards")
    // Manifests are one tiny (key, value) frame per shard — driver-side
    // folds are exactly right here. PER-BATCH maps, not one pooled
    // multimap: a fertility rate summed over only the shards that carry
    // the field against a token mass summed over ALL shards would be a
    // silently wrong number — a stat goes null unless EVERY contributing
    // shard carries its inputs (mixed-era manifests stay honest).
    def kv(path: String): Map[String, String] =
      spark.read.parquet(path).select("key", "value").collect()
        .map(r => r.getString(0) -> r.getString(1)).toMap
    val prior = labeled.dropRight(1).map(m => kv(m._2))
    val newest = kv(labeled.last._2)
    Seq("tokenizer", "byte_level", "budget").foreach { k =>
      val all = (prior.flatMap(_.get(k)) ++ newest.get(k)).distinct
      require(all.size <= 1,
        s"tokenizerDrift: shard manifests disagree on '$k' " +
          s"(${all.mkString(" vs ")}) — the release was packed under " +
          "different configs; re-ingest into a fresh release")
    }
    def round6(x: Double): Double = math.rint(x * 1e6) / 1e6
    def rates(ms: Seq[Map[String, String]]): Map[String, Option[Double]] = {
      def sumOf(k: String): Option[Double] = {
        val vs = ms.map(_.get(k).flatMap(_.toLongOption))
        if (vs.exists(_.isEmpty)) None else Some(vs.flatten.sum.toDouble)
      }
      val (t, o) = (sumOf("n_tokens"), sumOf("oov_tokens"))
      val (w, b) = (sumOf("n_words"), sumOf("n_text_bytes"))
      def r(num: Option[Double], den: Option[Double]) =
        for { nn <- num; d <- den if d != 0d } yield round6(nn / d)
      Map(
        // Volume is reported PER SHARD (the accepted side averages over
        // its shards): a newest-vs-cumulative-total ratio would drift
        // mechanically toward 0 as a healthy release matures, breaking
        // the "alert on ratio far from 1" contract every other stat
        // follows.
        "n_tokens_per_shard" -> t.map(x => round6(x / ms.length)),
        "oov_rate" -> r(o, t),
        "tokens_per_word" -> r(t, w),
        "tokens_per_kb" -> r(t.map(_ * 1024.0), b))
    }
    val (o, n) = (rates(prior), rates(Seq(newest)))
    Seq("n_tokens_per_shard", "oov_rate", "tokens_per_kb", "tokens_per_word").map { st =>
      val ratio = for { a <- o(st); b <- n(st) if a != 0d } yield round6(b / a)
      (st, o(st), n(st), ratio)
    }.toDF("stat", "old_val", "new_val", "ratio").orderBy("stat")
  }

  private def stepName(s: Step): String = s match {
    case Clean => "clean"
    case NormalizeNfc => "normalize"
    case Redact => "redact"
    case LangIdKeep(_) => "langid_keep"
    case Quality(_, _) => "quality"
    case GopherQuality => "gopher"
    case StripHtml => "strip_html"
    case DedupSoft => "dedup_soft"
    case C4LineFilter(_, _) => "c4_filter"
    case PhraseBlocklist(_) => "blocklist"
    case TemperatureSample(_, _, _) => "temperature"
    case WeightedSample(_, _) => "weighted_sample"
    case DedupExact => "dedup_exact"
    case Quota(_, _) => "quota"
    case Split(_) => "split"
    case Shuffle(_, _) => "shuffle"
    case Chunk(_, _) => "chunk"
    case Decontam(_, _, _) => "decontaminate"
    case PerplexityKeep(_, _) => "perplexity"
    case DedupMinhash(_, _, _, _) => "dedup_minhash"
    case TokenBudget(_, _) => "token_budget"
    case PerplexityRank(_, _, _) => "perplexity_rank"
    case Upsample(_, _) => "upsample"
    case MixUnimax(_, _, _) => "mix_unimax"
    case UrlDedup(_) => "url_dedup"
    case SubstringRemove(_) => "substring_remove"
    case DedupLines(_, _) => "dedup_lines"
    case QualityModel(_, _) => "quality_model"
    case RepetitionFilter(_, _, _, _, _) => "repetition"
    case CompressFilter(_, _) => "compress"
    case LangIdTrigramKeep(_) => "langid_trigram_keep"
    case DedupSimhash(_, _) => "dedup_simhash"
    case DedupNgram(_, _, _) => "dedup_ngram"
    case DedupWinnow(_, _, _, _) => "dedup_winnow"
    case DedupPhash(_, _) => "dedup_phash"
    case DedupAfp(_, _) => "dedup_afp"
    case DedupVideo(_, _, _, _) => "dedup_video"
    case ContainerMetaFilter(_, _, _) => "container_meta"
    case DedupEmbedding(_, _, _, _, _) => "dedup_embedding"
    case DedupSemantic(_, _, _, _) => "dedup_semantic"
    case SampleDiverse(_, _, _) => "sample_diverse"
    case ImportanceSample(_, _, _, _) => "importance_sample"
    case DecontamEmbedding(_, _, _) => "decontaminate_embedding"
    case Sink(_, _) => "sink"
    case SinkTar(_, _) => "sink_tar"
    case SinkTokens(_, _, _, _, _, _, _, _, _) => "sink_tokens"
  }

  /** Resolve an auxiliary embedding frame and restrict it to the ids
    * still alive in `df` — `dedup_semantic`/`sample_diverse` must fit on
    * the corpus AS CURATED SO FAR, not on embeddings of dropped docs.
    *
    * Coverage policy (explicit, checked): the embedding-driven steps
    * require EVERY live id to (a) cast losslessly to the long `vec_id`
    * key and (b) appear in the embedding table. Without the check,
    * failures are silent and the two steps disagree — a non-castable id
    * nulls out of the semi-join, so `dedup_semantic` degrades to a no-op
    * while `sample_diverse` drops every row; a merely-unembedded doc is
    * invisibly kept by the former (never marked `keep=false`) and
    * invisibly dropped by the latter (never clustered). Incomplete
    * coverage therefore fails loudly here, naming the table and counts;
    * pre-filter the corpus to the embedded subset if partial coverage is
    * intended. The guard costs one thin ids⟕vec_ids aggregate at
    * compile time — these steps already run eager centroid fits, so the
    * compile stage is an action boundary regardless.
    */
  private def liveEmbeddings(df: DataFrame, idCol: String, embTable: String,
      aux: Map[String, DataFrame], stepName: String): DataFrame = {
    val embAll = aux.getOrElse(embTable, throw new IllegalArgumentException(
      s"$stepName step names auxiliary embedding table '$embTable' but the " +
        s"compiler was given ${if (aux.isEmpty) "none" else aux.keys.mkString(", ")}"))
    require(embAll.columns.contains("vec_id") && embAll.columns.contains("embedding"),
      s"$stepName: auxiliary table '$embTable' must carry (vec_id, embedding), " +
        s"got ${embAll.columns.mkString(", ")}")
    // try_cast: under ANSI semantics a plain cast THROWS on the first
    // non-numeric id instead of reaching this guard's counted verdict.
    val probe = df.select(col(idCol).as("__raw"), col(idCol).try_cast("long").as("vec_id"))
      .join(embAll.select(col("vec_id"), lit(1).as("__has")), Seq("vec_id"), "left")
      .agg(count(lit(1)).as("n"),
        count(when(col("vec_id").isNull && col("__raw").isNotNull, 1)).as("bad_cast"),
        count(when(col("vec_id").isNotNull && col("__has").isNull, 1)).as("uncovered"))
      .head()
    val (n, badCast, uncovered) = (probe.getLong(0), probe.getLong(1), probe.getLong(2))
    require(badCast == 0L,
      s"$stepName: $badCast of $n live '$idCol' values do not cast to the long " +
        s"vec_id key of '$embTable' — non-numeric ids would silently null out of " +
        "the embedding join. Map ids to a numeric key before this step.")
    require(uncovered == 0L,
      s"$stepName: $uncovered of $n live ids have no embedding in '$embTable' — " +
        "unembedded docs would be silently kept by dedup_semantic but dropped by " +
        "sample_diverse. Provide full-coverage embeddings or pre-filter the corpus " +
        "to the embedded subset.")
    embAll.join(df.select(col(idCol).cast("long").as("vec_id")), Seq("vec_id"), "left_semi")
  }

  private def applyStep(df: DataFrame, step: Step, idCol: String, textCol: String,
      aux: Map[String, DataFrame]): DataFrame =
    step match {
      case Clean =>
        df.withColumn(textCol, Texts.cleanText(col(textCol)))
      case NormalizeNfc =>
        df.withColumn(textCol, Texts.normalizeNfc(col(textCol)))
      case Redact =>
        df.withColumn(textCol, Texts.redactPii(col(textCol)))
      case LangIdKeep(langs) =>
        df.filter(Texts.langId(col(textCol)).isin(langs: _*))
      case Quality(minTokens, maxPunct) =>
        val metrics = Texts.qualityMetrics(col(textCol)).toMap
        val conds =
          minTokens.map(n => metrics("n_tokens") >= n).toSeq ++
            maxPunct.map(r => metrics("punct_ratio") <= r).toSeq
        df.filter(conds.reduce(_ && _))
      case GopherQuality =>
        df.filter(Texts.gopherKeep(col(textCol)))
      case StripHtml =>
        df.withColumn(textCol, Texts.stripHtml(col(textCol)))
      case C4LineFilter(minWords, minSentences) =>
        // Pure map-side: per-doc line filter (lines are few — the
        // per-element HOF is per-document scalar work, the Texts.scala
        // caveat's acceptable case) then the sentence-count gate on the
        // REWRITTEN text. Zero exchanges.
        val kept = array_join(
          filter(split(col(textCol), "\n"), l =>
            rtrim(l).rlike("[.!?\"]$") &&
              size(filter(split(l, " "), t => t =!= "")) >= minWords), "\n")
        df.withColumn(textCol, kept)
          .filter(regexp_count(col(textCol), lit("[.!?]")) >= minSentences)
      case TemperatureSample(totalN, alpha, group) =>
        require(df.columns.contains(group),
          s"temperature: group column '$group' absent from the curated frame " +
            s"(have: ${df.columns.mkString(", ")})")
        val keep = Sampling.temperatureSample(df, totalN, alpha, group, idCol)
          .select(col(idCol).cast(df.schema(idCol).dataType).as(idCol))
        df.join(keep, Seq(idCol), "left_semi")
      case PhraseBlocklist(phrases) =>
        // Case-insensitive literal contains, pure codegen map-side —
        // C4 drops the whole page on any hit.
        df.filter(phrases.map(p =>
          col(textCol).isNull ||
            !contains(lower(col(textCol)), lit(p.toLowerCase))).reduce(_ && _))
      case DedupSoft =>
        // Appends (n_copies, weight); the thin-key join back keeps rows.
        val wts = Dedup.softDedupWeights(df, textCol, idCol)
          .select(col("doc_id").cast(df.schema(idCol).dataType).as(idCol),
            col("n_copies"), col("weight"))
        df.join(wts, Seq(idCol))
      case WeightedSample(k, wcol) =>
        require(df.columns.contains(wcol),
          s"weighted_sample: no '$wcol' column in the curated frame " +
            s"(have: ${df.columns.mkString(", ")}) — add a dedup_soft step " +
            "first or name an existing weight column via weight_col")
        val keep = Sampling.weightedSample(
          df.select(col(idCol), col(wcol)), k, wcol, idCol)
          .select(col(idCol).cast(df.schema(idCol).dataType).as(idCol))
        df.join(keep, Seq(idCol), "left_semi")
      case DedupExact =>
        // Keep the lowest id of each exact-text group: thin (hash, id)
        // aggregate + semi-join, the dedup_exact shape.
        val keep = df
          .groupBy(xxhash64(col(textCol)).as("__h"), length(col(textCol)).as("__len"))
          .agg(min(col(idCol)).as(idCol))
          .select(idCol)
        df.join(keep, Seq(idCol), "left_semi")
      case Quota(group, quotas) =>
        val keep = Sampling.quotaSample(df, quotas, group, idCol).select(idCol)
        df.join(keep, Seq(idCol), "left_semi")
      case Split(fractions) =>
        Sampling.splitAssign(df, fractions, idCol)
      case Shuffle(shards, seed) =>
        // Post-upsample frames are keyed by (id, copy): the hash mixes
        // the copy index in so repeats scatter across shards.
        val copyCol = Option.when(df.columns.contains("copy"))("copy")
        df.join(
          Sampling.shuffleShards(df, shards, idCol, copyCol, seed),
          idCol +: copyCol.toSeq)
      case Chunk(chars, overlap) =>
        Chunking.chunk(df, chars, overlap, idCol, textCol)
      case Decontam(probesTable, ngram, minMatches) =>
        val probes = aux.getOrElse(probesTable, throw new IllegalArgumentException(
          s"decontaminate step names auxiliary table '$probesTable' but the " +
            s"compiler was given ${if (aux.isEmpty) "none" else aux.keys.mkString(", ")}"))
        val hits = Decontaminate.matches(df, probes, ngram, textCol, idCol, textCol)
          .filter(col("matched_ngrams") >= minMatches)
          .select(col("doc_id").as(idCol))
        df.join(hits, Seq(idCol), "left_anti")
      case PerplexityKeep(maxPpl, vocabSize) =>
        // Self-perplexity: the LM is fit on the frame AS CURATED SO FAR,
        // so earlier filters shape the reference distribution (the CCNet
        // ordering). ppl is the operator's 4-decimal-rounded value.
        val keep = Vocabulary.perplexity(df, vocabSize, textCol, idCol)
          .filter(col("ppl") <= maxPpl)
          .select(col("doc_id").as(idCol))
        df.join(keep, Seq(idCol), "left_semi")
      case DedupMinhash(threshold, numHashes, bands, shingleN) =>
        val pairs = Dedup.minhashLsh(
          df, threshold, numHashes, bands, shingleN, textCol = textCol, idCol = idCol)
        val drop = Dedup.duplicateClusters(pairs)
          .filter(col("doc_id") =!= col("cluster_rep"))
          .select(col("doc_id").cast(df.schema(idCol).dataType).as(idCol))
        df.join(drop, Seq(idCol), "left_anti")
      case TokenBudget(budgets, group) =>
        val sized = df.withColumn("__nt",
          size(filter(split(lower(col(textCol)), " "), t => t =!= "")).cast("long"))
        val keep = Sampling.tokenBudgetSample(sized, budgets, group, "__nt", idCol)
          .select(col(idCol))
        df.join(keep, Seq(idCol), "left_semi")
      case Upsample(factors, group) =>
        // In-place (map-side) — the operator-then-join-back form would
        // shuffle the corpus by id twice for nothing.
        Sampling.upsampleWithCopies(df, factors, group, idCol).drop("n_copies")
      case MixUnimax(totalTokens, maxEpochs, group) =>
        // Token counts feed the PLAN only; the copies apply in place
        // (broadcast plan join + explode — same shape as upsample).
        Sampling.unimaxSample(
          df.withColumn("__nt",
            size(filter(split(lower(col(textCol)), " "), t => t =!= "")).cast("long")),
          totalTokens, maxEpochs, group, "__nt", idCol)
          .drop("__nt")
      case UrlDedup(urlCol) =>
        require(df.columns.contains(urlCol),
          s"url_dedup: no '$urlCol' column on the input frame " +
            s"(have: ${df.columns.mkString(", ")})")
        // First-crawl-wins selection: the thin (url_norm, id) aggregate
        // picks each group's keeper, then a semi-join keeps those rows.
        val keep = UrlCuration.dedupByUrl(df, urlCol, idCol)
          .select(col("keeper").cast(df.schema(idCol).dataType).as(idCol))
        df.join(keep, Seq(idCol), "left_semi")
      case SubstringRemove(k) =>
        // The operator returns the rewritten (id, text) grain; join the
        // surviving columns back on the id key (one id-keyed shuffle —
        // the rewrite itself already clustered by id).
        val rewritten = Dedup.removeDuplicateSpans(df, k, textCol, idCol)
          .select(col("doc_id").cast(df.schema(idCol).dataType).as(idCol),
            col("text").as(textCol))
        df.drop(textCol).join(rewritten, Seq(idCol))
      case DedupLines(minChars, sep) =>
        // Same rewritten-grain join-back as substring_remove; husks
        // (zero kept lines) leave the corpus here — a selection step,
        // like the quality gates, not a silent empty-text carrier.
        val rewritten = Dedup.dedupLines(df, minChars, sep, textCol, idCol)
          .filter(col("n_kept") > 0)
          .select(col("doc_id").cast(df.schema(idCol).dataType).as(idCol),
            col(textCol))
        df.drop(textCol).join(rewritten, Seq(idCol))
      case QualityModel(modelTable, minScore) =>
        val model = aux.getOrElse(modelTable, throw new IllegalArgumentException(
          s"quality_model step names auxiliary weight frame '$modelTable' but the " +
            s"compiler was given ${if (aux.isEmpty) "none" else aux.keys.mkString(", ")}"))
        val keep = QualityClassifier.score(df, model, idCol, textCol)
          .filter(col("quality") >= minScore)
          .select(col(idCol).cast(df.schema(idCol).dataType).as(idCol))
        df.join(keep, Seq(idCol), "left_semi")
      case RepetitionFilter(maxDupTok, maxDupBg, maxTopBg, maxDupLn, maxDupLnCh) =>
        // The Gopher Table A1 LINE thresholds are pure map-side column
        // predicates — applied directly, no metrics join needed.
        val lineM = Texts.dupLineMetrics(col(textCol)).toMap
        val lineConds =
          maxDupLn.map(t => lineM("frac_dup_lines") <= t).toSeq ++
            maxDupLnCh.map(t => lineM("frac_dup_line_chars") <= t)
        val afterLines =
          if (lineConds.isEmpty) df else df.filter(lineConds.reduce(_ && _))
        // Null bigram metrics (single-token docs) pass their thresholds:
        // absence of evidence, not spam evidence.
        val tokConds0 = maxDupTok.toSeq ++ maxDupBg ++ maxTopBg
        if (tokConds0.isEmpty) afterLines
        else {
          val m = Repetition.repetitionMetrics(afterLines, textCol, idCol)
          val conds =
            maxDupTok.map(t => m("dup_token_frac") <= t).toSeq ++
              maxDupBg.map(t => m("dup_bigram_frac").isNull || m("dup_bigram_frac") <= t) ++
              maxTopBg.map(t => m("top_bigram_frac").isNull || m("top_bigram_frac") <= t)
          val keep = m.filter(conds.reduce(_ && _))
            .select(col("doc_id").cast(df.schema(idCol).dataType).as(idCol))
          afterLines.join(keep, Seq(idCol), "left_semi")
        }
      case CompressFilter(minR, maxR) =>
        // Empty docs have a null ratio: no compressibility evidence → kept
        // (the quality/repetition gates are the right tool for them).
        val r = Compressibility.compressionRatio(df, textCol, idCol)
        val conds =
          minR.map(t => col("compress_ratio").isNull || col("compress_ratio") >= t).toSeq ++
            maxR.map(t => col("compress_ratio").isNull || col("compress_ratio") <= t)
        val keep = r.filter(conds.reduce(_ && _))
          .select(col("doc_id").cast(df.schema(idCol).dataType).as(idCol))
        df.join(keep, Seq(idCol), "left_semi")
      case LangIdTrigramKeep(langs) =>
        val keep = LangIdTrigram.classifyAll(df, textCol, idCol)
          .filter(col("pred_lang").isin(langs: _*))
          .select(col("doc_id").cast(df.schema(idCol).dataType).as(idCol))
        df.join(keep, Seq(idCol), "left_semi")
      case PerplexityRank(frac, group, vocabSize) =>
        val ppl = Vocabulary.perplexity(df, vocabSize, textCol, idCol)
          .select(col("doc_id").as(idCol), col("ppl"))
        val keep = Sampling.topFractionByScore(
          df.join(ppl, Seq(idCol)).withColumn("score", -col("ppl")),
          frac, "score", group, idCol)
          .select(col(idCol))
        df.join(keep, Seq(idCol), "left_semi")
      case DedupSimhash(maxHamming, maxBucket) =>
        val pairs = Dedup.simhash(df, maxHamming, maxBucket, textCol, idCol)
        val drop = Dedup.duplicateClusters(pairs)
          .filter(col("doc_id") =!= col("cluster_rep"))
          .select(col("doc_id").cast(df.schema(idCol).dataType).as(idCol))
        df.join(drop, Seq(idCol), "left_anti")
      case DedupNgram(threshold, metric, shingleN) =>
        val pairs = metric match {
          case "jaccard" => Dedup.ngramJaccard(df, threshold, shingleN, textCol, idCol)
          case _ => Dedup.ngramContainment(df, threshold, shingleN, textCol, idCol)
        }
        val drop = Dedup.duplicateClusters(pairs)
          .filter(col("doc_id") =!= col("cluster_rep"))
          .select(col("doc_id").cast(df.schema(idCol).dataType).as(idCol))
        df.join(drop, Seq(idCol), "left_anti")
      case DedupWinnow(minShared, k, w, maxBucket) =>
        val pairs = Dedup.winnow(df, minShared, k, w, maxBucket, textCol, idCol)
        val drop = Dedup.duplicateClusters(pairs)
          .filter(col("doc_id") =!= col("cluster_rep"))
          .select(col("doc_id").cast(df.schema(idCol).dataType).as(idCol))
        df.join(drop, Seq(idCol), "left_anti")
      case DedupPhash(maxHamming, payloadCol) =>
        require(df.columns.contains(payloadCol),
          s"dedup_phash: no binary payload column '$payloadCol' on the frame " +
            s"(have: ${df.columns.mkString(", ")})")
        val pairs = PerceptualHash.dedup(
          df.select(col(idCol).cast("long").as("media_id"),
            col(payloadCol).cast("binary").as("payload")),
          maxHamming)
        val drop = Dedup.duplicateClusters(pairs)
          .filter(col("doc_id") =!= col("cluster_rep"))
          .select(col("doc_id").cast(df.schema(idCol).dataType).as(idCol))
        df.join(drop, Seq(idCol), "left_anti")
      case DedupAfp(maxHamming, payloadCol) =>
        require(df.columns.contains(payloadCol),
          s"dedup_afp: no binary payload column '$payloadCol' on the frame " +
            s"(have: ${df.columns.mkString(", ")})")
        val pairs = AudioFingerprint.dedup(
          df.select(col(idCol).cast("long").as("media_id"),
            col(payloadCol).cast("binary").as("payload")),
          maxHamming)
        val drop = Dedup.duplicateClusters(pairs)
          .filter(col("doc_id") =!= col("cluster_rep"))
          .select(col("doc_id").cast(df.schema(idCol).dataType).as(idCol))
        df.join(drop, Seq(idCol), "left_anti")
      case DedupVideo(minShared, frameBytes, stride, payloadCol) =>
        require(df.columns.contains(payloadCol),
          s"dedup_video: no binary payload column '$payloadCol' on the frame " +
            s"(have: ${df.columns.mkString(", ")})")
        val pairs = VideoFingerprint.dedup(
          df.select(col(idCol).cast("long").as("media_id"),
            col(payloadCol).cast("binary").as("payload")),
          frameBytes, minShared, stride)
        val drop = Dedup.duplicateClusters(pairs)
          .filter(col("doc_id") =!= col("cluster_rep"))
          .select(col("doc_id").cast(df.schema(idCol).dataType).as(idCol))
        df.join(drop, Seq(idCol), "left_anti")
      case ContainerMetaFilter(formats, maxDurMs, payloadCol) =>
        require(df.columns.contains(payloadCol),
          s"container_meta: no binary payload column '$payloadCol' on the frame " +
            s"(have: ${df.columns.mkString(", ")})")
        // The YAML parser guards this too, but programmatic construction
        // must fail with the same named error, not an empty.reduce crash.
        require(formats.nonEmpty || maxDurMs.nonEmpty,
          "container_meta needs formats and/or max_duration_ms — an " +
            "unconstrained gate would keep everything")
        val meta = Multimodal.containerMeta(
          df.select(col(idCol).cast("long").as("media_id"),
            col(payloadCol).cast("binary").as("payload")))
        val conds =
          (if (formats.nonEmpty) Seq(col("container").isin(formats: _*)) else Nil) ++
            maxDurMs.map(m => col("duration_ms").isNotNull && col("duration_ms") <= m)
        val keep = meta.filter(conds.reduce(_ && _))
          .select(col("media_id").cast(df.schema(idCol).dataType).as(idCol))
        df.join(keep, Seq(idCol), "left_semi")
      case DedupEmbedding(embTable, threshold, bands, bits, maxBucket) =>
        val emb = liveEmbeddings(df, idCol, embTable, aux, "dedup_embedding")
        val pairs = Dedup.embeddingNearDup(emb, threshold, bands, bits, maxBucket)
        val drop = Dedup.duplicateClusters(pairs)
          .filter(col("doc_id") =!= col("cluster_rep"))
          .select(col("doc_id").cast(df.schema(idCol).dataType).as(idCol))
        df.join(drop, Seq(idCol), "left_anti")
      case DedupSemantic(embTable, threshold, nlist, nprobe) =>
        val emb = liveEmbeddings(df, idCol, embTable, aux, "dedup_semantic")
        val drop = Dedup.semDeDup(emb, threshold, nlist, nprobe)
          .filter(!col("keep"))
          .select(col("vec_id").cast(df.schema(idCol).dataType).as(idCol))
        df.join(drop, Seq(idCol), "left_anti")
      case SampleDiverse(embTable, clusters, perCluster) =>
        val emb = liveEmbeddings(df, idCol, embTable, aux, "sample_diverse")
        val keep = Sampling.perGroupHead(
          Similarity.clusterAssign(emb, nlist = clusters), perCluster, "cluster", "vec_id")
          .select(col("vec_id").cast(df.schema(idCol).dataType).as(idCol))
        df.join(keep, Seq(idCol), "left_semi")
      case ImportanceSample(targetTable, k, vocabSize, hashBuckets) =>
        val target = aux.getOrElse(targetTable, throw new IllegalArgumentException(
          s"importance_sample step names auxiliary target table '$targetTable' but the " +
            s"compiler was given ${if (aux.isEmpty) "none" else aux.keys.mkString(", ")}"))
        val keep = ImportanceSampling.importanceResample(
          df, target, k, vocabSize, hashBuckets, textCol, idCol)
          .select(col("doc_id").cast(df.schema(idCol).dataType).as(idCol))
        df.join(keep, Seq(idCol), "left_semi")
      case DecontamEmbedding(probesTable, embTable, threshold) =>
        val probes = aux.getOrElse(probesTable, throw new IllegalArgumentException(
          s"decontaminate_embedding step names auxiliary probe table '$probesTable' " +
            s"but the compiler was given ${if (aux.isEmpty) "none" else aux.keys.mkString(", ")}"))
        require(probes.columns.contains("vec_id") && probes.columns.contains("embedding"),
          s"decontaminate_embedding: probe table '$probesTable' must carry " +
            s"(vec_id, embedding), got ${probes.columns.mkString(", ")}")
        val emb = liveEmbeddings(df, idCol, embTable, aux, "decontaminate_embedding")
        val hits = Decontaminate.matchesEmbedding(emb, probes, threshold)
          .select(col("doc_id").cast(df.schema(idCol).dataType).as(idCol))
        df.join(hits, Seq(idCol), "left_anti")
      case Sink(path, partitionBy) =>
        partitionBy.foreach(p => require(df.columns.contains(p),
          s"sink: partition column '$p' absent from the curated frame " +
            s"(have: ${df.columns.mkString(", ")})"))
        val w = df.write.mode("overwrite")
        (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).parquet(path)
        val back = df.sparkSession.read.parquet(path)
        // Dataset-card manifest, computed from the READ-BACK release (the
        // numbers a consumer can re-derive, not the writer's intent).
        // Lives BESIDE the parquet dir — a subdir would pollute
        // spark.read.parquet(path)'s file discovery.
        writeManifest(s"${path}_manifest", df.sparkSession, Seq(
          "kind" -> "sink", "n_docs" -> back.count().toString,
          "partition_by" -> partitionBy.mkString(",")))
        back
      case SinkTar(path, targetShardBytes) =>
        // Tar members are id-keyed — a (id, copy)-keyed frame would
        // collide member names and silently drop repeats.
        require(!df.columns.contains("copy"),
          "sink_tar: frame is keyed (id, copy) after upsample/mix_unimax; " +
            "tar member names are id-keyed — release repeated corpora via the parquet 'sink'")
        require(Seq(org.apache.spark.sql.types.ByteType,
          org.apache.spark.sql.types.ShortType, org.apache.spark.sql.types.IntegerType,
          org.apache.spark.sql.types.LongType).contains(df.schema(idCol).dataType),
          s"sink_tar: id column '$idCol' must be integral (member names are " +
            s"<id>.<ext>), got ${df.schema(idCol).dataType.simpleString}")
        val hasLang = df.columns.contains("lang")
        val members = Seq("txt" -> textCol) ++ (if (hasLang) Seq("cls" -> "lang") else Nil)
        // Lineage cut: null guard + byte-sum aggregate + tar write are
        // three consumers of the curated chain.
        val cut = graft.plans.Materialize(df)
        // Null member payloads write as EMPTY tar members and decode
        // back as "" — a silent corpus rewrite. Refuse with the count
        // (parquet `sink` round-trips nulls; this release format can't).
        val nNull = cut.filter(members.map { case (_, c) => col(c).isNull }
          .reduce(_ || _)).count()
        require(nNull == 0,
          s"sink_tar: $nNull rows carry null ${members.map(_._2).mkString("/")} — " +
            "tar members would decode as empty strings, silently rewriting the " +
            "corpus; drop or fill nulls upstream (e.g. a 'quality' step), or " +
            "release via the parquet 'sink'")
        graft.sources.WebDataset.writeTarAuto(
          cut, path, targetShardBytes, idCol, members)
        // Read-back verification frame: the release as a training loader
        // would decode it (same eager-at-compile semantics as Sink).
        val m = graft.sources.WebDataset.samples(
          graft.sources.WebDataset.scanTar(df.sparkSession, path), members.map(_._1))
        val stats = m.agg(count(lit(1)).as("n"),
          countDistinct(col("shard")).as("s"),
          sum(octet_length(col("txt"))).as("b")).head()
        writeManifest(s"$path/manifest", df.sparkSession, Seq(
          "kind" -> "sink_tar", "n_docs" -> stats.getLong(0).toString,
          "n_shards" -> stats.getLong(1).toString,
          "n_text_bytes" -> stats.getLong(2).toString))
        val base = Seq(
          col("key").cast(df.schema(idCol).dataType).as(idCol),
          regexp_extract(col("shard"), "(\\d+)$", 1).cast("int").as("shard"),
          decode(col("txt"), "UTF-8").as(textCol))
        m.select(base ++ (if (hasLang) Seq(decode(col("cls"), "UTF-8").as("lang")) else Nil): _*)
      case SinkTokens(path, budgetTokens, vocabSize, buckets, targetShardBytes,
          tokenizer, numMerges, maxPieceLen, byteLevel) =>
        // Tokenizer model AND vocab fit on the corpus AS CURATED and
        // persist beside the shards; both are read BACK before use so
        // the release verifies the artifacts a loader would load.
        val spark = df.sparkSession
        // Lineage cut: the curated frame feeds the tokenizer fit, the
        // vocab fit and the pack — without it each consumer re-executes
        // the whole upstream curation chain.
        val cut = graft.plans.Materialize(df)
        val stream = tokenizer match {
          case "rank" => Packing.tokenStream(cut, Packing.WordTokenizer, textCol, idCol)
          case "bpe" =>
            graft.functions.Bpe.learnMerges(cut, numMerges = numMerges,
              textCol = textCol, byteLevel = byteLevel)
              .write.mode("overwrite").parquet(s"$path/tokenizer")
            Packing.tokenStream(cut,
              Packing.BpeTokenizer(spark.read.parquet(s"$path/tokenizer"), byteLevel),
              textCol, idCol)
          case "unigram" =>
            graft.functions.Unigram.learnPieces(
              cut, vocabSize = vocabSize, maxPieceLen = maxPieceLen, textCol = textCol)
              .write.mode("overwrite").parquet(s"$path/tokenizer")
            Packing.tokenStream(cut,
              Packing.UnigramTokenizer(spark.read.parquet(s"$path/tokenizer"), maxPieceLen),
              textCol, idCol)
          // The YAML parser validates this field, but SinkTokens is also
          // constructible programmatically — fail with the config path's
          // message instead of an anonymous MatchError.
          case other => throw new IllegalArgumentException(
            s"sink_tokens: unknown tokenizer '$other' (expected rank, bpe, or unigram)")
        }
        Packing.rankVocabFromTokens(stream, vocabSize)
          .write.mode("overwrite").parquet(s"$path/vocab")
        val vocabBack = spark.read.parquet(s"$path/vocab")
        Packing.tokenTar(
          Packing.packTokenIdsFrom(stream, vocabBack, budgetTokens, buckets),
          s"$path/shards", targetShardBytes)
        val back = graft.sources.TokenShards.scanTokens(spark, s"$path/shards")
        // Release-QA numbers derived from the release AS READ BACK (the
        // writeManifest contract), costing NO extra tokenization pass:
        // n_tokens is the packed sequence mass and the OOV mass is
        // exactly the reserved-id-0 tokens in the packed ids; words and
        // bytes are one thin scan of the curated text (no subword
        // segmentation). Ratios with a zero denominator publish as
        // "undefined", never a silent 0.0.
        val stats = back.agg(count(lit(1)).as("s"),
          coalesce(sum(col("n")), lit(0L)).as("t"),
          coalesce(sum(size(col("ids")) - size(array_remove(col("ids"), 0))), lit(0L))
            .as("oov")).head()
        val (nSeqs, nTokens, nOov) = (stats.getLong(0), stats.getLong(1), stats.getLong(2))
        val textStats = cut.agg(
          coalesce(sum(size(filter(split(lower(col(textCol)), " "), t => t =!= ""))
            .cast("long")), lit(0L)).as("w"),
          coalesce(sum(octet_length(col(textCol)).cast("long")), lit(0L)).as("b")).head()
        val (nWords, nBytes) = (textStats.getLong(0), textStats.getLong(1))
        def ratio(num: Double, den: Double): String =
          if (den == 0d) "undefined" else (math.rint(num / den * 1e4) / 1e4).toString
        writeManifest(s"$path/manifest", spark, Seq(
          "kind" -> "sink_tokens", "n_seqs" -> nSeqs.toString,
          "n_tokens" -> nTokens.toString,
          "vocab_rows" -> vocabBack.count().toString,
          "budget" -> budgetTokens.toString, "buckets" -> buckets.toString,
          // byte_level rides in the manifest because a merge table
          // learned in one mode MUST be applied in the same mode.
          "tokenizer" -> tokenizer, "byte_level" -> byteLevel.toString,
          "tokens_per_word" -> ratio(nTokens.toDouble, nWords.toDouble),
          "tokens_per_kb" -> ratio(nTokens * 1024.0, nBytes.toDouble),
          "oov_rate" -> ratio(nOov.toDouble, nTokens.toDouble)))
        back
    }

  /** One-row dataset-card manifest beside a release: `(key, value)`
    * string pairs (kind-specific keys, documented per sink), every
    * value re-derived from the release AS READ BACK — the manifest
    * states what a consumer can verify, not what the writer intended.
    */
  private def writeManifest(
      path: String, spark: SparkSession, kv: Seq[(String, String)]): Unit = {
    import spark.implicits._
    kv.toDF("key", "value").coalesce(1).write.mode("overwrite").parquet(path)
  }
}
