package graft.config

import scala.jdk.CollectionConverters._

/** Declarative curation-pipeline language — the extension-layer analogue
  * of the cohort task YAML ([[TaskConfig]]): a corpus-curation run is a
  * YAML list of steps, each a named operator with parameters, compiled to
  * one DataFrame chain by [[graft.operators.CurationPipeline]]. The
  * pipeline a 100 TB crawl actually runs (clean → language filter →
  * quality filter → dedup → mix → split → shuffle) becomes config, not
  * code — reviewable, diffable, re-runnable.
  *
  * ```yaml
  * steps:
  *   - clean: {}
  *   - langid_keep: { langs: [en, es] }
  *   - quality: { min_tokens: 5 }
  *   - dedup_exact: {}
  *   - quota: { group: lang, quotas: { en: 50, es: 20 } }
  *   - split: { train: 0.8, val: 0.1, test: 0.1 }
  *   - shuffle: { shards: 4 }
  * ```
  *
  * Parsing is strict: unknown step names and malformed parameter shapes
  * fail fast with the offending step named — a silently-skipped curation
  * step is corpus damage discovered months later.
  */
object CurationConfig {

  sealed trait Step
  case object Clean extends Step
  /** Unicode NFC normalization ([[graft.functions.Texts.normalizeNfc]]) —
    * unify composed/decomposed codepoint variants BEFORE any content
    * keying (dedup, decontamination, tokenization). */
  case object NormalizeNfc extends Step
  final case class LangIdKeep(langs: Seq[String]) extends Step
  final case class Quality(minTokens: Option[Long], maxPunctRatio: Option[Double]) extends Step

  /** C4's LINE-level heuristics (Raffel et al. 2020 §2.2 — the rules
    * applied BEFORE the corpus-wide line dedup): keep only lines ending
    * in terminal punctuation with at least `minWords` words; pages
    * whose kept text carries fewer than `minSentences` sentences
    * (terminal-punct count — the closed-form proxy) drop entirely.
    */
  final case class C4LineFilter(minWords: Int, minSentences: Int) extends Step

  /** C4's content blocklist (Raffel et al. 2020 §2.2: pages containing
    * "lorem ipsum", "javascript", a curly brace, or a bad-word list
    * entry drop entirely): case-insensitive substring match over the
    * caller's phrase list — policy lives in config, not code.
    */
  final case class PhraseBlocklist(phrases: Seq[String]) extends Step

  /** SOFT dedup as a step: keep every duplicate, APPEND `(n_copies,
    * weight)` columns (weight = 1/exact-group size —
    * [[graft.operators.Dedup.softDedupWeights]]); pair with
    * [[WeightedSample]] to draw a budget ∝ weight.
    */
  case object DedupSoft extends Step

  /** Deterministic weighted k-draw without replacement (probability ∝
    * `weightCol` — [[graft.operators.Sampling.weightedSample]]'s
    * Gumbel-max pick); requires the weight column (e.g. from a
    * preceding `dedup_soft`).
    */
  final case class WeightedSample(k: Int, weightCol: String) extends Step

  /** Extract text from crawl HTML payloads (drop script/style blocks,
    * strip tags, decode the common entities, collapse whitespace) — the
    * stage BEFORE `clean` in a web pipeline
    * ([[graft.functions.Texts.stripHtml]]).
    */
  case object StripHtml extends Step

  /** Keep documents passing the composed Gopher §A1.1 shape filters
    * ([[graft.functions.Texts.gopherKeep]] — word count, mean word
    * length, symbol ratio, bullet/ellipsis line fractions, alphabetic
    * share, stopword presence) at the published thresholds.
    */
  case object GopherQuality extends Step
  case object Redact extends Step
  case object DedupExact extends Step
  final case class Quota(group: String, quotas: Map[String, Long]) extends Step
  final case class Split(fractions: Seq[(String, Double)]) extends Step
  /** `seed` varies the permutation per training epoch (closed-form
    * hash offset — see [[graft.operators.Sampling.shuffleShards]]);
    * 0 (the default) is the legacy order. */
  final case class Shuffle(shards: Int, seed: Long) extends Step
  final case class Chunk(chars: Int, overlap: Int) extends Step

  /** Drop documents sharing ≥ `minMatches` word n-grams with the probe
    * frame named `probesTable` (an eval set) — probe sets are TABLES in
    * production, so the step names an auxiliary frame supplied to the
    * compiler rather than inlining strings into config.
    */
  final case class Decontam(probesTable: String, ngram: Int, minMatches: Long) extends Step

  /** Keep documents whose self-perplexity under an add-one unigram LM
    * fit on the surviving corpus is ≤ `maxPpl` (CCNet-style LM filter).
    */
  final case class PerplexityKeep(maxPpl: Double, vocabSize: Int) extends Step

  /** Near-duplicate removal: banded MinHash-LSH pairs at `threshold`
    * Jaccard, connected-component clusters, keep each cluster's min-id
    * member (singletons implicitly kept).
    */
  final case class DedupMinhash(
      threshold: Double, numHashes: Int, bands: Int, shingleN: Int) extends Step

  /** Temperature-smoothed mixing sample (quotas ∝ n_g^alpha over a
    * total doc budget — the exponent smoothing multilingual mixes use,
    * α=1 proportional, α→0 uniform); deterministic hash pick per group
    * ([[graft.operators.Sampling.temperatureSample]]).
    */
  final case class TemperatureSample(
      totalN: Long, alpha: Double, group: String) extends Step

  /** Token-budget mixing: keep each group's deterministic hash-prefix of
    * documents until its TOKEN budget is reached (the unit data mixes
    * are specified in); groups without a budget are dropped.
    */
  final case class TokenBudget(budgets: Map[String, Long], group: String) extends Step

  /** Rank-based LM quality cut: keep the best `keepTopFrac` of each
    * group by self-perplexity (lower = better), LM fit on the frame as
    * curated so far.
    */
  final case class PerplexityRank(
      keepTopFrac: Double, group: String, vocabSize: Int) extends Step

  /** Fractional-epoch upsampling ("2.5 epochs of fr"): each group-g doc
    * repeats ⌊f_g⌋ times plus one hash-picked extra for the fractional
    * part, with explicit `copy` indices; groups without a factor drop.
    * Changes the id key to `(id, copy)`, so only `shuffle` (which keys
    * copies apart) may follow it.
    */
  final case class Upsample(factors: Map[String, Double], group: String) extends Step

  /** UniMax mixing ("uniform over groups, capped at `maxEpochs`
    * repetitions", Chung et al. 2023): plan the allocation with
    * [[graft.operators.Sampling.unimaxPlan]] on the frame as curated so
    * far, then materialize it as `(id, copy)` repeats — the
    * budget-driven alternative to hand-specified [[Upsample]] factors.
    * Duplicates ids like `upsample` does, so only `shuffle` (and a
    * final `sink`) may follow.
    */
  final case class MixUnimax(
      totalTokens: Long, maxEpochs: Double, group: String) extends Step

  /** URL-level dedup (first crawl wins): keep the min-id document of
    * each normalized-URL group. The byte-cost pre-pass of a web
    * pipeline — it must precede every text-processing step (the
    * compiler enforces it), because its whole point is to drop refetches
    * before any per-token work is paid.
    */
  final case class UrlDedup(urlCol: String) extends Step

  /** Excise duplicated ≥`k`-token spans from every document (drop-every-
    * duplicated-token policy, original case preserved) — the Lee et al.
    * 2022 exact-substring transform as a pipeline step; span counting
    * runs on the corpus AS CURATED SO FAR.
    */
  final case class SubstringRemove(k: Int) extends Step

  /** Corpus-wide line dedup (the C4 repeated-line discard / CCNet
    * paragraph dedup): keep each duplicated line's first corpus
    * occurrence, drop the rest, reassemble documents; lines with fewer
    * than `minChars` non-space chars are exempt. Duplicate counting
    * runs on the corpus AS CURATED SO FAR. Docs reduced to zero kept
    * lines are dropped.
    */
  final case class DedupLines(minChars: Int, sep: String) extends Step

  /** Model-based quality filter (the GPT-3 curation stage): score with a
    * fitted [[graft.operators.QualityClassifier]] weight frame named
    * `modelTable` (models are TABLES in production — fit once on a
    * labeled sample, serve everywhere — so the step names an auxiliary
    * frame like `decontaminate`'s probe set) and keep documents with
    * quality ≥ `minScore`.
    */
  final case class QualityModel(modelTable: String, minScore: Double) extends Step

  /** Gopher-style repetition gate: drop documents whose duplicate-token /
    * duplicate-bigram / most-frequent-bigram fractions exceed the given
    * thresholds (each optional; at least one required). Documents too
    * short to have a bigram metric (null) pass that threshold — no
    * evidence is not evidence of spam — but documents with NO tokens at
    * all have no metrics row and are dropped (run `quality` first if
    * empty docs should fail loudly earlier).
    */
  final case class RepetitionFilter(
      maxDupTokenFrac: Option[Double],
      maxDupBigramFrac: Option[Double],
      maxTopBigramFrac: Option[Double],
      maxDupLineFrac: Option[Double] = None,
      maxDupLineCharFrac: Option[Double] = None) extends Step

  /** Compressibility gate (deflate compressed/raw ratio): drop documents
    * below `minRatio` (boilerplate/template spam — compresses too well)
    * or above `maxRatio` (random/binary junk — does not compress).
    */
  final case class CompressFilter(minRatio: Option[Double], maxRatio: Option[Double]) extends Step

  /** Trigram-profile language filter: keep documents whose
    * [[graft.operators.LangIdTrigram]] prediction is in `langs` — the
    * higher-precision sibling of `langid_keep` (script-heuristic). */
  final case class LangIdTrigramKeep(langs: Seq[String]) extends Step

  /** SimHash near-duplicate removal: 64-bit signatures over word
    * unigrams, banded Hamming pairs at ≤ `maxHamming`, connected
    * components, keep each cluster's min-id member — the
    * cheaper/denser-text sibling of `dedup_minhash`.
    */
  final case class DedupSimhash(maxHamming: Int, maxBucketSize: Int) extends Step

  /** Exact n-gram near-duplicate removal over distinct word shingles:
    * prefix-filtered pair generation ([[graft.operators.Dedup]]'s
    * PPJoin plan), connected components, keep each cluster's min-id
    * member. `metric` picks the overlap measure — `jaccard`
    * (symmetric |A∩B|/|A∪B|) or `containment` (asymmetric
    * |A∩B|/min(|A|,|B|), Broder 1997 — the one that catches a short
    * document embedded verbatim in a long one, which Jaccard's union
    * denominator structurally dilutes). Thresholds are NOT comparable
    * between the two metrics (containment ≥ jaccard always).
    */
  final case class DedupNgram(
      threshold: Double, metric: String, shingleN: Int) extends Step

  /** Winnowing near-duplicate removal (Schleimer et al. 2003): per-doc
    * selected k-gram fingerprints (window w), doc pairs sharing ≥
    * `minShared` fingerprints cluster, keep each cluster's min-id
    * member. Fingerprints shared by more than `maxBucketSize` docs are
    * boilerplate, not evidence — dropped before the pair join.
    */
  final case class DedupWinnow(
      minShared: Long, k: Int, w: Int, maxBucketSize: Int) extends Step

  /** LSH-hyperplane embedding near-duplicate removal through an
    * auxiliary `(vec_id, embedding)` table (the `dedup_semantic`
    * convention): banded signed-projection signatures bucket candidate
    * pairs, exact cosine ≥ `threshold` verifies, connected components
    * keep each cluster's min-id member. UNLIKE `dedup_semantic`, the
    * hyperplanes are deterministic hash-seeded functions of the vector
    * (no fitted state), so this step also runs in SHARD-INGEST mode
    * against the persisted vector index.
    */
  final case class DedupEmbedding(
      embTable: String, threshold: Double, bands: Int, bitsPerBand: Int,
      maxBucketSize: Int) extends Step

  /** Image near-dup removal over a binary payload column: dHash
    * perceptual signatures, Hamming-banded pairs at ≤ `maxHamming`,
    * connected components, keep each cluster's min-id member —
    * `dedup_minhash`'s image face
    * ([[graft.operators.PerceptualHash.dedup]]). The MULTIMODAL row
    * convention: the frame carries the media bytes as an opaque binary
    * `payloadCol` beside the id.
    */
  final case class DedupPhash(maxHamming: Int, payloadCol: String) extends Step

  /** Audio near-dup removal over a binary PCM-WAV payload column:
    * Haitsma–Kalker spectral fingerprints
    * ([[graft.operators.AudioFingerprint]]), Hamming-banded pairs at ≤
    * `maxHamming`, connected components, keep each cluster's min-id
    * member — the audio half of the multimodal family (dedup_phash is
    * the image half). Signature-index shard mode like dedup_phash.
    */
  final case class DedupAfp(maxHamming: Int, payloadCol: String) extends Step

  /** Video near-dup removal over a binary stored-raw-frame payload
    * column ([[graft.operators.VideoFingerprint]]): per-frame dHashes
    * at the `frameBytes` lattice, clip pairs by ≥ `minShared` shared
    * distinct frame signatures, connected components, keep each
    * cluster's min-id member — the third multimodal leg (dedup_phash
    * image, dedup_afp audio). Signature-index shard mode like both.
    */
  final case class DedupVideo(
      minShared: Long, frameBytes: Int, stride: Int, payloadCol: String) extends Step

  /** Container-envelope gate (no codec, magic-byte dispatch —
    * [[graft.operators.Multimodal.containerMeta]]): keep documents
    * whose payload parses to a container in `formats` (unparseable
    * payloads are container "opaque", so listing real formats drops
    * corrupt/alien blobs) and, when bounded, whose declared duration is
    * ≤ `maxDurationMs` — the ingest QA gate before any decode cost.
    */
  final case class ContainerMetaFilter(
      formats: Seq[String], maxDurationMs: Option[Long], payloadCol: String) extends Step

  /** SemDeDup semantic near-dup removal (Abbas et al. 2023): embeddings
    * are a TABLE in production (computed by a separate model pass), so
    * the step names an auxiliary `(vec_id, embedding)` frame; documents
    * whose SemDeDup `keep` flag is false drop. The embedding frame is
    * restricted to the ids still alive, so the IVF fit reflects the
    * corpus AS CURATED SO FAR.
    */
  final case class DedupSemantic(
      embTable: String, threshold: Double, nlist: Int, nprobe: Int) extends Step

  /** Cluster-uniform diversity sample: k-means-assign each surviving doc
    * (auxiliary embedding table, same convention as `dedup_semantic`),
    * keep up to `perCluster` hash-picked members per cluster — uniform
    * topic representation instead of frequency-weighted.
    */
  final case class SampleDiverse(embTable: String, clusters: Int, perCluster: Long) extends Step

  /** DSIR importance resampling toward the distribution of an auxiliary
    * TARGET sample table: two unigram feature LMs (target vs the corpus
    * as curated so far), Gumbel top-k over the log likelihood ratio —
    * the "match a target distribution" selector between quality gates
    * and quota mixing. `hashBuckets > 0` switches to the hashed feature
    * space (bounded LM at any corpus size).
    */
  final case class ImportanceSample(
      targetTable: String, k: Int, vocabSize: Int, hashBuckets: Int) extends Step

  /** Embedding-space decontamination: drop documents whose embedding
    * (auxiliary `embeddings` table, the `dedup_semantic` convention) is
    * a cosine near-duplicate of any eval-probe embedding (auxiliary
    * `probes` table, `(vec_id, embedding)`) — the semantic complement
    * of n-gram `decontaminate`, for paraphrased eval passages.
    */
  final case class DecontamEmbedding(
      probesTable: String, embTable: String, threshold: Double) extends Step

  /** Terminal release write: persist the curated frame to `path`
    * (parquet, Hive-partitioned by `partitionBy` — e.g. [split, shard]
    * after `split`/`shuffle` steps) and hand back the read-back frame,
    * so the pipeline's output IS the release as persisted. Must be the
    * final step.
    */
  final case class Sink(path: String, partitionBy: Seq[String]) extends Step

  /** Terminal WebDataset release: persist the curated corpus as
    * byte-budget-sized tar shards (`<id>.txt` text members, plus
    * `<id>.cls` with the `lang` column when present — the training-
    * loader convention) and hand back the DECODED read-back frame, so
    * the gate verifies the release as a loader would actually read it.
    * Must be the final step; refuses `(id, copy)`-keyed frames (tar
    * member names are id-keyed — release repeated corpora via the
    * parquet `sink`).
    */
  final case class SinkTar(path: String, targetShardBytes: Long) extends Step

  /** Terminal PRE-TOKENIZED release: tokenize the curated corpus, fit a
    * frequency-ranked id vocabulary over the emitted tokens, pack into
    * fixed-length token-id sequences, and release int32 binary tar
    * shards to `path/shards` with the vocab table beside them at
    * `path/vocab` (parquet) — the mmap-ready training format, produced
    * inside the language. `tokenizer` picks the stream: `rank`
    * (whitespace words — closed-form, SQL-replayable), `bpe` (merge
    * table learned on the curated corpus, `merges` pairs), or `unigram`
    * (SentencePiece-style piece table, ≤ `vocab` pieces of up to
    * `piece_len` chars); `byte_level: true` switches the BPE alphabet
    * to the GPT-2 byte symbols (unsegmented scripts, zero OOV — the
    * mode rides in the manifest because apply must match learn).
    * Subword models persist at `path/tokenizer` beside the release.
    * Hands back the DECODED read-back sequences. Must be the final
    * step.
    */
  final case class SinkTokens(
      path: String, budgetTokens: Int, vocabSize: Int,
      buckets: Int, targetShardBytes: Long,
      tokenizer: String = "rank", numMerges: Int = 256,
      maxPieceLen: Int = 6, byteLevel: Boolean = false) extends Step

  final case class Pipeline(steps: Seq[Step])

  def fromYaml(yamlText: String): Pipeline = {
    import org.yaml.snakeyaml.{LoaderOptions, Yaml}
    import org.yaml.snakeyaml.constructor.SafeConstructor
    val yaml = new Yaml(new SafeConstructor(new LoaderOptions()))
    val root = Option(yaml.load[java.util.Map[String, Object]](yamlText))
      .getOrElse(throw new IllegalArgumentException("empty curation config"))
    val rawSteps = Option(root.get("steps"))
      .getOrElse(throw new IllegalArgumentException("curation config needs a 'steps' list"))
      .asInstanceOf[java.util.List[Object]].asScala.toSeq
    Pipeline(rawSteps.zipWithIndex.map { case (raw, i) => parseStep(raw, i) })
  }

  private def parseStep(raw: Object, idx: Int): Step = {
    val m = raw match {
      case s: String => Map(s -> Map.empty[String, Object]) // bare `- clean`
      case jm: java.util.Map[_, _] =>
        jm.asScala.map { case (k, v) =>
          k.toString -> Option(v).map {
            case pm: java.util.Map[_, _] =>
              pm.asScala.map { case (pk, pv) => pk.toString -> pv.asInstanceOf[Object] }.toMap
            case other =>
              throw new IllegalArgumentException(
                s"step #$idx ('$k'): parameters must be a map, got $other")
          }.getOrElse(Map.empty[String, Object])
        }.toMap
      case other =>
        throw new IllegalArgumentException(s"step #$idx: expected a map or name, got $other")
    }
    require(m.size == 1, s"step #$idx must have exactly one operator name, got ${m.keys}")
    val (name, params) = m.head

    def longParam(k: String): Option[Long] =
      params.get(k).map { case n: Number => n.longValue }
    def doubleParam(k: String): Option[Double] =
      params.get(k).map { case n: Number => n.doubleValue }
    def need[T](o: Option[T], what: String): T =
      o.getOrElse(throw new IllegalArgumentException(s"step #$idx ('$name') needs $what"))

    name match {
      case "clean"  => Clean
      case "normalize" => NormalizeNfc
      case "redact" => Redact
      case "dedup_exact" => DedupExact
      case "langid_keep" =>
        val langs = need(params.get("langs"), "'langs' (list)")
          .asInstanceOf[java.util.List[Object]].asScala.map(_.toString).toSeq
        require(langs.nonEmpty, s"step #$idx: langid_keep needs a non-empty langs list")
        LangIdKeep(langs)
      case "quality" =>
        val q = Quality(longParam("min_tokens"), doubleParam("max_punct_ratio"))
        require(q.minTokens.nonEmpty || q.maxPunctRatio.nonEmpty,
          s"step #$idx: quality needs min_tokens and/or max_punct_ratio")
        q
      case "gopher" => GopherQuality
      case "strip_html" => StripHtml
      case "dedup_soft" => DedupSoft
      case "temperature" =>
        TemperatureSample(
          need(longParam("total"), "'total' (doc budget)"),
          doubleParam("alpha").getOrElse(0.5),
          params.get("group").map(_.toString).getOrElse("lang"))
      case "blocklist" =>
        val phrases = need(params.get("phrases"), "'phrases' (list)")
          .asInstanceOf[java.util.List[Object]].asScala.map(_.toString).toSeq
        require(phrases.nonEmpty && phrases.forall(_.nonEmpty),
          s"step #$idx: blocklist needs a non-empty list of non-empty phrases")
        PhraseBlocklist(phrases)
      case "c4_filter" =>
        C4LineFilter(
          longParam("min_words").getOrElse(5L).toInt,
          longParam("min_sentences").getOrElse(3L).toInt)
      case "weighted_sample" =>
        WeightedSample(
          need(longParam("k"), "'k' (sample size)").toInt,
          params.get("weight_col").map(_.toString).getOrElse("weight"))
      case "quota" =>
        val group = params.get("group").map(_.toString).getOrElse("lang")
        val quotas = need(params.get("quotas"), "'quotas' (map of group -> n)")
          .asInstanceOf[java.util.Map[Object, Object]].asScala
          .map { case (k, v) => k.toString -> v.asInstanceOf[Number].longValue }.toMap
        Quota(group, quotas)
      case "split" =>
        require(params.nonEmpty, s"step #$idx: split needs name -> fraction entries")
        Split(params.toSeq.map { case (k, v) => k -> v.asInstanceOf[Number].doubleValue }
          .sortBy(_._1))
      case "shuffle" =>
        Shuffle(need(longParam("shards"), "'shards'").toInt,
          longParam("seed").getOrElse(0L))
      case "chunk" =>
        Chunk(need(longParam("chars"), "'chars'").toInt,
          longParam("overlap").getOrElse(0L).toInt)
      case "decontaminate" =>
        Decontam(
          need(params.get("probes").map(_.toString), "'probes' (auxiliary table name)"),
          longParam("ngram").getOrElse(3L).toInt,
          longParam("min_matches").getOrElse(1L))
      case "perplexity" =>
        PerplexityKeep(
          need(doubleParam("max_ppl"), "'max_ppl'"),
          longParam("vocab").getOrElse(1L << 16).toInt)
      case "dedup_minhash" =>
        DedupMinhash(
          need(doubleParam("threshold"), "'threshold'"),
          longParam("num_hashes").getOrElse(64L).toInt,
          longParam("bands").getOrElse(16L).toInt,
          longParam("shingle_n").getOrElse(3L).toInt)
      case "token_budget" =>
        val budgets = need(params.get("budgets"), "'budgets' (map of group -> tokens)")
          .asInstanceOf[java.util.Map[Object, Object]].asScala
          .map { case (k, v) => k.toString -> v.asInstanceOf[Number].longValue }.toMap
        TokenBudget(budgets, params.get("group").map(_.toString).getOrElse("lang"))
      case "perplexity_rank" =>
        PerplexityRank(
          need(doubleParam("keep_top_frac"), "'keep_top_frac'"),
          params.get("group").map(_.toString).getOrElse("lang"),
          longParam("vocab").getOrElse(1L << 16).toInt)
      case "upsample" =>
        val factors = need(params.get("factors"), "'factors' (map of group -> epochs)")
          .asInstanceOf[java.util.Map[Object, Object]].asScala
          .map { case (k, v) => k.toString -> v.asInstanceOf[Number].doubleValue }.toMap
        Upsample(factors, params.get("group").map(_.toString).getOrElse("lang"))
      case "mix_unimax" =>
        MixUnimax(
          need(longParam("total_tokens"), "'total_tokens' (training budget B)"),
          need(doubleParam("max_epochs"), "'max_epochs' (per-group repetition cap)"),
          params.get("group").map(_.toString).getOrElse("lang"))
      case "url_dedup" =>
        UrlDedup(params.get("url_col").map(_.toString).getOrElse("url"))
      case "substring_remove" =>
        SubstringRemove(need(longParam("k"), "'k' (minimum span length in tokens)").toInt)
      case "dedup_lines" =>
        DedupLines(
          longParam("min_chars").getOrElse(10L).toInt,
          params.get("sep").map(_.toString).getOrElse("\n"))
      case "quality_model" =>
        QualityModel(
          need(params.get("model").map(_.toString), "'model' (auxiliary weight-frame name)"),
          need(doubleParam("min_score"), "'min_score'"))
      case "repetition" =>
        val r = RepetitionFilter(
          doubleParam("max_dup_token_frac"),
          doubleParam("max_dup_bigram_frac"),
          doubleParam("max_top_bigram_frac"),
          doubleParam("max_dup_line_frac"),
          doubleParam("max_dup_line_char_frac"))
        require(r.maxDupTokenFrac.nonEmpty || r.maxDupBigramFrac.nonEmpty ||
          r.maxTopBigramFrac.nonEmpty || r.maxDupLineFrac.nonEmpty ||
          r.maxDupLineCharFrac.nonEmpty,
          s"step #$idx: repetition needs at least one of max_dup_token_frac, " +
            "max_dup_bigram_frac, max_top_bigram_frac, max_dup_line_frac, " +
            "max_dup_line_char_frac")
        r
      case "compress" =>
        val c = CompressFilter(doubleParam("min_ratio"), doubleParam("max_ratio"))
        require(c.minRatio.nonEmpty || c.maxRatio.nonEmpty,
          s"step #$idx: compress needs min_ratio and/or max_ratio")
        c
      case "langid_trigram_keep" =>
        val langs = need(params.get("langs"), "'langs' (list)")
          .asInstanceOf[java.util.List[Object]].asScala.map(_.toString).toSeq
        require(langs.nonEmpty, s"step #$idx: langid_trigram_keep needs a non-empty langs list")
        LangIdTrigramKeep(langs)
      case "dedup_simhash" =>
        DedupSimhash(
          need(longParam("max_hamming"), "'max_hamming'").toInt,
          longParam("max_bucket").getOrElse(256L).toInt)
      case "dedup_ngram" =>
        val metric = params.get("metric").map(_.toString).getOrElse("jaccard")
        if (!Set("jaccard", "containment")(metric))
          throw new IllegalArgumentException(
            s"step #$idx: dedup_ngram metric must be jaccard|containment, got '$metric'")
        DedupNgram(
          need(doubleParam("threshold"), "'threshold'"),
          metric,
          longParam("shingle_n").getOrElse(1L).toInt)
      case "dedup_winnow" =>
        DedupWinnow(
          longParam("min_shared").getOrElse(2L),
          longParam("k").getOrElse(5L).toInt,
          longParam("w").getOrElse(4L).toInt,
          longParam("max_bucket").getOrElse(256L).toInt)
      case "dedup_phash" =>
        DedupPhash(
          longParam("max_hamming").getOrElse(2L).toInt,
          params.get("payload_col").map(_.toString).getOrElse("payload"))
      case "dedup_afp" =>
        DedupAfp(
          longParam("max_hamming").getOrElse(2L).toInt,
          params.get("payload_col").map(_.toString).getOrElse("payload"))
      case "dedup_video" =>
        DedupVideo(
          longParam("min_shared").getOrElse(2L),
          need(longParam("frame_bytes"), "'frame_bytes' (stored raw frame size)").toInt,
          longParam("stride").getOrElse(1L).toInt,
          params.get("payload_col").map(_.toString).getOrElse("payload"))
      case "container_meta" =>
        val fmts = params.get("formats")
          .map(_.asInstanceOf[java.util.List[Object]].asScala.map(_.toString).toSeq)
          .getOrElse(Seq.empty)
        val c = ContainerMetaFilter(fmts, longParam("max_duration_ms"),
          params.get("payload_col").map(_.toString).getOrElse("payload"))
        require(c.formats.nonEmpty || c.maxDurationMs.nonEmpty,
          s"step #$idx: container_meta needs formats and/or max_duration_ms")
        c
      case "dedup_embedding" =>
        DedupEmbedding(
          need(params.get("embeddings").map(_.toString),
            "'embeddings' (auxiliary (vec_id, embedding) table name)"),
          need(doubleParam("threshold"), "'threshold'"),
          longParam("bands").getOrElse(32L).toInt,
          longParam("bits").getOrElse(4L).toInt,
          longParam("max_bucket").getOrElse(256L).toInt)
      case "dedup_semantic" =>
        DedupSemantic(
          need(params.get("embeddings").map(_.toString),
            "'embeddings' (auxiliary (vec_id, embedding) table name)"),
          need(doubleParam("threshold"), "'threshold'"),
          longParam("nlist").getOrElse(0L).toInt,
          longParam("nprobe").getOrElse(1L).toInt)
      case "sample_diverse" =>
        SampleDiverse(
          need(params.get("embeddings").map(_.toString),
            "'embeddings' (auxiliary (vec_id, embedding) table name)"),
          longParam("clusters").getOrElse(0L).toInt,
          need(longParam("per_cluster"), "'per_cluster'"))
      case "importance_sample" =>
        ImportanceSample(
          need(params.get("target").map(_.toString),
            "'target' (auxiliary target-sample table name)"),
          need(longParam("k"), "'k'").toInt,
          longParam("vocab").getOrElse(1L << 16).toInt,
          longParam("hash_buckets").getOrElse(0L).toInt)
      case "decontaminate_embedding" =>
        DecontamEmbedding(
          need(params.get("probes").map(_.toString),
            "'probes' (auxiliary (vec_id, embedding) probe table name)"),
          need(params.get("embeddings").map(_.toString),
            "'embeddings' (auxiliary (vec_id, embedding) table name)"),
          need(doubleParam("threshold"), "'threshold'"))
      case "sink" =>
        Sink(
          need(params.get("path").map(_.toString), "'path'"),
          params.get("partition_by").map(
            _.asInstanceOf[java.util.List[Object]].asScala.map(_.toString).toSeq)
            .getOrElse(Seq.empty))
      case "sink_tar" =>
        SinkTar(
          need(params.get("path").map(_.toString), "'path'"),
          longParam("target_bytes").getOrElse(256L << 20))
      case "sink_tokens" =>
        val tok = params.get("tokenizer").map(_.toString).getOrElse("rank")
        if (!Set("rank", "bpe", "unigram")(tok))
          throw new IllegalArgumentException(
            s"step #$idx: sink_tokens tokenizer must be rank|bpe|unigram, got '$tok'")
        val byteLevel = params.get("byte_level") match {
          case None => false
          case Some(b: java.lang.Boolean) => b.booleanValue
          case Some(other) => throw new IllegalArgumentException(
            s"step #$idx: sink_tokens byte_level must be a boolean, got '$other'")
        }
        if (byteLevel && tok != "bpe")
          throw new IllegalArgumentException(
            s"step #$idx: sink_tokens byte_level applies only to tokenizer: bpe (got '$tok')")
        SinkTokens(
          need(params.get("path").map(_.toString), "'path'"),
          need(longParam("budget"), "'budget' (tokens per sequence)").toInt,
          longParam("vocab").getOrElse(1L << 16).toInt,
          longParam("buckets").getOrElse(1024L).toInt,
          longParam("target_bytes").getOrElse(256L << 20),
          tok,
          longParam("merges").getOrElse(256L).toInt,
          longParam("piece_len").getOrElse(6L).toInt,
          byteLevel)
      case other =>
        throw new IllegalArgumentException(
          s"step #$idx: unknown curation step '$other' (known: blocklist, c4_filter, clean, normalize, redact, " +
            "compress, dedup_afp, dedup_embedding, dedup_exact, dedup_lines, dedup_minhash, dedup_ngram, dedup_phash, dedup_semantic, dedup_simhash, dedup_video, dedup_winnow, " +
            "dedup_soft, decontaminate_embedding, gopher, importance_sample, langid_keep, " +
            "langid_trigram_keep, mix_unimax, quality, quality_model, quota, repetition, " +
            "sample_diverse, sink, sink_tar, sink_tokens, split, strip_html, shuffle, temperature, chunk, decontaminate, perplexity, " +
            "perplexity_rank, substring_remove, token_budget, upsample, url_dedup, weighted_sample)")
    }
  }
}
