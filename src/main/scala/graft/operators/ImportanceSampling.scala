package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DSIR-style importance resampling (Xie, Santurkar, Ma & Liang, "Data
  * Selection for Language Models via Importance Resampling", NeurIPS
  * 2023, arXiv:2302.03169): select raw-corpus documents whose feature
  * distribution matches a TARGET sample (e.g. a high-quality reference
  * corpus) by (1) fitting cheap unigram feature LMs on both, (2) scoring
  * every raw doc with the log likelihood ratio
  * `λ(x) = Σ_f [ln p_tgt(f) − ln p_raw(f)]`, and (3) resampling k docs
  * without replacement with probability ∝ exp λ(x) via the Gumbel top-k
  * trick. This is the "match a target distribution" selector that sits
  * between binary quality gates (keep/drop) and group-quota mix planning
  * — the published middle ground most large LM curation pipelines use.
  *
  * Features are the corpus's whitespace unigrams, either raw
  * (vocab-bounded, the cross-engine-reproducible form the SQL oracle
  * mirrors — the [[Vocabulary]] convention) or HASHED into a fixed
  * bucket space (`hashBuckets > 0`, the paper's memory-bound production
  * form: `xxhash64(tok) mod B` — the LM is exactly B+1 rows no matter
  * the corpus; parity of the two forms' machinery is asserted in
  * ExtensionsSpec). Both LMs reuse [[Vocabulary.unigramLmFromCounts]]'s
  * add-one smoothing and OOV floor, so a persisted counts frame from
  * the incremental-vocabulary path can feed either side without
  * refitting.
  *
  * Scale shape: each fit is one token hash-aggregate with map-side
  * combine, bounded to `vocabSize`/`hashBuckets` rows; scoring joins the
  * corpus token rows against the two BROADCAST LM frames and reduces to
  * one (doc_id)-keyed aggregate (partial combine). The Gumbel pick is
  * `orderBy(key).limit(k)` — Spark's TakeOrdered per-partition k-heap,
  * never a global sort. The "randomness" is the deterministic
  * multiplicative id-hash every sampler here uses
  * ([[Sampling.pseudoShuffle]]), so any engine reproduces the selection
  * row-for-row.
  */
object ImportanceSampling {

  /** One row per token occurrence, hashed to its feature bucket when
    * `hashBuckets > 0` (bucket rendered as a string so the frame is a
    * drop-in [[Vocabulary.unigramLmFromCounts]] input).
    */
  private def featureRows(
      docs: DataFrame,
      hashBuckets: Int,
      textCol: String,
      idCol: String
  ): DataFrame = {
    val toks = docs.select(col(idCol).as("doc_id"),
      explode(split(lower(col(textCol)), "\\s+")).as("tok"))
    if (hashBuckets > 0)
      toks.withColumn("tok",
        pmod(xxhash64(col("tok")), lit(hashBuckets.toLong)).cast("string"))
    else toks
  }

  /** Fit the feature LM of one side: `(tok, logp)` rows + OOV floor,
    * [[Vocabulary.unigramLm]] smoothing over word features
    * (`hashBuckets = 0`) or hashed buckets (`> 0` — `vocabSize` then
    * bounds nothing real since at most `hashBuckets` features exist).
    * Persistable: write once per corpus, reuse across selections.
    */
  def fitFeatureLm(
      docs: DataFrame,
      vocabSize: Int = 1 << 16,
      hashBuckets: Int = 0,
      textCol: String = "text",
      idCol: String = "doc_id"
  ): DataFrame =
    Vocabulary.unigramLmFromCounts(
      graft.plans.Materialize(
        featureRows(docs, hashBuckets, textCol, idCol)
          .groupBy("tok").agg(count(lit(1)).as("c"))),
      vocabSize)

  /** Per-document DSIR log importance weight under two FITTED
    * [[fitFeatureLm]] frames — the serving shape (fit once, score any
    * shard): both LMs broadcast, one doc-keyed aggregate.
    *
    * @return (doc_id, n_tokens, logw) — logw = Σ over the doc's tokens
    *         of `ln p_tgt − ln p_raw` (unrounded; resample rounds).
    */
  def importanceWeights(
      corpus: DataFrame,
      targetLm: DataFrame,
      rawLm: DataFrame,
      hashBuckets: Int = 0,
      textCol: String = "text",
      idCol: String = "doc_id"
  ): DataFrame = {
    def split(lm: DataFrame, voc: String, oov: String): (DataFrame, DataFrame) = {
      require(lm.columns.sorted.sameElements(Array("logp", "tok")),
        s"not a fitFeatureLm frame (columns ${lm.columns.mkString(",")})")
      (lm.filter(col("tok").isNotNull).select(col("tok"), col("logp").as(voc)),
        lm.filter(col("tok").isNull).select(col("logp").as(oov)))
    }
    val (tVoc, tOov) = split(targetLm, "__tl", "__to")
    val (rVoc, rOov) = split(rawLm, "__rl", "__ro")
    featureRows(corpus, hashBuckets, textCol, idCol)
      .join(broadcast(tVoc), Seq("tok"), "left")
      .join(broadcast(rVoc), Seq("tok"), "left")
      .crossJoin(broadcast(tOov)).crossJoin(broadcast(rOov))
      .select(col("doc_id"),
        (coalesce(col("__tl"), col("__to")) - coalesce(col("__rl"), col("__ro")))
          .as("__d"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"), sum(col("__d")).as("logw"))
  }

  /** One-shot DSIR selection: fit the target LM on `target` and the raw
    * LM on `corpus`, weight every corpus doc, and take the Gumbel top-k
    * — `key = λ(x) − ln(−ln u(id))` with the deterministic uniform
    * `u(id) = (hash(id) + 0.5) / 2³²`, which samples k docs without
    * replacement with probability ∝ exp λ(x) (the Gumbel-max argument),
    * reproducibly on any engine. Keys round to 6 dp (ties → doc_id) so
    * the cross-engine boundary is exact; `logw` reports at 4 dp.
    *
    * The noise hash is [[Sampling.pseudoShuffleWide]] (40 folded id
    * bits), not the 20-bit [[Sampling.pseudoShuffle]] the order-only
    * samplers use: the without-replacement-∝-exp λ claim needs noise
    * that is independent across ids, and the 20-bit hash hands every id
    * pair equal mod 2²⁰ the SAME u. Residues still collide at mod 2⁴⁰
    * (~10¹² ids) — beyond that corpus size, widen the fold again.
    *
    * @return (doc_id, n_tokens, logw, gumbel_key) for the k selected
    *         docs, ordered by doc_id.
    */
  def importanceResample(
      corpus: DataFrame,
      target: DataFrame,
      k: Int,
      vocabSize: Int = 1 << 16,
      hashBuckets: Int = 0,
      textCol: String = "text",
      idCol: String = "doc_id"
  ): DataFrame = {
    require(k > 0, s"sample size k must be positive, got $k")
    val tgtLm = fitFeatureLm(target, vocabSize, hashBuckets, textCol, idCol)
    val rawLm = fitFeatureLm(corpus, vocabSize, hashBuckets, textCol, idCol)
    val u: Column =
      (Sampling.pseudoShuffleWide(col("doc_id")).cast("double") + lit(0.5)) /
        lit(4294967296.0)
    importanceWeights(corpus, tgtLm, rawLm, hashBuckets, textCol, idCol)
      .select(col("doc_id"), col("n_tokens"),
        round(col("logw"), 4).as("logw"),
        round(col("logw") - log(-log(u)), 6).as("gumbel_key"))
      .orderBy(col("gumbel_key").desc, col("doc_id"))
      .limit(k)
      .orderBy("doc_id")
  }
}
