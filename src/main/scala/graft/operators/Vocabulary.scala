package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus vocabulary statistics and unigram language-model scoring — the
  * token-frequency layer of a training-data pipeline (vocabulary builds,
  * CCNet-style LM quality filtering; Wenzek et al. 2020, arXiv:1911.00359
  * describe the LM-perplexity filter this re-expresses with a corpus-fit
  * unigram model).
  *
  * Scale shape: token/n-gram counting is one hash-aggregate shuffle with
  * map-side partial combine on the gram; global top-k runs as
  * TakeOrdered (a per-partition k-heap merged on the driver — k rows per
  * partition, never a full sort). The fitted LM is bounded at `vocabSize`
  * rows and BROADCAST for scoring, so the corpus never shuffles on the
  * token — only thin (doc_id, logp) rows move to the per-doc aggregate,
  * and Spark's partial aggregation combines them map-side.
  */
object Vocabulary {

  /** Top-k word n-grams by corpus frequency with a deterministic
    * tiebreak (count DESC, gram ASC). Every occurrence counts (unlike
    * the deduped [[Dedup.shingleRows]]); `n_docs` is the document
    * frequency.
    *
    * @return (gram, n_occurrences, n_docs), at most k rows.
    */
  def topKNgrams(
      docs: DataFrame,
      n: Int,
      k: Int,
      textCol: String = "text",
      idCol: String = "doc_id"
  ): DataFrame =
    Dedup.windowRows(docs, n, textCol, idCol)
      .groupBy(col("w").as("gram"))
      .agg(count(lit(1)).as("n_occurrences"), count_distinct(col("doc_id")).as("n_docs"))
      .orderBy(col("n_occurrences").desc, col("gram").asc)
      .limit(k)

  /** One row per token occurrence: (doc_id, tok). */
  private def tokenRows(docs: DataFrame, textCol: String, idCol: String): DataFrame =
    docs.select(col(idCol).as("doc_id"),
      explode(split(lower(col(textCol)), "\\s+")).as("tok"))

  /** The fitted add-one-smoothed unigram LM as a persistable,
    * self-contained frame: one `(tok, logp)` row per vocab token —
    * `ln((c + 1) / (T + V + 1))` for the top `vocabSize` tokens (`T` =
    * total token occurrences, `V` = realized vocab size) — plus ONE
    * `tok IS NULL` row carrying the out-of-vocab floor
    * `ln(1 / (T + V + 1))` (split tokens can never be SQL null, so the
    * null key is unambiguous). All scoring constants are baked into the
    * rows, so a loaded LM needs no side config and no fail-fast gate:
    * write once per corpus, score any stream of shards against it.
    *
    * The `T`/`V` scalars stay in the plan as broadcast one-row frames —
    * no driver action; the one token-count aggregate is materialized
    * ([[graft.plans.Materialize]]) because totals, the vocab cut, and
    * the LM rows all read it (3 full corpus passes otherwise).
    */
  def unigramLm(
      docs: DataFrame,
      vocabSize: Int = 1 << 16,
      textCol: String = "text",
      idCol: String = "doc_id"
  ): DataFrame =
    unigramLmFromCounts(
      graft.plans.Materialize(unigramCounts(docs, textCol, idCol)), vocabSize)

  /** Per-document negative log-likelihood and perplexity under a FITTED
    * [[unigramLm]] frame — the serving shape: fit once per corpus (or
    * load from parquet), score every incoming shard paying only the
    * broadcast LM join + one per-doc aggregate; the corpus token counts
    * are never recomputed. High perplexity = far from the LM's training
    * distribution — the standard LM quality-filter signal. Rounded to 4
    * decimals for oracle hash stability.
    *
    * @return (doc_id, n_tokens, avg_nll, ppl) ordered by doc_id.
    */
  def perplexity(
      docs: DataFrame,
      lm: DataFrame,
      textCol: String,
      idCol: String
  ): DataFrame = {
    // Exact-columns gate: a bigramLm frame also carries (tok, logp) and
    // would silently score garbage here (every bigram row joins its
    // ending token) — reject anything but the unigram shape.
    require(lm.columns.sorted.sameElements(Array("logp", "tok")),
      s"not a unigramLm frame (columns ${lm.columns.mkString(",")}) — " +
        "fit the corpus with unigramLm (bigramLm frames score via perplexityBigram)")
    val oov = lm.filter(col("tok").isNull).select(col("logp").as("__oov"))
    val voc = lm.filter(col("tok").isNotNull)
      .select(col("tok"), col("logp").as("__logp"))
    tokenRows(docs, textCol, idCol)
      .join(broadcast(voc), Seq("tok"), "left")
      .crossJoin(broadcast(oov))
      .select(col("doc_id"), coalesce(col("__logp"), col("__oov")).as("__lp"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"), (-avg(col("__lp"))).as("__nll"))
      .select(col("doc_id"), col("n_tokens"),
        round(col("__nll"), 4).as("avg_nll"),
        round(exp(col("__nll")), 4).as("ppl"))
      .orderBy("doc_id")
  }

  /** One-shot [[perplexity]]: fit [[unigramLm]] on `docs` and score the
    * same corpus with it (self-perplexity — the quality-filter default).
    */
  def perplexity(
      docs: DataFrame,
      vocabSize: Int = 1 << 16,
      textCol: String = "text",
      idCol: String = "doc_id"
  ): DataFrame =
    perplexity(docs, unigramLm(docs, vocabSize, textCol, idCol), textCol, idCol)

  /** Raw token counts `(tok, c)` — the PERSISTABLE sufficient statistic
    * behind [[unigramLm]] (the LM frame itself bakes `T`/`V` into its
    * logp values, so two LMs cannot be combined; counts can). Write once
    * per corpus; on shard ingest, [[mergeCounts]] folds the shard's
    * counts in and [[unigramLmFromCounts]] re-derives the LM without
    * ever re-tokenizing the corpus — the incremental story the dedup
    * families already have (minhash/embedding/semantic/substring).
    */
  def unigramCounts(
      docs: DataFrame,
      textCol: String = "text",
      idCol: String = "doc_id"
  ): DataFrame =
    tokenRows(docs, textCol, idCol).groupBy("tok").agg(count(lit(1)).as("c"))

  /** Fold shard counts into corpus counts: one map-side-combinable sum
    * per token — counts(corpus ∪ shard) exactly (parity asserted in
    * ExtensionsSpec down to the scored perplexities).
    */
  def mergeCounts(corpus: DataFrame, shard: DataFrame): DataFrame = {
    require(corpus.columns.sorted.sameElements(Array("c", "tok")) &&
      shard.columns.sorted.sameElements(Array("c", "tok")),
      "mergeCounts takes two unigramCounts frames (tok, c)")
    corpus.unionByName(shard).groupBy("tok").agg(sum(col("c")).as("c"))
  }

  /** [[unigramLm]] from a persisted [[unigramCounts]] frame — the exact
    * same vocab cut, smoothing, and OOV floor, with no corpus scan.
    */
  def unigramLmFromCounts(counts: DataFrame, vocabSize: Int = 1 << 16): DataFrame = {
    require(counts.columns.sorted.sameElements(Array("c", "tok")),
      s"not a unigramCounts frame (columns ${counts.columns.mkString(",")})")
    val c = counts.select(col("tok"), col("c").as("__c"))
    val vocab = c.orderBy(col("__c").desc, col("tok").asc).limit(vocabSize)
    val totals = c.agg(sum(col("__c")).cast("double").as("__T"))
    val vsize = vocab.agg(count(lit(1)).cast("double").as("__V"))
    val inVocab = vocab
      .crossJoin(broadcast(totals)).crossJoin(broadcast(vsize))
      .select(col("tok"),
        log((col("__c") + lit(1)) / (col("__T") + col("__V") + lit(1))).as("logp"))
    val oovRow = totals.crossJoin(vsize)
      .select(lit(null).cast("string").as("tok"),
        log(lit(1.0) / (col("__T") + col("__V") + lit(1))).as("logp"))
    inVocab.unionByName(oovRow)
  }

  /** Per-doc token rows with position and the preceding token (null at
    * doc start) — the bigram adjacency frame; one doc_id repartition
    * pre-clusters the lag window AND the downstream per-doc aggregate.
    */
  private def adjacencyRows(docs: DataFrame, textCol: String, idCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy("doc_id").orderBy("pos")
    docs
      .select(col(idCol).as("doc_id"), col(textCol).as("__text"))
      .repartition(col("doc_id"))
      .select(col("doc_id"), posexplode(split(lower(col("__text")), "\\s+")).as(Seq("pos", "tok")))
      .withColumn("__prev", lag(col("tok"), 1).over(w))
  }

  /** Bigram LM with STUPID BACKOFF (Brants, Popat, Xu, Och & Dean,
    * "Large Language Models in Machine Translation", 2007 — the score
    * large-scale pipelines actually use: unnormalized, no discounting,
    * `S(w|w') = c(w'w)/c(w')` when the bigram is in the table, else
    * `0.4 · P_uni(w)`), persisted as ONE self-contained frame:
    *
    *   - bigram rows `(tok_prev, tok, ln(c2/c1))` — the top `bigramSize`
    *     bigrams by count (deterministic tiebreak), so the table is
    *     bounded no matter the corpus;
    *   - unigram rows `(null, tok, logp)` — the [[unigramLm]] vocab;
    *   - one `(null, null, logp)` out-of-vocab floor row.
    *
    * An absent bigram (unseen OR pruned) backs off — the standard
    * contract. Both lookup tables broadcast at scoring time.
    */
  def bigramLm(
      docs: DataFrame,
      vocabSize: Int = 1 << 16,
      bigramSize: Int = 1 << 20,
      textCol: String = "text",
      idCol: String = "doc_id"
  ): DataFrame = {
    val t = adjacencyRows(docs, textCol, idCol)
    val c1 = graft.plans.Materialize(t.groupBy("tok").agg(count(lit(1)).as("__c1")))
    val bigTop = t
      .filter(col("__prev").isNotNull)
      .groupBy(col("__prev"), col("tok"))
      .agg(count(lit(1)).as("__c2"))
      .orderBy(col("__c2").desc, col("__prev").asc, col("tok").asc)
      .limit(bigramSize)
    // c(prev) lookup: join the pruned bigram table (tiny) against the
    // unigram counts on the PRECEDING token.
    val bigScored = bigTop
      .join(c1.select(col("tok").as("__prev"), col("__c1")), Seq("__prev"))
      .select(col("__prev").as("tok_prev"), col("tok"),
        log(col("__c2").cast("double") / col("__c1").cast("double")).as("logp"))
    // Unigram side derived from the SAME materialized counts — the exact
    // [[unigramLm]] expressions, without a second corpus tokenize+count
    // pass.
    val vocab = c1.orderBy(col("__c1").desc, col("tok").asc).limit(vocabSize)
    val totals = c1.agg(sum(col("__c1")).cast("double").as("__T"))
    val vsize = vocab.agg(count(lit(1)).cast("double").as("__V"))
    val uniRows = vocab
      .crossJoin(broadcast(totals)).crossJoin(broadcast(vsize))
      .select(lit(null).cast("string").as("tok_prev"), col("tok"),
        log((col("__c1") + lit(1)) / (col("__T") + col("__V") + lit(1))).as("logp"))
    val oovRow = totals.crossJoin(vsize)
      .select(lit(null).cast("string").as("tok_prev"),
        lit(null).cast("string").as("tok"),
        log(lit(1.0) / (col("__T") + col("__V") + lit(1))).as("logp"))
    bigScored.unionByName(uniRows).unionByName(oovRow)
  }

  /** Per-document perplexity under a FITTED [[bigramLm]] frame: first
    * token scores with the unigram (OOV floor applies), later tokens
    * with the bigram when present, else `ln(0.4) + unigram` — stupid
    * backoff. Serving shape: both lookup sides broadcast; the corpus
    * pays one doc_id re-cluster (for the lag window, reused by the
    * per-doc aggregate) and never a token-keyed shuffle.
    *
    * @return (doc_id, n_tokens, avg_nll, ppl) ordered by doc_id.
    */
  def perplexityBigram(
      docs: DataFrame,
      lm: DataFrame,
      textCol: String,
      idCol: String
  ): DataFrame = {
    require(lm.columns.sorted.sameElements(Array("logp", "tok", "tok_prev")),
      s"not a bigramLm frame (columns ${lm.columns.mkString(",")}) — " +
        "fit the corpus with bigramLm")
    val bi = lm.filter(col("tok_prev").isNotNull)
      .select(col("tok_prev").as("__p"), col("tok").as("__t"), col("logp").as("__lb"))
    val uni = lm.filter(col("tok_prev").isNull && col("tok").isNotNull)
      .select(col("tok").as("tok"), col("logp").as("__lu"))
    val oov = lm.filter(col("tok_prev").isNull && col("tok").isNull)
      .select(col("logp").as("__lo"))
    val t = adjacencyRows(docs, textCol, idCol)
    val backUni = coalesce(col("__lu"), col("__lo"))
    t
      .join(broadcast(bi), col("__prev") === col("__p") && col("tok") === col("__t"), "left")
      .join(broadcast(uni), Seq("tok"), "left")
      .crossJoin(broadcast(oov))
      .select(col("doc_id"),
        when(col("__prev").isNull, backUni)
          .otherwise(when(col("__lb").isNotNull, col("__lb"))
            .otherwise(log(lit(0.4)) + backUni)).as("__lp"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"), (-avg(col("__lp"))).as("__nll"))
      .select(col("doc_id"), col("n_tokens"),
        round(col("__nll"), 4).as("avg_nll"),
        round(exp(col("__nll")), 4).as("ppl"))
      .orderBy("doc_id")
  }

  /** One-shot [[perplexityBigram]]: fit on `docs`, score `docs`. */
  def perplexityBigram(
      docs: DataFrame,
      vocabSize: Int = 1 << 16,
      bigramSize: Int = 1 << 20,
      textCol: String = "text",
      idCol: String = "doc_id"
  ): DataFrame =
    perplexityBigram(docs, bigramLm(docs, vocabSize, bigramSize, textCol, idCol),
      textCol, idCol)
}
