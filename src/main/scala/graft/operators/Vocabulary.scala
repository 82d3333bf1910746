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

  /** Per-document unigram-LM negative log-likelihood and perplexity,
    * scored with an add-one-smoothed model fit on the corpus itself: the
    * top `vocabSize` tokens get `ln((c + 1) / (T + V + 1))` (`T` = total
    * token occurrences, `V` = realized vocab size), everything else the
    * out-of-vocab floor `ln(1 / (T + V + 1))`. High perplexity = far
    * from the corpus distribution — the standard LM quality-filter
    * signal.
    *
    * The `T`/`V` scalars stay in the plan as broadcast one-row frames
    * (no driver action); the LM is at most `vocabSize` rows and
    * broadcast into the scoring join. Rounded to 4 decimals for oracle
    * hash stability.
    *
    * @return (doc_id, n_tokens, avg_nll, ppl) ordered by doc_id.
    */
  def perplexity(
      docs: DataFrame,
      vocabSize: Int = 1 << 16,
      textCol: String = "text",
      idCol: String = "doc_id"
  ): DataFrame = {
    val tok = tokenRows(docs, textCol, idCol)
    // One token-count fit, materialized ([[graft.plans.Materialize]]):
    // totals, vocab cut, and LM all read the same counts — without the
    // lineage cut Catalyst recomputes the corpus-wide count aggregate
    // per consumer (3 full passes).
    val counts = graft.plans.Materialize(
      tok.groupBy("tok").agg(count(lit(1)).as("__c")))
    val vocab = counts.orderBy(col("__c").desc, col("tok").asc).limit(vocabSize)
    val totals = counts.agg(sum(col("__c")).cast("double").as("__T"))
    val vsize = vocab.agg(count(lit(1)).cast("double").as("__V"))
    val lm = vocab
      .crossJoin(broadcast(totals)).crossJoin(broadcast(vsize))
      .select(col("tok"),
        log((col("__c") + lit(1)) / (col("__T") + col("__V") + lit(1))).as("__logp"))
    tok
      .join(broadcast(lm), Seq("tok"), "left")
      .crossJoin(broadcast(totals)).crossJoin(broadcast(vsize))
      .select(col("doc_id"),
        coalesce(col("__logp"),
          log(lit(1.0) / (col("__T") + col("__V") + lit(1)))).as("__lp"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"), (-avg(col("__lp"))).as("__nll"))
      .select(col("doc_id"), col("n_tokens"),
        round(col("__nll"), 4).as("avg_nll"),
        round(exp(col("__nll")), 4).as("ppl"))
      .orderBy("doc_id")
  }
}
