package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark-contamination detection for training corpora: find documents
  * sharing any word n-gram with a probe set (e.g. eval-set passages) and
  * count the distinct matched n-grams per document — the standard
  * n-gram-overlap decontamination check run before training.
  *
  * Scale shape: the probe side (an eval set — tiny next to the corpus) is
  * shingled once and BROADCAST; the corpus streams through the codegen'd
  * shingle explode ([[Dedup.shingleRows]]) and a broadcast hash join — no
  * shuffle carries document text, and the per-doc aggregate combines
  * map-side on the doc_id clustering shingleRows already established.
  */
object Decontaminate {

  /** @return (doc_id, matched_ngrams) for corpus documents with at least
    *         one probe n-gram hit; clean documents are absent.
    */
  def matches(
      docs: DataFrame,
      probes: DataFrame,
      shingleN: Int = 3,
      textCol: String = "text",
      idCol: String = "doc_id",
      probeTextCol: String = "text"
  ): DataFrame = {
    val probeShingles = probes
      .select(explode(graft.functions.Texts.distinctShingles(col(probeTextCol), shingleN)).as("s"))
      .distinct()
    Dedup.shingleRows(docs, shingleN, textCol, idCol)
      .join(broadcast(probeShingles), Seq("s"))
      .groupBy("doc_id")
      .agg(count_distinct(col("s")).as("matched_ngrams"))
  }
}
