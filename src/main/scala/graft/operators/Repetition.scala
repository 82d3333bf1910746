package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Repetition-based document quality metrics — the standard "repetitive
  * text" filters of large-scale training-data pipelines (duplicate-token
  * and duplicate-n-gram fractions, most-frequent-n-gram share; the
  * Gopher/MassiveText family of heuristics). High values flag boilerplate,
  * keyword stuffing, and degenerate generations.
  *
  * Scale shape: ONE repartition on doc_id parallelizes the explode and
  * pre-clusters every downstream aggregate — `groupBy(doc_id, tok)`,
  * `groupBy(doc_id, bigram)`, the per-doc rollups, and the final join all
  * reuse that clustering (hash(doc_id) satisfies the superset-key
  * distribution), so the whole operator runs in a single exchange.
  * Everything is explode + codegen'd hash-aggregate — no higher-order
  * array lambdas on the hot path.
  */
object Repetition {

  /** Per-document repetition metrics.
    *
    * @return (doc_id, n_tokens, dup_token_frac, top_token_frac,
    *         n_bigrams, dup_bigram_frac, top_bigram_frac); the bigram
    *         columns are null for single-token documents. Fractions are
    *         rounded to 4 places (oracle-comparison friendly).
    */
  def repetitionMetrics(
      docs: DataFrame,
      textCol: String = "text",
      idCol: String = "doc_id"
  ): DataFrame = {
    val toks = docs
      .select(col(idCol).as("doc_id"), col(textCol).as("__text"))
      .repartition(col("doc_id"))
      .select(col("doc_id"), posexplode(split(lower(col("__text")), "\\s+")).as(Seq("pos", "tok")))
      // split keeps a leading/trailing empty token on ragged whitespace
      // (Spark's limit -1 semantics); drop them so metrics are invariant
      // to padding. Bigram adjacency still follows `pos` order, so the
      // surviving neighbors pair up exactly as in the trimmed text.
      .filter(col("tok") =!= "")

    val tokStats = toks
      .groupBy("doc_id", "tok")
      .agg(count(lit(1)).as("c"))
      .groupBy("doc_id")
      .agg(sum("c").as("n"), count(lit(1)).as("d"), max("c").as("m"))
      .select(
        col("doc_id"),
        col("n").as("n_tokens"),
        round((col("n") - col("d")).cast("double") / col("n"), 4).as("dup_token_frac"),
        round(col("m").cast("double") / col("n"), 4).as("top_token_frac"))

    val w = Window.partitionBy("doc_id").orderBy("pos")
    val bgStats = toks
      .withColumn("next", lead(col("tok"), 1).over(w))
      .filter(col("next").isNotNull)
      .select(col("doc_id"), concat_ws(" ", col("tok"), col("next")).as("bg"))
      .groupBy("doc_id", "bg")
      .agg(count(lit(1)).as("c"))
      .groupBy("doc_id")
      .agg(sum("c").as("n"), count(lit(1)).as("d"), max("c").as("m"))
      .select(
        col("doc_id"),
        col("n").as("n_bigrams"),
        round((col("n") - col("d")).cast("double") / col("n"), 4).as("dup_bigram_frac"),
        round(col("m").cast("double") / col("n"), 4).as("top_bigram_frac"))

    tokStats.join(bgStats, Seq("doc_id"), "left")
  }
}
