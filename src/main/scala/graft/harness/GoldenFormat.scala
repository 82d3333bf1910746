package graft.harness

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Canonical text rendering for golden-fixture comparison of the catalog
  * entries with no SQL-portable oracle (hash-seeded outputs). Rows are
  * rendered sorted with a header line; doubles keep full Java precision
  * (deterministic — the pipelines are xxhash64-seeded with no RNG/time).
  */
object GoldenFormat {

  /** The catalog entries covered by golden fixtures. */
  val goldenNames: Seq[String] =
    Seq("dedup_minhash", "dedup_minhash_incr", "dedup_simhash", "dedup_simhash_incr",
      "dedup_semantic", "dedup_semantic_incr",
      "sim_ann_pq",
      "sim_ann_ivfpq", "sim_ann_ivfpq_idx", "text_fingerprint", "text_compress",
      "dedup_winnow", "dedup_winnow_incr", "text_bpe_tokens",
      "embedding_pca", "text_packing_bins",
      "text_bpe_bytes",
      "corpus_quantiles_incr",
      "embedding_clusters", "sample_diverse",
      "streaming_minhash_replay", "text_unigram_tokens", "sim_ann_ivfpq_filtered",
      "decontaminate_embedding", "curation_release_tokens_bpe",
      "curation_release_tokens_unigram",
      "tokenizer_stats_bpe", "tokenizer_stats_unigram",
      "curation_release_incr_near", "curation_release_incr_more",
      "curation_release_incr_emb", "sim_ann_ivfpq_purge")

  def render(df: DataFrame): String = {
    val cols = df.schema.fields.map { f =>
      f.dataType.typeName match {
        case "timestamp" => date_format(df(s"`${f.name}`"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as(f.name)
        case _           => df(s"`${f.name}`").cast("string").as(f.name)
      }
    }
    val header = df.columns.mkString("|")
    val lines = df
      .select(cols.toSeq: _*)
      .collect()
      .map(r =>
        (0 until r.length).map(i => if (r.isNullAt(i)) "␀null" else r.getString(i)).mkString("|"))
      .sorted
    (header +: lines).mkString("", "\n", "\n")
  }
}
