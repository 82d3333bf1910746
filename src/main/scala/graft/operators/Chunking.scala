package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Context-window chunking: split each document into fixed-size,
  * optionally overlapping character windows — the standard pre-tokenization
  * shaping step for LLM training corpora (a 100 TB corpus is packed into
  * model-context-sized pieces before tokenization; overlap preserves
  * cross-boundary n-grams for training continuity).
  *
  * Scale shape: pure map-side generate — one `explode(sequence(...))` per
  * document, zero exchanges, no driver involvement; output row count is
  * `Σ ⌈(len−overlap)/stride⌉`, linear in corpus bytes. The chunk math is
  * closed-form in the document length, so the operator is fully
  * SQL-expressible (exact DuckDB oracle in the catalog).
  */
object Chunking {

  /** One row per (document, chunk): `(idCol, chunk_id, chunk_text,
    * chunk_chars)`.
    *
    * Chunks start at character offsets `0, stride, 2·stride, …` with
    * `stride = chunkChars − overlapChars`; each chunk takes `chunkChars`
    * characters (the final one is shorter when the text runs out). A
    * document of length ≤ `chunkChars` yields exactly one chunk (its whole
    * text); otherwise `⌈(len − overlap)/stride⌉` chunks, which is the
    * smallest count whose windows jointly cover the text.
    */
  def chunk(
      docs: DataFrame,
      chunkChars: Int,
      overlapChars: Int = 0,
      idCol: String = "doc_id",
      textCol: String = "text"
  ): DataFrame = {
    require(chunkChars > 0, s"chunkChars must be positive, got $chunkChars")
    require(overlapChars >= 0 && overlapChars < chunkChars,
      s"overlapChars must be in [0, chunkChars), got $overlapChars vs $chunkChars")
    val stride = chunkChars - overlapChars
    val len = length(col(textCol))
    // ⌈(len − overlap)/stride⌉ in integer math; ≤ chunkChars ⇒ exactly 1.
    val n = when(len <= chunkChars, lit(1L))
      .otherwise(floor((len - lit(overlapChars) + lit(stride - 1)) / lit(stride)).cast("long"))
    val start = col("chunk_id") * stride
    docs
      .select(col(idCol), col(textCol), explode(sequence(lit(0L), n - 1)).as("chunk_id"))
      .select(
        col(idCol),
        col("chunk_id").cast("int").as("chunk_id"),
        col(textCol).substr(start + 1, lit(chunkChars)).as("chunk_text"))
      .withColumn("chunk_chars", length(col("chunk_text")).cast("long"))
  }
}
