package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Texts

/** Sequence packing for training-data assembly: assign every document the
  * pack (fixed token budget) in which its text STARTS when documents are
  * concatenated in (bucket, doc_id) order — the standard concat-then-chunk
  * packing used to fill training context windows (documents may straddle a
  * boundary; chunking handles the tail).
  *
  * Scale shape: a TOTAL-order running token sum would serialize the whole
  * corpus through one task, so the corpus is first split into `buckets`
  * independent packing streams (`pmod(doc_id, buckets)`); each bucket's
  * cumulative sum is one growing-frame window pass over its own partition
  * — fully parallel, one shuffle on the bucket key, codegen'd end to end.
  * Pack ids are globally unique via `(bucket << 40) + pack-in-bucket`:
  * up to ~1.1e12 packs per bucket and 2^23 buckets before overflow —
  * beyond any real corpus (a 1e6 multiplier would silently collide at
  * ~2e9 tokens per bucket).
  */
object Packing {

  def packSequences(
      docs: DataFrame,
      budgetTokens: Long,
      buckets: Int = 1024,
      textCol: String = "text",
      idCol: String = "doc_id"
  ): DataFrame = {
    require(budgetTokens > 0, "budgetTokens must be positive")
    val w = Window.partitionBy("bucket").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    docs
      .select(
        col(idCol).as("doc_id"),
        size(Texts.tokens(col(textCol))).cast("long").as("n_tokens"))
      .withColumn("bucket", pmod(col("doc_id"), lit(buckets.toLong)))
      .withColumn("start_tok", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .select(
        col("doc_id"), col("n_tokens"), col("bucket"),
        (shiftleft(col("bucket"), 40) +
          floor(col("start_tok") / lit(budgetTokens.toDouble))).cast("long").as("pack_id"))
  }
}
