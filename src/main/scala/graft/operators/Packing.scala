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

  /** NO-SPLIT bin packing — "sample packing": every document lands WHOLE
    * in exactly one pack of capacity `budgetTokens` (documents longer
    * than the budget are rejected up front), packs are filled by
    * first-fit-decreasing (FFD — the classic 11/9·OPT + 6/9 guarantee),
    * minimizing padding waste. This is the packing regime training
    * pipelines use when cross-document attention contamination matters
    * (each sequence = whole documents + padding), versus
    * [[packSequences]]' concat-then-chunk regime (zero padding, split
    * documents).
    *
    * Scale shape: FFD is inherently sequential, so the corpus splits
    * into `buckets` independent packing streams (`pmod(doc_id,
    * buckets)`) like [[packSequences]]; each bucket's FFD runs inside
    * ONE `mapPartitions` pass over its hash partition (the genuine
    * per-partition imperative case — a bin fill-level array, bounded by
    * the bucket's pack count). One shuffle on the bucket key, rows are
    * thin (id, tokens); determinism comes from the in-bucket
    * (tokens desc, id asc) FFD order, independent of arrival order.
    * Per-bucket waste stays within FFD's bound of that bucket's
    * optimum; cross-bucket imbalance adds at most `buckets − 1`
    * under-full final packs (property-tested in ExtensionsSpec).
    *
    * @return (doc_id, n_tokens, bucket, pack_id, pack_fill) — pack_id
    *         globally unique via the [[packSequences]] bucket-shift
    *         scheme; `pack_fill` is the pack's total tokens (same value
    *         on every member row), always ≤ budgetTokens.
    */
  def packGreedyBins(
      docs: DataFrame,
      budgetTokens: Long,
      buckets: Int = 1024,
      textCol: String = "text",
      idCol: String = "doc_id"
  ): DataFrame = {
    require(budgetTokens > 0, "budgetTokens must be positive")
    val spark = docs.sparkSession
    import spark.implicits._
    val sized = docs.select(
      col(idCol).cast("long").as("doc_id"),
      size(Texts.tokens(col(textCol))).cast("long").as("n_tokens"))
    val over = sized.filter(col("n_tokens") > budgetTokens).limit(1).collect()
    require(over.isEmpty,
      s"doc ${over.headOption.map(_.getLong(0)).getOrElse(-1L)} exceeds the pack budget " +
        s"$budgetTokens — chunk long documents first (Chunking.chunk) or raise the budget")
    sized
      .withColumn("bucket", pmod(col("doc_id"), lit(buckets.toLong)))
      .repartition(col("bucket"))
      .as[(Long, Long, Long)]
      .mapPartitions { it =>
        // A hash partition may hold several buckets — pack each bucket
        // independently so results don't depend on partition assignment.
        it.toSeq.groupBy(_._3).iterator.flatMap { case (bucket, rows) =>
          val ordered = rows.sortBy(t => (-t._2, t._1)) // tokens desc, id asc
          val fills = scala.collection.mutable.ArrayBuffer.empty[Long]
          val members = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Int)]
          ordered.foreach { case (id, tok, _) =>
            var b = 0
            while (b < fills.length && fills(b) + tok > budgetTokens) b += 1
            if (b == fills.length) fills += 0L
            fills(b) += tok
            members += ((id, tok, b))
          }
          members.iterator.map { case (id, tok, b) =>
            (id, tok, bucket, (bucket << 40) + b, fills(b))
          }
        }
      }
      .toDF("doc_id", "n_tokens", "bucket", "pack_id", "pack_fill")
  }
}
