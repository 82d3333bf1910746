package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic per-group quota sampling — training-mix curation: take
  * exactly `quota(g)` documents from each group (language, source, …),
  * picked by a seedless multiplicative-hash pseudo-shuffle so every
  * engine (and the SQL oracle) reproduces the same sample. Groups absent
  * from the quota map are dropped.
  *
  * Scale shape: one shuffle on the group key, then a per-group
  * window rank — exact quotas. A group so large its partition sort hurts
  * (e.g. 90%-English corpora) can first pre-filter with the same hash as
  * a threshold (`__r < quota/|g| × 2³²` with a safety factor) to cut the
  * sort input, then rank exactly; the hash ordering makes the two-step
  * pick identical to the one-step one.
  */
object Sampling {

  /** Knuth multiplicative hash of the id, bounded to avoid 64-bit
    * overflow (DuckDB BIGINT multiplication is checked, so the oracle
    * must compute the identical expression without wrapping).
    */
  private def pseudoShuffle(id: Column): Column =
    pmod(pmod(id, lit(1048576L)) * lit(2654435761L), lit(4294967296L))

  /** Deterministic train/val/test split assignment: each row lands in the
    * split whose cumulative-fraction bucket its id-hash falls into — the
    * standard reproducible alternative to `randomSplit` (whose output
    * depends on partitioning). Purely map-side: no shuffle, no state, and
    * any engine computing the same multiplicative hash (the SQL oracle
    * does) reproduces the assignment row-for-row. Fractions must sum to 1.
    *
    * @return the input plus a `split` column.
    */
  def splitAssign(
      df: DataFrame,
      splits: Seq[(String, Double)] = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1),
      idCol: String = "doc_id"
  ): DataFrame = {
    require(splits.nonEmpty && math.abs(splits.map(_._2).sum - 1.0) < 1e-9,
      s"split fractions must sum to 1, got: $splits")
    val r = pseudoShuffle(col(idCol))
    // Cumulative thresholds in hash space; the last split takes the rest,
    // so rounding never drops a row.
    val thresholds = splits.map(_._2).scanLeft(0.0)(_ + _).tail
      .map(c => (c * 4294967296.0).toLong)
    val assigned = splits.zip(thresholds).dropRight(1).foldRight(
      lit(splits.last._1)) { case (((name, _), thr), acc) => when(r < thr, name).otherwise(acc) }
    df.withColumn("split", assigned)
  }

  /** @return (idCol, groupCol, rk) — the quota sample with each row's
    *         1-based pick rank within its group.
    */
  def quotaSample(
      df: DataFrame,
      quotas: Map[String, Long],
      groupCol: String = "lang",
      idCol: String = "doc_id"
  ): DataFrame = {
    val w = Window.partitionBy(groupCol).orderBy(col("__r"), col(idCol))
    df
      .select(col(idCol), col(groupCol), pseudoShuffle(col(idCol)).as("__r"))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= coalesce(
        element_at(typedLit(quotas), col(groupCol)), lit(0L)))
      .select(col(idCol), col(groupCol), col("rk"))
  }
}
