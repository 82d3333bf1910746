package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for heavy-hitter keys.
  *
  * AQE's skew-join splitting handles joins; for aggregations over keys with
  * pathological fan-in (one subject with 10^8 events, one LSH bucket with
  * 10^6 docs), two-phase salted aggregation bounds any single task:
  * partial-aggregate on (key, salt), then final-aggregate on the key. For
  * algebraic aggregates (sum/count/min/max) results are identical to the
  * direct group-by — the catalog exposes `salted_groupby` with the plain
  * SQL as its oracle to prove it.
  */
object Skew {

  /** Two-phase salted sum-aggregation.
    *
    * @param saltBuckets number of partial buckets per key; the heaviest
    *                    key's largest task shrinks by this factor.
    */
  def saltedSum(
      df: DataFrame,
      keyCols: Seq[String],
      sumCols: Seq[String],
      saltBuckets: Int = 16
  ): DataFrame = {
    val salted = df.withColumn("__salt", pmod(spark_partition_id() + monotonically_increasing_id(), lit(saltBuckets)))
    val partial = salted
      .groupBy((keyCols :+ "__salt").map(col): _*)
      .agg(
        sum(sumCols.head).as(sumCols.head),
        sumCols.tail.map(c => sum(c).as(c)): _*)
    partial
      .groupBy(keyCols.map(col): _*)
      .agg(
        sum(sumCols.head).cast("long").as(sumCols.head),
        sumCols.tail.map(c => sum(c).cast("long").as(c)): _*)
  }
}
