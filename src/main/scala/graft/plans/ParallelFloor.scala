package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Floor a frame's parallelism at the session's default parallelism —
  * scale-adaptively, never as a constant: a tiny local input (one small
  * parquet file packs into 1-2 scan splits under
  * `spark.sql.files.openCostInBytes`) would otherwise serialize every
  * downstream per-row computation onto one or two cores, while a
  * corpus-scale scan already has orders of magnitude more splits than
  * cores and must NOT pay an extra exchange.
  *
  * The check reads the physical partition count (plan-time metadata, no
  * job); the repartition, when it fires, hashes on `keyCol` — a plain
  * hash exchange, no round-robin pre-sort, deterministic row placement.
  */
object ParallelFloor {

  def apply(df: DataFrame, keyCol: String = "id"): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions >= target) df
    else df.repartition(target, col(keyCol))
  }
}
