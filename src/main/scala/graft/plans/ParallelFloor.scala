package graft.plans

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.col

/** Floor a frame's parallelism at the session's default parallelism —
  * scale-adaptively, never as a constant: a tiny local input (one small
  * parquet file packs into 1-2 scan splits under
  * `spark.sql.files.openCostInBytes`) would otherwise serialize every
  * downstream per-row computation onto one or two cores, while a
  * corpus-scale scan already has orders of magnitude more splits than
  * cores and must NOT pay an extra exchange.
  *
  * PRECONDITION — scan-level inputs only, and it is now enforced: the
  * partition-count read goes through `df.rdd`, which on an
  * exchange-bearing plan under AQE would eagerly execute the upstream
  * shuffle stages as real jobs and then re-execute that lineage in the
  * caller (double execution). The guard below therefore leaves any plan
  * containing an Exchange untouched instead of probing it — every
  * intended call site is a scan+filter+project subtree, where `.rdd`
  * is plan-assembly only (no job). The repartition, when it fires,
  * hashes on `key` — a plain hash exchange, no round-robin pre-sort,
  * deterministic row placement.
  *
  * `key` should be high-cardinality under the ACTUAL data: hashing a
  * payload column collides for duplicate-heavy corpora (every identical
  * text lands on one partition — the serialization this floor exists to
  * prevent); prefer an id, or a per-row expression when no id rides the
  * frame.
  */
object ParallelFloor {

  def apply(df: DataFrame, keyCol: String = "id"): DataFrame =
    apply(df, col(keyCol))

  def apply(df: DataFrame, key: Column): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    val hasExchange = df.queryExecution.sparkPlan.collectFirst {
      case e: org.apache.spark.sql.execution.exchange.Exchange => e
    }.isDefined
    if (hasExchange) df
    else if (df.rdd.getNumPartitions >= target) df
    else df.repartition(target, key)
  }
}
