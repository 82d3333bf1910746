package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.{EventBounds, TemporalBounds}
import graft.operators.{EventBoundAgg, TemporalWindowAgg}
import graft.sources.Tables

/** Physical-plan audit: prints exchange counts and pushdown evidence for
  * the core operators, the artifacts backing the scale-design claims in
  * README.md. Run: `sbt "runMain graft.tools.PlanAudit"`.
  */
object PlanAudit {

  private def exchanges(df: DataFrame): Int = {
    val plan = df.queryExecution.executedPlan.toString
    "Exchange hashpartitioning".r.findAllIn(plan).length +
      "Exchange rangepartitioning".r.findAllIn(plan).length
  }

  private def audit(name: String, df: DataFrame, expectMaxExchanges: Int): Unit = {
    val n = exchanges(df)
    val flag = if (n <= expectMaxExchanges) "OK " else "HOT"
    println(f"$flag $name%-28s exchanges=$n (budget $expectMaxExchanges)")
    if (n > expectMaxExchanges) df.explain("formatted")
  }

  def main(args: Array[String]): Unit = {
    val spark = Tables
      .configure(
        SparkSession.builder()
          .master("local[8]")
          .config("spark.sql.shuffle.partitions", "8")
          .config("spark.ui.enabled", "false")
          // plan-shape audit: AQE rewrites plans at runtime, disable for
          // a stable static view
          .config("spark.sql.adaptive.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.001"

    val preds = Tables.eventsAsPredicates(spark, dir, Seq("click", "purchase", "error"))

    // 1 exchange: the subject_id repartition; collapse + window reuse it.
    audit("temporal_window", TemporalWindowAgg(preds, TemporalBounds(true, 86400000000L, true, 0L)), 1)

    // 2 = main stream (1, reused by cumsum window, bound window, and the
    // co-partitioned boundary join) + the boundaries side-branch, which
    // Catalyst rebuilds with the boundary filter pushed to the scan — a
    // *reduced* re-read, not a re-shuffle of the main stream. Inside
    // Query/ExtractSubtree the input frame is persisted, so the branch
    // reads the cache instead.
    audit("event_bound", EventBoundAgg(preds, EventBounds(true, "is_purchase", true, 0L)), 2)

    // +1 for the offset-correction branch (same pushdown-reduced shape).
    audit("event_bound_offset", EventBoundAgg(preds, EventBounds(true, "is_purchase", true, 3600000000L)), 3)

    // Parquet pushdown: filter + projection must reach the scan.
    val scan = Tables.table(spark, dir, "lineitem")
      .filter(col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
      .select("l_orderkey", "l_quantity")
    val scanPlan = scan.queryExecution.executedPlan.toString
    val pushed = scanPlan.contains("PushedFilters: [IsNotNull(l_shipdate), LessThan(l_shipdate")
    val pruned = scanPlan.contains("ReadSchema: struct<l_orderkey:bigint,l_quantity:double,l_shipdate")
    println(s"${if (pushed) "OK " else "HOT"} parquet filter pushdown        pushed=$pushed")
    println(s"${if (pruned) "OK " else "HOT"} parquet column pruning          pruned=$pruned")
    if (!pushed || !pruned) scan.explain("formatted")

    // Whole-stage codegen coverage on the temporal window path.
    // Sort elimination: over a frame cached sorted-within-partitions on
    // (subject_id, __ts_us), window operators must NOT re-sort.
    val sortedCached = preds
      .withColumn(graft.operators.TemporalWindowAgg.TsUs, unix_micros(col("timestamp")))
      .sortWithinPartitions(col("subject_id"), col(graft.operators.TemporalWindowAgg.TsUs))
      .persist()
    sortedCached.count()
    val overCached = TemporalWindowAgg(sortedCached, TemporalBounds(true, 86400000000L, true, 0L))
    // Count sorts only above the cache boundary — the cached plan's own
    // materialization sort is printed inside InMemoryRelation.
    val planAboveCache =
      overCached.queryExecution.executedPlan.toString.split("InMemoryRelation").head
    val nSorts = "Sort ".r.findAllIn(planAboveCache).length
    println(s"${if (nSorts == 0) "OK " else "HOT"} window sort reuse              sorts=$nSorts")
    sortedCached.unpersist()

    // Codegen'd operators carry a "*(stageId)" prefix in the plan string.
    val wsPlan = TemporalWindowAgg(preds, TemporalBounds(true, 86400000000L, true, 0L))
      .queryExecution.executedPlan.toString
    val codegenOps = "\\*\\(\\d+\\)".r.findAllIn(wsPlan).length
    println(s"${if (codegenOps > 0) "OK " else "HOT"} codegen'd operators            n=$codegenOps")

    spark.stop()
  }
}
