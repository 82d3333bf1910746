package graft

import org.apache.spark.sql.functions._

import graft.model.TemporalBounds
import graft.operators.TemporalWindowAgg
import graft.sources.{PredicateFrames, Tables}

/** Bucketed-table path: windows over a bucketed+sorted canonical frame
  * must plan with zero exchanges (the scan satisfies the distribution).
  */
class BucketedSpec extends SparkSpec {

  test("window aggregation over a bucketed table needs no shuffle") {
    val preds = Tables.eventsAsPredicates(
      spark, "/root/testdata/sf0.001", Seq("click", "purchase"))
    PredicateFrames.writeBucketed(preds, "graft_bucketed_preds", buckets = 4)

    val fromTable = PredicateFrames.readBucketed(spark, "graft_bucketed_preds")
    val out = TemporalWindowAgg(fromTable, TemporalBounds(true, 86400000000L, true, 0L))

    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed scan must satisfy window distribution; plan:\n${plan.take(1500)}")

    // Same results as the non-bucketed path.
    val direct = TemporalWindowAgg(preds, TemporalBounds(true, 86400000000L, true, 0L))
    assert(snap(out) == snap(direct))

    spark.sql("DROP TABLE IF EXISTS graft_bucketed_preds")
  }
}
