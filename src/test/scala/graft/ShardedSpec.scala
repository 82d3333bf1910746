package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.config.TaskConfig
import graft.sources.{PredicateFrames, Tables}

/** Sharded MEDS input: a directory of shard files is one distributed scan
  * (the Spark answer to the reference's per-shard Hydra multirun,
  * expand_shards.py) and must produce identical results to the single
  * concatenated input.
  */
class ShardedSpec extends SparkSpec {

  test("sharded MEDS directory ≡ single input") {
    val events = Tables.events(spark, "/root/testdata/sf0.001")
      .select(
        col("user_id").as("subject_id"),
        col("ts").as("time"),
        col("event_type").as("code"),
        col("value").cast("float").as("numeric_value"))

    val dir = Files.createTempDirectory("graft_shards").toString
    events.withColumn("shard", pmod(col("subject_id"), lit(3)))
      .write.mode("overwrite").partitionBy("shard").parquet(dir)

    val yaml =
      """predicates:
        |  click: { code: click }
        |  purchase: { code: purchase }
        |trigger: click
        |windows:
        |  target:
        |    start: trigger
        |    end: start -> purchase
        |    start_inclusive: False
        |    end_inclusive: True
        |    label: purchase
        |""".stripMargin
    val cfg = TaskConfig.fromYaml(yaml)

    def run(input: org.apache.spark.sql.DataFrame) = {
      val plain = PredicateFrames.fromMeds(input, cfg.plainPredicates.toSeq)
      snap(Query(cfg, PredicateFrames.finalize(cfg, plain))
        .select("subject_id", "label", "trigger"))
    }

    val sharded = run(spark.read.parquet(dir).drop("shard"))
    val single = run(events)
    assert(sharded == single && sharded.nonEmpty)
  }
}
