package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.config.TaskConfig
import graft.sources.{PredicateFrames, Tables}

/** Dev probe: dump the executed flagship plan at scale to see join
  * strategies and exchange placement across the recursion levels.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = Tables
      .configure(
        SparkSession.builder()
          .master("local[32]")
          .config("spark.sql.shuffle.partitions", "64")
          .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    if (args.contains("--no-checkpoint")) spark.conf.set("spark.graft.checkpoint", "off")
    // ScaleProbe's generated corpus (run `ScaleProbe 32` first).
    val scaled = "/tmp/graft_scale_v2_32x"
    val ev = spark.read.parquet(scaled)
    val cfg = TaskConfig.fromYaml(ScaleProbeYaml.yaml)
    val plain = PredicateFrames.fromMeds(ev.withColumnRenamed("timestamp", "time"), cfg.plainPredicates.toSeq)
    val preds = PredicateFrames.finalize(cfg, plain)
    val out = graft.Query(cfg, preds)
    out.write.format("noop").mode("overwrite").save()
    println("=== executed plan (post-AQE) ===")
    println(out.queryExecution.executedPlan.toString.take(14000))
    spark.stop()
  }
}

object ScaleProbeYaml {
  val yaml: String =
    """predicates:
      |  click: { code: click }
      |  purchase: { code: purchase }
      |  error: { code: error }
      |  signup: { code: signup }
      |  converted: { expr: "or(purchase, signup)" }
      |trigger: click
      |windows:
      |  input:
      |    start: NULL
      |    end: trigger + 24h
      |    start_inclusive: True
      |    end_inclusive: True
      |    has: { _ANY_EVENT: "(2, None)" }
      |    index_timestamp: end
      |  gap:
      |    start: trigger
      |    end: start + 48h
      |    start_inclusive: False
      |    end_inclusive: True
      |    has: { error: "(None, 0)" }
      |  target:
      |    start: gap.end
      |    end: start -> converted
      |    start_inclusive: False
      |    end_inclusive: True
      |    label: purchase
      |""".stripMargin
}
