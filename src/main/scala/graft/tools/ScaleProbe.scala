package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.config.TaskConfig
import graft.sources.{PredicateFrames, Tables}

/** Throughput scaling probe: replicates the sf0.1 events table N× (users
  * shifted per replica so subject cardinality scales too), runs the
  * flagship cohort task, and reports event-rows/second — the number to
  * compare against the reference baseline (~0.22-0.45 M rows/s per task on
  * 36 cores, BASELINE.md). At small SF the engine is stage-overhead-bound;
  * this shows what amortizes at scale. Temporary inputs go to /tmp.
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val replication = args.headOption.map(_.toInt).getOrElse(32)
    val spark = Tables
      .configure(
        SparkSession.builder()
          .master("local[32]")
          .config("spark.sql.shuffle.partitions", "64")
          .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val scaled = s"/tmp/graft_scale_${replication}x"
    if (!new java.io.File(scaled, "_SUCCESS").exists()) {
      val base = Tables.events(spark, "/root/testdata/sf0.1")
      base
        .crossJoin(spark.range(replication).select(col("id").as("rep")))
        .select(
          (col("user_id") + col("rep") * 1000000L).as("subject_id"),
          col("ts").as("timestamp"),
          col("event_type").as("code"),
          col("value").cast("float").as("numeric_value"))
        .write.mode("overwrite").parquet(scaled)
    }

    val cfg = TaskConfig.fromYaml(flagshipYaml)
    def run(): (Long, Double) = {
      val ev = spark.read.parquet(scaled)
      val nRows = ev.count()
      val t0 = System.nanoTime()
      val plain = PredicateFrames.fromMeds(ev.withColumnRenamed("timestamp", "time"), cfg.plainPredicates.toSeq)
      val preds = PredicateFrames.finalize(cfg, plain)
      val out = graft.Query(cfg, preds)
      out.write.format("noop").mode("overwrite").save()
      (nRows, (System.nanoTime() - t0) / 1e9)
    }

    run() // warm-up
    val (rows, secs) = run()
    println(f"[scale-probe] replication=${replication}x rows=$rows wall=${secs}%.1f s " +
      f"throughput=${rows / secs / 1e6}%.3f M rows/s")
    spark.stop()
  }

  private val flagshipYaml =
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
