package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

import graft.config.TaskConfig
import graft.sources.{PredicateFrames, Tables}

/** End-to-end task runner — the `aces-cli` equivalent
  * (reference: src/aces/run.py:121-180).
  *
  * Usage:
  *   runMain graft.Run --config task.yaml --data events.parquet \
  *     [--predicates overrides.yaml] [--standard meds|direct|esgpt] \
  *     [--ts-format "M/d/yyyy H:mm"] [--output out.parquet] [--window-stats dir]
  *
  * For `--standard esgpt`, `--data` is an ESGPT dataset directory
  * (subjects_df/events_df/dynamic_measurements_df parquet + config.json).
  *
  * `--data` accepts a file, directory, or glob — sharded datasets
  * (reference: expand_shards.py) are read as partitions of one distributed
  * scan rather than per-shard processes.
  *
  * Output: MEDS label schema for the `meds` standard (subject_id,
  * prediction_time, boolean_value, integer_value, float_value,
  * categorical_value; reference run.py:22-32), raw result otherwise.
  */
object Run {
  def main(args: Array[String]): Unit = {
    val opts = parseArgs(args)
    val configPath = opts.getOrElse("config", sys.error("--config is required"))
    val dataPath = opts.getOrElse("data", sys.error("--data is required"))
    val standard = opts.getOrElse("standard", "meds").toLowerCase
    val outPath = opts.getOrElse("output", "/tmp/graft_result.parquet")

    val preexisting = SparkSession.getDefaultSession.isDefined
    val spark = Tables
      .configure(
        SparkSession.builder()
          .master(sys.env.getOrElse("SPARK_MASTER", "local[*]"))
          .config("spark.sql.shuffle.partitions",
            sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
          .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val cfg = TaskConfig.fromYaml(
      Files.readString(Paths.get(configPath)),
      opts.get("predicates").map(p => Files.readString(Paths.get(p))))

    val plain = standard match {
      case "direct" =>
        PredicateFrames.directLoad(
          spark, dataPath, cfg.plainPredicates.keys.toSeq, opts.get("ts-format"))
      case "meds" =>
        PredicateFrames.fromMeds(spark.read.parquet(dataPath), cfg.plainPredicates.toSeq)
      case "esgpt" =>
        PredicateFrames.fromEsgptDir(spark, dataPath, cfg.plainPredicates.toSeq)
      case other =>
        sys.error(s"Invalid data standard: $other. Options are 'direct', 'MEDS', 'ESGPT'.")
    }

    val predicates = PredicateFrames.finalize(cfg, plain)
    val result = Query(cfg, predicates)

    opts.get("window-stats").foreach { dir =>
      result.write.mode("overwrite").parquet(dir)
    }

    val out = if (standard == "meds") Query.toMedsLabels(result) else result
    out.write.mode("overwrite").parquet(outPath)
    println(s"[graft.Run] wrote ${spark.read.parquet(outPath).count()} rows to $outPath")
    if (!preexisting) spark.stop()
  }

  private def parseArgs(args: Array[String]): Map[String, String] =
    args.sliding(2, 2).collect {
      case Array(k, v) if k.startsWith("--") => k.stripPrefix("--") -> v
    }.toMap
}
