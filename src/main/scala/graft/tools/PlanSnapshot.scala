package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

import graft.harness.QueryCatalog

/** Dump `.explain("formatted")` for named catalog queries (default: the
  * whole bench set) to `<outDir>/<name>_<suffix>.txt` — the before/after
  * plan evidence the optimization rounds commit under `plans/rNN/`.
  *
  * Usage: runMain graft.tools.PlanSnapshot <outDir> <suffix> [name ...]
  *   SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) picks the scale.
  */
object PlanSnapshot {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: PlanSnapshot <outDir> <suffix> [name...]")
    val outDir = args(0)
    val suffix = args(1)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.sources.Tables
      .configure(
        SparkSession.builder()
          .master(s"local[$cpus]")
          .config("spark.sql.shuffle.partitions", cpus)
          .config("spark.ui.enabled", "false")
          .config("spark.sql.adaptive.enabled", "true"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val names =
      if (args.length > 2) args.drop(2).toSeq else QueryCatalog.benchNames
    val fns = QueryCatalog.queries
    Files.createDirectories(Paths.get(outDir))
    names.foreach { name =>
      val fn = fns.getOrElse(name, sys.error(s"unknown catalog query '$name'"))
      val txt =
        try fn(spark, sfDir).queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        catch { case e: Throwable => s"EXPLAIN FAILED: $e" }
      Files.writeString(Paths.get(s"$outDir/${name}_$suffix.txt"), txt)
      println(s"[plan] $name -> $outDir/${name}_$suffix.txt")
    }
    spark.stop()
  }
}
