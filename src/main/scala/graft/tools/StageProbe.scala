package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

import graft.harness.QueryCatalog

/** Dev probe: per-stage wall/task-time split of one catalog query — the
  * §1/§7.1 evidence (which stage is slow, compute vs shuffle) without
  * the UI (disabled in this environment). Runs the query `warm` untimed
  * times first, then once instrumented; prints every stage's wall span,
  * summed executor run time, GC time and shuffle bytes.
  *
  * Usage: runMain graft.tools.StageProbe <query> [warmRuns=2]
  */
object StageProbe {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: StageProbe <query> [warmRuns]")
    val name = args(0)
    val warmRuns = if (args.length > 1) args(1).toInt else 2
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

    val fn = QueryCatalog.queries.getOrElse(
      name, sys.error(s"unknown catalog query '$name'"))
    (1 to warmRuns).foreach { _ =>
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
    }

    val stages = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val listener = new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val m = si.taskMetrics
        val wall = (for {
          s <- si.submissionTime; e <- si.completionTime
        } yield (e - s) / 1e3).getOrElse(-1.0)
        stages.add(
          f"stage ${si.stageId}%4d tasks=${si.numTasks}%4d wall=$wall%6.2fs " +
            f"task=${m.executorRunTime / 1e3}%7.2fs gc=${m.jvmGCTime / 1e3}%5.2fs " +
            f"shufR=${m.shuffleReadMetrics.totalBytesRead / 1e6}%8.1fMB " +
            f"shufW=${m.shuffleWriteMetrics.bytesWritten / 1e6}%8.1fMB  " +
            si.name.takeWhile(_ != '\n').take(90))
      }
    }
    spark.sparkContext.addSparkListener(listener)
    val t0 = System.nanoTime()
    fn(spark, sfDir).write.format("noop").mode("overwrite").save()
    val wall = (System.nanoTime() - t0) / 1e9
    // Let the listener bus drain before printing.
    Thread.sleep(1000)
    println(f"[stage] $name total=$wall%.2fs stages=${stages.size}")
    stages.forEach(s => println(s"[stage] $s"))
    spark.stop()
  }
}
