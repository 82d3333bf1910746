package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

import graft.sources.Tables

/** Dev probe: per-stage split of ONE pqCodebooks fit on the replicated
  * CoreScaleProbe corpus — localizes why the fit's wall is
  * core-insensitive (flat 8-vs-32 ratio at rep=50).
  *
  * Usage: runMain graft.tools.PqFitScaleProbe [replication=50]
  *   (expects /tmp/graft_corescale_emb_<rep>x from CoreScaleProbe)
  */
object PqFitScaleProbe {
  def main(args: Array[String]): Unit = {
    val replication = args.headOption.map(_.toInt).getOrElse(50)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Tables
      .configure(
        SparkSession.builder()
          .master(s"local[$cpus]")
          .config("spark.sql.shuffle.partitions", cpus)
          .config("spark.ui.enabled", "false")
          .config("spark.sql.adaptive.enabled", "true"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val embs = spark.read.parquet(s"/tmp/graft_corescale_emb_${replication}x")

    // warm
    graft.operators.ProductQuant.pqCodebooks(embs)
      .write.format("noop").mode("overwrite").save()

    val stages = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val m = si.taskMetrics
        val wall = (for { s <- si.submissionTime; e <- si.completionTime }
          yield (e - s) / 1e3).getOrElse(-1.0)
        stages.add(f"stage ${si.stageId}%4d tasks=${si.numTasks}%4d " +
          f"wall=$wall%6.2fs task=${m.executorRunTime / 1e3}%8.2fs " +
          f"gc=${m.jvmGCTime / 1e3}%5.2fs " +
          f"shufR=${m.shuffleReadMetrics.totalBytesRead / 1e6}%8.1fMB " +
          f"shufW=${m.shuffleWriteMetrics.bytesWritten / 1e6}%8.1fMB")
      }
    })
    val t0 = System.nanoTime()
    graft.operators.ProductQuant.pqCodebooks(embs)
      .write.format("noop").mode("overwrite").save()
    val wall = (System.nanoTime() - t0) / 1e9
    Thread.sleep(1000)
    println(f"[pqfit] total=$wall%.2fs cpus=$cpus rep=$replication stages=${stages.size}")
    stages.forEach(s => println(s"[pqfit] $s"))
    spark.stop()
  }
}
