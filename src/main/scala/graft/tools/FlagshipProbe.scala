package graft.tools

import org.apache.spark.sql.SparkSession

import graft.harness.QueryCatalog

/** Timing probe: flagship with vs without per-level checkpointing. */
object FlagshipProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.sources.Tables
      .configure(
        SparkSession.builder()
          .master("local[32]")
          .config("spark.sql.shuffle.partitions", "32")
          .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }

    // warm-up
    QueryCatalog.flagship(spark, sfDir).write.format("noop").mode("overwrite").save()

    for (_ <- 1 to 2) {
      spark.conf.set("spark.graft.checkpoint", "local")
      time("flagship checkpoint=lazy-local") {
        QueryCatalog.flagship(spark, sfDir).write.format("noop").mode("overwrite").save()
      }
      spark.conf.set("spark.graft.checkpoint", "off")
      time("flagship checkpoint=off      ") {
        QueryCatalog.flagship(spark, sfDir).write.format("noop").mode("overwrite").save()
      }
    }
    spark.conf.set("spark.graft.checkpoint", "local")
    spark.stop()
  }
}
