package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.{Tables, WebDataset}

/** WebDataset tar I/O scaling probe: writeTarAuto / scanTar / samples
  * throughput at 1×/k×/K× the sf0.1 documents corpus — the measurement
  * behind the "one task per shard file, members stream through a bounded
  * filesystem handle" claim. The shard count derives from a FIXED byte budget,
  * so a bigger corpus gets MORE shards at constant shard size — the
  * production shape (more parallel tasks, same per-task memory), which
  * is exactly what the probe verifies: per-MB cost must stay flat or
  * fall as shards multiply.
  *
  * Run: `sbt "runMain graft.tools.TarScaleProbe [sfDir] [k] [K]"`;
  * results are committed to BENCH_NOTES.md.
  */
object TarScaleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val midCopies = args.lift(1).map(_.toInt).getOrElse(10)
    val bigCopies = args.lift(2).map(_.toInt).getOrElse(50)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Tables
      .configure(
        SparkSession.builder()
          .master(s"local[$cpus]")
          .config("spark.sql.shuffle.partitions", cpus)
          .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val base = Tables.table(spark, sfDir, "documents")
      .select(col("doc_id"), col("text").cast("binary").as("t"),
        col("lang").cast("binary").as("l"))
    val idStride = base.agg(max(col("doc_id"))).head().getLong(0) + 1L
    def replicated(k: Int): DataFrame =
      (0 until k).map(i =>
        base.select((col("doc_id") + lit(i * idStride)).as("doc_id"),
          col("t"), col("l"))).reduce(_ unionByName _).cache()

    def time(f: => Unit): Double = {
      def once(): Double = {
        val t0 = System.nanoTime()
        f
        (System.nanoTime() - t0) / 1e9
      }
      math.min(once(), once())
    }
    def loadavg(): Double =
      java.lang.management.ManagementFactory.getOperatingSystemMXBean.getSystemLoadAverage

    // Warm-up: one tiny end-to-end round trip (codegen + commons-compress JIT).
    val warmDir = java.nio.file.Files.createTempDirectory("tarprobe-warm").toString
    WebDataset.writeTar(base.limit(50), warmDir + "/w", shards = 2,
      keyCol = "doc_id", members = Seq("txt" -> "t", "cls" -> "l"))
    WebDataset.samples(WebDataset.scanTar(spark, warmDir + "/w"), Seq("txt", "cls"))
      .write.format("noop").mode("overwrite").save()

    val targetShardBytes = 8L << 20 // fixed 8 MiB shards: count grows with corpus

    def measure(label: String, corpus: DataFrame): String = {
      val nDocs = corpus.count() // materialize the cache before timing
      val mb = corpus.select(sum(octet_length(col("t")) + octet_length(col("l"))))
        .head().getLong(0) / 1e6
      val dir = java.nio.file.Files.createTempDirectory("tarprobe").toString + "/corpus"
      var shards = 0
      val tWrite = time {
        shards = WebDataset.writeTarAuto(corpus, dir, targetShardBytes,
          keyCol = "doc_id", members = Seq("txt" -> "t", "cls" -> "l"))
      }
      val tScan = time {
        WebDataset.scanTar(spark, dir)
          .agg(count(lit(1)), sum("n_bytes")).collect()
      }
      val tPivot = time {
        WebDataset.samples(WebDataset.scanTar(spark, dir), Seq("txt", "cls"))
          .write.format("noop").mode("overwrite").save()
      }
      f"$label: docs=$nDocs payload=$mb%.1f MB shards=$shards | " +
        f"write $tWrite%.2f s (${mb / tWrite}%.0f MB/s) " +
        f"scan $tScan%.2f s (${mb / tScan}%.0f MB/s) " +
        f"pivot $tPivot%.2f s (${mb / tPivot}%.0f MB/s) | loadavg ${loadavg()}%.1f"
    }

    println(measure("x1", base.cache()))
    println(measure(s"x$midCopies", replicated(midCopies)))
    println(measure(s"x$bigCopies", replicated(bigCopies)))
    spark.stop()
  }
}
