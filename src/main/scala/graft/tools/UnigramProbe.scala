package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: phase split of text_unigram_tokens — the zh translate +
  * word-frequency collect (learn input), the driver EM, and the
  * distributed Viterbi apply — so optimization targets the real phase.
  */
object UnigramProbe {
  def main(args: Array[String]): Unit = {
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

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val hanzi = "一二三四五六七八九十百千万上下左右中大小山水火木金土"
    val mixed = docs.withColumn("text",
      when(col("lang") === "zh",
        translate(col("text"), "abcdefghijklmnopqrstuvwxyz ", hanzi))
        .otherwise(col("text")))

    def time[T](label: String, runs: Int = 3)(f: => T): Unit = {
      val ts = (1 to runs).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"[uni] $label%-28s runs=${ts.map(t => f"$t%.2f").mkString(",")} min=${ts.min}%.2f")
    }

    time("learnPieces (full)") {
      graft.functions.Unigram.learnPieces(
        mixed, vocabSize = 512, maxPieceLen = 6, emIters = 2, vocabLimit = 4096)
        .write.format("noop").mode("overwrite").save()
    }
    val pieces = graft.functions.Unigram.learnPieces(
      mixed, vocabSize = 512, maxPieceLen = 6, emIters = 2, vocabLimit = 4096)
    time("tokenCounts (apply)") {
      graft.functions.Unigram.tokenCounts(mixed, pieces, maxPieceLen = 6)
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
