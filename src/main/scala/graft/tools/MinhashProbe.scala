package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.Texts
import graft.operators.Dedup
import graft.sources.Tables

/** Stage timing for the MinHash-LSH pipeline at sf0.1. */
object MinhashProbe {
  def main(args: Array[String]): Unit = {
    val spark = Tables.configure(
      SparkSession.builder().master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables.table(spark, "/root/testdata/sf0.1", "documents")

    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s (n=$n)")
    }

    time("warmup shingle count") {
      docs.select(size(Texts.distinctShingles(col("text"), 3)).as("n")).agg(sum("n")).head.getLong(0)
    }
    time("signatures (explode+64 mins)") {
      Dedup.minhashSignatures(docs, 64, 3).write.format("noop").mode("overwrite").save(); 0L
    }
    time("full minhashLsh") {
      Dedup.minhashLsh(docs, 0.5).write.format("noop").mode("overwrite").save(); 0L
    }
    time("full minhashLsh (2nd)") {
      Dedup.minhashLsh(docs, 0.5).write.format("noop").mode("overwrite").save(); 0L
    }
    spark.stop()
  }
}
