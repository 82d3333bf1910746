package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: where does the IVF-PQ FIT wall go at bench scale?
  * Times the coarse fit, the PQ codebook fit, the full index build and
  * the 100-vector self-join bench entry separately (best of N, warm), so
  * the optimization rounds attack the real component instead of the
  * aggregate number.
  */
object PqFitProbe {
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

    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    def time[T](label: String, runs: Int = 3)(f: => T): Unit = {
      val ts = (1 to runs).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"[pqfit] $label%-28s runs=${ts.map(t => f"$t%.2f").mkString(",")} min=${ts.min}%.2f")
    }

    time("ivfCentroids(nlist=16)") {
      graft.operators.Similarity.ivfCentroids(emb, 16).write
        .format("noop").mode("overwrite").save()
    }
    time("pqCodebooks(m=16,ks=32)") {
      graft.operators.ProductQuant.pqCodebooks(emb, 16, 32).write
        .format("noop").mode("overwrite").save()
    }
    time("full ivfPqIndex codes") {
      graft.operators.ProductQuant.ivfPqIndex(emb, 16, 16, 32).codes.write
        .format("noop").mode("overwrite").save()
    }
    time("ivfpq100 e2e (bench entry)") {
      graft.operators.ProductQuant
        .ivfPqTopK(emb.filter(col("vec_id") < 100), k = 5).write
        .format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
