package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Core-scaling evidence probe: the sf0.1 bench entries are
  * scheduler-bound (sub-5 s walls of many small jobs), so their
  * 8-core/32-core ratios sit near 1 and witness nothing about operator
  * parallelism. This probe times the OPTIMIZED heavy paths on an
  * N×-replicated corpus (documents and embeddings, ids shifted per
  * replica) where compute dominates fixed latency — run it once with
  * `SPARK_GRAFT_CPUS=8` and once with `32` and compare the printed
  * minima (BENCH_NOTES records the ratio table).
  *
  * Usage: runMain graft.tools.CoreScaleProbe [replication=10]
  */
object CoreScaleProbe {
  def main(args: Array[String]): Unit = {
    val replication = args.headOption.map(_.toInt).getOrElse(10)
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

    // Replicated inputs, written once (both core-count invocations read
    // the same files): doc/vec ids shift by replica so key cardinality
    // scales with the data. 16 output files so the scan parallelizes.
    val docsPath = s"/tmp/graft_corescale_docs_${replication}x"
    val embPath = s"/tmp/graft_corescale_emb_${replication}x"
    if (!new java.io.File(docsPath, "_SUCCESS").exists()) {
      Tables.table(spark, "/root/testdata/sf0.1", "documents")
        .crossJoin(spark.range(replication).select(col("id").as("rep")))
        .select(
          (col("doc_id") + col("rep") * 10000000L).as("doc_id"),
          col("lang"), col("source"), col("text"), col("n_chars"))
        .repartition(16).write.mode("overwrite").parquet(docsPath)
      Tables.table(spark, "/root/testdata/sf0.1", "embeddings")
        .crossJoin(spark.range(replication).select(col("id").as("rep")))
        .select(
          (col("vec_id") + col("rep") * 10000000L).as("vec_id"),
          col("embedding"))
        .repartition(16).write.mode("overwrite").parquet(embPath)
    }
    val docs = spark.read.parquet(docsPath)
    val embs = spark.read.parquet(embPath)

    def time(label: String, runs: Int = 2)(f: => Unit): Unit = {
      val ts = (1 to runs).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"[corescale] $label%-24s cpus=$cpus rep=$replication " +
        f"runs=${ts.map(t => f"$t%.2f").mkString(",")} min=${ts.min}%.2f")
    }

    time("qmodel_train") {
      graft.operators.QualityClassifier.train(
        docs.withColumn("is_en", (col("lang") === "en").cast("int")),
        labelCol = "is_en", dim = 1024, iters = 32)
        .write.format("noop").mode("overwrite").save()
    }
    time("pq_fit") {
      graft.operators.ProductQuant.pqCodebooks(embs)
        .write.format("noop").mode("overwrite").save()
    }
    time("langid_classify") {
      graft.operators.LangIdTrigram.classifyAll(docs)
        .write.format("noop").mode("overwrite").save()
    }
    time("minhash_signatures") {
      graft.operators.Dedup.minhashSignatures(docs, 64, 3)
        .write.format("noop").mode("overwrite").save()
    }
    time("cc_clusters") {
      graft.operators.Dedup.duplicateClusters(
        graft.operators.Dedup.minhashLsh(docs, 0.5)
          .select(col("doc_a"), col("doc_b")))
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
