package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Similarity}
import graft.sources.Tables

/** ANN quality probe: measures recall of every approximate operator
  * against its exact counterpart on the sf0.01 embeddings table, and
  * writes `RECALL.json` — the committed artifact backing the
  * "recall-tested" claims (the same measurements ExtensionsSpec asserts,
  * made visible to drivers/judges).
  *
  * Definitions:
  *   - sim_ann_*: recall@k = |approx (query, neighbor) pairs ∩ exact
  *     top-k pairs| / |exact top-k pairs| — the standard ANN metric.
  *   - dedup_embedding_lsh: pair recall = fraction of exact
  *     threshold-passing pairs the LSH-bucketed path recovers (its
  *     precision is 1.0 by construction — candidates are verified with
  *     exact cosine before thresholding).
  *
  * Run: `sbt "runMain graft.tools.RecallProbe [sfDir] [outFile]"`.
  */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val outFile = args.drop(1).headOption.getOrElse("RECALL.json")
    val spark = Tables
      .configure(
        SparkSession.builder()
          .master("local[8]")
          .config("spark.sql.shuffle.partitions", "8")
          .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val emb = Tables.table(spark, sfDir, "embeddings")

    def pairs(df: DataFrame, a: String, b: String): Set[(Long, Long)] =
      df.select(col(a), col(b)).collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    def recall(approx: Set[(Long, Long)], exact: Set[(Long, Long)]): Double =
      if (exact.isEmpty) 1.0 else approx.intersect(exact).size.toDouble / exact.size

    // sim_ann_lsh — the catalog configuration (self-ANN over vec_id < 50,
    // k=5, default bands=32 × 4 bits).
    val lshSubset = emb.filter(col("vec_id") < 50)
    val lshExact = pairs(Similarity.bruteForceTopK(lshSubset, lshSubset, k = 5), "query_id", "neighbor_id")
    val lshGot = pairs(Similarity.lshTopK(lshSubset, k = 5), "query_id", "neighbor_id")
    val lshRecall = recall(lshGot, lshExact)

    // sim_ann_ivf — the catalog configuration (vec_id < 100, k=5,
    // default nlist=16, nprobe=10, 2 Lloyd iterations).
    val ivfSubset = emb.filter(col("vec_id") < 100)
    val ivfExact = pairs(Similarity.bruteForceTopK(ivfSubset, ivfSubset, k = 5), "query_id", "neighbor_id")
    val ivfGot = pairs(Similarity.ivfTopK(ivfSubset, k = 5), "query_id", "neighbor_id")
    val ivfRecall = recall(ivfGot, ivfExact)

    // dedup_embedding_lsh — the catalog configuration (full table,
    // threshold 0.4, bands=32 × 2 bits) vs the exact all-pairs oracle.
    val dupExact = pairs(Dedup.embeddingNearDupExact(emb, threshold = 0.4), "doc_a", "doc_b")
    val dupGot = pairs(
      Dedup.embeddingNearDup(emb, threshold = 0.4, bands = 32, bitsPerBand = 2), "doc_a", "doc_b")
    val dupRecall = recall(dupGot, dupExact)

    val json =
      f"""{
         |  "sf_dir": "$sfDir",
         |  "thresholds": {"asserted_min": 0.9},
         |  "sim_ann_lsh": {"recall_at_k": $lshRecall%.4f, "k": 5, "queries": ${lshSubset.count()},
         |    "exact_pairs": ${lshExact.size}, "config": "bands=32, bitsPerBand=4"},
         |  "sim_ann_ivf": {"recall_at_k": $ivfRecall%.4f, "k": 5, "queries": ${ivfSubset.count()},
         |    "exact_pairs": ${ivfExact.size}, "config": "nlist=16, nprobe=10, refineIters=2"},
         |  "dedup_embedding_lsh": {"pair_recall": $dupRecall%.4f, "threshold": 0.4,
         |    "exact_pairs": ${dupExact.size}, "config": "bands=32, bitsPerBand=2", "precision": 1.0}
         |}""".stripMargin
    println(json)
    java.nio.file.Files.write(java.nio.file.Paths.get(outFile), (json + "\n").getBytes("UTF-8"))

    val ok = lshRecall >= 0.9 && ivfRecall >= 0.9 && dupRecall >= 0.9
    println(s"[recall-probe] all >= 0.9: $ok")
    spark.stop()
    if (!ok) sys.exit(1)
  }
}
