package graft.harness

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic synthetic embedding corpora for ANN evaluation.
  *
  * The driver-generated `embeddings.parquet` fixture is near-uniform
  * random — the WORST case for coarse quantization (no cluster structure
  * for IVF to exploit, so holding a recall bar needs nprobe ≈ 0.625·nlist,
  * a 64% corpus scan — RECALL.json `nprobe_sweep`). Real embedding
  * corpora (sentence/image encoders over web data) cluster heavily, and
  * the standard ANN-benchmark model for that regime is a mixture of
  * Gaussians. This generator produces one deterministically: everything
  * derives from `xxhash64` — no RNG, no time — so the fixture is
  * identical on every run and every executor, and a measured sweep over
  * it is reproducible evidence for the nprobe ≪ nlist operating point.
  *
  * Scale shape: generation is one map-side pass over `spark.range(n)`
  * against the broadcast center array (centers are nClusters·dim doubles
  * — trivially broadcastable); no shuffles, no driver-side loops.
  */
object SyntheticEmbeddings {

  /** Hash-derived uniform in (0, 1): never exactly 0 (safe under log). */
  private def unif(salt: String, a: Column, b: Column): Column =
    (pmod(xxhash64(lit(salt), a, b), lit(1000000L)).cast("double") + 0.5d) / 1000000.0d

  /** A mixture-of-Gaussians embedding table:
    * (vec_id long, cluster int, embedding array<float>).
    *
    * `nClusters` centers drawn uniform in [-1, 1]^dim (hash-derived);
    * vector `i` belongs to cluster `xxhash64(i) mod nClusters` and is its
    * center plus i.i.d. N(0, clusterStd²) noise via Box–Muller over two
    * hash uniforms. With centers ~unit-scale and `clusterStd` ≈ 0.05–0.1,
    * nearest neighbors are overwhelmingly same-cluster — the regime where
    * IVF's coarse quantizer earns its keep. The `cluster` column is the
    * ground-truth assignment for diagnostics; drop it to mimic the real
    * table's schema.
    */
  def mixtureOfGaussians(
      spark: SparkSession,
      n: Long,
      dim: Int = 64,
      nClusters: Int = 40,
      clusterStd: Double = 0.08
  ): DataFrame = {
    require(n > 0 && dim > 0 && nClusters > 0, "n, dim, nClusters must be positive")
    val centers = spark.range(1).select(
      transform(sequence(lit(0), lit(nClusters - 1)), c =>
        transform(sequence(lit(0), lit(dim - 1)), d =>
          unif("mog-center", c, d) * 2.0d - 1.0d)).as("centers"))

    spark.range(n).select(col("id").as("vec_id"))
      .crossJoin(broadcast(centers))
      .select(
        col("vec_id"),
        pmod(xxhash64(lit("mog-assign"), col("vec_id")), lit(nClusters.toLong))
          .cast("int").as("cluster"),
        col("centers"))
      .select(
        col("vec_id"),
        col("cluster"),
        transform(sequence(lit(0), lit(dim - 1)), d => {
          val g = sqrt(lit(-2.0d) * log(unif("mog-noise-r", col("vec_id"), d))) *
            cos(lit(2.0d * math.Pi) * unif("mog-noise-t", col("vec_id"), d))
          (element_at(element_at(col("centers"), col("cluster") + 1), d + 1) +
            lit(clusterStd) * g).cast("float")
        }).as("embedding"))
  }
}
