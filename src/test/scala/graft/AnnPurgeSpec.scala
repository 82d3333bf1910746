package graft

import org.apache.spark.sql.functions._

import graft.operators.ProductQuant

/** Deletion propagation over a fitted IVF-PQ index: the purged vectors'
  * code rows leave (no probe can return them), the fits stay, and the
  * result equals serving an index whose codes were filtered by hand.
  */
class AnnPurgeSpec extends SparkSpec {

  import spark.implicits._

  // Deterministic clustered vectors (the harness mixture-of-Gaussians
  // generator) — structured enough that every PQ codeword is populated.
  private def vecs = graft.harness.SyntheticEmbeddings
    .mixtureOfGaussians(spark, n = 48L, dim = 8, nClusters = 4)
    .select("vec_id", "embedding")

  test("purged vectors leave serving; survivors re-rank; fits untouched") {
    val corpus = vecs.filter(col("vec_id") >= 8)
    val queries = vecs.filter(col("vec_id") < 8)
    val idx = ProductQuant.ivfPqIndex(corpus, nlist = 4, m = 4, ks = 8)
    val purged = ProductQuant.ivfPqIndexPurge(
      idx, corpus.filter(pmod(col("vec_id"), lit(3)) === 0).select("vec_id"))
    // Codes anti-join exactly; centroids/codebooks are the same frames.
    assert(snap(purged.codes.select("id")).sorted ==
      snap(idx.codes.filter(pmod(col("id"), lit(3)) =!= 0).select("id")).sorted)
    assert(purged.centroids eq idx.centroids)
    assert(purged.codebooks eq idx.codebooks)
    val keptCorpus = corpus.filter(pmod(col("vec_id"), lit(3)) =!= 0)
    val out = ProductQuant.ivfPqTopK(
      queries, keptCorpus, purged, 3, 4, 2, "vec_id", "embedding")
    assert(out.filter(pmod(col("neighbor_id"), lit(3)) === 0).count() == 0,
      "a purged vector surfaced as a neighbor")
    val manual = idx.copy(
      codes = idx.codes.filter(pmod(col("id"), lit(3)) =!= 0))
    val outManual = ProductQuant.ivfPqTopK(
      queries, keptCorpus, manual, 3, 4, 2, "vec_id", "embedding")
    assert(snap(out) == snap(outManual),
      "purge diverged from the hand-filtered index")
    // Re-purging the same ids is a no-op.
    val again = ProductQuant.ivfPqIndexPurge(
      purged, corpus.filter(pmod(col("vec_id"), lit(3)) === 0).select("vec_id"))
    assert(snap(ProductQuant.ivfPqTopK(
      queries, keptCorpus, again, 3, 4, 2, "vec_id", "embedding")) == snap(out))
  }

  test("purge refusals: multi-column and non-integral id frames") {
    val corpus = vecs.filter(col("vec_id") >= 8)
    val idx = ProductQuant.ivfPqIndex(corpus, nlist = 4, m = 4, ks = 8)
    val eCols = intercept[IllegalArgumentException](
      ProductQuant.ivfPqIndexPurge(idx, corpus.select("vec_id", "embedding")))
    assert(eCols.getMessage.contains("single-column"), eCols.getMessage)
    val eStr = intercept[IllegalArgumentException](
      ProductQuant.ivfPqIndexPurge(idx, Seq("9").toDF("vec_id")))
    assert(eStr.getMessage.contains("integral"), eStr.getMessage)
  }
}
