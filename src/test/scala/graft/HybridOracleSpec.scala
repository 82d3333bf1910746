package graft

import org.apache.spark.sql.functions._

/** The search_hybrid_idx oracle pins its dense (IVF-PQ) ranks as a
  * literal VALUES table inside otherwise-exact SQL (the BM25 half and
  * the RRF arithmetic recompute from the raw tables). This spec keeps
  * that pin honest: it refits the same hash-seeded index against the
  * live sf0.01 embeddings and asserts the served top-20 ranks equal
  * the tuples embedded in the oracle string — so a testdata
  * regeneration (or a fit-recipe change) surfaces HERE as "re-run
  * graft.tools.HybridOracleGen", not as an unexplained red row in the
  * driver's correctness artifact. Same cancel-on-regeneration guard as
  * GoldenOracleSpec: if the input fingerprint moved, every golden needs
  * regenerating anyway and this spec's failure would be noise.
  */
class HybridOracleSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.01"

  test("the oracle's pinned dense ranks match a fresh fit on the live fixture") {
    import org.apache.spark.sql.functions.{col => c}
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val fp = e.agg(bit_xor(xxhash64(c("vec_id"), c("embedding").cast("string"))))
      .head().getLong(0)
    // GoldenOracleSpec's documents⊕embeddings fingerprint can't be
    // reused directly (this spec only reads embeddings), so it pins its
    // own half. Regenerate BOTH via GoldenGen + HybridOracleGen.
    val expectedEmbFp = -6593858810303677256L
    assume(fp == expectedEmbFp,
      s"sf0.01 embeddings changed (fingerprint $fp) — rerun " +
        "graft.tools.HybridOracleGen, update the search_hybrid_idx " +
        "oracle VALUES and this spec's expectedEmbFp, and commit.")
    val idx = graft.operators.ProductQuant.ivfPqIndex(e, nlist = 16, m = 16, ks = 32)
    val fresh = graft.operators.ProductQuant.ivfPqTopK(
      e.filter(c("vec_id") < 3), e, idx, 20, 12, 0, "vec_id", "embedding")
      .select("query_id", "neighbor_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.get(2).asInstanceOf[Number].intValue))
      .toSet
    val sql = SparkEntry.oracleSql("search_hybrid_idx")
    val pinned = """\((\d+), (\d+), (\d+)\)""".r.findAllMatchIn(sql)
      .map(m => (m.group(1).toLong, m.group(2).toLong, m.group(3).toInt)).toSet
      // the query-text VALUES rows carry no 3-int tuples, so the regex
      // hits exactly the 60 dense tuples
    assert(pinned.size == 60, s"expected 60 pinned dense tuples, found ${pinned.size}")
    assert(fresh == pinned,
      "dense ranks drifted from the oracle's pinned VALUES — rerun " +
        "graft.tools.HybridOracleGen and refresh the oracle")
  }
}
