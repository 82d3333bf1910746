package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{IvfPqIndex, ProductQuant}

/** Regenerates the dense-ranks VALUES block inside the
  * `search_hybrid_idx` oracle (QueryCatalog): the entry's BM25 half and
  * the RRF fusion are exact SQL, but its dense half is the hash-seeded
  * IVF-PQ serve — deterministic, yet with no SQL form — so the oracle
  * pins those ranks as a literal VALUES table (the golden-fixture
  * convention, inlined). If the driver regenerates the sf0.01
  * embeddings fixture, re-run this and paste the printed block over
  * the `denseValues` constant (same flow as GoldenGen + the
  * GoldenOracleSpec fingerprint).
  *
  * Run: `sbt "runMain graft.tools.HybridOracleGen [sfDir]"`
  */
object HybridOracleGen {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val idx = ProductQuant.ivfPqIndex(e, nlist = 16, m = 16, ks = 32)
    val rows = ProductQuant.ivfPqTopK(
      e.filter(col("vec_id") < 3), e, idx, 20, 12, 0, "vec_id", "embedding")
      .select("query_id", "neighbor_id", "rank")
      .orderBy("query_id", "rank").collect()
    val values = rows.map(r =>
      s"(${r.getLong(0)}, ${r.getLong(1)}, ${r.get(2)})").mkString(",\n|    ")
    println("  private val hybridDenseValues: String =")
    println("    \"\"\"(VALUES " + values)
    println("AS dv(query_id, doc_id, dense_rank)\"\"\"")
    spark.stop()
  }
}
