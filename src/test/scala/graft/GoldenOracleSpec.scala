package graft

import java.nio.file.{Files, Paths}

import graft.harness.{GoldenFormat, QueryCatalog}

/** Exact-output oracles for the 5 catalog entries whose results are
  * hash-seeded (xxhash64-derived minhash/simhash/hyperplane signatures,
  * fingerprints) and so can't be expressed as portable DuckDB SQL. The
  * pipelines are fully deterministic — no RNG, no time — so a committed
  * golden fixture at sf0.01 is a valid exact oracle (regenerate with
  * `runMain graft.tools.GoldenGen` after any *intentional* change).
  */
class GoldenOracleSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.01"
  private val goldenDir = "src/test/resources/goldens"

  /** Fingerprint of the input tables the fixtures were generated from —
    * if the driver regenerates testdata with a different seed, cancel
    * (with a regenerate hint) rather than fail.
    */
  private lazy val dataFingerprint: Long = {
    import org.apache.spark.sql.functions._
    val d = graft.sources.Tables.table(spark, sfDir, "documents")
      .agg(bit_xor(xxhash64(col("doc_id"), col("text")))).head().getLong(0)
    val e = graft.sources.Tables.table(spark, sfDir, "embeddings")
      .agg(bit_xor(xxhash64(col("vec_id"), col("embedding").cast("string")))).head().getLong(0)
    d ^ e
  }
  private val expectedFingerprint = 1662625141547298220L

  GoldenFormat.goldenNames.foreach { name =>
    test(s"$name matches committed sf0.01 golden fixture") {
      assume(dataFingerprint == expectedFingerprint,
        s"sf0.01 testdata changed (fingerprint $dataFingerprint) — " +
          "rerun graft.tools.GoldenGen, update expectedFingerprint, and commit.")
      val path = Paths.get(s"$goldenDir/$name.csv")
      assert(Files.exists(path), s"Missing fixture $path — run graft.tools.GoldenGen and commit.")
      val expected = Files.readString(path)
      val actual = GoldenFormat.render(QueryCatalog.queries(name)(spark, sfDir))
      assert(actual == expected, s"$name output drifted from golden fixture")
    }
  }
}
