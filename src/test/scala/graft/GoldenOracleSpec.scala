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

  GoldenFormat.goldenNames.foreach { name =>
    test(s"$name matches committed sf0.01 golden fixture") {
      val path = Paths.get(s"$goldenDir/$name.csv")
      assert(Files.exists(path), s"Missing fixture $path — run graft.tools.GoldenGen and commit.")
      val expected = Files.readString(path)
      val actual = GoldenFormat.render(QueryCatalog.queries(name)(spark, sfDir))
      assert(actual == expected, s"$name output drifted from golden fixture")
    }
  }
}
