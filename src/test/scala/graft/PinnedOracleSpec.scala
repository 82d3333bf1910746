package graft

import graft.harness.PinnedOracles
import graft.tools.PinnedOracleGen

/** The quality-model and corpus-profile oracles pin their non-SQL parts
  * (pre-sigmoid margins; HLL/quantile sketch columns) as literal VALUES
  * inside otherwise-exact SQL (the search_hybrid_idx pattern). This
  * spec keeps those pins honest: it refits/recomputes each pinned
  * quantity against the live sf0.01 fixture and asserts byte-equality
  * with the tuples embedded in PinnedOracles — so a fit-recipe change
  * surfaces HERE as "re-run graft.tools.PinnedOracleGen", not as an
  * unexplained red row in the driver's correctness artifact. Same
  * cancel-on-regeneration guard as GoldenOracleSpec: a moved fixture
  * fingerprint means every golden needs regenerating anyway.
  */
class PinnedOracleSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.01"

  private def guard(): Unit = {
    val fp = PinnedOracleGen.docsFingerprint(
      spark.read.parquet(s"$sfDir/documents.parquet"))
    assume(fp == PinnedOracles.docsFp,
      s"sf0.01 documents changed (fingerprint $fp) — rerun " +
        "graft.tools.PinnedOracleGen (and GoldenGen), then commit the " +
        "regenerated PinnedOracles.scala.")
  }

  test("pinned quality-model margins match a fresh fit on the live fixture") {
    guard()
    // Raw margins carry last-ulp run-to-run drift (double partial-sum
    // merge order varies with parallelism — local[8] at generation vs
    // the suite's session), so the comparison happens at the GRAIN THE
    // ORACLE USES them at: quality = σ(m) rounded to 4 decimals
    // (Spark's HALF_UP), where the ulp drift vanishes. A fit-recipe
    // change still lands far past the 4th decimal.
    def quality(m: Double): Double =
      BigDecimal(1.0 / (1.0 + math.exp(-m)))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val tuple = """\((\d+), ([-0-9.E]+)\)""".r
    for ((iters, pinned) <- Seq(
        16 -> PinnedOracles.qmodelMargins16,
        32 -> PinnedOracles.qmodelMargins32)) {
      val pinnedQ = tuple.findAllMatchIn(pinned)
        .map(m => m.group(1).toLong -> quality(m.group(2).toDouble)).toMap
      val freshQ = PinnedOracleGen.marginRows(spark, sfDir, iters)
        .map { r =>
          val m = tuple.findFirstMatchIn(r).get
          m.group(1).toLong -> quality(m.group(2).toDouble)
        }.toMap
      assert(pinnedQ == freshQ,
        s"iters=$iters qualities drifted from the pinned margins — the fit " +
          "recipe changed; rerun graft.tools.PinnedOracleGen and commit")
    }
  }

  test("pinned profile sketch columns match a fresh profile on the live fixture") {
    guard()
    val fresh = PinnedOracleGen.sketchRows(spark, sfDir).mkString(", ")
    assert(PinnedOracles.profileSketch == fresh,
      "profile sketches drifted from the pinned VALUES — the sketch " +
        "parameters changed; rerun graft.tools.PinnedOracleGen and commit")
  }

  test("pinned ANN candidate sets match fresh bucketing/probing on the live fixture") {
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val fp = PinnedOracleGen.embFingerprint(e)
    assume(fp == PinnedOracles.embFp,
      s"sf0.01 embeddings changed (fingerprint $fp) — rerun " +
        "graft.tools.PinnedOracleGen (and GoldenGen), then commit.")
    val fresh = PinnedOracleGen.annCandidateRows(spark, sfDir).toMap
    for ((name, pinned) <- Seq(
        "annLshCandidates" -> PinnedOracles.annLshCandidates,
        "annLshQCandidates" -> PinnedOracles.annLshQCandidates,
        "annIvfCandidates" -> PinnedOracles.annIvfCandidates,
        "annIvfQCandidates" -> PinnedOracles.annIvfQCandidates))
      assert(pinned == fresh(name).mkString(", "),
        s"$name drifted from the pinned VALUES — the bucketing/probe " +
          "recipe changed; rerun graft.tools.PinnedOracleGen and commit")
  }

  test("pinned dedup pair/miss sets match fresh banding on the live fixture") {
    guard() // simhash/winnow pairs ride the documents fixture
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
    assume(PinnedOracleGen.embFingerprint(e) == PinnedOracles.embFp,
      "sf0.01 embeddings changed — rerun graft.tools.PinnedOracleGen.")
    val fresh = PinnedOracleGen.dedupFamilyRows(spark, sfDir).toMap
    for ((name, pinned) <- Seq(
        "embLshMiss" -> PinnedOracles.embLshMiss,
        "embIncrMiss" -> PinnedOracles.embIncrMiss,
        "embStreamMiss" -> PinnedOracles.embStreamMiss,
        "embdedupMiss" -> PinnedOracles.embdedupMiss,
        "simdedupPairs" -> PinnedOracles.simdedupPairs,
        "winnowPairs" -> PinnedOracles.winnowPairs))
      assert(pinned == fresh(name).mkString(", "),
        s"$name drifted from the pinned VALUES — the banding/verify " +
          "recipe changed; rerun graft.tools.PinnedOracleGen and commit")
  }

  test("pinned diff/incr HLL estimates match fresh sketches on the live fixture") {
    guard()
    val (diff, incr, incrDiff) = PinnedOracleGen.profileFamilyRows(spark, sfDir)
    for ((label, pinned, fresh) <- Seq(
        ("diff", PinnedOracles.profileDiffSketch, diff),
        ("incr", PinnedOracles.profileIncrSketch, incr),
        ("incr_diff", PinnedOracles.profileIncrDiffSketch, incrDiff)))
      assert(pinned == fresh.mkString(", "),
        s"profile $label HLL estimates drifted from the pinned VALUES — " +
          "rerun graft.tools.PinnedOracleGen and commit")
  }
}
