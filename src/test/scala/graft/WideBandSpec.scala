package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** The opt-in band-key widening in the incremental signature core
  * (Dedup.incrementalBandPairs): 56 triples of 8-bit chunks (24-bit
  * keys) replacing the narrow 4×16-bit chunks for exchange-bound
  * deployments. Correctness contract: the widened scheme finds the
  * SAME verified pair set for the Hamming ≤ 3 regime — ≤3 differing
  * bits leave ≥5 of the eight 8-bit chunks untouched, so some triple is
  * fully shared by every true pair, and exact bit_count verification
  * makes the banding invisible in the output. These specs force the
  * wide path with wideThreshold = 1 on small data and assert set
  * equality against the narrow path and against the batch restriction.
  */
class WideBandSpec extends SparkSpec {

  import spark.implicits._

  private def pairSet(df: DataFrame): Set[(Long, Long, Int)] =
    df.select("doc_a", "doc_b", "hamming").collect()
      .map(r => (r.getLong(0), r.getLong(1),
        r.get(2).asInstanceOf[Number].intValue)).toSet

  /** Randomized corpus/shard of 64-bit signatures: seeded bases, 0-3 bit
    * flips, exact-dup clusters, and null signatures (decode failures).
    */
  private def scalarFixture(): (DataFrame, DataFrame) = {
    val rnd = new scala.util.Random(1542)
    val bases = Seq.fill(40)(rnd.nextLong())
    def flip(s: Long, n: Int): Long =
      (0 until n).foldLeft(s)((acc, _) => acc ^ (1L << rnd.nextInt(64)))
    val corpus = bases.zipWithIndex.flatMap { case (b, i) =>
      val id = i * 10L
      Seq((id, Option(b))) ++
        (if (i % 3 == 0) Seq((id + 1, Option(flip(b, 1 + i % 3)))) else Nil) ++
        (if (i % 5 == 0) Seq((id + 2, Option(b))) else Nil) // exact dup
    } ++ Seq((9000L, None), (9001L, None))
    // Shard: re-encounters (near and exact variants of corpus bases),
    // fresh singletons, and a null-sig item.
    val shift = 100000L
    val shard = bases.zipWithIndex.flatMap { case (b, i) =>
      if (i % 4 == 0) Seq((shift + i, Option(flip(b, i % 4))))
      else if (i % 7 == 1) Seq((shift + i, Option(b)))
      else Nil
    } ++ Seq.tabulate(10)(j => (shift + 500L + j, Option(rnd.nextLong()))) ++
      Seq((shift + 600L, None: Option[Long]))
    (corpus.toDF("media_id", "sig"), shard.toDF("media_id", "sig"))
  }

  test("wide banding matches narrow banding and the batch restriction (scalar)") {
    val (corpus, shard) = scalarFixture()
    for (k <- Seq(0, 1, 2, 3)) {
      val narrow = pairSet(Dedup.sigDedupIncremental(
        shard, corpus, k, 256, wideThreshold = Int.MaxValue))
      val wide = pairSet(Dedup.sigDedupIncremental(
        shard, corpus, k, 256, wideThreshold = 1))
      assert(wide === narrow, s"wide vs narrow diverged at maxHamming=$k")
      // Batch restriction: an empty corpus makes the incremental a plain
      // batch pass over the union; keep only shard-touching pairs.
      val shardIds = shard.select("media_id").as[Long].collect().toSet
      val batch = pairSet(Dedup.sigDedupIncremental(
        corpus.unionByName(shard), corpus.limit(0), k, 256,
        wideThreshold = Int.MaxValue))
        .filter(p => shardIds(p._1) || shardIds(p._2))
      assert(wide === batch, s"wide vs batch restriction diverged at maxHamming=$k")
    }
  }

  test("wide banding matches narrow on the simhash cluster edition (repSigFilter)") {
    // Text docs: near-dup families (small edits), exact-dup clusters,
    // and empty docs (null signatures banding nowhere).
    val mk = (i: Int) => s"the quick brown fox $i jumps over the lazy dog " +
      ("lorem ipsum dolor sit amet " * 3)
    val corpusDocs = (0 until 25).flatMap { i =>
      Seq((i * 10L, mk(i))) ++
        (if (i % 4 == 0) Seq((i * 10L + 1, mk(i) + " extra")) else Nil) ++
        (if (i % 6 == 0) Seq((i * 10L + 2, mk(i))) else Nil)
    }.toDF("doc_id", "text")
    val shardDocs = ((0 until 25 by 3).map(i => (5000L + i, mk(i) + " tweak")) ++
      Seq((5600L, mk(2)), (5601L, "fresh completely different content here")))
      .toDF("doc_id", "text")
    val index = Dedup.simhashIndex(corpusDocs)
    val narrow = pairSet(Dedup.simhashIncremental(
      shardDocs, index, wideThreshold = Int.MaxValue))
    val wide = pairSet(Dedup.simhashIncremental(
      shardDocs, index, wideThreshold = 1))
    assert(wide === narrow)
    assert(wide.nonEmpty, "fixture produced no pairs — not exercising the band pass")
  }

  test("the broadcast budget refuses an over-bound opted-in shard loudly") {
    // The widened scheme broadcasts ~56 probe rows per distinct shard
    // signature; past the budget the require must name the bound and
    // the split remedy instead of silently stalling on a multi-GB
    // broadcast. Forced here by shrinking the budget conf to 1 sig.
    val (corpus, shard) = scalarFixture()
    spark.conf.set("spark.graft.wideband.maxDistinctSigs", "1")
    try {
      val e = intercept[IllegalArgumentException](
        Dedup.sigDedupIncremental(shard, corpus, 2, 256, wideThreshold = 1)
          .count())
      assert(e.getMessage.contains("broadcast budget"))
      assert(e.getMessage.contains("Split the ingest batch"))
    } finally spark.conf.unset("spark.graft.wideband.maxDistinctSigs")
  }

  test("spark.graft.wideband.threshold opts default-argument call sites in") {
    // Observable via the budget guard: with the conf threshold at 1 and
    // the budget at 1 sig, a default-wideThreshold call must take the
    // WIDE path (and hit the budget refusal) — proving the conf engaged
    // the widening without any per-call argument. Without the conf the
    // same call stays narrow and completes.
    val (corpus, shard) = scalarFixture()
    spark.conf.set("spark.graft.wideband.threshold", "1")
    spark.conf.set("spark.graft.wideband.maxDistinctSigs", "1")
    try {
      val e = intercept[IllegalArgumentException](
        Dedup.sigDedupIncremental(shard, corpus, 2, 256).count())
      assert(e.getMessage.contains("wide banding"))
    } finally {
      spark.conf.unset("spark.graft.wideband.threshold")
      spark.conf.unset("spark.graft.wideband.maxDistinctSigs")
    }
    assert(Dedup.sigDedupIncremental(shard, corpus, 2, 256).count() >= 0)
  }

  test("widening is opt-in only — the default threshold is disabled") {
    // The A/B measurement (BENCH_NOTES §28) showed the widened scheme
    // losing 5-15x on local[32] (map-side explode + broadcast-hash
    // probes dominate; the exchange it saves is thin rows), while
    // saturated NARROW ingest still measures 0.17x recuration — so the
    // default must stay narrow. Pin it so a refactor can't silently
    // flip every big-shard ingest to the 56-band explode.
    assert(Dedup.WideBandThreshold === Int.MaxValue)
  }
}
