package graft

import org.apache.spark.sql.DataFrame

import graft.operators.PerceptualHash

/** Incremental signature dedup, null-signature edge: decode-failed items
  * carry null signatures, and batch groups them into one exact cluster
  * (Window.partitionBy groups nulls). The shard-restricted path must
  * retrieve null-sig corpus twins too — its star semi-join is null-safe —
  * or a shard's null-sig item would silently never pair.
  */
class PerceptualIncrSpec extends SparkSpec {

  import spark.implicits._

  test("null signatures pair with their twins through the incremental star pass") {
    val corpus = Seq((1L, Option(100L)), (2L, None), (3L, None), (4L, Option(200L)))
      .toDF("media_id", "phash")
    val shard = Seq((10L, None: Option[Long]), (11L, Option(100L)))
      .toDF("media_id", "phash")
    val union = corpus.unionByName(shard)

    def key(df: DataFrame): Set[(Long, Long, Int)] =
      df.select("doc_a", "doc_b", "hamming").collect()
        .map(r => (r.getLong(0), r.getLong(1),
          r.get(2).asInstanceOf[Number].intValue)).toSet

    // Batch reference through the same public API: an empty corpus makes
    // the restriction a no-op, so this IS sigDedupPairs over the union.
    val batch = key(PerceptualHash.dedupIncrementalSigs(union, corpus.limit(0)))
    val shardIds = Set(10L, 11L)
    val want = batch.filter(p => shardIds(p._1) || shardIds(p._2))
    val got = key(PerceptualHash.dedupIncrementalSigs(shard, corpus))
    assert(got == want,
      s"incremental diverged from the restricted batch run: got $got want $want")
    assert(want.contains((2L, 10L, 0)),
      "expected the null-sig shard item to star-pair with its corpus twins")
  }
}
