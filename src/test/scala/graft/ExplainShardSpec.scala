package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.CurationPipeline

/** Shard-ingest drop provenance (CurationPipeline.explainShard) beyond
  * the oracle-gated url/lines/exact chain: fates through a SIGNATURE
  * family (minhash — standing-index drops batch explain cannot see),
  * winner attribution rules, replay idempotence (explain must leave
  * standing state byte-equivalent), and the refusals.
  */
class ExplainShardSpec extends SparkSpec {

  import spark.implicits._

  private def mk(i: Int) =
    s"document number $i with plenty of shared filler words " +
      ("alpha beta gamma delta epsilon zeta eta theta " * 4)

  private val pipelineYaml =
    """steps:
      |  - dedup_exact: {}
      |  - dedup_minhash: { threshold: 0.5 }
      |""".stripMargin

  test("fates name standing-index drops, winners follow the first-wins rule") {
    val p = graft.config.CurationConfig.fromYaml(pipelineYaml)
    val state = java.nio.file.Files.createTempDirectory("expl_state").toString
    // Shard 0: bases. Shard 1: an exact twin of doc 3 (exact-index
    // drop), a near-dup of doc 6 (minhash signature-index drop), and a
    // fresh doc (kept).
    val shard0 = (0 until 10).map(i => (i.toLong, mk(i))).toDF("doc_id", "text")
    val shard1 = Seq(
      (100L, mk(3)),
      (101L, mk(6) + " tiny tweak"),
      (102L, "completely different fresh content " + ("unique words " * 10)))
      .toDF("doc_id", "text")
    CurationPipeline.applyShard(shard0, p, state, "0")
    CurationPipeline.applyShard(shard1, p, state, "1")
    val got = CurationPipeline.explainShard(
      shard1, p, state, "1", Seq(100L, 101L, 102L, 5L).toDF("doc_id"))
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), if (r.isNullAt(2)) None else Some(r.getLong(2)))).toMap
    assert(got(100L) === ("dedup_exact", Some(3L)),
      "exact-index drop must name the standing keeper")
    assert(got(101L)._1 === "dedup_minhash",
      "signature-index drop must name the index family")
    assert(got(101L)._2 === None,
      "cluster-elected families report an honest null winner")
    assert(got(102L) === ("kept", None))
    assert(got(5L) === ("absent", None), "a shard-0 id is absent from shard 1")
  }

  test("the replay is idempotent — standing state serves shard 2 identically") {
    val p = graft.config.CurationConfig.fromYaml(pipelineYaml)
    def run(explainBetween: Boolean): Set[Long] = {
      val state = java.nio.file.Files.createTempDirectory("expl_idem").toString
      val shard0 = (0 until 10).map(i => (i.toLong, mk(i))).toDF("doc_id", "text")
      val shard1 = Seq((100L, mk(3)), (101L, "fresh " + mk(20)))
        .toDF("doc_id", "text")
      CurationPipeline.applyShard(shard0, p, state, "0")
      CurationPipeline.applyShard(shard1, p, state, "1")
      if (explainBetween)
        CurationPipeline.explainShard(
          shard1, p, state, "1", Seq(100L, 101L).toDF("doc_id")).collect()
      // Shard 2 ingests against whatever state the (possibly replayed)
      // dir now holds: a twin of a shard-1 survivor must still drop.
      val shard2 = Seq((200L, "fresh " + mk(20)), (201L, mk(40)))
        .toDF("doc_id", "text")
      CurationPipeline.applyShard(shard2, p, state, "2")
        .select("doc_id").as[Long].collect().toSet
    }
    assert(run(explainBetween = true) === run(explainBetween = false),
      "an explain replay between ingests changed the standing state")
  }

  test("a tampered shard frame refuses loudly and writes nothing") {
    // The replay contract — "pass the originally ingested frame" — is a
    // CHECK, not a doc line: a trimmed/edited frame would recompute
    // different increments, and before round 16 those would have been
    // silently written through the standing indexes. Now the verify
    // refuses on the first mismatching step, and the state dir is
    // byte-identical afterwards (proved by ingesting shard 2 and
    // getting the same survivors as an untampered control run).
    val p = graft.config.CurationConfig.fromYaml(pipelineYaml)
    val state = java.nio.file.Files.createTempDirectory("expl_tamper").toString
    val shard0 = (0 until 10).map(i => (i.toLong, mk(i))).toDF("doc_id", "text")
    val shard1 = Seq((100L, mk(3)), (101L, "fresh " + mk(20)))
      .toDF("doc_id", "text")
    CurationPipeline.applyShard(shard0, p, state, "0")
    CurationPipeline.applyShard(shard1, p, state, "1")
    // Edit a SURVIVING doc's text: doc 101 is a fresh exact-index keeper,
    // so the recomputed exact increment carries a different (hash, len)
    // key than the persisted slice. (Merely trimming doc 100 would NOT
    // trip the verify — and correctly so: 100 was dropped as an exact
    // twin of standing doc 3, so no increment ever carried it.)
    val tampered = shard1.withColumn("text",
      when(col("doc_id") === 101L, lit("maliciously edited content"))
        .otherwise(col("text")))
    val e = intercept[IllegalArgumentException](
      CurationPipeline.explainShard(
        tampered, p, state, "1", Seq(101L).toDF("doc_id")).collect())
    assert(e.getMessage.contains("does not match the persisted slice"),
      s"wrong refusal: ${e.getMessage}")
    // State survived untouched: shard 2's twin of the shard-1 survivor
    // still drops (it would be ADMITTED had the tampered "maliciously
    // edited" increment replaced the standing exact key), and a fresh
    // doc is still admitted.
    val shard2 = Seq((200L, "fresh " + mk(20)),
      (201L, "totally novel content " + ("unique snowflake words here " * 8)))
      .toDF("doc_id", "text")
    val kept = CurationPipeline.applyShard(shard2, p, state, "2")
      .select("doc_id").as[Long].collect().toSet
    assert(kept === Set(201L),
      "the refused replay must leave standing state exactly as ingested")
  }

  test("a never-ingested shard label refuses the replay (read-only)") {
    val p = graft.config.CurationConfig.fromYaml(pipelineYaml)
    val state = java.nio.file.Files.createTempDirectory("expl_noing").toString
    val shard0 = (0 until 5).map(i => (i.toLong, mk(i))).toDF("doc_id", "text")
    CurationPipeline.applyShard(shard0, p, state, "0")
    val ghost = Seq((300L, mk(30))).toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException](
      CurationPipeline.explainShard(
        ghost, p, state, "7", Seq(300L).toDF("doc_id")).collect())
    assert(e.getMessage.contains("never ingested"),
      s"wrong refusal: ${e.getMessage}")
  }

  test("a compaction past the shard's label answers from the fold, not a replay") {
    // After compactShardState folds batch=0/batch=1 into batch=c1, the
    // strictly-earlier prior view of shard 1 is gone — per-step fates
    // are unreconstructible, so every probe gets the honest
    // layout-level answer naming the fold (and the purge op when a
    // receipt exists), with no replay and nothing written.
    val p = graft.config.CurationConfig.fromYaml(pipelineYaml)
    val state = java.nio.file.Files.createTempDirectory("expl_compact").toString
    val shard0 = (0 until 10).map(i => (i.toLong, mk(i))).toDF("doc_id", "text")
    val shard1 = Seq((100L, mk(3))).toDF("doc_id", "text")
    CurationPipeline.applyShard(shard0, p, state, "0")
    CurationPipeline.applyShard(shard1, p, state, "1")
    CurationPipeline.compactShardState(spark, state)
    val folded = CurationPipeline.explainShard(
      shard1, p, state, "1", Seq(100L).toDF("doc_id"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.isNullAt(2)))
    assert(folded.toSeq === Seq((100L, "folded into batch=c1", true)), folded.toSeq)
    // After an erasure purge the receipt names the pass.
    CurationPipeline.purgeShardState(spark, state, Seq(3L).toDF("doc_id"))
    val purged = CurationPipeline.explainShard(
      shard1, p, state, "1", Seq(100L).toDF("doc_id"))
      .collect().map(r => r.getString(1))
    assert(purged.toSeq === Seq("folded into batch=c1 by purgeShardState"),
      purged.toSeq)
    // A LATER shard against the compacted state still explains fine.
    val shard2 = Seq(
      (200L, mk(4)),
      (201L, "totally unrelated content " + ("unique standalone words " * 10)))
      .toDF("doc_id", "text")
    CurationPipeline.applyShard(shard2, p, state, "2")
    val got = CurationPipeline.explainShard(
      shard2, p, state, "2", Seq(200L, 201L).toDF("doc_id"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(200L) === "dedup_exact")
    assert(got(201L) === "kept")
  }

  test("refusals: unknown state dir and drifted pipeline") {
    val p = graft.config.CurationConfig.fromYaml(pipelineYaml)
    val docs = Seq((1L, mk(1))).toDF("doc_id", "text")
    val missing = intercept[IllegalArgumentException] {
      CurationPipeline.explainShard(docs, p,
        java.nio.file.Files.createTempDirectory("expl_empty").toString, "0",
        Seq(1L).toDF("doc_id"))
    }
    assert(missing.getMessage.contains("_pipeline"))
    val state = java.nio.file.Files.createTempDirectory("expl_drift").toString
    CurationPipeline.applyShard(docs, p, state, "0")
    val other = graft.config.CurationConfig.fromYaml(
      "steps:\n  - dedup_exact: {}\n")
    val drift = intercept[IllegalArgumentException] {
      CurationPipeline.explainShard(docs, other, state, "0", Seq(1L).toDF("doc_id"))
    }
    assert(drift.getMessage.contains("differs"))
  }
}
