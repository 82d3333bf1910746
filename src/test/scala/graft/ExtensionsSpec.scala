package graft

import org.apache.spark.sql.functions._

import graft.functions.Texts
import graft.operators.{Decontaminate, Dedup, Multimodal, Packing, Similarity}

/** Correctness tests for the scale-extension operators against local
  * brute-force computations on the real sf0.001 testdata.
  */
class ExtensionsSpec extends SparkSpec {

  private lazy val docs = graft.sources.Tables.table(spark, "/root/testdata/sf0.001", "documents")
  private lazy val emb = graft.sources.Tables.table(spark, "/root/testdata/sf0.001", "embeddings")

  private def localShingles(text: String, n: Int): Set[String] = {
    val toks = text.toLowerCase.split("\\s+").toSeq
    if (toks.size < n) Set.empty
    else toks.sliding(n).map(_.mkString(" ")).toSet
  }

  test("minhash LSH pairs are a high-recall subset of exact jaccard pairs") {
    val texts = docs.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val n = 3
    val truth = (for {
      (a, ta) <- texts.toSeq
      (b, tb) <- texts.toSeq if a < b
      sa = localShingles(ta, n); sb = localShingles(tb, n)
      if sa.nonEmpty && sb.nonEmpty
      j = sa.intersect(sb).size.toDouble / sa.union(sb).size
      if j >= 0.5
    } yield (a, b) -> j).toMap

    val got = Dedup.minhashLsh(docs, threshold = 0.5, numHashes = 64, bands = 16, shingleN = n)
      .collect().map(r => (r.getLong(1).min(r.getLong(0)), r.getLong(0).max(r.getLong(1))) -> r.getDouble(2))
      .toMap

    // Every reported pair must be a true pair with the exact jaccard.
    got.foreach { case (pair, j) =>
      assert(truth.contains(pair), s"false positive pair $pair")
      assert(math.abs(truth(pair) - j) < 1e-9, s"jaccard mismatch for $pair")
    }
    // Recall: LSH with b=16,r=4 at tau=0.5 should find the large majority.
    if (truth.nonEmpty) {
      val recall = got.size.toDouble / truth.size
      assert(recall >= 0.8, s"recall $recall too low (${got.size}/${truth.size})")
    }
  }

  test("ngramJaccard matches local brute force exactly") {
    val texts = docs.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val truth = (for {
      (a, ta) <- texts.toSeq
      (b, tb) <- texts.toSeq if a < b
      sa = localShingles(ta, 1); sb = localShingles(tb, 1)
      if sa.nonEmpty && sb.nonEmpty
      j = sa.intersect(sb).size.toDouble / sa.union(sb).size
      if j >= 0.8
    } yield (a, b)).toSet

    val got = Dedup.ngramJaccard(docs, threshold = 0.8, shingleN = 1)
      .collect().map(r => (r.getLong(1).min(r.getLong(0)), r.getLong(0).max(r.getLong(1)))).toSet
    assert(got == truth)
  }

  test("ngramContainment matches local brute force and catches subset dups Jaccard misses") {
    val texts = docs.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val truth = (for {
      (a, ta) <- texts.toSeq
      (b, tb) <- texts.toSeq if a < b
      sa = localShingles(ta, 1); sb = localShingles(tb, 1)
      if sa.nonEmpty && sb.nonEmpty
      c = sa.intersect(sb).size.toDouble / math.min(sa.size, sb.size)
      if c >= 0.9
    } yield (a, b)).toSet
    val got = Dedup.ngramContainment(docs, threshold = 0.9, shingleN = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == truth)

    // The structural point: a short doc embedded verbatim in a much
    // longer one has containment 1.0 but Jaccard diluted below any
    // usable threshold.
    import spark.implicits._
    val sub = Seq(
      (1L, "alpha beta gamma delta"),
      (2L, "alpha beta gamma delta " + (1 to 40).map(i => s"w$i").mkString(" ")))
      .toDF("doc_id", "text")
    val cPairs = Dedup.ngramContainment(sub, threshold = 0.99)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(cPairs.toSeq == Seq((1L, 2L, 1.0)))
    assert(Dedup.ngramJaccard(sub, threshold = 0.5).count() == 0,
      "Jaccard must miss the subset pair (union dilution) — that's why containment exists")
  }

  test("tokenBudgetSample: prefix semantics, pre-filter parity, determinism") {
    import spark.implicits._
    import graft.operators.Sampling
    // Skewed frame: 90% 'en', token counts varying 1..20.
    val frame = (0L until 20000L)
      .map(i => (i, if (i % 10 != 0) "en" else "fr", (i % 20 + 1)))
      .toDF("doc_id", "lang", "n_tokens")
    val budgets = Map("en" -> 700L, "fr" -> 150L)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
        .sortBy(_._1).toSeq
    val fast = rows(Sampling.tokenBudgetSample(frame, budgets))
    val exact = rows(Sampling.tokenBudgetSample(frame, budgets, preFilterSlack = Double.MaxValue))
    assert(fast == exact, "pre-filtered pick must equal the exact single-step pick")
    // Budget semantics: every kept doc's cum_before < budget, and the
    // sample reaches the budget (crossing doc included).
    for ((g, b) <- budgets) {
      val grp = exact.filter(_._2 == g)
      assert(grp.forall(_._4 < b))
      assert(grp.map(_._3).sum >= b, s"group $g sample must reach its token budget")
    }
    assert(rows(Sampling.tokenBudgetSample(frame, budgets)) == fast, "deterministic")
  }

  test("mixPlan: epochs match closed-form shares; absent groups drop; upsample closes the loop") {
    import spark.implicits._
    import graft.operators.Sampling
    val frame = Seq(
      (1L, "en", 100L), (2L, "en", 300L), (3L, "fr", 50L),
      (4L, "fr", 150L), (5L, "de", 400L)).toDF("doc_id", "lang", "n_tokens")
    // Weights skip 'de' (dropped from the mix) and don't sum to 1
    // (normalized over the map: en 0.75, fr 0.25).
    val plan = Sampling.mixPlan(frame, Map("en" -> 3.0, "fr" -> 1.0), totalTokens = 1600L)
    val rows = plan.collect().map(r => r.getString(0) ->
      (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))).toMap
    assert(rows.keySet == Set("en", "fr")) // de dropped, no silent inflation
    assert(rows("en") == ((2L, 400L, 0.75, 1200.0, 3.0)))   // 1200 target / 400 actual
    assert(rows("fr") == ((2L, 200L, 0.25, 400.0, 2.0)))
    // The planned epochs ARE upsample factors: executing the plan lands
    // the planned token volume per group (exact here — integral epochs,
    // no fractional hash-pick).
    val factors = plan.collect().map(r => r.getString(0) -> r.getDouble(5)).toMap
    val executed = Sampling.upsampleRepeats(frame, factors)
      .join(frame.select("doc_id", "n_tokens"), Seq("doc_id"))
    val vol = executed.groupBy("lang").agg(sum("n_tokens").as("t"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(vol("en") == 1200L && vol("fr") == 400L)
    intercept[IllegalArgumentException](Sampling.mixPlan(frame, Map.empty, 100L))
    intercept[IllegalArgumentException](Sampling.mixPlan(frame, Map("en" -> 1.0), 0L))
  }

  test("upsampleRepeats: copy counts match local math; expected volume ≈ f·|g|") {
    import graft.operators.Sampling
    val factors = Map("en" -> 1.0, "fr" -> 2.5, "es" -> 0.4)
    val out = Sampling.upsampleRepeats(docs, factors)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    // Local replica of the rule.
    val base = docs.select("doc_id", "lang").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    def hash(id: Long): Long =
      java.lang.Math.floorMod(java.lang.Math.floorMod(id, 1048576L) * 2654435761L, 4294967296L)
    val wantCopies = base.flatMap { case (id, g) =>
      factors.get(g).map { f =>
        val n = f.toLong + (if (hash(id) < (f - math.floor(f)) * 4294967296.0d) 1 else 0)
        (id, g, n)
      }
    }.filter(_._3 > 0).toSet
    val gotByDoc = out.groupBy(_._1).map { case (id, rows) =>
      assert(rows.map(_._4).sorted.toSeq == (0L until rows.head._3).toSeq,
        s"doc $id copy indices must be dense 0..n-1")
      (id, rows.head._2, rows.head._3)
    }
    assert(gotByDoc.toSet == wantCopies)
    // Volume: per group, total copies within ±20% of f·|g| (hash noise).
    val sizes = base.groupBy(_._2).view.mapValues(_.length).toMap
    for ((g, f) <- factors) {
      val got = out.count(_._2 == g).toDouble
      val want = f * sizes(g)
      assert(math.abs(got - want) <= math.max(4.0, 0.2 * want),
        s"group $g volume $got vs expected $want")
    }
    // de/zh have no factor -> absent entirely.
    assert(!out.exists(t => t._2 == "de" || t._2 == "zh"))
  }

  test("curation upsample step: copies scatter across shards; misplaced step fails fast") {
    import graft.operators.CurationPipeline
    val out = CurationPipeline.fromYaml(docs,
      """steps:
        |  - upsample: { group: lang, factors: { en: 1.0, fr: 3.0 } }
        |  - shuffle: { shards: 4 }
        |""".stripMargin)
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("copy"),
        r.getAs[Long]("shard"), r.getAs[Long]("pos")))
    // fr docs have exactly 3 copies; with the copy-mixing hash their
    // shards must NOT all coincide for every doc (they would under a
    // plain id hash).
    val byDoc = out.groupBy(_._1).values.filter(_.length == 3)
    assert(byDoc.nonEmpty, "fr docs must repeat 3x")
    assert(byDoc.exists(_.map(_._3).distinct.length > 1),
      "copies of at least some docs must land in different shards")
    // (shard, pos) is a dense 1..n permutation per shard.
    out.groupBy(_._3).foreach { case (sh, rows) =>
      assert(rows.map(_._4).sorted.toSeq == (1L to rows.length).toSeq,
        s"shard $sh positions must be dense")
    }
    // Selection steps after upsample are corpus damage — refuse them.
    val bad = intercept[IllegalArgumentException] {
      CurationPipeline.fromYaml(docs,
        """steps:
          |  - upsample: { group: lang, factors: { en: 2.0 } }
          |  - dedup_exact: {}
          |""".stripMargin)
    }
    assert(bad.getMessage.contains("only 'shuffle' may follow"))
  }

  test("topFractionByScore: exact per-group fraction; threshold filter approximates it") {
    import spark.implicits._
    import graft.operators.Sampling
    val frame = (0L until 3000L)
      .map(i => (i, if (i % 3 == 0) "a" else "b", (i * 2654435761L % 1000L).toDouble))
      .toDF("doc_id", "lang", "score")
    val kept = Sampling.topFractionByScore(frame, 0.8, "score", "lang", "doc_id")
    val byGroup = kept.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val sizes = frame.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    for ((g, n) <- sizes)
      assert(byGroup(g) == math.ceil(n * 0.8).toLong, s"group $g kept ${byGroup(g)} of $n")
    // Every kept score >= every dropped score within its group.
    val keptIds = kept.select("doc_id").collect().map(_.getLong(0)).toSet
    val all = frame.collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    for (g <- sizes.keys) {
      val (in, out) = all.filter(_._2 == g).partition(t => keptIds(t._1))
      if (out.nonEmpty) assert(in.map(_._3).min >= out.map(_._3).max)
    }
    // Approx threshold path: kept fraction lands near the target and the
    // cut is a clean score threshold.
    val approx = Sampling.scoreThresholdFilter(frame, 0.8, "score", "lang")
    val frac = approx.count().toDouble / frame.count()
    assert(math.abs(frac - 0.8) < 0.05, s"approx kept fraction $frac")
  }

  test("incremental minhash dedup matches the full-corpus run on the union") {
    val corpus = docs.filter(col("doc_id") < 250)
    val fresh = docs.filter(col("doc_id") >= 250)
    // Roundtrip the index through parquet — the persisted-table contract
    // (the production loop writes it once per corpus, bucketed by doc_id).
    val dir = java.nio.file.Files.createTempDirectory("graft_mh_index_").toString
    Dedup.minhashIndex(corpus).write.mode("overwrite").parquet(dir)
    val index = spark.read.parquet(dir)

    val incr = Dedup.minhashLshIncremental(fresh, index, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val full = Dedup.minhashLsh(docs, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .filter { case (a, b, _) => a >= 250 || b >= 250 }.toSet
    // Exact parity, jaccard values included: same pairs as running the
    // full corpus, minus the corpus-internal ones already known.
    assert(incr == full)
  }

  test("incremental simhash dedup matches the full-corpus run on the union") {
    val corpus = docs.filter(col("doc_id") < 250)
    val fresh = docs.filter(col("doc_id") >= 250)
    val dir = java.nio.file.Files.createTempDirectory("graft_sh_index_").toString
    Dedup.simhashIndex(corpus).write.mode("overwrite").parquet(dir)
    val index = spark.read.parquet(dir)

    val incr = Dedup.simhashIncremental(fresh, index, maxHamming = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val full = Dedup.simhash(docs, maxHamming = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
      .filter { case (a, b, _) => a >= 250 || b >= 250 }.toSet
    // Exact parity, hamming values included.
    assert(incr == full, s"missing=${(full -- incr).take(3)} extra=${(incr -- full).take(3)}")
    assert(incr.nonEmpty, "fixture split should produce cross-frame simhash pairs")
    val bad = intercept[IllegalArgumentException] {
      Dedup.simhashIncremental(fresh, corpus)
    }
    assert(bad.getMessage.contains("simhashIndex"))
  }

  test("incremental winnow dedup matches the full-corpus run on the union") {
    val corpus = docs.filter(col("doc_id") < 250)
    val fresh = docs.filter(col("doc_id") >= 250)
    val dir = java.nio.file.Files.createTempDirectory("graft_wn_index_").toString
    Dedup.winnowIndex(corpus).write.mode("overwrite").parquet(dir)
    val index = spark.read.parquet(dir)

    val incr = Dedup.winnowIncremental(fresh, index, minShared = 1L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val full = Dedup.winnow(docs, minShared = 1L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .filter { case (a, b, _) => a >= 250 || b >= 250 }.toSet
    // Exact parity, shared-fingerprint counts included.
    assert(incr == full, s"missing=${(full -- incr).take(3)} extra=${(incr -- full).take(3)}")
    assert(incr.nonEmpty, "fixture split should produce cross-frame winnow pairs")
    val bad = intercept[IllegalArgumentException] {
      Dedup.winnowIncremental(fresh, corpus)
    }
    assert(bad.getMessage.contains("winnowIndex"))
  }

  test("incremental ngram-jaccard matches the full-corpus run on the union") {
    val corpus = docs.filter(col("doc_id") < 250)
    val fresh = docs.filter(col("doc_id") >= 250)
    val dir = java.nio.file.Files.createTempDirectory("graft_ng_index_").toString
    Dedup.ngramIndex(corpus).write.mode("overwrite").parquet(dir)
    val index = spark.read.parquet(dir)

    val incr = Dedup.ngramJaccardIncremental(fresh, index, threshold = 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val full = Dedup.ngramJaccard(docs, threshold = 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .filter { case (a, b, _) => a >= 250 || b >= 250 }.toSet
    // Exact parity, jaccard values included.
    assert(incr == full, s"missing=${(full -- incr).take(3)} extra=${(incr -- full).take(3)}")
    assert(incr.nonEmpty, "fixture split should produce cross-frame jaccard pairs")
    val bad = intercept[IllegalArgumentException] {
      Dedup.ngramJaccardIncremental(fresh, corpus, threshold = 0.8)
    }
    assert(bad.getMessage.contains("ngramIndex"))
  }

  test("incremental embedding near-dup matches the full run on the union") {
    val corpus = emb.filter(col("vec_id") < 400)
    val fresh = emb.filter(col("vec_id") >= 400)
    val incr = Dedup.embeddingNearDupIncremental(fresh, corpus, threshold = 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val full = Dedup.embeddingNearDup(emb, threshold = 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .filter { case (a, b, _) => a >= 400 || b >= 400 }.toSet
    // Exact parity, cosines included: same pairs as bucketing the whole
    // corpus, minus the corpus-internal ones already known.
    assert(incr == full, s"missing=${(full -- incr).take(3)} extra=${(incr -- full).take(3)}")
    assert(incr.nonEmpty, "fixture split should produce cross-frame near-dup pairs")
  }

  test("simhash finds identical documents at hamming 0") {
    // Duplicate the corpus with shifted ids: every doc has an exact twin.
    val shifted = docs.withColumn("doc_id", col("doc_id") + 1000000L)
    val both = docs.unionByName(shifted)
    val pairs = Dedup.simhash(both, maxHamming = 0)
      .collect().map(r => (r.getLong(1).min(r.getLong(0)), r.getLong(0).max(r.getLong(1)))).toSet
    val expectedTwins = docs.select("doc_id").collect().map(_.getLong(0))
      .map(id => (id, id + 1000000L)).toSet
    assert(expectedTwins.subsetOf(pairs), "every exact twin must collide at hamming 0")
  }

  test("brute-force cosine top-k matches local computation") {
    val vecs = emb.collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray.map(_.toDouble)).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val queries = vecs.keys.filter(_ < 5)
    val local = queries.map { q =>
      q -> vecs.toSeq.filter(_._1 != q)
        .map { case (id, v) => (id, cos(vecs(q), v)) }
        .sortBy { case (id, s) => (-s, id) }
        .take(3).map(_._1)
    }.toMap

    val got = Similarity.bruteForceTopK(emb.filter(col("vec_id") < 5), emb, k = 3)
      .orderBy("query_id", "rank")
      .collect()
      .groupBy(_.getLong(0))
      .view.mapValues(_.sortBy(_.getInt(3)).map(_.getLong(1)).toSeq).toMap
    assert(got == local)
  }

  test("LSH ANN reports correct cosine values and reasonable recall") {
    val k = 3
    val subset = emb.filter(col("vec_id") < 100)
    val brute = Similarity.bruteForceTopK(subset, subset, k)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ann = Similarity.lshTopK(subset, k)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = ann.intersect(brute).size.toDouble / brute.size
    // Default 32 bands x 4 hyperplane bits on clustered synthetic vectors;
    // deterministic (hash-seeded planes), so this is a fixed measurement —
    // RECALL.json records the committed numbers.
    assert(recall >= 0.9, s"ANN recall $recall below the 0.9 bar")
  }

  test("IVF ANN reports correct cosine values and reasonable recall") {
    val k = 3
    val subset = emb.filter(col("vec_id") < 100)
    val brute = Similarity.bruteForceTopK(subset, subset, k)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = Similarity.ivfTopK(subset, k)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = ivf.intersect(brute).size.toDouble / brute.size
    // Default nlist=16/nprobe=10 (deterministic seeds — fixed measurement).
    assert(recall >= 0.9, s"IVF recall $recall below the 0.9 bar")
  }

  test("native dot / l2sq expressions agree with interpreted formulations") {
    import org.apache.spark.sql.graft.VectorExpressions
    val checked = emb.limit(50)
      .select(
        VectorExpressions.dot(col("embedding"), col("embedding")).as("ndot"),
        aggregate(zip_with(col("embedding"), col("embedding"), (x, y) => x.cast("double") * y),
          lit(0.0d), (acc, v) => acc + v).as("idot"),
        VectorExpressions.l2sq(col("embedding"), reverse(col("embedding"))).as("nl2"),
        aggregate(zip_with(col("embedding"), reverse(col("embedding")),
          (x, y) => (x.cast("double") - y) * (x.cast("double") - y)),
          lit(0.0d), (acc, v) => acc + v).as("il2"))
      .collect()
    checked.foreach { r =>
      assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-9, s"dot mismatch: $r")
      assert(math.abs(r.getDouble(2) - r.getDouble(3)) < 1e-9, s"l2sq mismatch: $r")
    }
  }

  test("PQ ANN: ADC + exact re-rank keeps recall, sims are exact") {
    import graft.operators.ProductQuant
    val k = 3
    val subset = emb.filter(col("vec_id") < 100)
    val brute = Similarity.bruteForceTopK(subset, subset, k)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    val pq = ProductQuant.pqTopK(subset, k)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    val recall = pq.keySet.intersect(brute.keySet).size.toDouble / brute.size
    // Deterministic (hash-seeded codebooks) — a fixed measurement, like
    // the LSH/IVF bars; RECALL.json records the committed numbers.
    assert(recall >= 0.9, s"PQ recall $recall below the 0.9 bar")
    // Re-ranked sims must be EXACT cosines (not ADC approximations).
    pq.foreach { case (pair, sim) =>
      brute.get(pair).foreach(exact =>
        assert(math.abs(sim - exact) < 1e-9, s"sim for $pair drifted: $sim vs $exact"))
    }
  }

  test("semDeDup: precision 1.0, intra-cluster completeness, measured pair recall") {
    val threshold = 0.4
    val out = Dedup.semDeDup(emb, threshold = threshold, nlist = 8, nprobe = 2)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(3))).toMap

    // Local exact all-pairs oracle.
    val vecs = emb.collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        d += a(i).toDouble * b(i); na += a(i).toDouble * a(i); nb += b(i).toDouble * b(i)
        i += 1
      }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val ids = vecs.keys.toSeq.sorted
    val exactPairs = for {
      (a, i) <- ids.zipWithIndex; b <- ids.drop(i + 1)
      if cos(vecs(a), vecs(b)) >= threshold
    } yield (a, b)

    assert(out.keySet == vecs.keySet, "one decision row per input vector")
    // Precision 1.0: a dropped vector really has a semantic duplicate.
    val withDup = exactPairs.flatMap(p => Seq(p._1, p._2)).toSet
    val droppedIds = out.collect { case (id, (_, false)) => id }.toSet
    assert(droppedIds.subsetOf(withDup),
      s"false drops: ${droppedIds.diff(withDup).take(5)}")
    // Intra-cluster completeness: a duplicate pair sharing a cluster
    // cannot keep both members (the later one in the keep order drops).
    exactPairs.filter(p => out(p._1)._1 == out(p._2)._1).foreach { p =>
      assert(!(out(p._1)._2 && out(p._2)._2),
        s"intra-cluster dup pair $p kept both members")
    }
    // Measured pair recall (cross-cluster pairs are missed by design):
    // the fixture corpus must stay above the committed RECALL.json bar.
    if (exactPairs.nonEmpty) {
      val covered = exactPairs.count(p => !out(p._1)._2 || !out(p._2)._2)
      val recall = covered.toDouble / exactPairs.size
      assert(recall >= 0.5, s"semantic-dedup pair recall $recall below 0.5 on the fixture")
    }
  }

  test("packed PQ codes: byte layout round-trips and fused ADC matches element_at") {
    import graft.operators.ProductQuant
    import org.apache.spark.sql.graft.VectorExpressions
    // ks=256 exercises the full unsigned-byte range (codes up to 255).
    val books = ProductQuant.pqCodebooks(emb, m = 8, ks = 256, refineIters = 1)
    val unpacked = ProductQuant.pqEncode(emb, books)
    val packed = ProductQuant.pqEncodePacked(emb, books)
    val joined = unpacked.join(packed.withColumnRenamed("codes", "bcodes"), Seq("id"))
      .select(col("codes"), col("bcodes")).collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      val arr = r.getSeq[Int](0)
      val bytes = r.getAs[Array[Byte]](1)
      assert(bytes.length == arr.length, "packed length != m")
      arr.indices.foreach(i =>
        assert((bytes(i) & 0xff) == arr(i), s"byte $i: ${bytes(i) & 0xff} != ${arr(i)}"))
    }
    // Fused ADC loop == the chained element_at formulation, bit-exact.
    val sizes = books.groupBy("m").count().orderBy("m").collect().map(_.getLong(1).toInt)
    val offsets = sizes.scanLeft(0)(_ + _).dropRight(1)
    val tab = array((0 until sizes.sum).map(i => lit(i * 0.125 - 3.0)): _*)
    val viaElementAt = sizes.indices
      .map(mi => element_at(tab, element_at(col("codes"), mi + 1) + lit(offsets(mi) + 1)))
      .reduce(_ + _)
    val cmp = unpacked.join(packed.withColumnRenamed("codes", "bcodes"), Seq("id"))
      .select(
        viaElementAt.as("ref"),
        VectorExpressions.pqAdcScore(col("bcodes"), tab, offsets.toSeq).as("fused"))
      .collect()
    cmp.foreach(r => assert(r.getDouble(0) == r.getDouble(1), s"ADC drift: $r"))
  }

  test("PQ ADC scan routes are result-identical (broadcast vs bucketed shuffle)") {
    import graft.operators.ProductQuant
    val k = 3
    val q = emb.filter(col("vec_id") < 20)
    val c = emb.filter(col("vec_id") >= 20)
    def run(): Set[((Long, Long), (Double, Int))] =
      ProductQuant.pqTopK(q, c, k, m = 8, ks = 16, refineIters = 1,
        rerankFactor = 8, idCol = "vec_id", vecCol = "embedding")
        .collect().map(r => ((r.getLong(0), r.getLong(1)), (r.getDouble(2), r.getInt(3)))).toSet
    val viaBroadcast = run()
    // Force the bucketed shuffle route for the SAME asymmetric input: the
    // scaladoc's route-independence claim, asserted directly.
    spark.conf.set("spark.graft.pq.adcBroadcastMaxBytes", "0")
    val viaShuffle =
      try run()
      finally spark.conf.unset("spark.graft.pq.adcBroadcastMaxBytes")
    assert(viaShuffle == viaBroadcast,
      s"route divergence: broadcast-only=${viaBroadcast.diff(viaShuffle).take(3)} " +
        s"shuffle-only=${viaShuffle.diff(viaBroadcast).take(3)}")
    assert(viaBroadcast.nonEmpty)
  }

  test("PQ index overload: persisted codebooks round-trip and match the one-shot path") {
    import graft.operators.ProductQuant
    val k = 3
    val q = emb.filter(col("vec_id") < 20)
    val c = emb.filter(col("vec_id") >= 20)
    val oneShot = ProductQuant.pqTopK(q, c, k, m = 8, ks = 16, refineIters = 1,
      rerankFactor = 8, idCol = "vec_id", vecCol = "embedding")
      .collect().map(r => ((r.getLong(0), r.getLong(1)), (r.getDouble(2), r.getInt(3)))).toMap
    // Fit once, persist, read back, query — the production retrieval loop.
    val dir = java.nio.file.Files.createTempDirectory("pq-index").toString
    ProductQuant.pqCodebooks(c, m = 8, ks = 16, refineIters = 1)
      .write.mode("overwrite").parquet(dir)
    val fromIndex = ProductQuant.pqTopK(q, c, spark.read.parquet(dir), k,
      rerankFactor = 8, idCol = "vec_id", vecCol = "embedding")
      .collect().map(r => ((r.getLong(0), r.getLong(1)), (r.getDouble(2), r.getInt(3)))).toMap
    assert(fromIndex == oneShot, "index-overload results drifted from the one-shot path")
  }

  test("IVF-PQ index overload: parquet round-trip is bit-identical to the one-shot path") {
    import graft.operators.{IvfPqIndex, ProductQuant}
    val k = 3
    val q = emb.filter(col("vec_id") < 20)
    val c = emb.filter(col("vec_id") >= 20)
    def rows(df: org.apache.spark.sql.DataFrame): Map[(Long, Long), (Double, Int)] =
      df.collect().map(r => ((r.getLong(0), r.getLong(1)), (r.getDouble(2), r.getInt(3)))).toMap
    val oneShot = rows(ProductQuant.ivfPqTopK(q, c, k, nlist = 8, nprobe = 5,
      m = 8, ks = 16, refineIters = 1, rerankFactor = 8,
      idCol = "vec_id", vecCol = "embedding"))
    // Fit once, persist all three frames, read back, query — the serving
    // loop. The fits are deterministic, so the loaded index must produce
    // the SAME ranks and the SAME exact-cosine sims, bit for bit.
    val dir = java.nio.file.Files.createTempDirectory("ivfpq-index").toString
    ProductQuant.ivfPqIndex(c, nlist = 8, m = 8, ks = 16, refineIters = 1).save(dir)
    val loaded = IvfPqIndex.load(spark, dir)
    val fromIndex = rows(ProductQuant.ivfPqTopK(q, c, loaded, k, nprobe = 5,
      rerankFactor = 8, idCol = "vec_id", vecCol = "embedding"))
    assert(fromIndex == oneShot,
      s"index-overload drift: oneShot-only=${oneShot.toSet.diff(fromIndex.toSet).take(3)} " +
        s"index-only=${fromIndex.toSet.diff(oneShot.toSet).take(3)}")
    assert(fromIndex.nonEmpty)
    // The serving shape also answers self-join queries (corpus vs itself).
    val selfServed = ProductQuant.ivfPqTopK(c, c, loaded, k, nprobe = 5,
      rerankFactor = 8, idCol = "vec_id", vecCol = "embedding")
    assert(selfServed.filter(col("query_id") === col("neighbor_id")).count() == 0)
    // nprobe <= 0 derives from the loaded index's actual centroid count.
    assert(rows(ProductQuant.ivfPqTopK(q, c, loaded, k, nprobe = 0,
      rerankFactor = 8, idCol = "vec_id", vecCol = "embedding")).nonEmpty)
  }

  test("IVF-PQ index append: shard ingest equals one-pass encoding, and the grown index serves") {
    import graft.operators.ProductQuant
    val corpus = emb.filter(col("vec_id") >= 20 && col("vec_id") < 300)
    val shard = emb.filter(col("vec_id") >= 300)
    val q = emb.filter(col("vec_id") < 20)
    val full = emb.filter(col("vec_id") >= 20)
    // Fit once on the standing corpus; append the shard encode-only.
    val idx = ProductQuant.ivfPqIndex(corpus, nlist = 8, m = 8, ks = 16, refineIters = 1)
    val appended = ProductQuant.ivfPqIndexAppend(shard, idx)
    // Bit-identical to encoding corpus ∪ shard against the SAME fits.
    def codeRows(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Seq[Byte])] =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getAs[Array[Byte]](2).toSeq)).toSet
    val onePass = Similarity.assignToCentroids(
      full.select(col("vec_id").as("id"), col("embedding").as("v")), idx.centroids)
      .select("id", "cid")
      .join(ProductQuant.pqEncodePacked(full, idx.codebooks), Seq("id"))
    assert(codeRows(appended.codes) == codeRows(onePass),
      "appended codes drifted from one-pass encoding against the same fits")
    // The grown index answers queries over the full corpus (shard ids
    // reachable as neighbors).
    val served = ProductQuant.ivfPqTopK(q, full, appended, k = 5, nprobe = 5,
      rerankFactor = 8, idCol = "vec_id", vecCol = "embedding")
    assert(served.filter(col("neighbor_id") >= 300).count() > 0,
      "appended shard never surfaces as a neighbor — append is not serving")
    // The drift monitor measures the grown index through the serving API;
    // it must equal the recall computed by hand from the same two runs
    // (this asserts the monitor, not the cheap test index's quality).
    val recall = ProductQuant.servingRecall(q, full, appended, k = 5, nprobe = 5,
      rerankFactor = 8)
    def pairsOf(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("query_id", "neighbor_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairsOf(Similarity.bruteForceTopK(q, full, 5))
    val got = pairsOf(served)
    val byHand = got.intersect(exact).size.toDouble / exact.size
    assert(math.abs(recall - byHand) < 1e-12 && recall > 0 && recall <= 1.0,
      s"servingRecall $recall != hand-computed $byHand")
  }

  test("PQ ANN at the ks=256 production point keeps recall") {
    import graft.operators.ProductQuant
    val k = 3
    val subset = emb.filter(col("vec_id") < 100)
    val brute = Similarity.bruteForceTopK(subset, subset, k)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = ProductQuant.pqTopK(subset, k, ks = 256)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = got.intersect(brute).size.toDouble / brute.size
    assert(recall >= 0.9, s"ks=256 PQ recall $recall below the 0.9 bar")
  }

  test("semDeDupIncremental: shard decisions equal the full run restricted to the shard") {
    import graft.operators.Dedup
    val corpus = emb.filter(col("vec_id") < 400)
    val shard = emb.filter(col("vec_id") >= 400)
    // Persisted cluster state: ONE centroid table drives both runs.
    val cents = graft.plans.Materialize(
      Similarity.ivfCentroids(corpus, nlist = 16), eager = true)
    def rows(df: org.apache.spark.sql.DataFrame): Map[Long, (Long, Double, Boolean)] =
      df.collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getBoolean(3)))).toMap
    val full = rows(Dedup.semDeDup(emb, cents, threshold = 0.4, nprobe = 2,
      idCol = "vec_id", vecCol = "embedding")
      .filter(col("vec_id") >= 400))
    val incr = rows(Dedup.semDeDupIncremental(shard, corpus, cents,
      threshold = 0.4, nprobe = 2))
    assert(incr == full,
      s"incremental drift: full-only=${full.toSet.diff(incr.toSet).take(3)} " +
        s"incr-only=${incr.toSet.diff(full.toSet).take(3)}")
    assert(incr.nonEmpty && incr.exists(!_._2._3),
      "fixture shard must contain at least one drop for the parity to be meaningful")
  }

  test("clustered MoG fixture: deterministic, and IVF holds 0.9 recall at nprobe=ceil(sqrt(nlist))") {
    import graft.harness.SyntheticEmbeddings
    val mog = SyntheticEmbeddings
      .mixtureOfGaussians(spark, n = 1000, dim = 64, nClusters = 25, clusterStd = 0.08)
      .select("vec_id", "embedding")
      .cache()
    try {
      // Deterministic: two independent generations are byte-identical.
      val again = SyntheticEmbeddings
        .mixtureOfGaussians(spark, n = 1000, dim = 64, nClusters = 25, clusterStd = 0.08)
        .select("vec_id", "embedding")
      def sig(df: org.apache.spark.sql.DataFrame): Array[(Long, Seq[Float])] =
        df.collect().map(r => (r.getLong(0), r.getSeq[Float](1))).sortBy(_._1)
      assert(sig(mog).toSeq == sig(again).toSeq, "MoG fixture is not deterministic")

      // The clustered regime: textbook sqrt-probing must hold the bar
      // that the near-uniform fixture provably can't (RECALL.json).
      val exact = Similarity.bruteForceTopK(mog, mog, k = 5)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val nlist = 32 // ceil(sqrt(1000))
      val nprobe = math.ceil(math.sqrt(nlist)).toInt // 6 — a ~19% scan
      val got = Similarity.ivfTopK(mog, mog, 5, nlist, nprobe, 2, "vec_id", "embedding")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val recall = got.intersect(exact).size.toDouble / exact.size
      assert(recall >= 0.9, s"MoG sqrt-nprobe recall $recall below the 0.9 bar")

      // And through the documented knob: auto nlist/nprobe with
      // spark.graft.ivf.nprobeFraction at the sqrt ratio.
      spark.conf.set("spark.graft.ivf.nprobeFraction", (math.sqrt(nlist) / nlist).toString)
      val viaKnob =
        try Similarity.ivfTopK(mog, k = 5)
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        finally spark.conf.unset("spark.graft.ivf.nprobeFraction")
      val knobRecall = viaKnob.intersect(exact).size.toDouble / exact.size
      assert(knobRecall >= 0.9, s"nprobeFraction-knob recall $knobRecall below the 0.9 bar")
    } finally { mog.unpersist(); () }
  }

  test("IVF-PQ ANN: coarse routing + ADC + exact re-rank keeps recall") {
    import graft.operators.ProductQuant
    val k = 3
    val subset = emb.filter(col("vec_id") < 100)
    val brute = Similarity.bruteForceTopK(subset, subset, k)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = ProductQuant.ivfPqTopK(subset, k)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = got.intersect(brute).size.toDouble / brute.size
    assert(recall >= 0.9, s"IVF-PQ recall $recall below the 0.9 bar")
  }

  test("two-frame PQ ANN: query frame vs disjoint corpus keeps recall") {
    import graft.operators.ProductQuant
    val k = 3
    val q = emb.filter(col("vec_id") < 20)
    val c = emb.filter(col("vec_id") >= 20)
    val brute = Similarity.bruteForceTopK(q, c, k)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = ProductQuant.pqTopK(q, c, k, m = 16, ks = 32, refineIters = 2,
      rerankFactor = 0, idCol = "vec_id", vecCol = "embedding")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    got.foreach { case (qid, nid) =>
      assert(qid < 20 && nid >= 20, s"pair ($qid,$nid) crosses frame boundaries")
    }
    val recall = got.intersect(brute).size.toDouble / brute.size
    assert(recall >= 0.9, s"two-frame PQ recall $recall below the 0.9 bar")
  }

  test("two-frame ANN: query frame vs disjoint corpus keeps recall") {
    val k = 3
    val q = emb.filter(col("vec_id") < 20)
    val c = emb.filter(col("vec_id") >= 20)
    val brute = Similarity.bruteForceTopK(q, c, k)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // Every result must come from the corpus side only.
    val lshGot = Similarity.lshTopK(q, c, k, 32, 4, "vec_id", "embedding")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivfGot = Similarity.ivfTopK(q, c, k, 16, 10, 2, "vec_id", "embedding")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    (lshGot ++ ivfGot).foreach { case (qid, nid) =>
      assert(qid < 20 && nid >= 20, s"pair ($qid,$nid) crosses frame boundaries")
    }
    val lshRecall = lshGot.intersect(brute).size.toDouble / brute.size
    val ivfRecall = ivfGot.intersect(brute).size.toDouble / brute.size
    assert(lshRecall >= 0.9, s"two-frame LSH recall $lshRecall below the 0.9 bar")
    assert(ivfRecall >= 0.9, s"two-frame IVF recall $ivfRecall below the 0.9 bar")
  }

  test("IVF auto nlist/nprobe: sqrt-N derivation with floor, recall holds") {
    // resolveNlist: explicit positive wins; <=0 derives max(16, ceil(√N)).
    assert(Similarity.resolveNlist(emb.filter(col("vec_id") < 100), 0, "vec_id") == 16,
      "100-vector corpus floors at 16")
    assert(Similarity.resolveNlist(emb, 0, "vec_id") == 23, "ceil(√500) = 23")
    assert(Similarity.resolveNlist(emb, 7, "vec_id") == 7, "explicit nlist wins")
    assert(Similarity.resolveNprobe(0, 23) == 15, "auto nprobe = ceil(0.625·23)")
    assert(Similarity.resolveNprobe(12, 23) == 12, "explicit nprobe wins")
    // The auto-derived index (nlist=23, nprobe=15 on the full 500-vector
    // table) must hold the same recall bar as the explicit configs.
    val k = 3
    val brute = Similarity.bruteForceTopK(emb, emb, k)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val auto = Similarity.ivfTopK(emb, k)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = auto.intersect(brute).size.toDouble / brute.size
    assert(recall >= 0.9, s"auto-derived IVF recall $recall below the 0.9 bar")
  }

  test("IVF fit-once: persisted centroids reproduce the one-shot result") {
    val subset = emb.filter(col("vec_id") < 100)
    val oneShot = Similarity.ivfTopK(subset, k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet
    // Fit once, roundtrip the centroid table through parquet (the
    // persisted-index contract), query against it twice.
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf_cent_").toString
    Similarity.ivfCentroids(subset).write.mode("overwrite").parquet(dir)
    val cents = spark.read.parquet(dir)
    def queryOnce() = Similarity
      .ivfTopK(subset, subset, cents, k = 3, nprobe = 10, idCol = "vec_id", vecCol = "embedding")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet
    assert(queryOnce() == oneShot, "persisted centroids must reproduce the one-shot ranking")
    assert(queryOnce() == oneShot, "repeat queries against the same index are stable")
  }

  test("IVF sampled Lloyd fit (fitFraction < 1) keeps recall") {
    val k = 3
    val subset = emb.filter(col("vec_id") < 100)
    val brute = Similarity.bruteForceTopK(subset, subset, k)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    spark.conf.set("spark.graft.ivf.fitFraction", "0.5")
    val ivf =
      try Similarity.ivfTopK(subset, k)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      finally spark.conf.unset("spark.graft.ivf.fitFraction")
    val recall = ivf.intersect(brute).size.toDouble / brute.size
    // Centroids fitted on a deterministic hash-sampled half of the corpus
    // (the 100 TB fit path); assignment and probe still cover every
    // vector. This 50-sample/16-centroid fit is deliberately DEGENERATE
    // (cliff guard only, hence the loose bar) — the canonical sampled-fit
    // recall measurement lives in RecallProbe's sf0.1 block
    // (~1000-sample/16-centroid, the regime fitFraction targets,
    // asserted >= 0.85 there).
    assert(recall >= 0.8, s"sampled-fit IVF recall $recall fell off the cliff (bar 0.8)")
  }

  test("minhashLsh reports mass-identical docs as star pairs; incremental matches full run") {
    import spark.implicits._
    // 500 identical docs (every band bucket would blow maxBucketSize=64)
    // plus one twin pair and one short doc pair below the shingle width.
    val flood = (0L until 500L).map(i => (i, "lorem ipsum dolor sit amet consectetur"))
    val twins = Seq((9000L, "alpha beta gamma delta epsilon"), (9001L, "alpha beta gamma delta epsilon"))
    val shorties = Seq((9100L, "hi"), (9101L, "hi")) // < shingleN tokens: unshingleable
    val docs = (flood ++ twins ++ shorties).toDF("doc_id", "text")
    val pairs = Dedup.minhashLsh(docs, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val expected = (1L until 500L).map(i => (0L, i, 1.0)).toSet +
      ((9000L, 9001L, 1.0)) + ((9100L, 9101L, 1.0))
    assert(pairs == expected,
      s"expected 499 star pairs + twins + short-doc pair, got ${pairs.size}")

    // Incremental against a persisted index must see the same pairs for a
    // shard that duplicates corpus boilerplate exactly.
    val corpus = docs.filter(col("doc_id") < 9000L)
    val shard = Seq(
      (20000L, "lorem ipsum dolor sit amet consectetur"), // exact dup of the flood
      (20001L, "totally novel text about something else entirely")).toDF("doc_id", "text")
    val incr = Dedup.minhashLshIncremental(shard, Dedup.minhashIndex(corpus), threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(incr == Set((0L, 20000L, 1.0)),
      s"shard dup of a capped-out boilerplate cluster must still be caught: $incr")
  }

  test("simhash reports mass-identical docs as linear star pairs despite the bucket cap") {
    import spark.implicits._
    // 2000 identical docs — far beyond maxBucketSize — plus one exact twin
    // pair. The exact-duplicate pre-pass collapses the flood to one
    // representative, so the cluster surfaces as 1999 star pairs (rep 0 ↔
    // each copy, hamming 0) instead of being silently dropped by the cap
    // (or costing ~2000² bucket-local comparisons ×4 chunks uncapped).
    val flood = (0L until 2000L).map(i => (i, "aaa bbb ccc aaa bbb"))
    val twins = Seq((10000L, "xxx yyy zzz www vvv"), (10001L, "xxx yyy zzz www vvv"))
    val docs = (flood ++ twins).toDF("doc_id", "text")
    val pairs = Dedup.simhash(docs, maxHamming = 0, maxBucketSize = 256)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = (1L until 2000L).map(i => (0L, i)).toSet + ((10000L, 10001L))
    assert(pairs == expected,
      s"expected 1999 star pairs + the twin pair, got ${pairs.size} pairs")
    // After the pre-pass only DISTINCT texts reach the banding stage, so
    // the cap drops nothing on this corpus — the observability companion
    // proves it.
    assert(Dedup.simhashCappedBuckets(docs, maxBucketSize = 256).count() == 0L)
  }

  test("trigram langid classifies held-out sentences in all 15 languages") {
    import spark.implicits._
    // None of these sentences appear in the UDHR seed profiles.
    val samples = Seq(
      1L -> ("en", "the quick brown fox jumps over the lazy dog and runs through the green forest every morning"),
      2L -> ("es", "el perro corre por la calle y come mucha comida durante la noche con sus amigos"),
      3L -> ("fr", "le chien mange du pain et boit de l'eau dans la cuisine chaque matin avec les enfants"),
      4L -> ("de", "der hund läuft durch den wald und trinkt wasser aus dem fluss jeden morgen"),
      5L -> ("it", "il cane corre nella strada e mangia il pane con gli amici della città ogni giorno"),
      6L -> ("pt", "o cachorro corre pela rua e come pão com os amigos durante a manhã todos os dias"),
      7L -> ("nl", "de hond loopt door het bos en drinkt water uit de rivier elke dag met de kinderen"),
      8L -> ("sv", "hunden springer genom skogen och dricker vatten från floden varje dag med barnen"),
      9L -> ("da", "hunden løber gennem skoven og drikker vand fra floden hver dag med børnene"),
      10L -> ("zh", "今天天气很好我们一起去公园散步然后在餐厅吃饭聊天"),
      11L -> ("und", "12345 !!! ??? 678"),
      12L -> ("ru", "сегодня утром мы пошли в магазин и купили хлеб для всей семьи"),
      13L -> ("ja", "今日は天気がいいので公園に行って友達と一緒に遊びました"),
      14L -> ("ko", "오늘 아침에 우리는 시장에 가서 가족을 위해 빵을 샀습니다"),
      15L -> ("ar", "ذهب الرجل إلى السوق في الصباح واشترى خبزا لعائلته"),
      16L -> ("el", "σήμερα το πρωί πήγαμε στην αγορά και αγοράσαμε ψωμί για την οικογένεια"))
    val df = samples.map { case (id, (_, t)) => (id, t) }.toDF("doc_id", "text")
    val got = graft.operators.LangIdTrigram.classifyAll(df).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    samples.foreach { case (id, (want, _)) =>
      assert(got(id) == want, s"doc $id: predicted ${got(id)}, wanted $want")
    }
  }

  test("trigram langid agrees with the stopword heuristic on natural-language text") {
    // The two heuristics share 5 languages (en/es/fr/de/zh). Agreement is
    // measured on natural sentences — the fixture corpus is synthetic
    // database jargon ("key agg row scan ..."), i.e. no natural language
    // to identify, so corpus-level agreement would measure noise (the
    // corpus itself is covered exactly by the DuckDB oracle instead).
    import spark.implicits._
    val sentences = Seq(
      "the old man walked to the market in the morning and bought some bread for his family",
      "she said that it was the best day of the year and everyone agreed with her",
      "a small bird sat on the roof of the house and sang in the warm evening air",
      "el mercado de la ciudad estaba lleno de gente que compraba fruta y pan para la semana",
      "la casa de mis padres es grande y tiene un jardín con muchas flores y árboles",
      "los niños juegan en el parque todos los días después de la escuela con sus amigos",
      "le marché de la ville était plein de gens qui achetaient du pain et des fruits",
      "la maison de mes parents est grande et elle a un jardin avec beaucoup de fleurs",
      "les enfants jouent dans le parc tous les jours après l'école avec leurs amis",
      "der alte mann ging am morgen zum markt und kaufte brot für seine familie",
      "das haus meiner eltern ist groß und hat einen garten mit vielen blumen und bäumen",
      "die kinder spielen jeden tag nach der schule mit ihren freunden im park",
      "早上老人走到市场给家人买了一些面包然后回到家里",
      "我父母的房子很大有一个花园里面有很多花和树",
      "孩子们每天放学后都和他们的朋友在公园里玩")
    val df = sentences.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val sw = df.select(col("doc_id"), graft.functions.Texts.langId(col("text")).as("sw"))
    val ct = graft.operators.LangIdTrigram.classifyAll(df)
    val joined = sw.join(ct, "doc_id").filter(col("sw") =!= "und").collect()
      .map(r => (r.getString(1), r.getString(2)))
    assert(joined.length >= 12, s"stopword heuristic should fire on most sentences: ${joined.length}")
    val agree = joined.count { case (a, b) => a == b }
    val frac = agree.toDouble / joined.length
    val confusion = joined.filter { case (a, b) => a != b }
      .groupBy(identity).view.mapValues(_.size).toMap
    assert(frac >= 0.9,
      s"agreement $agree/${joined.length} = $frac below 0.9; confusion: $confusion")
  }

  test("trigram langid matches a local Cavnar–Trenkle model exactly") {
    import graft.operators.LangIdTrigram
    val topK = LangIdTrigram.defaultTopK
    val profiles = LangIdTrigram.profileRows(topK)
      .groupBy(_._1).view.mapValues(_.map { case (_, tg, r) => tg -> r }.toMap).toMap
    val langs = LangIdTrigram.seeds.keys.toSeq.sorted
    def localClassify(text: String): String = {
      val ranked = LangIdTrigram.localTrigrams(text)
        .groupBy(identity).view.mapValues(_.size).toSeq
        .sortBy { case (tg, c) => (-c, tg) }
        .take(topK).zipWithIndex.map { case ((tg, _), i) => tg -> (i + 1) }
      if (ranked.isEmpty) "und"
      else langs.map { l =>
        val prof = profiles(l)
        (ranked.map { case (tg, dr) =>
          prof.get(tg).map(lr => math.abs(dr - lr).toLong).getOrElse(topK.toLong)
        }.sum, l)
      }.min._2
    }
    val texts = docs.select("doc_id", "text").limit(60).collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val ids = texts.map(_._1).toSet
    val got = LangIdTrigram.classifyAll(docs.filter(col("doc_id").isin(ids.toSeq: _*)))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    texts.foreach { case (id, t) =>
      assert(got(id) == localClassify(t), s"doc $id: spark ${got(id)} != local ${localClassify(t)}")
    }
  }

  test("containerMeta round-trips MediaFixtures payloads to closed-form metadata") {
    import spark.implicits._
    val ids = (0L until 30L).toDF("doc_id")
    val got = graft.operators.Multimodal
      .containerMeta(graft.harness.MediaFixtures.syntheticContainers(ids))
      .collect()
      .map(r => r.getLong(0) -> r).toMap
    (0L until 30L).foreach { id =>
      val r = got(id)
      (id % 6) match {
        case 0 =>
          assert(r.getString(1) == "mp4")
          assert(r.getInt(2) == 16 + (id % 64).toInt, s"mp4 $id width")
          assert(r.getInt(3) == 16 + ((7 * id) % 64).toInt, s"mp4 $id height")
          assert(r.getLong(4) == 500 + id % 1000, s"mp4 $id duration")
          assert(r.isNullAt(5) && r.isNullAt(6))
        case 1 =>
          assert(r.getString(1) == "mp3")
          assert(r.isNullAt(2) && r.isNullAt(3))
          val frames = 5 + (id % 20)
          assert(r.getLong(4) == frames * 1152L * 1000L / 44100L, s"mp3 $id duration")
          assert(r.getInt(5) == 128 && r.getInt(6) == 44100)
        case 2 =>
          assert(r.getString(1) == "webm")
          assert(r.getInt(2) == 32 + (id % 128).toInt, s"webm $id width")
          assert(r.getInt(3) == 32 + ((3 * id) % 128).toInt, s"webm $id height")
          assert(r.getLong(4) == 250 + id % 500, s"webm $id duration")
          assert(r.isNullAt(5) && r.isNullAt(6))
        case 3 =>
          assert(r.getString(1) == "flac")
          assert(r.isNullAt(2) && r.isNullAt(3) && r.isNullAt(5))
          assert(r.getLong(4) == (10 + id % 50) * 100, s"flac $id duration")
          assert(r.getInt(6) == 44100)
        case 4 =>
          assert(r.getString(1) == "ogg")
          assert(r.isNullAt(2) && r.isNullAt(3))
          assert(r.getLong(4) == (20 + id % 100) * 10, s"ogg $id duration")
          assert(r.getInt(5) == 112 && r.getInt(6) == 44100)
        case _ =>
          assert(r.getString(1) == "aac")
          assert(r.isNullAt(2) && r.isNullAt(3))
          val frames = 3 + (id % 15)
          val durMs = frames * 1024L * 1000L / 44100L
          assert(r.getLong(4) == durMs, s"adts $id duration")
          assert(r.getInt(5) == (frames * 200L * 8L / durMs).toInt, s"adts $id bitrate")
          assert(r.getInt(6) == 44100)
      }
    }
  }

  test("container parsers handle v1 MP4 boxes, ID3-tagged MP3, and corrupt payloads") {
    import graft.operators.Multimodal
    // Hand-assembled (NOT via MediaFixtures) version-1 MP4: 64-bit mvhd
    // duration 45000 ticks at timescale 90000 → 500 ms; tkhd v1 with
    // 640×360 in 16.16 fixed point.
    val bb = java.nio.ByteBuffer.allocate(16 + 8 + 120 + 8 + 104)
    bb.putInt(16); bb.put("ftyp".getBytes); bb.put("isom".getBytes); bb.putInt(0)
    bb.putInt(8 + 120 + 8 + 104); bb.put("moov".getBytes)
    bb.putInt(120); bb.put("mvhd".getBytes)
    bb.putInt(0x01000000)               // version 1, flags 0
    bb.putLong(0L); bb.putLong(0L)      // creation, modification
    bb.putInt(90000)                    // timescale
    bb.putLong(45000L)                  // duration (64-bit)
    bb.putInt(0x00010000); bb.putShort(0x0100.toShort)
    bb.put(new Array[Byte](10 + 36 + 24)); bb.putInt(2)
    bb.putInt(8 + 104); bb.put("trak".getBytes)
    bb.putInt(104); bb.put("tkhd".getBytes)
    bb.putInt(0x01000000)               // version 1, flags 0
    bb.putLong(0L); bb.putLong(0L)      // creation, modification
    bb.putInt(1); bb.putInt(0)          // track_ID, reserved
    bb.putLong(45000L)                  // duration (64-bit)
    bb.put(new Array[Byte](8))          // reserved
    bb.putShort(0); bb.putShort(0); bb.putShort(0); bb.putShort(0)
    bb.put(new Array[Byte](36))         // matrix
    bb.putInt(640 << 16); bb.putInt(360 << 16)
    val mp4v1 = bb.array()
    val m4 = Multimodal.parseMp4(mp4v1).get
    assert((m4.width, m4.height, m4.durationMs) == (Some(640), Some(360), Some(500L)),
      s"v1 MP4 parse: $m4")

    // ID3v2-tagged MP3 (tag must be skipped via its syncsafe size): 7
    // frames of MPEG-1 Layer III 128 kbps / 44100 Hz after 100 tag bytes.
    val tag = Array[Byte]('I', 'D', '3', 4, 0, 0, 0, 0, 0, 100) ++ new Array[Byte](100)
    val frame = Array[Byte](0xff.toByte, 0xfb.toByte, 0x90.toByte, 0x00) ++
      new Array[Byte](144000 * 128 / 44100 - 4)
    val mp3 = tag ++ Array.fill(7)(frame).flatten
    val m3 = Multimodal.parseMp3(mp3).get
    assert((m3.durationMs, m3.bitrateKbps, m3.sampleRate) ==
      (Some(7L * 1152 * 1000 / 44100), Some(128), Some(44100)), s"ID3 MP3 parse: $m3")

    // VBR MP3: frame lengths follow each frame's own bitrate index; the
    // sample-sum duration is bitrate-independent (5 frames of 1152
    // samples at 44100 Hz), and the reported bitrate is the FIRST frame's.
    def mp3Frame(bitrateIdx: Int, kbps: Int): Array[Byte] =
      Array[Byte](0xff.toByte, 0xfb.toByte, ((bitrateIdx << 4) | 0x00).toByte, 0x00) ++
        new Array[Byte](144000 * kbps / 44100 - 4)
    val vbr = mp3Frame(9, 128) ++ mp3Frame(14, 320) ++ mp3Frame(5, 64) ++
      mp3Frame(11, 192) ++ mp3Frame(9, 128)
    val mv = Multimodal.parseMp3(vbr).get
    assert((mv.durationMs, mv.bitrateKbps, mv.sampleRate) ==
      (Some(5L * 1152 * 1000 / 44100), Some(128), Some(44100)), s"VBR MP3 parse: $mv")

    // WebM Duration may be an 8-byte double; the EBML walk must honor the
    // element size. Hand-assemble: EBML header + Segment(Info(
    // TimecodeScale=1e6, Duration=double 1234.0)).
    def vintElem(idBytes: Array[Int], content: Array[Byte]): Array[Byte] =
      idBytes.map(_.toByte).toArray ++ Array((0x80 | content.length).toByte) ++ content
    val dur8 = java.nio.ByteBuffer.allocate(8).putDouble(1234.0).array()
    val info8 = vintElem(Array(0x15, 0x49, 0xa9, 0x66),
      vintElem(Array(0x2a, 0xd7, 0xb1), Array(0x0f, 0x42, 0x40).map(_.toByte)) ++
        vintElem(Array(0x44, 0x89), dur8))
    val webm8 = vintElem(Array(0x1a, 0x45, 0xdf, 0xa3), Array.empty) ++
      vintElem(Array(0x18, 0x53, 0x80, 0x67), info8)
    val mw = Multimodal.parseWebm(webm8).get
    assert(mw.durationMs == Some(1234L) && mw.width.isEmpty, s"double-duration WebM parse: $mw")

    // Corrupt / truncated payloads never throw and never misreport.
    assert(Multimodal.parseMp4("plain text, not a container".getBytes).isEmpty)
    assert(Multimodal.parseMp3(Array[Byte](0x12, 0x34, 0x56)).isEmpty)
    assert(Multimodal.parseWebm(Array[Byte](0x1a, 0x45)).isEmpty)
    val truncated = graft.harness.MediaFixtures.mp4Payload(3L).take(40)
    assert(Multimodal.parseMp4(truncated).exists(m => m.width.isEmpty && m.durationMs.isEmpty) ||
      Multimodal.parseMp4(truncated).isEmpty)
  }

  test("redactPii scrubs emails, IPs and phones; counts match; clean text untouched") {
    import spark.implicits._
    val cases = Seq(
      (1L, "write to alice.smith+tag@sub.example.org today",
        "write to [EMAIL] today", (1L, 0L, 0L)),
      (2L, "servers 10.0.42.7 and 192.168.1.254 are up",
        "servers [IPV4] and [IPV4] are up", (0L, 2L, 0L)),
      (3L, "call +15551234567 or mail bob@x.io from 8.8.8.8",
        "call [PHONE] or mail [EMAIL] from [IPV4]", (1L, 1L, 1L)),
      (4L, "no pii here, just version 1.2 and a plus + sign",
        "no pii here, just version 1.2 and a plus + sign", (0L, 0L, 0L)))
    val df = cases.map { case (id, t, _, _) => (id, t) }.toDF("doc_id", "text")
    val counts = Texts.piiCounts(col("text"))
    val got = df.select(col("doc_id") +: Texts.redactPii(col("text")).as("r") +:
      counts.map { case (n, c) => c.as(n) }: _*)
      .collect().map(r => r.getLong(0) -> (r.getString(1), (r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    cases.foreach { case (id, _, wantText, wantCounts) =>
      assert(got(id)._1 == wantText, s"doc $id: ${got(id)._1}")
      assert(got(id)._2 == wantCounts, s"doc $id counts: ${got(id)._2}")
    }
  }

  test("parseOgg: near-Long.MaxValue last granule degrades to a sane duration, not overflow") {
    import graft.operators.Multimodal
    // Minimal single-page Ogg: 27-byte page header + 1 segment holding a
    // 28-byte Vorbis identification payload (rate 48 kHz), with the page
    // granule position adversarially set near Long.MaxValue.
    val payload = new Array[Byte](28)
    payload(0) = 0x01
    "vorbis".getBytes("US-ASCII").copyToArray(payload, 1)
    val pb = java.nio.ByteBuffer.wrap(payload).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    pb.putInt(12, 48000)
    pb.putInt(20, 128000)
    val hb = java.nio.ByteBuffer.allocate(28).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    hb.put("OggS".getBytes("US-ASCII"))
    hb.putLong(6, Long.MaxValue - 7)
    hb.put(26, 1.toByte)
    hb.put(27, 28.toByte)
    val meta = Multimodal.parseOgg(hb.array() ++ payload)
    assert(meta.isDefined)
    val d = meta.get.durationMs
    // Exact split-form value: ⌊g/48000⌋·1000 + ⌊(g mod 48000)·1000/48000⌋.
    val g = Long.MaxValue - 7
    assert(d.contains(g / 48000 * 1000L + g % 48000 * 1000L / 48000), s"got $d")
    assert(d.exists(_ > 0))
    // And the normal fixture still reads the same duration as before.
    val normal = Multimodal.parseOgg(graft.harness.MediaFixtures.oggPayload(10L))
    assert(normal.exists(_.durationMs.exists(_ > 0)))
  }

  test("ConcurrentFits surfaces the original exception, not an ExecutionException wrapper") {
    import graft.operators.ConcurrentFits
    class FitBoom extends RuntimeException("subspace fit failed")
    val caught = intercept[FitBoom] {
      ConcurrentFits.run[Int](Seq(
        () => 1,
        () => throw new FitBoom,
        () => 3))
    }
    assert(caught.getMessage == "subspace fit failed")
    // Success path unchanged: results in submission order.
    assert(ConcurrentFits.run[Int](Seq(() => 1, () => 2, () => 3)) == Seq(1, 2, 3))
    // Pool width honors spark.graft.pq.fitParallelism when a session is up.
    spark.conf.set("spark.graft.pq.fitParallelism", "2")
    try assert(ConcurrentFits.run[Int]((1 to 8).map(i => () => i)) == (1 to 8))
    finally spark.conf.unset("spark.graft.pq.fitParallelism")
  }

  test("dHash: synthetic BMPs realize their closed-form target hashes (builder vs hasher)") {
    import graft.harness.MediaFixtures
    import graft.operators.PerceptualHash
    (0L until 60L).foreach { id =>
      val got = PerceptualHash.dhash(MediaFixtures.bmpPayload(id))
      assert(got.contains(MediaFixtures.dhashTarget(id)),
        s"id $id: dhash $got != target ${MediaFixtures.dhashTarget(id)}")
    }
    // Cross-family base hashes stay far apart over every id range in use
    // (sf0.1 has 5000 docs → 1000 families): the SQL oracle's "no
    // cross-family pairs at maxHamming=2" claim needs min base distance
    // > 4 (variant flips can close at most 2 bits); assert a wide margin.
    val bases = (0L until 1000L).map(f => MediaFixtures.dhashTarget(f * 5))
    var minD = 64
    var i = 0
    while (i < bases.length) {
      var j = i + 1
      while (j < bases.length) {
        val d = java.lang.Long.bitCount(bases(i) ^ bases(j))
        if (d < minD) minD = d
        j += 1
      }
      i += 1
    }
    assert(minD >= 13, s"cross-family min Hamming $minD — oracle margin eroded")
  }

  test("BMP walks reject adversarial headers (rowSize overflow, bad data offset) without throwing") {
    import graft.operators.{Multimodal, PerceptualHash}
    def bmpHeader(width: Int, height: Int, dataOffset: Int): Array[Byte] = {
      val b = java.nio.ByteBuffer.allocate(100).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.put('B'.toByte); b.put('M'.toByte)
      b.putInt(2, 100)          // file size
      b.putInt(10, dataOffset)
      b.putInt(14, 40)          // info header size
      b.putInt(18, width)
      b.putInt(22, height)
      b.putShort(26, 1)         // planes
      b.putShort(28, 24)        // bpp
      b.putInt(30, 0)           // BI_RGB
      b.array()
    }
    // width ~2^27: 24*width overflows Int to negative — the former Int
    // rowSize passed the bounds check and indexed out of bounds.
    val hugeWidth = bmpHeader(200000000, 8, 54)
    assert(PerceptualHash.dhashBmp(hugeWidth).isEmpty)
    assert(Multimodal.decodeBmp(hugeWidth).isEmpty)
    // width×height chosen so rowSize*height wraps LONG negative — the
    // first hardening's multiplication-form bounds check passed this; the
    // division-form check must not.
    val longWrap = bmpHeader(Int.MaxValue, 2000000000, 54)
    assert(PerceptualHash.dhashBmp(longWrap).isEmpty)
    assert(Multimodal.decodeBmp(longWrap).isEmpty)
    // |Int.MinValue| overflows abs — must reject, not loop on a negative height.
    val minHeight = bmpHeader(9, Int.MinValue, 54)
    assert(PerceptualHash.dhashBmp(minHeight).isEmpty)
    assert(Multimodal.decodeBmp(minHeight).isEmpty)
    // Negative / out-of-range data offsets.
    Seq(-100, -1, 101, Int.MaxValue).foreach { off =>
      val p = bmpHeader(9, 8, off)
      assert(PerceptualHash.dhashBmp(p).isEmpty, s"offset $off")
      assert(Multimodal.decodeBmp(p).isEmpty, s"offset $off")
    }
    // Sanity: the honest fixture still decodes after the hardening.
    assert(PerceptualHash.dhashBmp(graft.harness.MediaFixtures.bmpPayload(7L)).isDefined)
    assert(Multimodal.decodeBmp(graft.harness.MediaFixtures.bmpPayload(7L)).isDefined)
  }

  test("dHash is format- and scale-invariant: BMP, PNG, and a 2x upscale hash identically") {
    import graft.harness.MediaFixtures
    import graft.operators.PerceptualHash
    (0L until 10L).foreach { id =>
      val bmp = MediaFixtures.bmpPayload(id)
      val target = MediaFixtures.dhashTarget(id)
      // ImageIO reads BMP too — the ImageIO path must agree with the
      // byte-arithmetic path on the same payload.
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bmp))
      assert(img != null, "JDK ImageIO failed to read the BMP fixture")
      def png(im: java.awt.image.BufferedImage): Array[Byte] = {
        val o = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(im, "png", o)
        o.toByteArray
      }
      assert(PerceptualHash.dhash(png(img)).contains(target), s"id $id: PNG re-encode drifted")
      // 2x nearest-neighbor upscale: every 9x8 pool cell averages a 2x2
      // block of identical grays — the hash must not move.
      val up = new java.awt.image.BufferedImage(
        img.getWidth * 2, img.getHeight * 2, java.awt.image.BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < up.getHeight) {
        var x = 0
        while (x < up.getWidth) {
          up.setRGB(x, y, img.getRGB(x / 2, y / 2)); x += 1
        }
        y += 1
      }
      assert(PerceptualHash.dhash(png(up)).contains(target), s"id $id: 2x upscale drifted")
    }
  }

  test("phash dedupIncremental equals the full run restricted to shard ids") {
    import graft.harness.MediaFixtures
    import graft.operators.PerceptualHash
    val ids = spark.range(0, 50).select(col("id").as("doc_id"))
    val all = MediaFixtures.syntheticBitmaps(ids)
    // Split MID-family (family 6 spans ids 30-34) so corpus↔shard pairs
    // exist, not just shard-internal ones.
    val corpus = all.filter(col("media_id") < 32)
    val shard = all.filter(col("media_id") >= 32)
    val dir = "/tmp/graft_test_phashidx"
    PerceptualHash.signatures(corpus).write.mode("overwrite").parquet(dir)
    val incr = PerceptualHash.dedupIncremental(
      shard, spark.read.parquet(dir), maxHamming = 2)
    val full = PerceptualHash.dedup(all, maxHamming = 2)
      .filter(col("doc_a") >= 32 || col("doc_b") >= 32)
    assert(snap(incr.orderBy("doc_a", "doc_b")) ==
      snap(full.orderBy("doc_a", "doc_b")))
    // Cross-boundary pairs are present (family 6 straddles the split).
    assert(incr.filter(col("doc_a") < 32).count() > 0)
    val bad = intercept[IllegalArgumentException] {
      PerceptualHash.dedupIncremental(shard, all)
    }
    assert(bad.getMessage.contains("signatures"))
  }

  test("phash dedup recovers the family structure; identical images star-pair at hamming 0") {
    import graft.harness.MediaFixtures
    import graft.operators.PerceptualHash
    import spark.implicits._
    val ids = spark.range(0, 50).select(col("id").as("doc_id"))
    val got = PerceptualHash.dedup(MediaFixtures.syntheticBitmaps(ids), maxHamming = 2)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getInt(2))).toMap
    val expected = (for {
      a <- 0L until 50L; b <- (a + 1) until 50L
      if a / 5 == b / 5
    } yield ((a, b), if (a % 5 == 0 || b % 5 == 0) 1 else 2)).toMap
    assert(got == expected,
      s"family structure: missing=${expected.keySet.diff(got.keySet).take(5)} " +
        s"extra=${got.keySet.diff(expected.keySet).take(5)}")

    // Byte-identical images (same target hash) collapse to star pairs.
    val dup = Seq(
      (1000L, MediaFixtures.bmpPayload(0L)),
      (1001L, MediaFixtures.bmpPayload(0L)),
      (1002L, MediaFixtures.bmpPayload(0L))).toDF("media_id", "payload")
    val stars = PerceptualHash.dedup(dup, maxHamming = 2)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getInt(2))).toMap
    assert(stars == Map((1000L, 1001L) -> 0, (1000L, 1002L) -> 0),
      s"expected min-id star pairs at hamming 0; got $stars")

    // Non-image payloads simply produce no signatures (and no pairs).
    val mixed = Seq((1L, "not an image at all".getBytes("UTF-8"))).toDF("media_id", "payload")
    assert(PerceptualHash.signatures(mixed).count() == 0)
  }

  test("container parsers never throw on fuzzed payloads (hash-derived + mutated fixtures)") {
    import graft.operators.Multimodal
    def parseAll(p: Array[Byte]): Unit = {
      Multimodal.parseMp4(p); Multimodal.parseWebm(p); Multimodal.parseMp3(p)
      Multimodal.parseFlac(p); Multimodal.parseOgg(p); Multimodal.parseAdts(p)
      ()
    }
    // Deterministic pseudo-random payloads (xxhash-style LCG over a seed).
    def bytes(seed: Long, n: Int): Array[Byte] = {
      var x = seed
      Array.fill(n) { x = x * 6364136223846793005L + 1442695040888963407L; (x >>> 56).toByte }
    }
    (0 until 100).foreach(i => parseAll(bytes(i.toLong, 16 + (i * 37) % 4096)))
    // Valid fixtures with every prefix truncation and single-bit flips:
    // the walks must stop cleanly on any corrupt size/offset they meet.
    Seq(
      graft.harness.MediaFixtures.mp4Payload(7L),
      graft.harness.MediaFixtures.webmPayload(8L),
      graft.harness.MediaFixtures.mp3Payload(4L).take(900),
      graft.harness.MediaFixtures.flacPayload(9L),
      graft.harness.MediaFixtures.oggPayload(10L),
      graft.harness.MediaFixtures.adtsPayload(11L).take(900)).foreach { base =>
      (0 to base.length by math.max(1, base.length / 50)).foreach(n => parseAll(base.take(n)))
      (0 until base.length by math.max(1, base.length / 64)).foreach { i =>
        val mutated = base.clone()
        mutated(i) = (mutated(i) ^ 0x81).toByte
        parseAll(mutated)
      }
    }
    // Regression: an empty mvhd box ending exactly at the payload edge —
    // the fixed-offset header reads must be bounds-guarded, not trust the
    // box size.
    val edge = java.nio.ByteBuffer.allocate(16 + 8 + 8)
    edge.putInt(16); edge.put("ftyp".getBytes); edge.put("isom".getBytes); edge.putInt(0)
    edge.putInt(16); edge.put("moov".getBytes)
    edge.putInt(8); edge.put("mvhd".getBytes) // zero-content box at EOF
    parseAll(edge.array())

    // And through the distributed operator: fuzz rows must come back as
    // SOME row (parsed or opaque), never a task failure.
    import spark.implicits._
    val fuzz = (0L until 50L).map(i => (i, bytes(i * 31 + 5, 64 + (i * 97 % 2048).toInt)))
      .toDF("media_id", "payload")
    assert(Multimodal.containerMeta(fuzz).count() == 50L)
  }

  test("compressionRatio matches a local deflate and flags repetitive text") {
    import spark.implicits._
    val aug = docs.select("doc_id", "text").unionByName(Seq(
      (910001L, "spam " * 400),                 // degenerate → very low ratio
      (910002L, ""),                            // empty → null ratio
      (910003L, (0 until 400).map(i => (i * 2654435761L % 997).toString).mkString(" "))
    ).toDF("doc_id", "text"))
    def localRatio(t: String): (Long, Long, Option[Double]) = {
      val bytes = t.getBytes("UTF-8")
      if (bytes.isEmpty) return (0L, 0L, None)
      val d = new java.util.zip.Deflater()
      d.setInput(bytes); d.finish()
      val buf = new Array[Byte](64 * 1024)
      var c = 0L
      while (!d.finished()) c += d.deflate(buf)
      d.end()
      (bytes.length.toLong, c, Some(math.rint(c.toDouble / bytes.length * 10000) / 10000))
    }
    val expected = aug.collect().map(r => r.getLong(0) -> localRatio(r.getString(1))).toMap
    val got = graft.operators.Compressibility.compressionRatio(aug).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    assert(got.keySet == expected.keySet)
    got.foreach { case (id, v) => assert(v == expected(id), s"doc $id: $v != ${expected(id)}") }
    // The degenerate doc compresses far harder than the hash-numbers doc.
    assert(got(910001L)._3.get < 0.05, s"boilerplate ratio: ${got(910001L)._3}")
    assert(got(910003L)._3.get > got(910001L)._3.get * 5)
  }

  test("repetitionMetrics matches local brute force") {
    val texts = docs.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap ++
      // Ragged whitespace: leading/trailing/consecutive separators must
      // not mint empty tokens on any side (operator, this model, oracle).
      Map(900001L -> "  foo\tbar  foo\n baz  ", 900002L -> "\t one two three ")
    def r4(x: Double) = BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val expected = texts.map { case (id, t) =>
      val toks = t.toLowerCase.split("\\s+").toSeq.filter(_.nonEmpty)
      val n = toks.size.toLong
      val counts = toks.groupBy(identity).view.mapValues(_.size.toLong)
      val bgs = toks.sliding(2).filter(_.size == 2).map(_.mkString(" ")).toSeq
      val bn = bgs.size.toLong
      val bcounts = bgs.groupBy(identity).view.mapValues(_.size.toLong)
      id -> (n, r4((n - counts.size).toDouble / n), r4(counts.values.max.toDouble / n),
        bn, if (bn == 0) null else r4((bn - bcounts.size).toDouble / bn))
    }
    val augmented = {
      import spark.implicits._
      docs.select("doc_id", "text").unionByName(
        Seq(900001L -> "  foo\tbar  foo\n baz  ", 900002L -> "\t one two three ")
          .toDF("doc_id", "text"))
    }
    val got = graft.operators.Repetition.repetitionMetrics(augmented).collect().map { r =>
      r.getLong(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3),
        if (r.isNullAt(4)) 0L else r.getLong(4), if (r.isNullAt(5)) null else r.getDouble(5))
    }.toMap
    assert(got.keySet == expected.keySet)
    got.foreach { case (id, v) => assert(v == expected(id), s"doc $id: $v != ${expected(id)}") }
  }

  test("splitAssign is deterministic, exhaustive, and partitioning-invariant") {
    val splits = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    def assignments(df: org.apache.spark.sql.DataFrame) =
      graft.operators.Sampling.splitAssign(df, splits)
        .select("doc_id", "split").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
    val a = assignments(docs)
    val b = assignments(docs.repartition(17))
    assert(a == b, "assignment must not depend on partitioning")
    assert(a.keySet == docs.select("doc_id").collect().map(_.getLong(0)).toSet)
    val byCat = a.values.groupBy(identity).view.mapValues(_.size).toMap
    assert(byCat.keySet.subsetOf(Set("train", "val", "test")))
    // 500 docs: hash buckets land within a loose tolerance of the targets.
    assert(byCat("train") > 350 && byCat("train") < 450, s"train share off: $byCat")
    intercept[IllegalArgumentException](
      graft.operators.Sampling.splitAssign(docs, Seq("a" -> 0.5, "b" -> 0.4)))
  }

  test("shuffleShards is a partitioning-invariant permutation with dense in-shard positions") {
    def perm(df: org.apache.spark.sql.DataFrame) =
      graft.operators.Sampling.shuffleShards(df, numShards = 8)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val a = perm(docs)
    val b = perm(docs.repartition(17))
    assert(a.sorted.sameElements(b.sorted), "permutation must not depend on partitioning")
    // Every doc exactly once; positions dense 1..n per shard.
    assert(a.map(_._1).distinct.length == docs.count())
    a.groupBy(_._2).foreach { case (shard, rows) =>
      assert(rows.map(_._3).sorted.sameElements(1L to rows.length),
        s"shard $shard positions not dense")
    }
    // The order is a genuine shuffle, not id order: within some shard the
    // doc_id sequence along pos must not be monotonic.
    val scrambled = a.groupBy(_._2).values.exists { rows =>
      val ids = rows.sortBy(_._3).map(_._1)
      ids.zip(ids.tail).exists { case (x, y) => x > y }
    }
    assert(scrambled, "expected non-monotonic doc_id order within shards")
    intercept[IllegalArgumentException](
      graft.operators.Sampling.shuffleShards(docs, numShards = 0))
  }

  test("packSequences: pack ids follow the bucketed running token sum") {
    val packed = Packing.packSequences(docs, budgetTokens = 100, buckets = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(packed.length == docs.count())
    // Replicate the bucketed concat-then-chunk rule locally.
    packed.groupBy(_._3).foreach { case (bucket, rows) =>
      var runningTokens = 0L
      rows.sortBy(_._1).foreach { case (id, nTokens, b, packId) =>
        assert(b == id % 4, s"doc $id bucket")
        assert(packId == (b << 40) + runningTokens / 100,
          s"doc $id pack_id (start_tok=$runningTokens)")
        runningTokens += nTokens
      }
    }
    // Pack ids never decrease along a bucket and the corpus packs tightly:
    // total packs ≈ total tokens / budget (+ ≤1 open pack per bucket).
    val totalTokens = packed.map(_._2).sum
    val nPacks = packed.map(_._4).distinct.length
    assert(nPacks <= totalTokens / 100 + 4, s"$nPacks packs for $totalTokens tokens")
  }

  test("packGreedyBins: whole docs, capacity respected, FFD-tight, deterministic") {
    val budget = 120L
    val packed = Packing.packGreedyBins(docs, budgetTokens = budget, buckets = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(packed.length == docs.count(), "every doc packed exactly once")
    // Capacity: each pack's fill ≤ budget, and pack_fill is consistent
    // with the members' token sum.
    packed.groupBy(_._4).foreach { case (packId, members) =>
      val fill = members.map(_._2).sum
      assert(fill <= budget, s"pack $packId overfull: $fill")
      assert(members.forall(_._5 == fill), s"pack $packId fill column inconsistent")
    }
    // FFD replication in miniature: per bucket, the local FFD produces
    // the identical assignment.
    packed.groupBy(_._3).foreach { case (bucket, rows) =>
      val ordered = rows.sortBy(t => (-t._2, t._1))
      val fills = scala.collection.mutable.ArrayBuffer.empty[Long]
      val want = ordered.map { case (id, tok, _, _, _) =>
        var b = 0
        while (b < fills.length && fills(b) + tok > budget) b += 1
        if (b == fills.length) fills += 0L
        fills(b) += tok
        id -> ((bucket << 40) + b)
      }.toMap
      rows.foreach { case (id, _, _, packId, _) =>
        assert(packId == want(id), s"doc $id pack mismatch in bucket $bucket")
      }
    }
    // Waste bound: packs used stay within FFD's guarantee of the
    // per-bucket lower bound (+1 open pack per bucket slack).
    val totalTokens = packed.map(_._2).sum
    val nPacks = packed.map(_._4).distinct.length
    val lower = math.ceil(totalTokens.toDouble / budget)
    assert(nPacks <= math.ceil(11.0 / 9 * lower).toLong + 4 * 2,
      s"$nPacks packs vs lower bound $lower")
    // Deterministic under repartitioning.
    val again = Packing.packGreedyBins(docs.repartition(7), budgetTokens = budget, buckets = 4)
      .collect().map(r => (r.getLong(0), r.getLong(3))).sortBy(_._1).toSeq
    assert(again == packed.map(t => (t._1, t._4)).sortBy(_._1).toSeq)
    // Over-budget doc rejected with the chunking hint.
    val ex = intercept[IllegalArgumentException](
      Packing.packGreedyBins(docs, budgetTokens = 3))
    assert(ex.getMessage.contains("chunk"))
  }

  test("winnowFingerprints matches local selection over Spark-computed hashes") {
    import spark.implicits._
    val k = 5; val w = 4
    val texts = docs.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val winLocal = texts.toSeq.flatMap { case (id, t) =>
      val toks = t.toLowerCase.split("\\s+").toSeq
      if (toks.size < k) Seq.empty
      else toks.sliding(k).zipWithIndex.map { case (ws, i) => (id, i, ws.mkString(" ")) }.toSeq
    }
    // Hashes computed by Spark itself, so the local replica selects over
    // the operator's exact hash values.
    val hmap = winLocal.toDF("doc_id", "pos", "win")
      .withColumn("h", xxhash64(col("win")))
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(3)).toMap
    val want = texts.keys.flatMap { id =>
      val n = winLocal.count(_._1 == id)
      if (n >= 1 && n < w) {
        // Degenerate window: the whole (short) hash sequence selects once.
        val best = (0 until n).minBy(p => (hmap((id, p)), -p))
        Seq((id, hmap((id, best)), best.toLong))
      } else (0 to n - w).map { j =>
        val best = (j until j + w).minBy(p => (hmap((id, p)), -p))
        (id, hmap((id, best)), best.toLong)
      }
    }.toSet

    val got = Dedup.winnowFingerprints(docs, k = k, w = w)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == want,
      s"diff: got-only=${got.diff(want).take(5)} want-only=${want.diff(got).take(5)}")
    // Winnowing must actually compress: strictly fewer selections than windows.
    assert(got.size < winLocal.size && got.nonEmpty)
  }

  test("winnow: a shared run of w+k-1 tokens guarantees a shared fingerprint") {
    import spark.implicits._
    val shared = "q0 q1 q2 q3 q4 q5 q6 q7 q8 q9" // 10 tokens >= w+k-1 = 8
    val toy = Seq(
      (1L, s"a b c $shared z x c v b n m k l"),
      (2L, s"m n o p $shared v w x y z a s d")).toDF("doc_id", "text")
    val pairs = Dedup.winnow(toy, minShared = 1, k = 5, w = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.contains((1L, 2L)), s"guarantee violated: $pairs")
  }

  test("winnow: identical short docs (fewer than w hashes) still pair") {
    import spark.implicits._
    // 6 tokens → 2 k-gram hashes at k=5: no complete w=4 window exists,
    // so the degenerate whole-sequence window must select.
    val toy = Seq(
      (1L, "alpha beta gamma delta eps zeta"),
      (2L, "alpha beta gamma delta eps zeta"),
      (3L, "one two three four five six")).toDF("doc_id", "text")
    val fps = Dedup.winnowFingerprints(toy, k = 5, w = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(fps.map(_._1) == Set(1L, 2L, 3L), s"short docs must fingerprint: $fps")
    val pairs = Dedup.winnow(toy, minShared = 1, k = 5, w = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.toSeq == Seq((1L, 2L)), s"got $pairs")
  }

  test("duplicateSpans: closed-form cross-doc and self-repetition spans") {
    import spark.implicits._
    val toy = Seq(
      (1L, "a b c d e f g h"),            // shares "a b c d e" with doc 2
      (2L, "x x a b c d e y"),
      (3L, "p q r s t u p q r s t u"),    // self-repetition: pos 0,1 ~ 6,7
      (4L, "m n o")                       // too short for k=5, clean
    ).toDF("doc_id", "text")

    val spans = Dedup.duplicateSpans(toy, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(spans == Set(
      (1L, 0L, 5L, 1L),
      (2L, 2L, 5L, 1L),
      (3L, 0L, 6L, 2L),   // windows at pos 0,1 merge: tokens [0,5]
      (3L, 6L, 6L, 2L)),  // windows at pos 6,7 merge: tokens [6,11]
      s"got $spans")

    val summary = Dedup.duplicateSpanSummary(toy, k = 5)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(summary == Map(
      1L -> ((1L, 1L, 5L, 8L)),
      2L -> ((1L, 1L, 5L, 8L)),
      3L -> ((4L, 2L, 12L, 12L)),
      4L -> ((0L, 0L, 0L, 3L))),
      s"got $summary")
  }

  test("duplicateSpanSummary matches local brute force on the fixture corpus") {
    val k = 5
    val texts = docs.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val wins = texts.toSeq.flatMap { case (id, t) =>
      val toks = t.toLowerCase.split("\\s+").toSeq
      if (toks.size < k) Seq.empty
      else toks.sliding(k).zipWithIndex.map { case (w, i) => (id, i, w.mkString(" ")) }.toSeq
    }
    val counts = wins.groupBy(_._3).map { case (w, xs) => w -> xs.size }
    val hitPos = wins.filter(x => counts(x._3) >= 2).groupBy(_._1)
      .map { case (id, xs) => id -> xs.map(_._2).sorted }
    val truth = texts.map { case (id, t) =>
      val total = t.toLowerCase.split("\\s+").length.toLong
      val ps = hitPos.getOrElse(id, Seq.empty)
      val spans = ps.foldLeft(List.empty[(Int, Int)]) {
        case ((s, e) :: rest, p) if p - e < k => (s, p) :: rest
        case (acc, p)                         => (p, p) :: acc
      }
      val covered = spans.map { case (s, e) => e - s + k }.sum.toLong
      id -> ((ps.size.toLong, spans.size.toLong, covered, total))
    }

    val got = Dedup.duplicateSpanSummary(docs, k = k)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got == truth, {
      val diff = (got.keySet ++ truth.keySet).filter(id => got.get(id) != truth.get(id)).take(5)
      s"mismatch on ${diff.map(id => s"$id: got=${got.get(id)} want=${truth.get(id)}")}"
    })
    // The fixture corpus must actually exercise the operator.
    assert(got.values.exists(_._1 > 0L), "fixture has no duplicated spans — test is vacuous")
  }

  test("duplicateSpans: hashed window keys match string keys exactly") {
    val str = snap(Dedup.duplicateSpanSummary(docs, k = 5, hashWindows = false))
    val hsh = snap(Dedup.duplicateSpanSummary(docs, k = 5, hashWindows = true))
    assert(str == hsh)
  }

  test("duplicateSpansIncremental: shard output equals full run restricted to shard") {
    val corpus = docs.filter(col("doc_id") < 450)
    val shard = docs.filter(col("doc_id") >= 450)
    val full = snap(Dedup.duplicateSpans(docs, k = 5).filter(col("doc_id") >= 450))
    assert(full.nonEmpty, "shard has no duplicated spans — parity test is vacuous")
    for (hashed <- Seq(false, true)) {
      val idx = Dedup.substringIndex(corpus, k = 5, hashWindows = hashed)
      val incr = snap(Dedup.duplicateSpansIncremental(shard, idx, k = 5, hashWindows = hashed))
      assert(incr == full, s"hashed=$hashed parity broken")
    }
  }

  test("substringIndex: config survives parquet; mismatches fail fast with remedy") {
    val dir = "/tmp/graft_test_subidx"
    Dedup.substringIndex(docs.filter(col("doc_id") < 450), k = 5, hashWindows = true)
      .write.mode("overwrite").parquet(dir)
    val loaded = spark.read.parquet(dir)
    val shard = docs.filter(col("doc_id") >= 450)
    // Round-trip: results identical to the in-memory index.
    assert(snap(Dedup.duplicateSpansIncremental(shard, loaded, k = 5, hashWindows = true)) ==
      snap(Dedup.duplicateSpansIncremental(shard,
        Dedup.substringIndex(docs.filter(col("doc_id") < 450), k = 5, hashWindows = true),
        k = 5, hashWindows = true)))
    // Config mismatches are explicit errors, not wrong answers.
    val eK = intercept[IllegalArgumentException] {
      Dedup.duplicateSpansIncremental(shard, loaded, k = 7, hashWindows = true)
    }
    assert(eK.getMessage.contains("re-index"))
    val eMode = intercept[IllegalArgumentException] {
      Dedup.duplicateSpansIncremental(shard, loaded, k = 5, hashWindows = false)
    }
    assert(eMode.getMessage.contains("re-index"))
    val eFrame = intercept[IllegalArgumentException] {
      Dedup.duplicateSpansIncremental(shard, docs, k = 5)
    }
    assert(eFrame.getMessage.contains("substringIndex"))
  }

  test("removeDuplicateSpans: excises spans, preserves case/order, empties full dups") {
    import spark.implicits._
    val toy = Seq(
      (1L, "A B C d e f g h"),            // case-insensitive match on "a b c d e"
      (2L, "x x a b c d e y"),
      (3L, "p q r s t u p q r s t u"),    // fully covered → ""
      (4L, "m n o")                       // untouched
    ).toDF("doc_id", "text")
    val got = Dedup.removeDuplicateSpans(toy, k = 5)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "f g h", 2L -> "x x y", 3L -> "", 4L -> "m n o"), s"got $got")
  }

  test("removeDuplicateSpans: removed token mass equals summary coverage on the fixture") {
    val summary = Dedup.duplicateSpanSummary(docs, k = 5)
      .collect().map(r => r.getLong(0) -> ((r.getLong(3), r.getLong(4)))).toMap
    val cleaned = Dedup.removeDuplicateSpans(docs, k = 5)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val original = docs.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(cleaned.keySet == original.keySet)
    cleaned.foreach { case (id, t) =>
      val (covered, total) = summary(id)
      val kept = if (t.isEmpty) 0 else t.split(" ").length
      assert(kept == total - covered, s"doc $id kept $kept != ${total - covered}")
      if (covered == 0) assert(t == original(id), s"doc $id with no spans was altered")
    }
  }

  test("unigramLm: persisted LM scores identically to the one-shot fit") {
    import graft.operators.Vocabulary
    val oneShot = snap(Vocabulary.perplexity(docs, vocabSize = 10))
    val dir = "/tmp/graft_test_unilm"
    Vocabulary.unigramLm(docs, vocabSize = 10).write.mode("overwrite").parquet(dir)
    val served = snap(Vocabulary.perplexity(docs, spark.read.parquet(dir), "text", "doc_id"))
    assert(served == oneShot)
    // Cross-corpus serving: a shard never seen at fit time scores without error
    // and hits the OOV floor for unseen tokens.
    val lm = spark.read.parquet(dir)
    val shardScores = Vocabulary.perplexity(docs.filter(col("doc_id") >= 400), lm, "text", "doc_id")
    assert(shardScores.count() == docs.filter(col("doc_id") >= 400).count())
    val eFrame = intercept[IllegalArgumentException] {
      Vocabulary.perplexity(docs, docs, "text", "doc_id")
    }
    assert(eFrame.getMessage.contains("unigramLm"))
  }

  test("unigramCounts merge: shard ingest refits the LM without re-tokenizing") {
    import graft.operators.Vocabulary
    val corpus = docs.filter(col("doc_id") < 250)
    val shard = docs.filter(col("doc_id") >= 250)
    val dir = "/tmp/graft_test_ucounts"
    Vocabulary.unigramCounts(corpus).write.mode("overwrite").parquet(dir)
    val merged = Vocabulary.mergeCounts(
      spark.read.parquet(dir), Vocabulary.unigramCounts(shard))
    val lmIncr = Vocabulary.unigramLmFromCounts(merged, vocabSize = 10)
    // Scores under the merged-counts LM are bit-equal to a from-scratch
    // fit on the union — counts are the exact sufficient statistic.
    val full = snap(Vocabulary.perplexity(docs,
      Vocabulary.unigramLm(docs, vocabSize = 10), "text", "doc_id"))
    assert(snap(Vocabulary.perplexity(docs, lmIncr, "text", "doc_id")) == full)
    val bad = intercept[IllegalArgumentException] { Vocabulary.mergeCounts(docs, docs) }
    assert(bad.getMessage.contains("unigramCounts"))
  }

  test("perplexityBigram: stupid backoff matches local math; persisted LM identical") {
    import graft.operators.Vocabulary
    val vocabSize = 10
    val bigramSize = 50
    val texts = docs.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap

    val allToks = texts.toSeq.flatMap { case (id, t) =>
      t.toLowerCase.split("\\s+").toSeq.zipWithIndex.map { case (tok, i) => (id, i, tok) }
    }
    val c1 = allToks.groupBy(_._3).map { case (tok, xs) => tok -> xs.size.toLong }
    val tTotal = allToks.size.toDouble
    val vocab = c1.toSeq.sortBy { case (tok, c) => (-c, tok) }.take(vocabSize).toMap
    val v = vocab.size.toDouble
    def uniLp(tok: String): Double = vocab.get(tok) match {
      case Some(c) => math.log((c + 1) / (tTotal + v + 1))
      case None    => math.log(1.0 / (tTotal + v + 1))
    }
    val bigrams = texts.toSeq.flatMap { case (_, t) =>
      val toks = t.toLowerCase.split("\\s+").toSeq
      toks.zip(toks.drop(1))
    }
    val bigTop = bigrams.groupBy(identity).map { case (bg, xs) => bg -> xs.size.toLong }
      .toSeq.sortBy { case ((p, w), c) => (-c, p, w) }.take(bigramSize).toMap
    def lp(prev: Option[String], tok: String): Double = prev match {
      case None => uniLp(tok)
      case Some(p) => bigTop.get((p, tok)) match {
        case Some(c2) => math.log(c2.toDouble / c1(p))
        case None     => math.log(0.4) + uniLp(tok)
      }
    }
    val truth = texts.map { case (id, t) =>
      val toks = t.toLowerCase.split("\\s+").toSeq
      val lps = toks.zipWithIndex.map { case (tok, i) =>
        lp(if (i == 0) None else Some(toks(i - 1)), tok)
      }
      val nll = -lps.sum / lps.size
      id -> ((toks.size.toLong, nll, math.exp(nll)))
    }

    val got = Vocabulary.perplexityBigram(docs, vocabSize = vocabSize, bigramSize = bigramSize)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    assert(got.keySet == truth.keySet)
    got.foreach { case (id, (n, nll, ppl)) =>
      val (tn, tnll, tppl) = truth(id)
      assert(n == tn, s"doc $id token count $n != $tn")
      assert(math.abs(nll - tnll) < 1e-4 + 1e-9, s"doc $id nll $nll != $tnll")
      assert(math.abs(ppl - tppl) / tppl < 1e-4, s"doc $id ppl $ppl != $tppl")
    }
    // The fixture must exercise the backoff (pruned bigrams) at this size.
    assert(bigrams.distinct.size > bigramSize, "bigram table not pruned — backoff unexercised")

    // Persisted LM round-trip scores identically.
    val dir = "/tmp/graft_test_bilm"
    Vocabulary.bigramLm(docs, vocabSize = vocabSize, bigramSize = bigramSize)
      .write.mode("overwrite").parquet(dir)
    assert(snap(Vocabulary.perplexityBigram(docs, spark.read.parquet(dir), "text", "doc_id")) ==
      snap(Vocabulary.perplexityBigram(docs, vocabSize = vocabSize, bigramSize = bigramSize)))
  }

  test("topKNgrams: every occurrence counted, deterministic tiebreak") {
    import spark.implicits._
    import graft.operators.Vocabulary
    val toy = Seq((1L, "a b a b c"), (2L, "a b x")).toDF("doc_id", "text")
    // Bigrams: doc 1 → "a b","b a","a b","b c"; doc 2 → "a b","b x".
    val got = Vocabulary.topKNgrams(toy, n = 2, k = 3)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq(("a b", 3L, 2L), ("b a", 1L, 1L), ("b c", 1L, 1L)), s"got $got")
  }

  test("topKNgrams matches local brute force on the fixture corpus") {
    import graft.operators.Vocabulary
    val texts = docs.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val occ = texts.toSeq.flatMap { case (id, t) =>
      val toks = t.toLowerCase.split("\\s+").toSeq
      if (toks.size < 2) Seq.empty else toks.sliding(2).map(w => id -> w.mkString(" ")).toSeq
    }
    val truth = occ.groupBy(_._2).map { case (g, xs) =>
      (g, xs.size.toLong, xs.map(_._1).distinct.size.toLong)
    }.toSeq.sortBy { case (g, n, _) => (-n, g) }.take(50)

    val got = Vocabulary.topKNgrams(docs, n = 2, k = 50)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == truth, s"first diff: ${got.zip(truth).find(p => p._1 != p._2)}")
  }

  test("perplexity: corpus-fit unigram LM with OOV floor matches local math") {
    import graft.operators.Vocabulary
    val vocabSize = 10
    val texts = docs.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val allToks = texts.toSeq.flatMap { case (id, t) => t.toLowerCase.split("\\s+").toSeq.map(id -> _) }
    val counts = allToks.groupBy(_._2).map { case (tok, xs) => tok -> xs.size.toLong }
    val tTotal = allToks.size.toDouble
    val vocab = counts.toSeq.sortBy { case (tok, c) => (-c, tok) }.take(vocabSize).toMap
    val v = vocab.size.toDouble
    def logp(tok: String): Double = vocab.get(tok) match {
      case Some(c) => math.log((c + 1) / (tTotal + v + 1))
      case None    => math.log(1.0 / (tTotal + v + 1))
    }
    val truth = allToks.groupBy(_._1).map { case (id, xs) =>
      val nll = -xs.map(x => logp(x._2)).sum / xs.size
      id -> ((xs.size.toLong, nll, math.exp(nll)))
    }

    val got = Vocabulary.perplexity(docs, vocabSize = vocabSize)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    assert(got.keySet == truth.keySet)
    got.foreach { case (id, (n, nll, ppl)) =>
      val (tn, tnll, tppl) = truth(id)
      assert(n == tn, s"doc $id token count $n != $tn")
      assert(math.abs(nll - tnll) < 1e-4 + 1e-9, s"doc $id nll $nll != $tnll")
      assert(math.abs(ppl - tppl) / tppl < 1e-4, s"doc $id ppl $ppl != $tppl")
    }
    // The corpus must exercise the OOV floor at this vocab size.
    assert(counts.size > vocabSize, "fixture vocab too small — OOV path not exercised")
  }

  test("matchesBloom equals exact decontamination (bloom pre-pass is lossless)") {
    import graft.operators.Decontaminate
    val corpus = docs.filter(col("doc_id") >= 5)
    val probes = docs.filter(col("doc_id") < 5)
    val exact = snap(Decontaminate.matches(corpus, probes, shingleN = 3))
    assert(exact.nonEmpty, "fixture has no contamination — test is vacuous")
    assert(snap(Decontaminate.matchesBloom(corpus, probes, shingleN = 3,
      bloomBits = 1L << 14)) == exact)
    // A saturated 64-bit bloom degrades to pure verify — still exact.
    assert(snap(Decontaminate.matchesBloom(corpus, probes, shingleN = 3,
      bloomBits = 64L)) == exact)
  }

  test("temperatureSample: sqrt-smoothed quotas match local math; skew flattened") {
    import graft.operators.Sampling
    val rows = docs.select("doc_id", "lang").collect().map(r => (r.getLong(0), r.getString(1)))
    def shuffle(id: Long) = ((id % 1048576L) * 2654435761L) % 4294967296L
    val n = rows.groupBy(_._2).map { case (l, xs) => l -> xs.size }
    val totalN = 100L
    val z = n.values.map(v => math.sqrt(v.toDouble)).sum
    val q = n.map { case (l, c) =>
      l -> math.max(1L, math.floor(totalN * math.sqrt(c.toDouble) / z).toLong)
    }
    val want = rows.groupBy(_._2).toSeq.flatMap { case (l, xs) =>
      xs.map(_._1).sortBy(id => (shuffle(id), id)).take(q(l).toInt).zipWithIndex
        .map { case (id, i) => (id, l, i + 1L) }
    }.toSet

    val got = Sampling.temperatureSample(docs, totalN = totalN, alpha = 0.5)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(got == want, s"diff: got-only=${got.diff(want).take(5)} want-only=${want.diff(got).take(5)}")
    // Flattening: the dominant group's sample share sits below its corpus share.
    val (domLang, domN) = n.maxBy(_._2)
    assert(q(domLang).toDouble / got.size < domN.toDouble / rows.length,
      s"$domLang not flattened: quota ${q(domLang)} of ${got.size} vs $domN of ${rows.length}")
  }

  test("duplicateClusters: min-label connected components over pair graph") {
    import spark.implicits._
    // Chain 1-2-3 (transitive cluster), isolated pair 7-8, pair 5-9.
    val pairs = Seq((1L, 2L), (2L, 3L), (7L, 8L), (9L, 5L)).toDF("doc_a", "doc_b")
    val got = Dedup.duplicateClusters(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 7L -> 7L, 8L -> 7L, 5L -> 5L, 9L -> 5L),
      s"got $got")
  }

  test("sessionize: gap boundaries split sessions per subject") {
    import spark.implicits._
    import graft.operators.Sessionize
    val ev = Seq(
      (1L, "2024-01-01 10:00:00"), (1L, "2024-01-01 10:30:00"), // session 0
      (1L, "2024-01-01 12:00:00"),                              // gap >1h -> session 1
      (2L, "2024-01-01 09:00:00"))                              // own session 0
      .toDF("subject_id", "ts").withColumn("timestamp", to_timestamp(col("ts")))
    val got = Sessionize.sessions(ev, gapMicros = 3600000000L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(5))).toSet
    assert(got == Set((1L, 0L, 2L, 1800000000L), (1L, 1L, 1L, 0L), (2L, 0L, 1L, 0L)), s"got $got")
  }

  test("quotaSample: exact per-group quotas, deterministic, unknown groups dropped") {
    import graft.operators.Sampling
    val got = Sampling.quotaSample(docs, Map("en" -> 3L, "fr" -> 2L))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(got.count(_._2 == "en") == 3 && got.count(_._2 == "fr") == 2)
    assert(got.map(_._2).toSet == Set("en", "fr"), "unquoted groups dropped")
    assert(got.forall(_._3 >= 1L) && got.filter(_._2 == "en").map(_._3).sorted.toSeq == Seq(1L, 2L, 3L))
    // Deterministic: a second run picks the identical sample.
    val again = Sampling.quotaSample(docs, Map("en" -> 3L, "fr" -> 2L))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(got.sortBy(_._1).toSeq == again.sortBy(_._1).toSeq)
  }

  test("quotaSample: skewed giant group — pre-filter cuts the rank input, pick unchanged") {
    import spark.implicits._
    import graft.operators.Sampling
    // 90% of rows in one group (the 90%-English shape the pre-filter
    // exists for), small quotas — exactly the regime where the naive
    // single-partition rank dies at scale.
    val skewed = (0L until 50000L)
      .map(i => (i, if (i % 10 != 0) "en" else if (i % 20 == 0) "es" else "fr"))
      .toDF("doc_id", "lang")
    val quotas = Map("en" -> 40L, "es" -> 15L)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).sortBy(_._1).toSeq
    val fast = Sampling.quotaSample(skewed, quotas)
    // Equivalence proof in miniature: the pre-filtered pick is identical
    // to the exact single-step path (slack=MaxValue disables the filter).
    val exact = rows(Sampling.quotaSample(skewed, quotas, preFilterSlack = Double.MaxValue))
    assert(rows(fast) == exact, "pre-filtered pick must equal the exact single-step pick")
    assert(exact.count(_._2 == "en") == 40 && exact.count(_._2 == "es") == 15)
    // Plan shape: Catalyst folds the __r < thr pre-filter into the
    // broadcast group-count join's condition, which must execute BELOW
    // the rank window (top-down plan print → join line appears after
    // Window), so the rank sorts only the pre-filtered survivors.
    val plan = fast.queryExecution.executedPlan.toString
    val winAt = plan.indexOf("Window")
    val preAt = "__r#\\d+L? < least\\(".r.findFirstMatchIn(plan).map(_.start).getOrElse(-1)
    assert(winAt >= 0 && preAt > winAt,
      s"pre-filter must sit below the rank window (win@$winAt, filter@$preAt)")
    assert(plan.contains("BroadcastHashJoin"), "group counts must join by broadcast")
  }

  test("decontaminate flags exactly the documents sharing probe n-grams") {
    import spark.implicits._
    val corpus = Seq(
      (10L, "alpha beta gamma delta epsilon"), // shares 2 probe 3-grams
      (11L, "zeta eta theta iota"),            // clean
      (12L, "one two alpha beta gamma two")    // shares 1 (dedup'd per doc)
    ).toDF("doc_id", "text")
    val probes = Seq((0L, "alpha beta gamma delta")).toDF("doc_id", "text")
    val got = Decontaminate.matches(corpus, probes, shingleN = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // probe 3-grams: "alpha beta gamma", "beta gamma delta"
    assert(got == Map(10L -> 2L, 12L -> 1L), s"got $got")
  }

  test("new operators tolerate empty inputs (0 rows, schema intact, no throw)") {
    import spark.implicits._
    val noDocs = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val noPairs = Seq.empty[(Long, Long)].toDF("doc_a", "doc_b")
    val packed = Packing.packSequences(noDocs, budgetTokens = 128)
    assert(packed.count() == 0 &&
      packed.columns.toSeq == Seq("doc_id", "n_tokens", "bucket", "pack_id"))
    val decon = Decontaminate.matches(noDocs, noDocs)
    assert(decon.count() == 0 && decon.columns.toSeq == Seq("doc_id", "matched_ngrams"))
    val clusters = Dedup.duplicateClusters(noPairs)
    assert(clusters.count() == 0 && clusters.columns.toSeq == Seq("doc_id", "cluster_rep"))
  }

  test("hash-keyed exact dedup equals full-text exact dedup") {
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(rows(Dedup.exact(docs)) == rows(Dedup.exactByHash(docs)))
  }

  test("codegen'd cosine expression agrees with the interpreted formulation") {
    val pairs = emb.limit(50).select(col("vec_id").as("ia"), col("embedding").as("va"))
      .crossJoin(emb.limit(50).select(col("vec_id").as("ib"), col("embedding").as("vb")))
      .filter(col("ia") < col("ib"))
    val diffs = pairs.select(
      abs(Similarity.cosine(col("va"), col("vb")) -
        Similarity.cosineInterpreted(col("va"), col("vb"))).as("d"))
      .agg(max("d")).head().getDouble(0)
    // interpreted path rounds products through float; double-math expression differs only in low bits
    assert(diffs < 1e-6, s"max |codegen - interpreted| = $diffs")
  }

  test("embedding near-dup LSH is a high-recall subset of the exact pairs") {
    val t = 0.35
    val exact = Dedup.embeddingNearDupExact(emb, t)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty, "threshold yields no pairs — test data changed?")
    val lsh = Dedup.embeddingNearDup(emb, t, bands = 32, bitsPerBand = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // LSH candidates verified by exact cosine → subset; banding gives recall.
    assert(lsh.subsetOf(exact), "LSH produced a pair the exact path did not")
    val recall = lsh.intersect(exact).size.toDouble / exact.size
    assert(recall >= 0.8, s"embedding near-dup recall $recall unexpectedly low")
  }

  test("language-ID heuristic identifies stopword-bearing texts") {
    // NOTE: the corpus `lang` column is synthetic metadata unrelated to the
    // text (all rows are English-ish token soup), so accuracy against it is
    // meaningless — test on constructed texts instead.
    import spark.implicits._
    val samples = Seq(
      ("the cat sat on the mat and it is happy", "en"),
      ("el perro es grande y no se ve en la casa", "es"),
      ("le chat est dans la maison et il dort pour un moment", "fr"),
      ("der hund ist ein freund und das ist gut zu wissen", "de"),
      ("xyzzy qwerty plugh", "und"))
    val df = samples.map(_._1).toDF("text")
    val out = df.select(Texts.langId(col("text")).as("pred")).collect().map(_.getString(0)).toSeq
    assert(out == samples.map(_._2))
  }

  test("fingerprint is deterministic and separates distinct texts") {
    val fps = docs.select(col("doc_id"), Texts.fingerprint(col("text")).as("fp")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val fps2 = docs.select(col("doc_id"), Texts.fingerprint(col("text")).as("fp")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fps == fps2)
    val texts = docs.select("doc_id", "text").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // identical texts must collide
    texts.groupBy(_._2).values.filter(_.size > 1).foreach { grp =>
      assert(grp.keys.map(fps).toSet.size == 1)
    }
  }

  test("multimodal frame sampling: expression and codec-hook paths agree") {
    val media = Multimodal.asMedia(docs.limit(50), "doc_id", "text", "text")
    def snap50(df: org.apache.spark.sql.DataFrame) = df
      .select(col("media_id"), col("frame_idx"), xxhash64(col("frame_bytes")).as("h"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val expr = snap50(Multimodal.sampleFrames(media, frameBytes = 64, stride = 3))
    val hook = snap50(Multimodal.sampleFramesDecoded(media, frameBytes = 64, stride = 3))
    assert(expr.nonEmpty && expr == hook)
  }

  test("real decode: BMP dims + mean RGB and WAV duration + amplitude") {
    import spark.implicits._
    import java.nio.{ByteBuffer, ByteOrder}

    // 2x2 uncompressed 24-bit BMP, every pixel pure red (stored B,G,R;
    // rows padded to 4-byte multiples: 6 pixel bytes + 2 pad).
    val bmp = {
      val b = ByteBuffer.allocate(70).order(ByteOrder.LITTLE_ENDIAN)
      b.put('B'.toByte).put('M'.toByte).putInt(70).putInt(0).putInt(54)
      b.putInt(40).putInt(2).putInt(2).putShort(1).putShort(24)
      b.putInt(0).putInt(16).putInt(0).putInt(0).putInt(0).putInt(0)
      for (_ <- 0 until 2) {
        for (_ <- 0 until 2) b.put(0.toByte).put(0.toByte).put(255.toByte)
        b.put(0.toByte).put(0.toByte)
      }
      b.array()
    }
    // PCM WAV: mono, 16-bit, 1000 Hz, 4 samples -> 4 ms.
    val wav = {
      val b = ByteBuffer.allocate(52).order(ByteOrder.LITTLE_ENDIAN)
      b.put("RIFF".getBytes).putInt(44).put("WAVE".getBytes)
      b.put("fmt ".getBytes).putInt(16).putShort(1).putShort(1)
      b.putInt(1000).putInt(2000).putShort(2).putShort(16)
      b.put("data".getBytes).putInt(8)
      b.putShort(16384).putShort(-16384).putShort(32767).putShort(0)
      b.array()
    }
    val media = Seq((1L, bmp), (2L, wav), (3L, "plain text".getBytes("UTF-8")))
      .toDF("media_id", "payload")
    val got = Multimodal.decodeMedia(media).collect().map(r => r.getLong(0) -> r).toMap

    assert(got(1L).getString(1) == "bmp")
    assert(got(1L).getInt(2) == 2 && got(1L).getInt(3) == 2)
    val rgb = got(1L).getSeq[Double](5)
    assert(math.abs(rgb(0) - 1.0) < 1e-9 && rgb(1) == 0.0 && rgb(2) == 0.0, s"rgb $rgb")

    assert(got(2L).getString(1) == "wav")
    assert(got(2L).getLong(4) == 4L, "4 samples at 1 kHz = 4 ms")
    val amp = got(2L).getSeq[Double](5)
    assert(math.abs(amp(0) - (0.5 + 0.5 + 32767.0 / 32768 + 0.0) / 4) < 1e-9, s"meanAbs $amp")
    assert(math.abs(amp(1) - math.sqrt((0.25 + 0.25 + math.pow(32767.0 / 32768, 2)) / 4)) < 1e-9)

    assert(got(3L).getString(1) == "opaque" && got(3L).getSeq[Double](5).length == 8)
  }

  test("real decode: JPEG/PNG/GIF via javax.imageio (dims + mean RGB)") {
    import spark.implicits._

    // Hand-crafted 2x1 truecolor PNG — bytes assembled from the PNG spec
    // (zlib IDAT + CRC32 chunks), NOT ImageIO.write, so decode is tested
    // against an encoder-independent golden. Pixels: (255,0,0), (0,255,0)
    // → mean RGB (0.5, 0.5, 0.0).
    val png = {
      val out = new java.io.ByteArrayOutputStream()
      out.write(Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte))
      def chunk(typ: String, data: Array[Byte]): Unit = {
        val len = java.nio.ByteBuffer.allocate(4).putInt(data.length).array()
        out.write(len)
        val body = typ.getBytes("US-ASCII") ++ data
        out.write(body)
        val crc = new java.util.zip.CRC32(); crc.update(body)
        out.write(java.nio.ByteBuffer.allocate(4).putInt(crc.getValue.toInt).array())
      }
      val ihdr = java.nio.ByteBuffer.allocate(13)
        .putInt(2).putInt(1) // width=2 height=1
        .put(8.toByte).put(2.toByte) // bit depth 8, color type 2 (truecolor)
        .put(0.toByte).put(0.toByte).put(0.toByte) // deflate, filter 0, no interlace
        .array()
      chunk("IHDR", ihdr)
      val scanline = Array[Byte](0, 255.toByte, 0, 0, 0, 255.toByte, 0) // filter + RGB RGB
      val deflater = new java.util.zip.Deflater()
      deflater.setInput(scanline); deflater.finish()
      val comp = new Array[Byte](64)
      val n = deflater.deflate(comp)
      chunk("IDAT", comp.take(n))
      chunk("IEND", Array.empty[Byte])
      out.toByteArray
    }
    // JPEG and GIF: encode a solid-color 3x2 with ImageIO.write (round-trip);
    // GIF palette is lossless for solid colors, JPEG needs tolerance.
    def encoded(fmt: String, rgb: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(3, 2, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (x <- 0 until 3; y <- 0 until 2) img.setRGB(x, y, rgb)
      val out = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, fmt, out), s"JDK must encode $fmt")
      out.toByteArray
    }
    val jpeg = encoded("jpg", 0x4080c0)  // (64, 128, 192)
    val gif = encoded("gif", 0x0000ff)   // pure blue

    assert(Multimodal.imageFormat(png).contains("png"))
    assert(Multimodal.imageFormat(jpeg).contains("jpeg"))
    assert(Multimodal.imageFormat(gif).contains("gif"))

    val media = Seq((1L, png), (2L, jpeg), (3L, gif)).toDF("media_id", "payload")
    val got = Multimodal.decodeMedia(media).collect().map(r => r.getLong(0) -> r).toMap

    assert(got(1L).getString(1) == "png")
    assert(got(1L).getInt(2) == 2 && got(1L).getInt(3) == 1)
    val pngRgb = got(1L).getSeq[Double](5)
    assert(math.abs(pngRgb(0) - 0.5) < 1e-9 && math.abs(pngRgb(1) - 0.5) < 1e-9 && pngRgb(2) == 0.0,
      s"png mean rgb $pngRgb")

    assert(got(2L).getString(1) == "jpeg")
    assert(got(2L).getInt(2) == 3 && got(2L).getInt(3) == 2)
    val jRgb = got(2L).getSeq[Double](5)
    assert(math.abs(jRgb(0) - 64.0 / 255) < 0.02 && math.abs(jRgb(1) - 128.0 / 255) < 0.02 &&
      math.abs(jRgb(2) - 192.0 / 255) < 0.02, s"jpeg mean rgb $jRgb")

    assert(got(3L).getString(1) == "gif")
    assert(got(3L).getInt(2) == 3 && got(3L).getInt(3) == 2)
    val gRgb = got(3L).getSeq[Double](5)
    assert(gRgb(0) == 0.0 && gRgb(1) == 0.0 && math.abs(gRgb(2) - 1.0) < 1e-9, s"gif mean rgb $gRgb")

    // Truncated JPEG payload (valid magic, corrupt body) falls back to opaque.
    val corrupt = Seq((9L, jpeg.take(8))).toDF("media_id", "payload")
    assert(Multimodal.decodeMedia(corrupt).head().getString(1) == "opaque")
  }

  test("multimodal resizeMeta preserves aspect ratio") {
    import spark.implicits._
    val media = Seq((1L, "img", Array[Byte](1), ("raw", 4000, 1000, -1L)))
      .toDF("media_id", "modality", "payload", "meta")
      .select(col("media_id"), col("modality"), col("payload"),
        col("meta").cast("struct<codec:string,width:int,height:int,duration_ms:bigint>").as("meta"))
    val out = Multimodal.resizeMeta(media, maxDim = 1024).select("resize_meta.*").head()
    assert(out.getInt(0) == 1024 && out.getInt(1) == 256)
  }

  test("multimodal plumbing: features align with payload bytes") {
    val media = Multimodal.asMedia(docs, "doc_id", "text", "text")
    val feats = Multimodal.extractFeatures(media, batchSize = 64)
    val got = feats.select("media_id", "n_bytes").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expected = docs.select(col("doc_id"), length(col("text")).cast("long").as("n")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expected) // ASCII corpus: bytes == chars
    val f = feats.head()
    assert(f.getSeq[Double](f.fieldIndex("feature")).length == 8)
  }
}
