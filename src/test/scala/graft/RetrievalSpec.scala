package graft

import org.apache.spark.sql.functions._

import graft.functions.Bpe
import graft.operators.{Chunking, Retrieval}

/** Unit coverage for the chunking / BM25 / BPE additions (their sf0.01
  * catalog outputs are additionally oracle- or golden-checked).
  */
class RetrievalSpec extends SparkSpec {

  import spark.implicits._

  // ---------------------------------------------------------------- chunking

  test("chunk covers the text with the declared stride and overlap") {
    val docs = Seq((1L, "abcdefghij"), (2L, "abc"), (3L, "abcd")).toDF("doc_id", "text")
    val out = Chunking.chunk(docs, chunkChars = 4, overlapChars = 1)
      .orderBy("doc_id", "chunk_id")
      .select("doc_id", "chunk_id", "chunk_text", "chunk_chars")
      .as[(Long, Int, String, Long)].collect().toSeq
    // stride 3: len 10 → ⌈(10−1)/3⌉ = 3 chunks at offsets 0, 3, 6.
    assert(out == Seq(
      (1L, 0, "abcd", 4L), (1L, 1, "defg", 4L), (1L, 2, "ghij", 4L),
      (2L, 0, "abc", 3L),
      (3L, 0, "abcd", 4L)))
    // Reassembling chunk starts covers every character: last chunk end ≥ len.
    assert(out.filter(_._1 == 1L).map(t => t._2 * 3 + t._4).max >= 10)
  }

  test("chunk without overlap partitions the text exactly") {
    val docs = Seq((1L, "abcdefghij")).toDF("doc_id", "text")
    val out = Chunking.chunk(docs, chunkChars = 4)
      .orderBy("chunk_id").select("chunk_text").as[String].collect().toSeq
    assert(out == Seq("abcd", "efgh", "ij"))
    assert(out.mkString == "abcdefghij")
  }

  // ------------------------------------------------------------------- BM25

  test("bm25 ranks the unique-term document first and scores match hand formula") {
    val docs = Seq(
      (1L, "spark spark join"),
      (2L, "join merge sort"),
      (3L, "window window window")).toDF("doc_id", "text")
    val qs = Seq((10L, "spark")).toDF("query_id", "query_text")
    val out = Retrieval.bm25TopK(qs, docs, k = 3)
      .orderBy("rank").as[(Long, Long, Int, Double)].collect().toSeq
    // Only doc 1 contains "spark".
    assert(out.map(_._2) == Seq(1L))
    // Hand BM25: N=3, df=1 → idf = ln(1 + 2.5/1.5); tf=2, dl=3, avgdl=3.
    val idf = math.log(1.0 + 2.5 / 1.5)
    val expected = idf * (2 * 2.2 / (2 + 1.2 * (1.0 - 0.75 + 0.75 * 3.0 / 3.0)))
    assert(math.abs(out.head._4 - expected) < 5e-5)
  }

  test("bm25 favors rarer terms via idf") {
    // "rare" appears in 1 doc, "common" in all 4 — same tf, same dl.
    val docs = Seq(
      (1L, "rare common filler pad"),
      (2L, "common filler pad pad"),
      (3L, "common pad pad pad"),
      (4L, "common pad pad pad")).toDF("doc_id", "text")
    val qs = Seq((1L, "rare common")).toDF("query_id", "query_text")
    val top = Retrieval.bm25TopK(qs, docs, k = 1).select("doc_id").as[Long].head()
    assert(top == 1L)
  }

  test("bm25 index overload equals the one-shot path through parquet") {
    val docs = Seq(
      (1L, "spark join window"), (2L, "merge sort join"), (3L, "hash batch spark"))
      .toDF("doc_id", "text")
    val qs = Seq((1L, "spark join"), (2L, "sort")).toDF("query_id", "query_text")
    val dir = java.nio.file.Files.createTempDirectory("bm25idx").toString
    Retrieval.postings(docs).write.mode("overwrite").parquet(s"$dir/postings")
    val served = Retrieval.bm25TopK(
      qs, spark.read.parquet(s"$dir/postings"), k = 3, k1 = 1.2, b = 0.75)
    val oneShot = Retrieval.bm25TopK(qs, docs, k = 3)
    assert(snap(served) == snap(oneShot))
  }

  test("postings index is append-only incremental: shard union equals full rebuild") {
    val corpus = Seq((1L, "spark join window"), (2L, "merge sort join")).toDF("doc_id", "text")
    val shard = Seq((3L, "hash batch spark")).toDF("doc_id", "text")
    val appended = Retrieval.postings(corpus).unionByName(Retrieval.postings(shard))
    val rebuilt = Retrieval.postings(corpus.unionByName(shard))
    assert(snap(appended) == snap(rebuilt))
    // And querying the appended index equals querying the rebuild.
    val qs = Seq((1L, "spark")).toDF("query_id", "query_text")
    assert(snap(Retrieval.bm25TopK(qs, appended, 5, 1.2, 0.75)) ==
      snap(Retrieval.bm25TopK(qs, rebuilt, 5, 1.2, 0.75)))
  }

  test("standing term-bucketed index: append/serve/compact equal the one-shot run") {
    val b0 = Seq((1L, "spark join window"), (2L, "merge sort join")).toDF("doc_id", "text")
    val b1 = Seq((3L, "hash batch spark"), (4L, "")).toDF("doc_id", "text")
    val union = b0.unionByName(b1)
    val qs = Seq((1L, "spark join"), (2L, "sort"), (3L, "absentterm"))
      .toDF("query_id", "query_text")
    val dir = java.nio.file.Files.createTempDirectory("bm25srv").toString + "/idx"
    Retrieval.appendIndex(b0, dir, "0", buckets = 8)
    Retrieval.appendIndex(b1, dir, "1", buckets = 8)
    val want = snap(Retrieval.bm25TopK(qs, union, k = 3))
    assert(snap(Retrieval.bm25TopKIndexed(spark, qs, dir, k = 3)) == want,
      "indexed serve diverged from the one-shot run pre-compaction")
    Retrieval.compactIndex(spark, dir)
    val batches = new java.io.File(dir).listFiles().map(_.getName)
      .filter(_.startsWith("batch=")).toSeq
    assert(batches == Seq("batch=c1"), s"unexpected layout after fold: $batches")
    assert(snap(Retrieval.bm25TopKIndexed(spark, qs, dir, k = 3)) == want,
      "indexed serve diverged from the one-shot run post-compaction")
    // A third append lands beside the fold and serves seamlessly.
    Retrieval.appendIndex(Seq((5L, "window spark")).toDF("doc_id", "text"),
      dir, "2", buckets = 8)
    val union2 = union.unionByName(Seq((5L, "window spark")).toDF("doc_id", "text"))
    assert(snap(Retrieval.bm25TopKIndexed(spark, qs, dir, k = 3)) ==
      snap(Retrieval.bm25TopK(qs, union2, k = 3)),
      "post-fold append diverged from the one-shot run")
  }

  test("standing index refusals: bucket mismatch, bad label, crashed append") {
    val b0 = Seq((1L, "spark join")).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("bm25ref").toString + "/idx"
    Retrieval.appendIndex(b0, dir, "0", buckets = 8)
    val qs = Seq((1L, "spark")).toDF("query_id", "query_text")
    // Bucket-count drift would mis-route probes — refused by the manifest.
    val eB = intercept[IllegalArgumentException](
      Retrieval.appendIndex(b0.withColumn("doc_id", col("doc_id") + 10),
        dir, "1", buckets = 16))
    assert(eB.getMessage.contains("bucket"), eB.getMessage)
    // Labels must be numeric (they order the layout).
    val eL = intercept[IllegalArgumentException](
      Retrieval.appendIndex(b0, dir, "crawlA", buckets = 8))
    assert(eL.getMessage.contains("numeric"), eL.getMessage)
    // A postings slice without its stats twin (crash window) refuses
    // the serve with the repair named.
    val p = java.nio.file.Paths.get(s"$dir/_stats/batch=0")
    def rmrf(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rmrf)); f.delete(); ()
    }
    rmrf(p.toFile)
    val eS = intercept[IllegalArgumentException](
      Retrieval.bm25TopKIndexed(spark, qs, dir, k = 3))
    assert(eS.getMessage.contains("diverge"), eS.getMessage)
    // Re-appending the label repairs (writes are overwrites).
    Retrieval.appendIndex(b0, dir, "0", buckets = 8)
    assert(snap(Retrieval.bm25TopKIndexed(spark, qs, dir, k = 3)) ==
      snap(Retrieval.bm25TopK(qs, b0, k = 3)))
  }

  test("compactIndex rebuilds the stats manifest from postings (the universal repair)") {
    val b0 = Seq((1L, "spark join window"), (2L, "merge sort join")).toDF("doc_id", "text")
    val b1 = Seq((3L, "hash batch spark")).toDF("doc_id", "text")
    val union = b0.unionByName(b1)
    val qs = Seq((1L, "spark join"), (2L, "sort")).toDF("query_id", "query_text")
    val dir = java.nio.file.Files.createTempDirectory("bm25fix").toString + "/idx"
    Retrieval.appendIndex(b0, dir, "0", buckets = 8)
    Retrieval.appendIndex(b1, dir, "1", buckets = 8)
    def rmrf(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rmrf)); f.delete(); ()
    }
    // Crashed append: postings for batch 1 are complete, its stats row
    // never landed. Serving refuses; compactIndex rebuilds the manifest
    // FROM the postings, so totals come out correct, never stale.
    rmrf(new java.io.File(s"$dir/_stats/batch=1"))
    val e = intercept[IllegalArgumentException](
      Retrieval.bm25TopKIndexed(spark, qs, dir, k = 3))
    assert(e.getMessage.contains("diverge"), e.getMessage)
    Retrieval.compactIndex(spark, dir)
    assert(snap(Retrieval.bm25TopKIndexed(spark, qs, dir, k = 3)) ==
      snap(Retrieval.bm25TopK(qs, union, k = 3)),
      "rebuilt manifest diverged from ground truth")
    // A batch replayed from BEFORE the fold is refused — its rows are in
    // the c-fold already; landing beside it would double-count.
    val eReplay = intercept[IllegalArgumentException](
      Retrieval.appendIndex(b1, dir, "1", buckets = 8))
    assert(eReplay.getMessage.contains("folded"), eReplay.getMessage)
    // A slice whose write crashed mid-flight (no _SUCCESS) refuses
    // maintenance folds with the re-append remedy.
    Retrieval.appendIndex(
      Seq((9L, "window spark")).toDF("doc_id", "text"), dir, "2", buckets = 8)
    assert(new java.io.File(s"$dir/batch=2/_SUCCESS").delete())
    val ePartial = intercept[IllegalArgumentException](
      Retrieval.compactIndex(spark, dir))
    assert(ePartial.getMessage.contains("re-append"), ePartial.getMessage)
  }

  test("a crashed FIRST append (no stats manifest at all) is healable") {
    val b0 = Seq((1L, "spark join window"), (2L, "merge sort join")).toDF("doc_id", "text")
    val qs = Seq((1L, "spark join")).toDF("query_id", "query_text")
    def rmrf(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rmrf)); f.delete(); ()
    }
    // compactIndex must BOOTSTRAP the manifest, not throw on zero inputs.
    val dir = java.nio.file.Files.createTempDirectory("bm25boot").toString + "/idx"
    Retrieval.appendIndex(b0, dir, "0", buckets = 8)
    rmrf(new java.io.File(s"$dir/_stats"))
    intercept[IllegalArgumentException](
      Retrieval.bm25TopKIndexed(spark, qs, dir, k = 3))
    Retrieval.compactIndex(spark, dir)
    assert(snap(Retrieval.bm25TopKIndexed(spark, qs, dir, k = 3)) ==
      snap(Retrieval.bm25TopK(qs, b0, k = 3)))
    // purgeIndex on the same crash state must heal too, never wedge
    // (its postings fold commits first; the stats rebuild bootstraps).
    val dir2 = java.nio.file.Files.createTempDirectory("bm25boot2").toString + "/idx"
    Retrieval.appendIndex(b0, dir2, "0", buckets = 8)
    rmrf(new java.io.File(s"$dir2/_stats"))
    Retrieval.purgeIndex(spark, dir2, Seq(2L).toDF("id"))
    assert(snap(Retrieval.bm25TopKIndexed(spark, qs, dir2, k = 3)) ==
      snap(Retrieval.bm25TopK(qs, b0.filter(col("doc_id") =!= 2), k = 3)))
  }

  test("a torn _buckets manifest fails loudly and fsck reports it") {
    val b0 = Seq((1L, "spark join")).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("bm25torn").toString + "/idx"
    Retrieval.appendIndex(b0, dir, "0", buckets = 8)
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$dir/_buckets"), Array.emptyByteArray)
    val qs = Seq((1L, "spark")).toDF("query_id", "query_text")
    val e = intercept[IllegalArgumentException](
      Retrieval.bm25TopKIndexed(spark, qs, dir, k = 3))
    assert(e.getMessage.contains("unreadable"), e.getMessage)
    val findings = Retrieval.fsckIndex(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(findings.contains(("bad_buckets", "_buckets")), findings.toString)
  }

  test("standing index purge: postings leave, stats correct, scores re-rank") {
    val b0 = Seq((1L, "spark join window"), (2L, "merge sort join")).toDF("doc_id", "text")
    val b1 = Seq((3L, "hash batch spark"), (4L, "spark spark spark")).toDF("doc_id", "text")
    val qs = Seq((1L, "spark join"), (2L, "sort")).toDF("query_id", "query_text")
    val dir = java.nio.file.Files.createTempDirectory("bm25pg").toString + "/idx"
    // indexSink IS appendIndex keyed by batch id — drive it directly.
    val sink = Retrieval.indexSink(dir, buckets = 8)
    sink(b0, 0L); sink(b1, 1L)
    Retrieval.purgeIndex(spark, dir, Seq(2L, 4L).toDF("id"))
    // Serve equals a one-shot run over the KEPT docs — N/avgdl/df all
    // corrected, not just rows dropped.
    val kept = Seq((1L, "spark join window"), (3L, "hash batch spark"))
      .toDF("doc_id", "text")
    assert(snap(Retrieval.bm25TopKIndexed(spark, qs, dir, k = 3)) ==
      snap(Retrieval.bm25TopK(qs, kept, k = 3)),
      "purged serve diverged from the one-shot run over the kept corpus")
    // A receipt landed; a purge-to-empty is refused; ids must be integral.
    assert(new java.io.File(s"$dir/_purge").listFiles().nonEmpty,
      "no purge receipt written")
    val eAll = intercept[IllegalArgumentException](
      Retrieval.purgeIndex(spark, dir, Seq(1L, 3L).toDF("id")))
    assert(eAll.getMessage.contains("empty"), eAll.getMessage)
    val eStr = intercept[IllegalArgumentException](
      Retrieval.purgeIndex(spark, dir, Seq("1").toDF("id")))
    assert(eStr.getMessage.contains("integral"), eStr.getMessage)
    // Idempotent: re-running the same purge is a no-op rewrite.
    Retrieval.purgeIndex(spark, dir, Seq(2L, 4L).toDF("id"))
    assert(snap(Retrieval.bm25TopKIndexed(spark, qs, dir, k = 3)) ==
      snap(Retrieval.bm25TopK(qs, kept, k = 3)))
  }

  test("index stats drift gates an append-only shard sequence (healthy vs boilerplate flood)") {
    val docs = graft.sources.Tables
      .table(spark, "/root/testdata/sf0.001", "documents").select("doc_id", "text")
    val corpus = docs.filter(col("doc_id") < 30)
    val healthyShard = docs.filter(col("doc_id") >= 30)
    // Boilerplate flood: many short docs dominated by ONE term — the
    // failure mode the max_df_frac/avgdl signals exist to catch.
    val spamShard = spark.range(1000, 1400)
      .select(col("id").as("doc_id"), lit("click here now").as("text"))

    val base = Retrieval.indexStats(Retrieval.postings(corpus))
    val baseRow = base.head()
    assert(baseRow.getAs[Long]("n_docs") == 30L)
    // Exact cross-check of the one-row stats against direct aggregates.
    val post = Retrieval.postings(corpus)
    assert(baseRow.getAs[Long]("n_postings") == post.count())
    assert(baseRow.getAs[Long]("n_terms") ==
      post.select("term").distinct().count())

    def diffMap(shard: org.apache.spark.sql.DataFrame) = {
      val appended = Retrieval.postings(corpus).unionByName(Retrieval.postings(shard))
      Retrieval.indexStatsDiff(base, Retrieval.indexStats(appended))
        .collect().map(r => r.getString(0) ->
          (Option(r.get(3)).map(_.asInstanceOf[Double]))).toMap
    }

    // Healthy append: counts grow by the shard fraction, the per-doc
    // shape statistics stay near 1.0.
    val healthy = diffMap(healthyShard)
    assert(healthy("n_docs").get > 1.0)
    assert(math.abs(healthy("avgdl").get - 1.0) < 0.25)
    assert(math.abs(healthy("postings_per_doc").get - 1.0) < 0.25)
    assert(math.abs(healthy("max_df_frac").get - 1.0) < 0.35)

    // Boilerplate flood: avgdl collapses (3-token docs flood in) and the
    // vocabulary stagnates while the corpus balloons (n_terms flat at
    // 13× the docs) — two alerts fire. (max_df_frac moves little HERE
    // because this fixture corpus is already stopword-saturated at
    // df=27/30; it is the signal for unsaturated corpora.)
    val spam = diffMap(spamShard)
    assert(spam("avgdl").get < 0.5, s"avgdl ratio ${spam("avgdl")}")
    assert(spam("n_docs").get > 5.0)
    assert(spam("n_terms").get < 1.2, s"n_terms ratio ${spam("n_terms")}")
    assert(spam("postings_per_doc").get < 0.5)
  }

  test("rrf fusion composes with the ANN ladder as the dense side") {
    val emb = graft.sources.Tables.table(spark, "/root/testdata/sf0.001", "embeddings")
    val docs = graft.sources.Tables.table(spark, "/root/testdata/sf0.001", "documents")
    val qs = Seq((0L, "spark join"), (1L, "merge sort")).toDF("query_id", "query_text")
    val lex = Retrieval.bm25TopK(qs, docs, k = 20)
    def denseOf(df: org.apache.spark.sql.DataFrame) =
      df.select(col("query_id"), col("neighbor_id").as("doc_id"), col("rank"))
    val qVecs = emb.filter(col("vec_id") < 2)
    val exactHybrid = Retrieval.rrfFuse(
      lex, denseOf(graft.operators.Similarity.bruteForceTopK(qVecs, emb, 20)), k = 10)
    val annHybrid = Retrieval.rrfFuse(
      lex, denseOf(graft.operators.ProductQuant.ivfPqTopK(
        qVecs, emb, 20, 0, 0, 16, 32, 2, 0, "vec_id", "embedding")), k = 10)
    // The ANN-backed hybrid is the 100 TB shape; at fixture scale its
    // top-10 must agree heavily with the exact-dense hybrid (ANN recall
    // ≥0.9 on this fixture per RECALL.json).
    def tops(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val overlap = tops(annHybrid).intersect(tops(exactHybrid)).size.toDouble /
      tops(exactHybrid).size
    assert(overlap >= 0.8, s"ANN-hybrid overlap $overlap < 0.8")
  }

  // ----------------------------------------------------------------- TF-IDF

  test("tfidf keywords favor document-specific terms over ubiquitous ones") {
    val docs = Seq(
      (1L, "common rare common unique"),
      (2L, "common filler filler"),
      (3L, "common filler other")).toDF("doc_id", "text")
    val out = Retrieval.tfidfKeywords(docs, k = 2)
      .orderBy("doc_id", "rank")
      .as[(Long, String, Int, Double)].collect().toSeq
    // "common" appears in all 3 docs → idf ln(4/4)=0 → never a keyword
    // over terms with positive idf.
    val doc1 = out.filter(_._1 == 1L).map(_._2)
    assert(doc1.toSet == Set("rare", "unique"))
    // Hand check: df(rare)=1 → score = 1·ln(4/2) = 0.6931.
    assert(out.filter(t => t._1 == 1L && t._2 == "rare").head._4 == 0.6931)
    // doc 2: "filler" tf=2, df=2 → 2·ln(4/3) top; "common" scores 0.
    assert(out.filter(_._1 == 2L).head._2 == "filler")
  }

  // -------------------------------------------------------------------- RRF

  test("rrf fusion rewards presence in both lists and handles one-sided docs") {
    val lex = Seq((1L, 10L, 1), (1L, 11L, 2)).toDF("query_id", "doc_id", "rank")
    val dense = Seq((1L, 11L, 1), (1L, 12L, 2)).toDF("query_id", "doc_id", "rank")
    val out = Retrieval.rrfFuse(lex, dense, k = 5)
      .orderBy("rank").as[(Long, Long, Int, Double)].collect().toSeq
    // doc 11 is in both lists (ranks 2 and 1) → 1/62 + 1/61 beats either
    // single-list doc (1/61 or 1/62).
    assert(out.map(_._2) == Seq(11L, 10L, 12L))
    assert(math.abs(out.head._4 - (1.0 / 62 + 1.0 / 61)) < 1e-6)
    // One-sided docs carry only their own list's summand.
    assert(math.abs(out(1)._4 - 1.0 / 61) < 1e-6)
    assert(math.abs(out(2)._4 - 1.0 / 62) < 1e-6)
  }

  test("rrf equal scores break ties by doc_id") {
    val lex = Seq((1L, 20L, 1)).toDF("query_id", "doc_id", "rank")
    val dense = Seq((1L, 5L, 1)).toDF("query_id", "doc_id", "rank")
    val out = Retrieval.rrfFuse(lex, dense, k = 5)
      .orderBy("rank").select("doc_id").as[Long].collect().toSeq
    assert(out == Seq(5L, 20L))
  }

  // -------------------------------------------------------------------- BPE

  test("bpe learn merges most frequent pair first, lexicographic ties") {
    // "aaab"×3: pairs (a,a)×2·3=6, (a,b)×3 → first merge (a,a).
    val merges = Bpe.learnOnDict(Seq(("aaab", 3L), ("ab", 1L)), numMerges = 2)
    assert(merges.head.left == "a" && merges.head.right == "a")
    // After merging: "aaab" → [aa, a, b]; pairs (aa,a)×3, (a,b)×3+1=4 → (a,b).
    assert((merges(1).left, merges(1).right) == ("a", "b"))
  }

  test("bpe encode applies merges in rank order, all occurrences per pass") {
    val ranks = Map(("a", "a") -> 0, ("a", "b") -> 1, ("aa", "ab") -> 2)
    assert(Bpe.encodeWord("aaab", ranks).toSeq == Seq("aaab"))
    assert(Bpe.encodeWord("aaaa", ranks).toSeq == Seq("aa", "aa"))
    assert(Bpe.encodeWord("ab", ranks).toSeq == Seq("ab"))
    assert(Bpe.encodeWord("ba", ranks).toSeq == Seq("b", "a"))
  }

  test("bpe learn stops early when no pairs remain") {
    assert(Bpe.learnOnDict(Seq(("ab", 1L)), numMerges = 10).length == 1)
  }

  test("bpe tokenCounts: merged corpus words compress, unseen structure doesn't") {
    val docs = Seq(
      (1L, "lower lower lower newest"),
      (2L, "lowest newest newest"),
      (3L, "zz")).toDF("doc_id", "text")
    val merges = Bpe.learnMerges(docs, numMerges = 20, vocabLimit = 100)
    val out = Bpe.tokenCounts(docs, merges)
      .orderBy("doc_id").as[(Long, Long, Long)].collect().toSeq
    assert(out.map(_._2) == Seq(4L, 3L, 1L)) // word counts
    // 20 merges over a 4-word vocab fully merge every vocab word → one
    // token per word.
    assert(out(0)._3 == 4L)
    // "zz" never co-occurs enough to win merges before the loop ends only
    // if pair budget exhausted — with 20 merges the whole tiny vocab
    // merges; counts are ≥ 1 token per word regardless.
    assert(out.forall { case (_, w, t) => t >= w })
  }

  test("bpe merge table round-trips through parquet") {
    val docs = Seq((1L, "abc abc abd")).toDF("doc_id", "text")
    val merges = Bpe.learnMerges(docs, numMerges = 5, vocabLimit = 10)
    val dir = java.nio.file.Files.createTempDirectory("bpe").toString
    merges.write.mode("overwrite").parquet(dir)
    val reloaded = spark.read.parquet(dir)
    assert(snap(Bpe.tokenCounts(docs, reloaded)) == snap(Bpe.tokenCounts(docs, merges)))
  }

  test("byte-level bpe: alphabet is a printable bijection over all 256 bytes") {
    val m = Bpe.byteToChar
    assert(m.length == 256 && m.toSet.size == 256) // injective
    // Every mapped char is printable BMP (no controls, no space, no
    // surrogates) — safe as a parquet string symbol.
    assert(m.forall(c => !Character.isISOControl(c) && !Character.isWhitespace(c)
      && !Character.isSurrogate(c)))
    // Printable ASCII keeps its own codepoint (so ASCII corpora learn
    // identical tables in both modes).
    assert(('!' to '~').forall(c => m(c.toInt) == c))
  }

  test("byte-level bpe equals char-level on printable-ASCII corpora") {
    val docs = Seq(
      (1L, "lower lower lower newest"),
      (2L, "lowest newest newest")).toDF("doc_id", "text")
    val charM = Bpe.learnMerges(docs, numMerges = 10, vocabLimit = 100)
    val byteM = Bpe.learnMerges(docs, numMerges = 10, vocabLimit = 100, byteLevel = true)
    assert(snap(charM) == snap(byteM))
    assert(snap(Bpe.tokenCounts(docs, charM)) ==
      snap(Bpe.tokenCounts(docs, byteM, byteLevel = true)))
  }

  test("byte-level bpe: unsegmented CJK learns multi-byte units, zero OOV, round-trips") {
    // Unsegmented text: each doc is ONE whitespace "word" of 3-byte
    // hanzi (+ one emoji = 4 bytes, a surrogate pair in UTF-16).
    val docs = Seq(
      (1L, "数据表连接数据表"), (2L, "数据流连接数据流"),
      (3L, "数据数据数据"), (4L, "🙂数据🙂")).toDF("doc_id", "text")
    val merges = Bpe.learnMerges(docs, numMerges = 12, vocabLimit = 100, byteLevel = true)
    val out = Bpe.tokenCounts(docs, merges, byteLevel = true)
      .orderBy("doc_id").as[(Long, Long, Long)].collect().toSeq
    assert(out.map(_._2) == Seq(1L, 1L, 1L, 1L)) // one "word" each
    // 数据 appears 7×: with 12 merges its 6 bytes fuse into few tokens —
    // doc 3 (数据×3) must compress well below its 18 raw bytes.
    assert(out(2)._3 <= 6L, s"expected multi-byte merges, got ${out(2)._3} tokens")
    // The emoji doc tokenizes (no OOV): its 4 emoji bytes were never in
    // the merge dictionary yet still emit base byte symbols.
    assert(out(3)._3 >= 8L && out(3)._3 <= 14L)
    // Byte-symbol merge table survives parquet.
    val dir = java.nio.file.Files.createTempDirectory("bpeb").toString
    merges.write.mode("overwrite").parquet(dir)
    assert(snap(Bpe.tokenCounts(docs, spark.read.parquet(dir), byteLevel = true)) ==
      snap(Bpe.tokenCounts(docs, merges, byteLevel = true)))
  }

  // ---------------------------------------------------------------- Unigram

  test("unigram learn: chars always kept, vocab bounded, probs normalize, frequent word fuses") {
    import graft.functions.Unigram
    val docs = Seq(
      (1L, "hello hello hello hello world"),
      (2L, "hello hello world trees"),
      (3L, "hello seas trees")).toDF("doc_id", "text")
    val pieces = Unigram.learnPieces(docs, vocabSize = 24, maxPieceLen = 6, emIters = 3)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val chars = docs.collect().flatMap(_.getString(1).split("\\s+"))
      .flatMap(_.toCharArray).map(_.toString).toSet
    assert(chars.subsetOf(pieces.keySet), "single chars must never be pruned")
    assert(pieces.size <= 24)
    assert(math.abs(pieces.values.map(math.exp).sum - 1.0) < 1e-9)
    // "hello" dominates the corpus: the EM must give it (or a long
    // prefix) piece status, so Viterbi fuses it into ≤ 2 tokens.
    assert(Unigram.viterbiCount("hello", pieces, 6, -1e9) <= 2)
  }

  test("unigram viterbi: matches brute-force best segmentation; tie prefers longer piece; OOV floors") {
    import graft.functions.Unigram
    val lp = Map("ab" -> math.log(0.5), "a" -> math.log(0.25),
      "b" -> math.log(0.2), "c" -> math.log(0.05))
    // Brute force over all 2^(n-1) segmentations of "abcab".
    def allSegs(w: String): Seq[Seq[String]] =
      if (w.isEmpty) Seq(Seq.empty)
      else (1 to w.length).flatMap(i =>
        lp.get(w.take(i)).toSeq.flatMap(_ =>
          allSegs(w.drop(i)).map(w.take(i) +: _)))
    val best = allSegs("abcab").map(s => (s.map(lp).sum, s.length)).maxBy(_._1)
    assert(Unigram.viterbiCount("abcab", lp, 6, -1e9) == best._2)
    // Exact tie between [ab] and [a, b] if p(ab) = p(a)p(b): longer wins.
    val tie = Map("ab" -> math.log(0.25), "a" -> math.log(0.5), "b" -> math.log(0.5))
    assert(Unigram.viterbiCount("ab", tie, 6, -1e9) == 1)
    // OOV chars floor-segment one per char — totality on any input.
    assert(Unigram.viterbiCount("xy", lp, 6, -100.0) == 2)
    assert(Unigram.viterbiCount("axb", lp, 6, -100.0) == 3)
  }

  test("unigram viterbiPieces: concatenation restores the word; count parity; same tie rule") {
    import graft.functions.Unigram
    val lp = Map("ab" -> math.log(0.5), "a" -> math.log(0.25),
      "b" -> math.log(0.2), "c" -> math.log(0.05))
    val words = Seq("abcab", "ab", "a", "ccc", "xy", "axb", "")
    words.foreach { w =>
      val ps = Unigram.viterbiPieces(w, lp, 6, -100.0)
      assert(ps.mkString == w, s"pieces of '$w' must concatenate back")
      assert(ps.length == Unigram.viterbiCount(w, lp, 6, -100.0),
        s"piece decode of '$w' disagrees with the count DP")
    }
    // The exact-tie case: [ab] beats [a, b] (longer final piece).
    val tie = Map("ab" -> math.log(0.25), "a" -> math.log(0.5), "b" -> math.log(0.5))
    assert(Unigram.viterbiPieces("ab", tie, 6, -1e9).toSeq == Seq("ab"))
  }

  test("unigram on unsegmented CJK: multi-char pieces form; table round-trips; deterministic") {
    import graft.functions.Unigram
    val docs = Seq(
      (1L, "数据表连接数据表"), (2L, "数据流连接数据流"),
      (3L, "数据数据数据"), (4L, "数据连接")).toDF("doc_id", "text")
    val pieces = Unigram.learnPieces(docs, vocabSize = 16, maxPieceLen = 4, emIters = 3)
    val tab = pieces.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(tab.keys.exists(_.length > 1), "CJK corpus must learn multi-char pieces")
    val out = Unigram.tokenCounts(docs, pieces, maxPieceLen = 4)
      .orderBy("doc_id").as[(Long, Long, Long)].collect().toSeq
    assert(out.map(_._2) == Seq(1L, 1L, 1L, 1L)) // one "word" each
    // 数据 repeats 7×: doc 3 (数据×3) must fuse below its 6 raw chars.
    assert(out(2)._3 <= 3L, s"expected multi-char pieces, got ${out(2)._3} tokens")
    // Piece table survives parquet byte-for-byte in effect.
    val dir = java.nio.file.Files.createTempDirectory("unig").toString
    pieces.write.mode("overwrite").parquet(dir)
    assert(snap(Unigram.tokenCounts(docs, spark.read.parquet(dir), maxPieceLen = 4)) ==
      snap(Unigram.tokenCounts(docs, pieces, maxPieceLen = 4)))
    // Pure function of the corpus (golden-fixture precondition).
    assert(snap(Unigram.learnPieces(docs, vocabSize = 16, maxPieceLen = 4, emIters = 3))
      == snap(pieces))
  }
}
