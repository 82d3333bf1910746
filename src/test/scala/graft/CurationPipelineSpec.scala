package graft

import org.apache.spark.sql.functions._

import graft.config.CurationConfig
import graft.operators.CurationPipeline

class CurationPipelineSpec extends SparkSpec {

  import spark.implicits._

  private lazy val docs = graft.sources.Tables
    .table(spark, "/root/testdata/sf0.001", "documents")

  test("yaml parses every step form, bare names included") {
    val p = CurationConfig.fromYaml(
      """steps:
        |  - clean
        |  - redact: {}
        |  - langid_keep: { langs: [en] }
        |  - quality: { min_tokens: 3, max_punct_ratio: 0.5 }
        |  - dedup_exact
        |  - quota: { quotas: { en: 10 } }
        |  - split: { train: 0.9, test: 0.1 }
        |  - shuffle: { shards: 2 }
        |  - chunk: { chars: 100, overlap: 10 }
        |""".stripMargin)
    assert(p.steps.length == 9)
    assert(p.steps(5) == CurationConfig.Quota("lang", Map("en" -> 10L)))
    assert(p.steps(6) == CurationConfig.Split(Seq("test" -> 0.1, "train" -> 0.9)))
  }

  test("unknown steps and malformed parameters fail fast with the step named") {
    val bad = intercept[IllegalArgumentException](CurationConfig.fromYaml(
      "steps:\n  - frobnicate: {}\n"))
    assert(bad.getMessage.contains("frobnicate") && bad.getMessage.contains("#0"))
    val missing = intercept[IllegalArgumentException](CurationConfig.fromYaml(
      "steps:\n  - clean\n  - langid_keep: {}\n"))
    assert(missing.getMessage.contains("#1"))
    intercept[IllegalArgumentException](CurationConfig.fromYaml("nothing: here\n"))
  }

  test("each step composes: the pipeline output matches manual chaining") {
    val yaml =
      """steps:
        |  - clean
        |  - quality: { min_tokens: 10 }
        |  - dedup_exact
        |  - split: { train: 0.5, test: 0.5 }
        |""".stripMargin
    val got = CurationPipeline.fromYaml(docs, yaml)
    // Manual equivalent.
    val cleaned = docs.withColumn("text", graft.functions.Texts.cleanText(col("text")))
    val metrics = graft.functions.Texts.qualityMetrics(col("text")).toMap
    val filtered = cleaned.filter(metrics("n_tokens") >= 10)
    val keep = filtered.groupBy(xxhash64(col("text")), length(col("text")))
      .agg(min("doc_id").as("doc_id")).select("doc_id")
    val deduped = filtered.join(keep, Seq("doc_id"), "left_semi")
    val want = graft.operators.Sampling.splitAssign(
      deduped, Seq("test" -> 0.5, "train" -> 0.5))
    assert(snap(got) == snap(want))
    // Steps preserved the non-produced columns.
    assert(got.columns.toSet == Set("doc_id", "text", "lang", "source", "n_chars", "split"))
  }

  test("quota step keeps full rows and exact group counts") {
    val yaml =
      """steps:
        |  - quota: { group: lang, quotas: { en: 7, es: 3 } }
        |""".stripMargin
    val out = CurationPipeline.fromYaml(docs, yaml)
    val counts = out.groupBy("lang").count().as[(String, Long)].collect().toMap
    assert(counts == Map("en" -> 7L, "es" -> 3L))
    assert(out.columns.contains("text"))
  }

  test("funnel reports monotone survivor counts per step") {
    val p = CurationConfig.fromYaml(
      """steps:
        |  - clean
        |  - quality: { min_tokens: 10 }
        |  - dedup_exact
        |  - quota: { quotas: { en: 20 } }
        |""".stripMargin)
    val rows = CurationPipeline.funnel(docs, p)
      .orderBy("step_idx").as[(Int, String, Long)].collect().toSeq
    assert(rows.map(_._2) == Seq("input", "clean", "quality", "dedup_exact", "quota"))
    assert(rows.head._3 == docs.count())
    // Counts never grow through filters; quota ends at exactly 20.
    assert(rows.map(_._3).zip(rows.tail.map(_._3)).forall { case (a, b) => b <= a })
    assert(rows.last._3 == 20L)
  }

  test("chunk must be the final step") {
    val ex = intercept[IllegalArgumentException](CurationPipeline.fromYaml(docs,
      "steps:\n  - chunk: { chars: 100 }\n  - clean\n"))
    assert(ex.getMessage.contains("final step"))
  }

  test("decontaminate, perplexity, and dedup_minhash steps parse and compose") {
    val p = CurationConfig.fromYaml(
      """steps:
        |  - decontaminate: { probes: eval, ngram: 3, min_matches: 2 }
        |  - perplexity: { max_ppl: 500.0, vocab: 32 }
        |  - dedup_minhash: { threshold: 0.8, num_hashes: 32, bands: 8 }
        |""".stripMargin)
    assert(p.steps == Seq(
      CurationConfig.Decontam("eval", 3, 2L),
      CurationConfig.PerplexityKeep(500.0, 32),
      CurationConfig.DedupMinhash(0.8, 32, 8, 3)))
    // Missing required params fail fast.
    assert(intercept[IllegalArgumentException](CurationConfig.fromYaml(
      "steps:\n  - decontaminate: {}\n")).getMessage.contains("probes"))
    assert(intercept[IllegalArgumentException](CurationConfig.fromYaml(
      "steps:\n  - perplexity: {}\n")).getMessage.contains("max_ppl"))
    assert(intercept[IllegalArgumentException](CurationConfig.fromYaml(
      "steps:\n  - dedup_minhash: {}\n")).getMessage.contains("threshold"))
  }

  test("decontaminate step drops matching docs; missing aux frame is a clear error") {
    val probes = docs.filter(col("doc_id") < 5)
    val corpus = docs.filter(col("doc_id") >= 5)
    val yaml = "steps:\n  - decontaminate: { probes: eval }\n"
    val out = CurationPipeline.fromYaml(corpus, yaml, aux = Map("eval" -> probes))
    val hitIds = graft.operators.Decontaminate.matches(corpus, probes, 3)
      .select("doc_id").as[Long].collect().toSet
    val outIds = out.select("doc_id").as[Long].collect().toSet
    assert(hitIds.nonEmpty && outIds.intersect(hitIds).isEmpty)
    assert(outIds.size == corpus.count() - hitIds.size)
    val err = intercept[IllegalArgumentException](
      CurationPipeline.fromYaml(corpus, yaml).count())
    assert(err.getMessage.contains("eval"))
  }

  test("perplexity step keeps exactly the docs at or under the cut") {
    val yaml = "steps:\n  - perplexity: { max_ppl: 300, vocab: 20 }\n"
    val out = CurationPipeline.fromYaml(docs, yaml)
    val want = graft.operators.Vocabulary.perplexity(docs, vocabSize = 20)
      .filter(col("ppl") <= 300).select("doc_id").as[Long].collect().toSet
    val got = out.select("doc_id").as[Long].collect().toSet
    assert(got == want && got.nonEmpty && got.size < docs.count())
  }

  test("token_budget and perplexity_rank steps parse and equal operator composition") {
    val p = CurationConfig.fromYaml(
      """steps:
        |  - token_budget: { group: lang, budgets: { en: 2000, es: 800 } }
        |  - perplexity_rank: { keep_top_frac: 0.5, vocab: 20 }
        |""".stripMargin)
    assert(p.steps == Seq(
      CurationConfig.TokenBudget(Map("en" -> 2000L, "es" -> 800L), "lang"),
      CurationConfig.PerplexityRank(0.5, "lang", 20)))
    assert(intercept[IllegalArgumentException](CurationConfig.fromYaml(
      "steps:\n  - token_budget: {}\n")).getMessage.contains("budgets"))
    assert(intercept[IllegalArgumentException](CurationConfig.fromYaml(
      "steps:\n  - perplexity_rank: {}\n")).getMessage.contains("keep_top_frac"))

    val out = CurationPipeline.fromYaml(docs,
      "steps:\n  - token_budget: { budgets: { en: 2000, es: 800 } }\n")
    val sized = docs.withColumn("__nt",
      size(filter(split(lower(col("text")), " "), t => t =!= "")).cast("long"))
    val want = graft.operators.Sampling
      .tokenBudgetSample(sized, Map("en" -> 2000L, "es" -> 800L), "lang", "__nt")
      .select("doc_id").as[Long].collect().toSet
    assert(out.select("doc_id").as[Long].collect().toSet == want && want.nonEmpty)
    assert(out.columns.contains("text"), "step preserves input columns")

    val ranked = CurationPipeline.fromYaml(docs,
      "steps:\n  - perplexity_rank: { keep_top_frac: 0.5, vocab: 20 }\n")
    val counts = ranked.groupBy("lang").count().as[(String, Long)].collect().toMap
    val sizes = docs.groupBy("lang").count().as[(String, Long)].collect().toMap
    for ((g, n) <- sizes)
      assert(counts(g) == math.ceil(n * 0.5).toLong, s"group $g kept ${counts.get(g)} of $n")
  }

  test("dedup_minhash step equals operator composition and keeps cluster minima") {
    val yaml = "steps:\n  - dedup_minhash: { threshold: 0.7 }\n"
    val out = CurationPipeline.fromYaml(docs, yaml)
    val pairs = graft.operators.Dedup.minhashLsh(docs, 0.7)
    val drop = graft.operators.Dedup.duplicateClusters(pairs)
      .filter(col("doc_id") =!= col("cluster_rep"))
      .select("doc_id").as[Long].collect().toSet
    assert(drop.nonEmpty, "fixture must contain near-dups for this test to bite")
    val got = out.select("doc_id").as[Long].collect().toSet
    val all = docs.select("doc_id").as[Long].collect().toSet
    assert(got == all.diff(drop))
  }

  test("strip_html step extracts text: blocks dropped wholesale, tags stripped, entities decoded") {
    val html = Seq((1L,
      "<div>Hello <b>world</b><script>var x = \"<p>ignored</p>\";</script> &amp; &lt;ok&gt;&nbsp;done</div>"))
      .toDF("doc_id", "text")
    val got = CurationPipeline.fromYaml(html, "steps:\n  - strip_html\n")
      .head().getAs[String]("text")
    assert(got == "Hello world & <ok> done", s"got '$got'")
    // &amp; decodes LAST: double-encoded entities become their literal
    // entity text, never a second decode.
    val dbl = Seq((1L, "<p>&amp;lt;kept&amp;gt;</p>")).toDF("doc_id", "text")
    assert(CurationPipeline.fromYaml(dbl, "steps:\n  - strip_html\n")
      .head().getAs[String]("text") == "&lt;kept&gt;")
  }

  test("repetition step gates on the Gopher duplicate-line thresholds") {
    // Even docs repeat a line (dup frac 1/3 > 0.2); odd docs don't.
    val varied = docs.withColumn("text",
      when(pmod(col("doc_id"), lit(2)) === 0,
        concat_ws("\n", col("text"), lit("dup line dup line"), lit("dup line dup line")))
        .otherwise(concat_ws("\n", col("text"), lit("unique closing line"))))
    val got = CurationPipeline.fromYaml(varied,
      "steps:\n  - repetition: { max_dup_line_frac: 0.2 }\n")
    val want = varied.filter(graft.functions.Texts
      .dupLineMetrics(col("text")).toMap.apply("frac_dup_lines") <= 0.2)
    assert(snap(got) == snap(want))
    assert(got.count() > 0 && got.count() < varied.count())
  }

  test("temperature step equals operator composition") {
    val got = CurationPipeline.fromYaml(docs,
      "steps:\n  - temperature: { total: 40, alpha: 0.5 }\n")
    val keep = graft.operators.Sampling.temperatureSample(docs, totalN = 40, alpha = 0.5)
      .select("doc_id")
    val want = docs.join(keep, Seq("doc_id"), "left_semi")
    assert(snap(got) == snap(want))
    assert(got.count() > 0 && got.count() < docs.count())
    assert(got.columns.toSet == docs.columns.toSet)
  }

  test("blocklist step drops pages containing any phrase, case-insensitive") {
    val fixture = Seq(
      (1L, "clean page about spark joins"),
      (2L, "LOREM IPSUM placeholder page"),
      (3L, "code page function() { return }")).toDF("doc_id", "text")
    val got = CurationPipeline.fromYaml(fixture,
      "steps:\n  - blocklist: { phrases: [\"lorem ipsum\", \"{\"] }\n")
    assert(got.select("doc_id").collect().map(_.getLong(0)).toSeq == Seq(1L))
    val empty = intercept[IllegalArgumentException](CurationPipeline.fromYaml(fixture,
      "steps:\n  - blocklist: { phrases: [] }\n"))
    assert(empty.getMessage.contains("non-empty"))
  }

  test("c4_filter keeps terminal-punct lines with enough words; short pages drop") {
    val fixture = Seq(
      (1L, "one two three four five six.\nno punct line here at all\nSeven eight nine ten eleven!\nIs this a question or what?"),
      (2L, "one two three four five six.\nShort.\nSeven eight nine ten eleven!")) // 2 sentences -> page drops
      .toDF("doc_id", "text")
    val got = CurationPipeline.fromYaml(fixture,
      "steps:\n  - c4_filter: { min_words: 5, min_sentences: 3 }\n")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L ->
      "one two three four five six.\nSeven eight nine ten eleven!\nIs this a question or what?"),
      s"got $got")
  }

  test("dedup_soft + weighted_sample steps equal operator composition; missing weight is a clear error") {
    val got = CurationPipeline.fromYaml(docs,
      "steps:\n  - dedup_soft\n  - weighted_sample: { k: 25 }\n")
    val wts = graft.operators.Dedup.softDedupWeights(docs)
    val keep = graft.operators.Sampling.weightedSample(wts, k = 25).select("doc_id")
    val want = docs.join(wts, Seq("doc_id")).join(keep, Seq("doc_id"), "left_semi")
    assert(snap(got) == snap(want))
    assert(got.count() == 25)
    assert(got.columns.toSet == (docs.columns.toSet ++ Set("n_copies", "weight")))
    val noW = intercept[IllegalArgumentException](CurationPipeline.fromYaml(docs,
      "steps:\n  - weighted_sample: { k: 5 }\n"))
    assert(noW.getMessage.contains("dedup_soft"))
  }

  test("gopher step keeps exactly the gopherKeep survivors") {
    // Even ids double their text past the 50-word floor; odd ids stay
    // under it — the composed filter must discriminate, not pass-all.
    val varied = docs.withColumn("text",
      when(pmod(col("doc_id"), lit(2)) === 0, concat_ws(" ", col("text"), col("text")))
        .otherwise(col("text")))
    val got = CurationPipeline.fromYaml(varied, "steps:\n  - gopher\n")
    val want = varied.filter(graft.functions.Texts.gopherKeep(col("text")))
    assert(snap(got) == snap(want))
    assert(got.count() > 0 && got.count() < varied.count())
  }

  test("dedup_lines step equals operator composition and drops zero-line husks") {
    // A boilerplate header shared by every doc plus a doc whose whole
    // text is that header: the step must rewrite texts AND drop the husk.
    val lined = docs.withColumn("text",
      when(col("doc_id") === 7, lit("every doc carries this header"))
        .otherwise(concat(lit("every doc carries this header\n"), col("text"))))
    val got = CurationPipeline.fromYaml(lined,
      "steps:\n  - dedup_lines: { min_chars: 10 }\n")
    val want = {
      val rw = graft.operators.Dedup.dedupLines(lined, minLineChars = 10)
        .filter(col("n_kept") > 0).select("doc_id", "text")
      lined.drop("text").join(rw, Seq("doc_id"))
    }
    assert(snap(got) == snap(want))
    assert(got.columns.toSet == lined.columns.toSet)
    // The first doc by id keeps the header; everyone else lost it.
    val minId = lined.agg(min("doc_id")).head().getLong(0)
    assert(got.filter(col("doc_id") === minId).head().getAs[String]("text")
      .startsWith("every doc carries this header"))
    assert(got.filter(col("doc_id") =!= minId &&
      col("text").contains("every doc carries this header")).count() == 0)
    assert(got.filter(col("doc_id") === 7).count() == 0, "husk must be dropped")
  }

  test("url_dedup, substring_remove, and quality_model steps parse and equal operator composition") {
    // Every 3rd doc shares a url with doc_id−1: url groups of 1–2 docs.
    val withUrl = docs.withColumn("url",
      concat(lit("https://ex.com/p"), (col("doc_id") - col("doc_id") % 3).cast("string")))
    val model = graft.operators.QualityClassifier.train(
      docs.withColumn("is_en", (col("lang") === "en").cast("int")),
      labelCol = "is_en", dim = 128, iters = 4)
    val got = CurationPipeline.fromYaml(withUrl,
      """steps:
        |  - url_dedup: {}
        |  - substring_remove: { k: 5 }
        |  - quality_model: { model: m, min_score: 0.4 }
        |""".stripMargin,
      aux = Map("m" -> model))

    // Manual equivalent, step by step.
    val keepU = graft.operators.UrlCuration.dedupByUrl(withUrl)
      .select(col("keeper").as("doc_id"))
    val afterUrl = withUrl.join(keepU, Seq("doc_id"), "left_semi")
    val rewritten = graft.operators.Dedup.removeDuplicateSpans(afterUrl, k = 5)
    val afterSub = afterUrl.drop("text").join(rewritten, Seq("doc_id"))
    val keepQ = graft.operators.QualityClassifier.score(afterSub, model)
      .filter(col("quality") >= 0.4).select("doc_id")
    val want = afterSub.join(keepQ, Seq("doc_id"), "left_semi")

    assert(snap(got.select("doc_id", "text")) == snap(want.select("doc_id", "text")))
    // Columns survive the chain; the URL stage really deduped.
    assert(got.columns.toSet == withUrl.columns.toSet)
    assert(afterUrl.count() < withUrl.count())
    assert(got.count() == want.count())
  }

  test("normalize step unifies composed/decomposed variants before dedup") {
    val mixed = Seq(
      (1L, "café latte"), (2L, "café latte"), // NFC-equal pair
      (3L, "plain text")).toDF("doc_id", "text")
    // Raw exact dedup misses the pair; normalize-then-dedup collapses it.
    val raw = CurationPipeline.fromYaml(mixed, "steps:\n  - dedup_exact: {}\n")
    assert(raw.count() == 3)
    val normed = CurationPipeline.fromYaml(mixed,
      "steps:\n  - normalize: {}\n  - dedup_exact: {}\n")
    assert(normed.count() == 2)
    assert(normed.select("doc_id").collect().map(_.getLong(0)).toSet == Set(1L, 3L))
    // The surviving text is the composed form; nulls pass through.
    assert(normed.filter(col("doc_id") === 1L).head.getString(1) == "caf\u00e9 latte")
    val withNull = Seq((1L, null.asInstanceOf[String])).toDF("doc_id", "text")
    assert(withNull.select(graft.functions.Texts.normalizeNfc(col("text"))).head.isNullAt(0))
  }

  test("repetition, compress, and langid_trigram_keep steps parse and equal operator composition") {
    val got = CurationPipeline.fromYaml(docs,
      """steps:
        |  - repetition: { max_dup_token_frac: 0.8, max_top_bigram_frac: 0.2 }
        |  - compress: { min_ratio: 0.2, max_ratio: 0.95 }
        |  - langid_trigram_keep: { langs: [en, es] }
        |""".stripMargin)

    val m = graft.operators.Repetition.repetitionMetrics(docs)
    val keepR = m.filter(col("dup_token_frac") <= 0.8 &&
        (col("top_bigram_frac").isNull || col("top_bigram_frac") <= 0.2))
      .select("doc_id")
    val afterR = docs.join(keepR, Seq("doc_id"), "left_semi")
    val keepC = graft.operators.Compressibility.compressionRatio(afterR)
      .filter(col("compress_ratio").isNull ||
        (col("compress_ratio") >= 0.2 && col("compress_ratio") <= 0.95))
      .select("doc_id")
    val afterC = afterR.join(keepC, Seq("doc_id"), "left_semi")
    val keepL = graft.operators.LangIdTrigram.classifyAll(afterC)
      .filter(col("pred_lang").isin("en", "es")).select("doc_id")
    val want = afterC.join(keepL, Seq("doc_id"), "left_semi")

    assert(snap(got) == snap(want))
    // Each gate is live on this corpus (drops something, keeps something).
    assert(got.count() > 0 && got.count() < docs.count())
    // The langid gate really ran: survivors are en/es-classified.
    val langs = graft.operators.LangIdTrigram.classifyAll(got)
      .select("pred_lang").distinct().collect().map(_.getString(0)).toSet
    assert(langs.subsetOf(Set("en", "es")))
  }

  test("url_dedup after a text step is refused; model/url preconditions are clear errors") {
    val withUrl = docs.withColumn("url", concat(lit("https://ex.com/"), col("doc_id")))
    val late = intercept[IllegalArgumentException] {
      CurationPipeline.fromYaml(withUrl,
        "steps:\n  - clean: {}\n  - url_dedup: {}\n")
    }
    assert(late.getMessage.contains("url_dedup") && late.getMessage.contains("precede"))
    val noUrl = intercept[IllegalArgumentException] {
      CurationPipeline.fromYaml(docs, "steps:\n  - url_dedup: {}\n")
    }
    assert(noUrl.getMessage.contains("url"))
    val noModel = intercept[IllegalArgumentException] {
      CurationPipeline.fromYaml(docs,
        "steps:\n  - quality_model: { model: m, min_score: 0.5 }\n")
    }
    assert(noModel.getMessage.contains("'m'"))
  }

  test("shuffle positions are dense per shard after the full pipeline") {
    val yaml =
      """steps:
        |  - dedup_exact
        |  - shuffle: { shards: 4 }
        |""".stripMargin
    val out = CurationPipeline.fromYaml(docs, yaml)
      .select("doc_id", "shard", "pos").as[(Long, Long, Long)].collect()
    out.groupBy(_._2).foreach { case (_, rows) =>
      assert(rows.map(_._3).sorted.sameElements(1L to rows.length))
    }
  }

  test("sink step writes the partitioned release and must be terminal") {
    val dir = java.nio.file.Files.createTempDirectory("cursink").toString + "/rel"
    val yaml =
      s"""steps:
         |  - split: { train: 0.8, val: 0.1, test: 0.1 }
         |  - shuffle: { shards: 2 }
         |  - sink: { path: $dir, partition_by: [split, shard] }
         |""".stripMargin
    val out = CurationPipeline.fromYaml(docs, yaml)
    // The returned frame IS the read-back release: same rows as the
    // pre-sink chain, served from the Hive split/shard layout.
    val pre = CurationPipeline.fromYaml(docs,
      "steps:\n  - split: { train: 0.8, val: 0.1, test: 0.1 }\n  - shuffle: { shards: 2 }\n")
    assert(out.count() == pre.count())
    assert(snap(out.select(col("doc_id"), col("split"), col("shard").cast("long"))) ==
      snap(pre.select(col("doc_id"), col("split"), col("shard"))))
    val dirs = new java.io.File(dir).listFiles().map(_.getName).filter(_.startsWith("split="))
    assert(dirs.toSet == Set("split=train", "split=val", "split=test"))
    // Manifest beside the release (a subdir would pollute parquet
    // discovery): read-back-derived doc count + the partition spec.
    val mani = spark.read.parquet(s"${dir}_manifest").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(mani("kind") == "sink" && mani("n_docs") == out.count().toString &&
      mani("partition_by") == "split,shard")
    // Terminal rule: anything after sink is refused.
    val late = intercept[IllegalArgumentException](CurationPipeline.fromYaml(docs,
      s"steps:\n  - sink: {{ path: $dir }}\n  - clean\n"
        .replace("{{", "{").replace("}}", "}")))
    assert(late.getMessage.contains("final step"))
    // Missing partition column is a clear error.
    val noCol = intercept[IllegalArgumentException](CurationPipeline.fromYaml(docs,
      s"steps:\n  - sink: {{ path: $dir, partition_by: [nope] }}\n"
        .replace("{{", "{").replace("}}", "}")))
    assert(noCol.getMessage.contains("nope"))
    // upsample → sink is legal (only selection steps are refused after
    // upsample); upsample → quota stays refused.
    CurationPipeline.fromYaml(docs,
      s"""steps:
         |  - upsample: { factors: { en: 2.0 } }
         |  - shuffle: { shards: 2 }
         |  - sink: { path: $dir-up, partition_by: [shard] }
         |""".stripMargin).count()
    val bad = intercept[IllegalArgumentException](CurationPipeline.fromYaml(docs,
      "steps:\n  - upsample: { factors: { en: 2.0 } }\n  - quota: { quotas: { en: 5 } }\n"))
    assert(bad.getMessage.contains("upsample"))
  }

  test("dedup_simhash, dedup_semantic, sample_diverse, importance_sample steps equal operator composition") {
    import graft.operators.{Dedup, ImportanceSampling, Sampling, Similarity}
    val emb = graft.sources.Tables.table(spark, "/root/testdata/sf0.001", "embeddings")

    // dedup_simhash: survivors = all docs minus non-representative
    // cluster members, exactly the operator chain.
    val sim = CurationPipeline.fromYaml(docs,
      "steps:\n  - dedup_simhash: { max_hamming: 10 }\n")
    val simDrop = Dedup.duplicateClusters(Dedup.simhash(docs, 10))
      .filter(col("doc_id") =!= col("cluster_rep"))
    val wantSim = docs.join(simDrop.select("doc_id"), Seq("doc_id"), "left_anti")
    assert(snap(sim) == snap(wantSim))

    // dedup_semantic: drops exactly the keep=false ids of semDeDup run
    // on the live embeddings.
    val sem = CurationPipeline.fromYaml(docs,
      "steps:\n  - dedup_semantic: { embeddings: emb, threshold: 0.4, nlist: 8, nprobe: 2 }\n",
      aux = Map("emb" -> emb))
    val semDrop = Dedup.semDeDup(
      emb.join(docs.select(col("doc_id").as("vec_id")), Seq("vec_id"), "left_semi"),
      0.4, nlist = 8, nprobe = 2).filter(!col("keep"))
    val wantSem = docs.join(semDrop.select(col("vec_id").as("doc_id")),
      Seq("doc_id"), "left_anti")
    assert(snap(sem) == snap(wantSem))

    // sample_diverse: cluster-assign + per-cluster head, semi-joined.
    val div = CurationPipeline.fromYaml(docs,
      "steps:\n  - sample_diverse: { embeddings: emb, clusters: 8, per_cluster: 3 }\n",
      aux = Map("emb" -> emb))
    val keepDiv = Sampling.perGroupHead(
      Similarity.clusterAssign(
        emb.join(docs.select(col("doc_id").as("vec_id")), Seq("vec_id"), "left_semi"),
        nlist = 8), 3, "cluster", "vec_id")
    val wantDiv = docs.join(keepDiv.select(col("vec_id").as("doc_id")), Seq("doc_id"), "left_semi")
    assert(snap(div) == snap(wantDiv))
    assert(div.count() <= 8 * 3)

    // importance_sample: the DSIR pick, semi-joined.
    val imp = CurationPipeline.fromYaml(docs,
      "steps:\n  - importance_sample: { target: tgt, k: 12, vocab: 20 }\n",
      aux = Map("tgt" -> docs.filter(col("lang") === "en")))
    val keepImp = ImportanceSampling.importanceResample(
      docs, docs.filter(col("lang") === "en"), 12, 20)
    assert(snap(imp) ==
      snap(docs.join(keepImp.select("doc_id"), Seq("doc_id"), "left_semi")))
    // Missing aux tables are clear errors naming the table.
    val noEmb = intercept[IllegalArgumentException](CurationPipeline.fromYaml(docs,
      "steps:\n  - sample_diverse: { embeddings: nope, per_cluster: 3 }\n"))
    assert(noEmb.getMessage.contains("'nope'"))
    val noTgt = intercept[IllegalArgumentException](CurationPipeline.fromYaml(docs,
      "steps:\n  - importance_sample: { target: nope, k: 5 }\n"))
    assert(noTgt.getMessage.contains("'nope'"))
  }

  test("epoch-seeded shuffle varies the permutation, preserves the corpus, seed 0 is legacy") {
    import graft.operators.Sampling
    val s0 = Sampling.shuffleShards(docs, 4)
    val s0e = Sampling.shuffleShards(docs, 4, epochSeed = 0L)
    assert(snap(s0) == snap(s0e), "seed 0 must be the legacy permutation")
    val s1 = Sampling.shuffleShards(docs, 4, epochSeed = 1L)
    // Same corpus either epoch...
    assert(s1.select("doc_id").orderBy("doc_id").collect().toSeq ==
      s0.select("doc_id").orderBy("doc_id").collect().toSeq)
    // ...different global order (some doc changed shard or position).
    assert(snap(s1) != snap(s0), "epoch 1 replayed epoch 0's order")
    // YAML surface: parity with the operator at the same seed.
    val out = CurationPipeline.fromYaml(docs,
      "steps:\n  - shuffle: { shards: 4, seed: 7 }\n")
      .select("doc_id", "shard", "pos")
    val want = docs.join(
      Sampling.shuffleShards(docs, 4, epochSeed = 7L), Seq("doc_id"))
      .select("doc_id", "shard", "pos")
    assert(snap(out) == snap(want))
  }

  test("sink_tar releases decoded tar shards; misplaced or copy-keyed use is refused") {
    val path = java.nio.file.Files.createTempDirectory("ctar").toString + "/rel"
    val out = CurationPipeline.fromYaml(docs,
      s"steps:\n  - quality: { min_tokens: 5 }\n" +
        s"  - sink_tar: { path: $path, target_bytes: 4096 }\n")
    // The read-back frame IS the release as decoded: text and lang
    // round-trip byte-exactly for every surviving doc.
    val want = docs.filter(
      size(filter(split(lower(col("text")), " "), t => t =!= "")) >= 5)
      .select(col("doc_id"), col("text"), col("lang"))
    val got = out.select(col("doc_id"), col("text"), col("lang"))
    assert(snap(got) == snap(want), "decoded release drifted from the curated frame")
    // Shards exist on disk with the derived byte-budget count.
    val tars = new java.io.File(path).listFiles().map(_.getName).filter(_.endsWith(".tar"))
    assert(tars.length > 1, s"expected multiple 4 KiB-budget shards, got ${tars.length}")
    assert(out.select("shard").distinct().count() == tars.length)
    val mani = spark.read.parquet(s"$path/manifest").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(mani("kind") == "sink_tar" && mani("n_docs") == want.count().toString &&
      mani("n_shards") == tars.length.toString)
    // Not final → refused; after mix_unimax (copy-keyed) → refused.
    val mid = intercept[IllegalArgumentException](CurationPipeline.fromYaml(docs,
      s"steps:\n  - sink_tar: { path: $path }\n  - quality: { min_tokens: 5 }\n"))
    assert(mid.getMessage.contains("final step"))
    val copies = intercept[IllegalArgumentException](CurationPipeline.fromYaml(docs,
      s"steps:\n  - mix_unimax: { total_tokens: 9000, max_epochs: 2.0 }\n" +
        s"  - sink_tar: { path: $path }\n"))
    assert(copies.getMessage.contains("only 'shuffle'"))
    // Null payloads would decode as "" — refused loudly, not rewritten.
    val path2 = java.nio.file.Files.createTempDirectory("ctar2").toString + "/rel"
    val nulls = intercept[IllegalArgumentException](CurationPipeline.fromYaml(
      docs.withColumn("text", when(col("doc_id") % 7 === 0, col("text"))),
      s"steps:\n  - sink_tar: { path: $path2 }\n"))
    assert(nulls.getMessage.contains("null") && nulls.getMessage.contains("empty strings"))
  }

  test("sink_tokens releases pre-tokenized shards; read-back equals a pack against the persisted vocab") {
    import graft.operators.Packing
    val path = java.nio.file.Files.createTempDirectory("ctok").toString + "/rel"
    val out = CurationPipeline.fromYaml(docs,
      s"steps:\n  - quality: { min_tokens: 5 }\n" +
        s"  - sink_tokens: { path: $path, budget: 32, vocab: 100, buckets: 2, target_bytes: 2048 }\n")
    val vocab = spark.read.parquet(s"$path/vocab")
    assert(vocab.columns.toSeq == Seq("tok", "tok_id") && vocab.count() <= 100)
    val curated = docs.filter(
      size(filter(split(lower(col("text")), " "), t => t =!= "")) >= 5)
    val want = Packing.packTokenIds(curated, vocab, budgetTokens = 32, buckets = 2)
    assert(snap(out) == snap(want),
      "decoded token release drifted from packing against the persisted vocab")
    assert(new java.io.File(s"$path/shards").listFiles()
      .count(_.getName.endsWith(".tar")) > 1, "expected multiple 2 KiB-budget shards")
    // The loader-facing decode: every in-vocab id maps back to a token,
    // and the exploded length equals the released sequence lengths.
    val dec = graft.sources.TokenShards.decodeTokens(spark, path)
    assert(dec.filter(col("tok_id") =!= 0 && col("tok").isNull).count() == 0)
    assert(dec.count() == out.agg(sum(col("n"))).head().getLong(0))
    val mani = spark.read.parquet(s"$path/manifest").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(mani("kind") == "sink_tokens" &&
      mani("n_seqs") == out.count().toString &&
      mani("n_tokens") == out.agg(sum(col("n"))).head().getLong(0).toString &&
      mani("tokenizer") == "rank")
    // Release-QA fields: rank tokens ARE words (fertility exactly 1);
    // oov_rate must equal the recomputed share of curated tokens
    // outside the persisted vocab.
    assert(mani("tokens_per_word").toDouble == 1.0, mani("tokens_per_word"))
    assert(mani("tokens_per_kb").toDouble > 0.0)
    val curatedToks = curated.select(
      explode(filter(split(lower(col("text")), " "), t => t =!= "")).as("tok"))
    val nTok = curatedToks.count().toDouble
    val nOov = curatedToks.join(vocab, Seq("tok"), "left_anti").count().toDouble
    assert(mani("oov_rate").toDouble == math.rint(nOov / nTok * 1e4) / 1e4,
      s"oov_rate ${mani("oov_rate")} != recomputed ${nOov / nTok}")
    val mid = intercept[IllegalArgumentException](CurationPipeline.fromYaml(docs,
      s"steps:\n  - sink_tokens: { path: $path, budget: 32 }\n" +
        "  - quality: { min_tokens: 5 }\n"))
    assert(mid.getMessage.contains("final step"))
    // Programmatic construction bypasses the YAML parser's validation:
    // an unknown tokenizer must fail with the config path's named error,
    // not an anonymous MatchError.
    val unk = intercept[IllegalArgumentException](CurationPipeline.apply(docs,
      CurationConfig.Pipeline(Seq(CurationConfig.SinkTokens(
        path + "2", 32, 100, 2, 2048L, tokenizer = "sentencepiece")))))
    assert(unk.getMessage.contains("unknown tokenizer"))
  }

  test("sink_tokens tokenizer bpe/unigram: read-back equals a pack from the persisted model + vocab") {
    import graft.operators.Packing
    val curated = docs.filter(
      size(filter(split(lower(col("text")), " "), t => t =!= "")) >= 5)
    Seq("bpe" -> "tokenizer: bpe, merges: 24",
        "bpe_bytes" -> "tokenizer: bpe, merges: 24, byte_level: true",
        "unigram" -> "tokenizer: unigram, piece_len: 4").foreach { case (mode, yamlTok) =>
      val path = java.nio.file.Files.createTempDirectory(s"ctok_$mode").toString + "/rel"
      val out = CurationPipeline.fromYaml(docs,
        s"steps:\n  - quality: { min_tokens: 5 }\n" +
          s"  - sink_tokens: { path: $path, budget: 32, vocab: 60, buckets: 2,\n" +
          s"                   target_bytes: 2048, $yamlTok }\n")
      val model = spark.read.parquet(s"$path/tokenizer")
      val tok = mode match {
        case "bpe" =>
          assert(model.columns.toSeq == Seq("rank", "left", "right"))
          Packing.BpeTokenizer(model)
        case "bpe_bytes" =>
          // apply mode must match the learn mode the manifest records
          val mani = spark.read.parquet(s"$path/manifest").collect()
            .map(r => r.getString(0) -> r.getString(1)).toMap
          assert(mani("byte_level") == "true")
          Packing.BpeTokenizer(model, byteLevel = true)
        case _ =>
          assert(model.columns.toSeq == Seq("piece", "logp"))
          Packing.UnigramTokenizer(model, maxPieceLen = 4)
      }
      val stream = Packing.tokenStream(curated, tok)
      val want = Packing.packTokenIdsFrom(
        stream, spark.read.parquet(s"$path/vocab"), budgetTokens = 32, buckets = 2)
      assert(snap(out) == snap(want),
        s"$mode token release drifted from packing against the persisted model")
      // Subword ids rank the EMITTED pieces: every vocab entry is a
      // token the tokenizer produced, not a raw word.
      val vocabToks = spark.read.parquet(s"$path/vocab").select("tok")
      assert(vocabToks.except(stream.select("tok").distinct()).count() == 0)
    }
    val bad = intercept[IllegalArgumentException](CurationPipeline.fromYaml(docs,
      "steps:\n  - sink_tokens: { path: /tmp/x, budget: 32, tokenizer: sentencepiece }\n"))
    assert(bad.getMessage.contains("rank|bpe|unigram"))
    val badByte = intercept[IllegalArgumentException](CurationPipeline.fromYaml(docs,
      "steps:\n  - sink_tokens: { path: /tmp/x, budget: 32, tokenizer: unigram, byte_level: true }\n"))
    assert(badByte.getMessage.contains("byte_level"))
  }

  test("mix_unimax step applies the waterfilled plan as (id, copy) repeats") {
    import graft.operators.Sampling
    val out = CurationPipeline.fromYaml(docs,
      "steps:\n  - mix_unimax: { total_tokens: 9000, max_epochs: 2.0 }\n")
    val sized = docs.withColumn("__nt",
      size(filter(split(lower(col("text")), " "), t => t =!= "")).cast("long"))
    val want = Sampling.unimaxSample(sized, 9000L, 2.0, "lang", "__nt").drop("__nt")
    assert(snap(out) == snap(want), "mix_unimax drifted from the operator composition")
    // No document repeats past the epoch cap.
    val maxCopies = out.groupBy("doc_id").count().agg(max("count")).head().getLong(0)
    assert(maxCopies <= 2, s"doc repeated $maxCopies times past the 2-epoch cap")
    // Selection steps after mix_unimax are refused with the step named.
    val bad = intercept[IllegalArgumentException](CurationPipeline.fromYaml(docs,
      "steps:\n  - mix_unimax: { total_tokens: 9000, max_epochs: 2.0 }\n" +
        "  - quality: { min_tokens: 5 }\n"))
    assert(bad.getMessage.contains("mix_unimax") &&
      bad.getMessage.contains("only 'shuffle'"))
    // shuffle after it keys copies apart (the legal continuation).
    val sh = CurationPipeline.fromYaml(docs,
      "steps:\n  - mix_unimax: { total_tokens: 9000, max_epochs: 2.0 }\n" +
        "  - shuffle: { shards: 2 }\n")
    assert(sh.columns.contains("copy") && sh.columns.contains("shard"))
    assert(sh.count() == out.count())
  }

  test("decontaminate_embedding step drops exactly the ANN-flagged docs") {
    import graft.operators.Decontaminate
    val emb = graft.sources.Tables.table(spark, "/root/testdata/sf0.001", "embeddings")
    val probes = emb.filter(col("vec_id") < 10)
    val out = CurationPipeline.fromYaml(docs,
      "steps:\n  - decontaminate_embedding: { probes: p, embeddings: emb, threshold: 0.4 }\n",
      aux = Map("p" -> probes, "emb" -> emb))
    val live = emb.join(docs.select(col("doc_id").as("vec_id")), Seq("vec_id"), "left_semi")
    val hits = Decontaminate.matchesEmbedding(live, probes, threshold = 0.4)
      .select(col("doc_id"))
    val want = docs.join(hits, Seq("doc_id"), "left_anti")
    assert(snap(out) == snap(want))
    assert(out.count() < docs.count(), "self-probes must drop their corpus twins")
    // Missing aux tables fail with the table named.
    val noP = intercept[IllegalArgumentException](CurationPipeline.fromYaml(docs,
      "steps:\n  - decontaminate_embedding: { probes: nope, embeddings: emb, threshold: 0.4 }\n",
      aux = Map("emb" -> emb)))
    assert(noP.getMessage.contains("'nope'"))
  }

  test("embedding steps fail loudly on non-castable ids and on unembedded live docs") {
    val emb = graft.sources.Tables.table(spark, "/root/testdata/sf0.001", "embeddings")
    // Non-numeric string ids: the long cast nulls them, which would
    // silently empty the live embedding frame (dedup_semantic no-op,
    // sample_diverse drops everything) — the compiler names the problem.
    val strDocs = docs.withColumn("doc_id", concat(lit("doc-"), col("doc_id")))
    val badCast = intercept[IllegalArgumentException](CurationPipeline.fromYaml(strDocs,
      "steps:\n  - dedup_semantic: { embeddings: emb, threshold: 0.4 }\n",
      aux = Map("emb" -> emb)))
    assert(badCast.getMessage.contains("cast"), badCast.getMessage)
    // Partial coverage: live ids missing from the embedding table would
    // be kept by dedup_semantic but dropped by sample_diverse — the
    // compiler refuses instead of letting the two steps disagree.
    val partial = emb.filter(col("vec_id") % 2 === 0)
    val uncov = intercept[IllegalArgumentException](CurationPipeline.fromYaml(docs,
      "steps:\n  - sample_diverse: { embeddings: emb, clusters: 4, per_cluster: 2 }\n",
      aux = Map("emb" -> partial)))
    assert(uncov.getMessage.contains("no embedding"), uncov.getMessage)
    // Full coverage passes (the existing parity test's path).
    CurationPipeline.fromYaml(docs,
      "steps:\n  - sample_diverse: { embeddings: emb, clusters: 4, per_cluster: 2 }\n",
      aux = Map("emb" -> emb)).count()
  }

  // Shard-ingest fixture: urls with cross-shard refetches, a corpus-wide
  // shared boilerplate line, exact duplicates (ids 2000+) and near
  // duplicates (ids 1000+, one extra trailing token) of shard-0 docs —
  // every stateful step must do real cross-shard work.
  private def ingestCorpus = {
    val base = docs.select(col("doc_id"), col("lang"), col("text"))
    val near = base.filter(col("doc_id") % 5 === 0)
      .withColumn("doc_id", col("doc_id") + 1000L)
      .withColumn("text", concat(col("text"), lit(" extra trailing token")))
    // Exact duplicates must SURVIVE line dedup to reach dedup_exact:
    // short lines (< 10 non-space chars) are line-dedup-exempt, so a
    // shared short-line body duplicates at the whole-doc grain only.
    val exact = base.filter(col("doc_id") % 11 === 0)
      .withColumn("doc_id", col("doc_id") + 2000L)
      .withColumn("text", lit("tiny a\ntiny b"))
    base.unionByName(near).unionByName(exact)
      .withColumn("url",
        when(pmod(col("doc_id"), lit(10L)) === 5, lit("https://ex.com/refetch"))
          .otherwise(concat(lit("https://ex.com/p"), col("doc_id").cast("string"))))
      .withColumn("text",
        concat_ws("\n", lit("shared boilerplate header line padded"), col("text")))
  }

  private val ingestYaml =
    """steps:
      |  - url_dedup: {}
      |  - dedup_lines: { min_chars: 10 }
      |  - dedup_exact
      |  - dedup_minhash: { threshold: 0.5 }
      |""".stripMargin

  test("applyShard: two-shard ingest equals the batch pipeline over the union") {
    val corpus = graft.plans.Materialize(ingestCorpus)
    val state = java.nio.file.Files.createTempDirectory("cpincr").toString + "/state"
    val p = CurationConfig.fromYaml(ingestYaml)
    def key(df: org.apache.spark.sql.DataFrame) =
      snap(df.select("doc_id", "lang", "text", "url"))
    val s0 = CurationPipeline.applyShard(
      corpus.filter(col("doc_id") < 30), p, state, "0")
    val got0 = key(s0) // materialize shard 0 (state writes already ran eagerly)
    val s1 = CurationPipeline.applyShard(
      corpus.filter(col("doc_id") >= 30), p, state, "1")
    val got1 = key(s1) // materialize before any re-delivery overwrites state
    val batch = CurationPipeline.apply(corpus, p)
    // The parity CONTRACT: each shard's output equals the batch pipeline
    // over everything ingested up to and including it, restricted to the
    // shard's docs (near-dup steps never drop retroactively, so union
    // parity is not promised in general — for first-wins-only pipelines
    // it is, asserted below).
    assert(got0.sorted ==
      key(CurationPipeline.apply(corpus.filter(col("doc_id") < 30), p)).sorted,
      "shard 0 diverged from the batch prefix")
    assert(got1.sorted == key(batch.filter(col("doc_id") >= 30)).sorted,
      "shard 1 diverged from the batch run restricted to its docs")
    // For the first-wins families alone (url/lines/exact) the union of
    // shard outputs IS the batch run over the whole corpus.
    val p3 = CurationConfig.Pipeline(p.steps.take(3))
    val state3 = java.nio.file.Files.createTempDirectory("cpincr3").toString + "/s"
    val u0 = key(CurationPipeline.applyShard(
      corpus.filter(col("doc_id") < 30), p3, state3, "0"))
    val u1 = key(CurationPipeline.applyShard(
      corpus.filter(col("doc_id") >= 30), p3, state3, "1"))
    assert((u0 ++ u1).sorted == key(CurationPipeline.apply(corpus, p3)).sorted,
      "first-wins shard-ingest union diverged from the batch pipeline")
    // Every stateful step discriminated on this fixture.
    def after(i: Int) =
      CurationPipeline.apply(corpus, CurationConfig.Pipeline(p.steps.take(i + 1)))
    val (n0, n1, n2, n3, n4) = (corpus.count(), after(0).count(),
      after(1).count(), after(2).count(), after(3).count())
    assert(n1 < n0, s"url_dedup dropped nothing ($n0 -> $n1)")
    assert(after(1).filter(col("text").contains("shared boilerplate header")).count() == 1,
      "line dedup left the shared header in more than one doc")
    assert(n2 <= n1 && n3 < n2, s"dedup_exact dropped nothing ($n2 -> $n3)")
    assert(n4 < n3, s"dedup_minhash dropped nothing ($n3 -> $n4)")
    // Re-delivery of shard 1 (at-least-once) recomputes against the
    // identical prior view and leaves output AND state unchanged.
    val idxBefore = snap(spark.read.parquet(s"$state/step3=minhash_index"))
    val again = CurationPipeline.applyShard(
      corpus.filter(col("doc_id") >= 30), p, state, "1")
    assert(key(again) == got1, "re-delivered shard changed its output")
    assert(snap(spark.read.parquet(s"$state/step3=minhash_index")) == idxBefore)
    // Re-delivery of an EARLIER shard after later ones have ingested:
    // the prior view is restricted to strictly-earlier labels, so shard
    // 0 must NOT see shard 1's signatures and must reproduce its
    // original output exactly.
    val again0 = CurationPipeline.applyShard(
      corpus.filter(col("doc_id") < 30), p, state, "0")
    assert(key(again0) == got0,
      "re-delivered first shard saw later batches' state")
    // An edited pipeline against existing state fails loudly (state
    // subdirs are keyed by step position).
    val edited = CurationConfig.Pipeline(
      CurationConfig.Clean +: p.steps)
    val drift = intercept[IllegalArgumentException](
      CurationPipeline.applyShard(
        corpus.filter(col("doc_id") < 30), edited, state, "2"))
    assert(drift.getMessage.contains("pipeline differs"), drift.getMessage)
  }

  test("applyShard: LM fits once and serves later shards; sink writes shard= dirs; corpus-global steps refused") {
    val corpus = graft.plans.Materialize(ingestCorpus)
    val state = java.nio.file.Files.createTempDirectory("cpincr2").toString + "/state"
    val rel = java.nio.file.Files.createTempDirectory("cpincr2r").toString + "/release"
    val yaml =
      s"""steps:
         |  - dedup_exact
         |  - perplexity: { max_ppl: 40, vocab: 20 }
         |  - sink: { path: $rel }
         |""".stripMargin
    val shard0 = corpus.filter(col("doc_id") < 30)
    val shard1 = corpus.filter(col("doc_id") >= 30)
    CurationPipeline.fromYamlShard(shard0, yaml, state, "0").count()
    // The LM persisted at the perplexity step's state dir equals a fit
    // on shard 0 AS CURATED (post dedup_exact) — the CCNet fit scope.
    val curated0 = CurationPipeline.apply(shard0,
      CurationConfig.fromYaml("steps:\n  - dedup_exact\n"))
    assert(snap(spark.read.parquet(s"$state/step1=lm")) ==
      snap(graft.operators.Vocabulary.unigramLm(curated0, vocabSize = 20)),
      "persisted LM drifted from the first shard's curated fit")
    val out1 = CurationPipeline.fromYamlShard(shard1, yaml, state, "1")
    // Shard 1 is scored as SERVED (LM unchanged), not refit: its keeps
    // equal serving the shard-0 LM over shard 1 as curated.
    val curated1 = CurationPipeline.apply(shard1,
      CurationConfig.fromYaml("steps:\n  - dedup_exact\n"))
    val servedKeep = graft.operators.Vocabulary
      .perplexity(curated1, spark.read.parquet(s"$state/step1=lm"), "text", "doc_id")
      .filter(col("ppl") <= 40).select("doc_id")
    assert(snap(out1.select("doc_id")) == snap(servedKeep),
      "shard 1 was not scored against the served LM")
    // The release accumulates shard= dirs and reads as one corpus.
    assert(new java.io.File(rel).listFiles().map(_.getName).count(_.startsWith("shard=")) == 2)
    assert(spark.read.parquet(rel).count() ==
      CurationPipeline.fromYamlShard(shard1, yaml, state, "1").count() +
        spark.read.parquet(s"$rel/shard=0").count())
    // Corpus-global steps are refused loudly in shard mode (fresh state
    // dir — the pipeline fingerprint would otherwise fire first).
    val refused = intercept[IllegalArgumentException](
      CurationPipeline.fromYamlShard(shard0,
        "steps:\n  - quota: { quotas: { en: 10 } }\n",
        java.nio.file.Files.createTempDirectory("cpref").toString + "/s", "9"))
    assert(refused.getMessage.contains("shard-ingest"), refused.getMessage)
  }

  test("curationSink: batch-keyed release slices, re-delivery idempotent, sink steps refused") {
    val corpus = graft.plans.Materialize(ingestCorpus)
    val base = java.nio.file.Files.createTempDirectory("cpsink").toString
    val p = CurationConfig.fromYaml(ingestYaml)
    val sink = CurationPipeline.curationSink(p, s"$base/state", s"$base/release")
    val b0 = corpus.filter(col("doc_id") < 30)
    val b1 = corpus.filter(col("doc_id") >= 30)
    sink(b0, 0L); sink(b1, 1L)
    val standing = snap(spark.read.parquet(s"$base/release")
      .select("doc_id", "lang", "text", "url"))
    // The standing release equals the batch pipeline over everything
    // ingested (the applyShard parity, through the streaming sink).
    assert(standing.sorted ==
      snap(CurationPipeline.apply(corpus, p)
        .select("doc_id", "lang", "text", "url")).sorted)
    // Re-delivered batch (at-least-once) rewrites its own slice only.
    sink(b1, 1L)
    assert(snap(spark.read.parquet(s"$base/release")
      .select("doc_id", "lang", "text", "url")).sorted == standing.sorted)
    // A pipeline carrying its own sink step is refused up front.
    val refused = intercept[IllegalArgumentException](
      CurationPipeline.curationSink(
        CurationConfig.fromYaml(
          s"steps:\n  - dedup_exact\n  - sink: { path: $base/other }\n"),
        s"$base/state2", s"$base/release2"))
    assert(refused.getMessage.contains("terminal release write"), refused.getMessage)
  }

  test("finalizeRelease rewrites the standing release with the corpus-global mix") {
    val corpus = graft.plans.Materialize(ingestCorpus)
    val base = java.nio.file.Files.createTempDirectory("cpfin").toString
    val rel = s"$base/release"
    val yaml = s"steps:\n  - dedup_exact\n  - sink: { path: $rel }\n"
    CurationPipeline.fromYamlShard(
      corpus.filter(col("doc_id") < 30), yaml, s"$base/state", "0").count()
    CurationPipeline.fromYamlShard(
      corpus.filter(col("doc_id") >= 30), yaml, s"$base/state", "1").count()
    val finYaml =
      """steps:
        |  - quota: { group: lang, quotas: { en: 8, es: 6, fr: 4 } }
        |  - split: { train: 0.8, val: 0.1, test: 0.1 }
        |""".stripMargin
    CurationPipeline.finalizeReleaseYaml(spark, rel, finYaml)
    // The slices folded into ONE finalized dir, _SUCCESS preserved.
    val names = new java.io.File(rel).listFiles().map(_.getName)
      .filter(_.startsWith("shard=")).toSeq
    assert(names == Seq("shard=c1"), s"unexpected release layout: $names")
    assert(new java.io.File(s"$rel/shard=c1/_SUCCESS").exists(),
      "finalized dir lost its _SUCCESS marker")
    // The finalized release equals the batch mixing pipeline over the
    // union of the raw slices (dedup_exact is first-wins, so the slice
    // union equals the batch run over the whole corpus).
    val expected = CurationPipeline.apply(
      CurationPipeline.apply(corpus,
        CurationConfig.fromYaml("steps:\n  - dedup_exact\n")),
      CurationConfig.fromYaml(finYaml))
    assert(snap(spark.read.parquet(rel).select("doc_id", "lang", "split")).sorted ==
      snap(expected.select("doc_id", "lang", "split")).sorted,
      "finalized release diverged from the batch mixing pipeline")
    // A SINGLE already-folded slice still finalizes (the rewrite is the
    // point, not the fold): re-cutting the finalized corpus to a
    // tighter quota shrinks it in place.
    CurationPipeline.finalizeReleaseYaml(spark, rel,
      "steps:\n  - quota: { group: lang, quotas: { en: 2 } }\n")
    val recut = spark.read.parquet(rel)
    assert(recut.count() == 2 &&
      recut.select("lang").distinct().collect().map(_.getString(0)).toSeq == Seq("en"),
      "single-slice finalize did not rewrite the standing release")
    // Sink steps are refused — the finalize pass IS the release write.
    val refused = intercept[IllegalArgumentException](
      CurationPipeline.finalizeReleaseYaml(spark, rel,
        s"steps:\n  - sink: { path: $base/other }\n"))
    assert(refused.getMessage.contains("finalizeRelease"), refused.getMessage)
  }

  test("applyShard: simhash and substring_remove ingest against persisted state") {
    val corpus = graft.plans.Materialize(ingestCorpus)
    def key(df: org.apache.spark.sql.DataFrame) = snap(df.select("doc_id", "text"))
    val shard0 = corpus.filter(col("doc_id") < 30)
    val shard1 = corpus.filter(col("doc_id") >= 30)
    // Simhash: per-shard restricted parity, cross-shard near-dups
    // (the +1000 one-extra-token copies of shard-0 docs) must drop via
    // the persisted signature index alone.
    val pSim = CurationConfig.fromYaml(
      "steps:\n  - dedup_simhash: { max_hamming: 3 }\n")
    val st1 = java.nio.file.Files.createTempDirectory("cpsim").toString + "/s"
    val a = key(CurationPipeline.applyShard(shard0, pSim, st1, "0"))
    val b = key(CurationPipeline.applyShard(shard1, pSim, st1, "1"))
    assert(a.sorted == key(CurationPipeline.apply(shard0, pSim)).sorted)
    // Restricted parity IS the cross-shard assertion (copies 1000..1025
    // of shard-0 docs live in shard 1); the count check below only
    // confirms the step did real work on this fixture.
    assert(b.sorted ==
      key(CurationPipeline.apply(corpus, pSim).filter(col("doc_id") >= 30)).sorted,
      "simhash shard ingest diverged from the batch run restricted to the shard")
    assert(b.size < shard1.count(), "simhash dropped nothing on this fixture")
    // substring_remove: shard docs are REWRITTEN against the standing
    // window counts — near-dup copies share >= 5-token windows with
    // shard-0 originals, so their spans must be excised cross-shard.
    val pSub = CurationConfig.fromYaml(
      "steps:\n  - substring_remove: { k: 5 }\n")
    val st2 = java.nio.file.Files.createTempDirectory("cpsub").toString + "/s"
    val c = key(CurationPipeline.applyShard(shard0, pSub, st2, "0"))
    val d = key(CurationPipeline.applyShard(shard1, pSub, st2, "1"))
    assert(c.sorted == key(CurationPipeline.apply(shard0, pSub)).sorted)
    assert(d.sorted ==
      key(CurationPipeline.apply(corpus, pSub).filter(col("doc_id") >= 30)).sorted,
      "substring shard rewrite diverged from the batch transform restricted to the shard")
    // (Cross-shard behavior is covered by the restricted-parity assert
    // above; this only confirms the transform rewrote something.)
    val untouched = snap(shard1
      .withColumn("text", array_join(split(col("text"), "\\s+"), " "))
      .select("doc_id", "text"))
    assert(d.sorted != untouched.sorted,
      "no span was excised — the fixture should force some")
  }

  test("compactShardState folds state increments; ingest continues against the compacted dirs") {
    val corpus = graft.plans.Materialize(ingestCorpus)
    val p = CurationConfig.fromYaml(ingestYaml)
    def key(df: org.apache.spark.sql.DataFrame) =
      snap(df.select("doc_id", "lang", "text", "url"))
    val s1 = java.nio.file.Files.createTempDirectory("cpcomp1").toString + "/s"
    val s2 = java.nio.file.Files.createTempDirectory("cpcomp2").toString + "/s"
    val b0 = corpus.filter(col("doc_id") < 20)
    val b1 = corpus.filter(col("doc_id") >= 20 && col("doc_id") < 40)
    val b2 = corpus.filter(col("doc_id") >= 40)
    // Uncompacted reference run.
    Seq(b0 -> "0", b1 -> "1").foreach { case (b, l) =>
      CurationPipeline.applyShard(b, p, s1, l).count() }
    val want = key(CurationPipeline.applyShard(b2, p, s1, "2"))
    // Compacted run: fold after two shards, then ingest the third.
    Seq(b0 -> "0", b1 -> "1").foreach { case (b, l) =>
      CurationPipeline.applyShard(b, p, s2, l).count() }
    CurationPipeline.compactShardState(spark, s2)
    // Each stateful step's batches folded to one batch=c1 dir.
    val urlDirs = new java.io.File(s"$s2/step0=url_index").listFiles()
      .map(_.getName).filter(_.startsWith("batch=")).toSeq
    assert(urlDirs == Seq("batch=c1"), s"unexpected layout: $urlDirs")
    assert(key(CurationPipeline.applyShard(b2, p, s2, "2")) == want,
      "ingest against compacted state diverged from the uncompacted run")
    // A half-finished compaction (commit marker present) must refuse
    // ingest loudly — surviving batch dirs alone are NOT the state.
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$s2/step0=url_index", "_compact_commit"),
      "batch=c2\nbatch=c1\nbatch=2".getBytes("UTF-8"))
    val blocked = intercept[IllegalArgumentException](
      CurationPipeline.applyShard(corpus.filter(col("doc_id") >= 60), p, s2, "3")
        .count())
    assert(blocked.getMessage.contains("unfinished compaction"), blocked.getMessage)
    java.nio.file.Files.delete(
      java.nio.file.Paths.get(s"$s2/step0=url_index", "_compact_commit"))
    // Non-numeric shard labels are refused (they cannot order the
    // prior-state view and would collide with the c prefix).
    val badLabel = intercept[IllegalArgumentException](
      CurationPipeline.applyShard(b0, p, s2, "crawlA"))
    assert(badLabel.getMessage.contains("numeric"), badLabel.getMessage)
  }

  test("a pre-additive ngram_index state dir refuses ingest with a re-index message") {
    val corpus = graft.plans.Materialize(ingestCorpus)
    val p = CurationConfig.fromYaml(
      "steps:\n  - dedup_ngram: { threshold: 0.5 }\n")
    val st = java.nio.file.Files.createTempDirectory("cpngmig").toString + "/s"
    CurationPipeline.applyShard(
      corpus.filter(col("doc_id") < 30), p, st, "0").count()
    // Downgrade the persisted batch to the pre-additive (doc_id, s)
    // shape — the upgrade-in-place scenario the gate exists for.
    val idx = s"$st/step0=ngram_index"
    spark.read.parquet(s"$idx/batch=0").select("doc_id", "s")
      .write.parquet(s"$idx/_oldfmt_tmp")
    def rmrf(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rmrf)); f.delete(); ()
    }
    rmrf(new java.io.File(s"$idx/batch=0"))
    assert(new java.io.File(s"$idx/_oldfmt_tmp")
      .renameTo(new java.io.File(s"$idx/batch=0")))
    val e = intercept[IllegalArgumentException](
      CurationPipeline.applyShard(
        corpus.filter(col("doc_id") >= 30), p, st, "1").count())
    assert(e.getMessage.contains("pre-additive"), e.getMessage)
  }

  test("compactBatchDir resumes a compaction that crashed mid-commit without data loss") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("cpresume").toString + "/idx"
    Seq((1L, "a")).toDF("id", "v").write.parquet(s"$dir/batch=0")
    Seq((2L, "b")).toDF("id", "v").write.parquet(s"$dir/batch=1")
    Seq((3L, "c")).toDF("id", "v").write.parquet(s"$dir/batch=2")
    val all = snap(spark.read.parquet(dir).select("id", "v"))
    // Simulate the crash window: the tmp and commit marker are written,
    // batch=0 is already deleted — the tmp is the ONLY complete copy.
    spark.read.parquet(dir).write.parquet(s"$dir/_compact_tmp")
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "_compact_commit"),
      "batch=c2\nbatch=0\nbatch=1\nbatch=2".getBytes("UTF-8"))
    def rmrf(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rmrf)); f.delete(); ()
    }
    rmrf(new java.io.File(s"$dir/batch=0"))
    graft.operators.StateCompaction.compactBatchDir(spark, dir)
    val dirs = new java.io.File(dir).listFiles().map(_.getName)
      .filter(_.startsWith("batch=")).toSeq
    assert(dirs == Seq("batch=c2"), s"unexpected layout after resume: $dirs")
    assert(snap(spark.read.parquet(dir).select("id", "v")).sorted == all.sorted,
      "resumed compaction lost rows")
    assert(!new java.io.File(s"$dir/_compact_commit").exists())
    assert(!new java.io.File(s"$dir/_compact_tmp").exists())
    // Re-compaction where the TARGET name is itself a folded dir
    // ({batch=c2, batch=1} → target batch=c2 again): a crash after the
    // commit point must not let the resume destroy the published fold —
    // the stale same-name pre-fold dir is replaced, never the tmp's
    // contents lost.
    val dir2 = java.nio.file.Files.createTempDirectory("cpresume2").toString + "/idx"
    Seq((1L, "a"), (2L, "b")).toDF("id", "v").write.parquet(s"$dir2/batch=c2")
    Seq((3L, "c")).toDF("id", "v").write.parquet(s"$dir2/batch=1")
    val all2 = snap(spark.read.parquet(dir2).select("id", "v"))
    spark.read.parquet(dir2).select("id", "v").write.parquet(s"$dir2/_compact_tmp")
    java.nio.file.Files.write(java.nio.file.Paths.get(dir2, "_compact_commit"),
      "batch=c2\nbatch=c2\nbatch=1".getBytes("UTF-8"))
    rmrf(new java.io.File(s"$dir2/batch=1")) // crash mid-delete, stale c2 remains
    graft.operators.StateCompaction.compactBatchDir(spark, dir2)
    assert(new java.io.File(dir2).listFiles().map(_.getName)
      .filter(_.startsWith("batch=")).toSeq == Seq("batch=c2"))
    assert(snap(spark.read.parquet(dir2).select("id", "v")).sorted == all2.sorted,
      "same-name resume lost rows")
  }

  test("applyShard: dedup_phash ingests against the persisted signature index") {
    import spark.implicits._
    // dHash family fixture (families of 5 single-bit-flip variants);
    // the shard split at 22 cuts family 4 across shards, so its later
    // members must drop via the persisted index, never a re-decode.
    val frame = graft.harness.MediaFixtures.syntheticBitmaps(
        (0L until 40L).toDF("doc_id"))
      .select(col("media_id").as("doc_id"), col("payload"))
    val p = CurationConfig.fromYaml(
      "steps:\n  - dedup_phash: { max_hamming: 2 }\n")
    val state = java.nio.file.Files.createTempDirectory("cpph").toString + "/state"
    val a = snap(CurationPipeline.applyShard(
      frame.filter(col("doc_id") < 22), p, state, "0").select("doc_id"))
    val b = snap(CurationPipeline.applyShard(
      frame.filter(col("doc_id") >= 22), p, state, "1").select("doc_id"))
    assert((a ++ b).sorted ==
      snap(CurationPipeline.apply(frame, p).select("doc_id")).sorted,
      "shard-ingest phash dedup diverged from the batch step")
    // Keep set = each family's min id: 0, 5, …, 35.
    assert((a ++ b).sorted == (0L until 40L by 5).map(_.toString).sorted,
      s"unexpected keeps: ${(a ++ b).sorted}")
  }

  test("release-dir compaction folds tar and parquet slices without changing the read") {
    import graft.sources.WebDataset
    val base = java.nio.file.Files.createTempDirectory("relcomp").toString
    def dirNames(p: String) =
      Option(new java.io.File(p).listFiles).getOrElse(Array.empty)
        .filter(_.isDirectory).map(_.getName).sorted.toSeq

    // tar face: two accumulated batch slices -> one batch=c1 dir,
    // member-identical read-back, _SUCCESS contract preserved.
    val tarDir = s"$base/tar"
    val bin = docs.select(col("doc_id"), col("text").cast("binary").as("t"),
      col("lang").cast("binary").as("l"))
    WebDataset.writeTarAuto(bin.filter(col("doc_id") < 25),
      s"$tarDir/batch=0", 16384, "doc_id", Seq("txt" -> "t", "cls" -> "l"))
    WebDataset.writeTarAuto(bin.filter(col("doc_id") >= 25),
      s"$tarDir/batch=1", 16384, "doc_id", Seq("txt" -> "t", "cls" -> "l"))
    def members() = snap(
      WebDataset.scanTar(spark, tarDir, requireSuccess = true)
        .select(col("key"), col("ext"), xxhash64(col("payload")).as("h")))
    val before = members().sorted
    WebDataset.compactTarRelease(spark, tarDir, targetShardBytes = 16384)
    assert(dirNames(tarDir) == Seq("batch=c1"), dirNames(tarDir).toString)
    assert(members().sorted == before, "tar fold changed the member read")
    // a resumed ingest appends beside the folded dir; re-compaction
    // folds {c1, 2} into c2
    WebDataset.writeTarAuto(
      bin.filter(col("doc_id") < 5).withColumn("doc_id", col("doc_id") + 1000),
      s"$tarDir/batch=2", 16384, "doc_id", Seq("txt" -> "t", "cls" -> "l"))
    val grown = members().sorted
    WebDataset.compactTarRelease(spark, tarDir, targetShardBytes = 16384)
    assert(dirNames(tarDir) == Seq("batch=c2"), dirNames(tarDir).toString)
    assert(members().sorted == grown, "re-fold changed the member read")

    // an unfinished compaction (marker present) is refused by gated
    // readers — the survivors would silently miss the folded slices
    val marker = java.nio.file.Paths.get(tarDir, "_compact_commit")
    java.nio.file.Files.writeString(marker, "batch=c9\nbatch=c2")
    val blockedRead = intercept[IllegalArgumentException](
      WebDataset.scanTar(spark, tarDir, requireSuccess = true))
    assert(blockedRead.getMessage.contains("unfinished compaction"),
      blockedRead.getMessage)
    java.nio.file.Files.delete(marker)

    // slices with DIFFERING member sets refuse the fold — the pivot
    // would fabricate empty members, changing what a loader decodes
    WebDataset.writeTarAuto(
      bin.filter(col("doc_id") < 3).withColumn("doc_id", col("doc_id") + 2000)
        .select("doc_id", "t"),
      s"$tarDir/batch=3", 16384, "doc_id", Seq("txt" -> "t")) // no cls member
    val blockedFold = intercept[IllegalArgumentException](
      WebDataset.compactTarRelease(spark, tarDir, targetShardBytes = 16384))
    assert(blockedFold.getMessage.contains("missing one of"), blockedFold.getMessage)

    // parquet face: curationSink's shard=<id> slices -> one shard=c1.
    val pqDir = s"$base/pq"
    val rows = docs.select("doc_id", "lang", "text")
    rows.filter(col("doc_id") < 25).write.parquet(s"$pqDir/shard=0")
    rows.filter(col("doc_id") >= 25).write.parquet(s"$pqDir/shard=1")
    val pqBefore = snap(spark.read.parquet(pqDir)
      .select("doc_id", "lang", "text")).sorted
    CurationPipeline.compactRelease(spark, pqDir)
    assert(dirNames(pqDir) == Seq("shard=c1"), dirNames(pqDir).toString)
    val pqAfter = snap(spark.read.parquet(pqDir)
      .select("doc_id", "lang", "text")).sorted
    assert(pqAfter == pqBefore, "parquet fold changed the release read")
  }

  test("terminal sink_tar/sink_tokens shard mode: fit-once, accumulated read, idempotent re-delivery") {
    import graft.sources.{TokenShards, WebDataset}
    val d = graft.plans.Materialize(docs.select("doc_id", "lang", "text"))
    val base = java.nio.file.Files.createTempDirectory("shardsink").toString

    // sink_tar: two shards accumulate batch=0/batch=1 slices; the
    // standing release reads as one corpus whose keys equal the batch
    // pipeline's keep set (first-wins parity), and re-delivering a
    // shard leaves the read byte-identical.
    val tarRel = s"$base/tar"
    val pTar = CurationConfig.fromYaml(
      s"steps:\n  - dedup_exact: {}\n  - sink_tar: { path: $tarRel, target_bytes: 16384 }\n")
    CurationPipeline.applyShard(d.filter(col("doc_id") < 25), pTar, s"$base/st1", "0")
    CurationPipeline.applyShard(d.filter(col("doc_id") >= 25), pTar, s"$base/st1", "1")
    def tarRead() = snap(WebDataset.samples(
      WebDataset.scanTar(spark, tarRel, requireSuccess = true), Seq("txt", "cls"))
      .select(col("key"), xxhash64(col("txt")).as("h"), xxhash64(col("cls")).as("c")))
    val t1 = tarRead()
    val keepBatch = snap(CurationPipeline.apply(d,
      CurationConfig.fromYaml("steps:\n  - dedup_exact: {}\n")).select("doc_id"))
    assert(t1.map(_.split("\\|")(0)).sorted == keepBatch.sorted,
      "accumulated tar keys diverged from the batch keep set")
    CurationPipeline.applyShard(d.filter(col("doc_id") >= 25), pTar, s"$base/st1", "1")
    assert(tarRead() == t1, "re-delivered shard changed the tar read")

    // sink_tokens (bpe): the tokenizer model AND vocab fit ONCE on
    // shard 0's curated frame (the vocab _SUCCESS is the marker) and
    // serve shard 1 unchanged; the accumulated shards/ layout decodes,
    // and re-delivery leaves it identical.
    val tokRel = s"$base/tok"
    val pTok = CurationConfig.fromYaml(
      s"""steps:
         |  - dedup_exact: {}
         |  - sink_tokens: { path: $tokRel, budget: 64, vocab: 200, buckets: 4,
         |                   target_bytes: 16384, tokenizer: bpe, merges: 30 }
         |""".stripMargin)
    CurationPipeline.applyShard(d.filter(col("doc_id") < 25), pTok, s"$base/st2", "0")
    def fp(p: String) = snap(spark.read.parquet(p))
    val vocab0 = fp(s"$tokRel/vocab"); val model0 = fp(s"$tokRel/tokenizer")
    CurationPipeline.applyShard(d.filter(col("doc_id") >= 25), pTok, s"$base/st2", "1")
    assert(fp(s"$tokRel/vocab") == vocab0 && fp(s"$tokRel/tokenizer") == model0,
      "later shard refit the fit-once tokenizer/vocab")
    def tokRead() = snap(TokenShards.scanTokens(spark, s"$tokRel/shards")
      .select(col("bucket"), col("seq"), col("n"), xxhash64(col("ids")).as("h")))
    val k1 = tokRead()
    assert(k1.nonEmpty, "token release decoded empty")
    // shard-1 buckets live in their own label*buckets range
    assert(k1.map(_.split("\\|")(0).toInt).exists(_ >= 4),
      "shard 1's packed buckets were not shifted into its own range")
    CurationPipeline.applyShard(d.filter(col("doc_id") >= 25), pTok, s"$base/st2", "1")
    assert(tokRead() == k1, "re-delivered shard changed the token read")
  }

  test("dedup_ngram and dedup_winnow steps equal operator composition") {
    import graft.operators.Dedup
    val d = graft.plans.Materialize(docs.select("doc_id", "lang", "text"))
    def ids(df: org.apache.spark.sql.DataFrame) = snap(df.select("doc_id"))

    // jaccard
    val gotJ = CurationPipeline.fromYaml(d,
      "steps:\n  - dedup_ngram: { threshold: 0.8 }\n")
    val dropJ = Dedup.duplicateClusters(Dedup.ngramJaccard(d, 0.8, 1))
      .filter(col("doc_id") =!= col("cluster_rep")).select("doc_id")
    assert(ids(gotJ).sorted ==
      ids(d.join(dropJ, Seq("doc_id"), "left_anti")).sorted)

    // containment on the embedded-short-doc fixture the metric exists for
    val shorts = d.filter(col("doc_id") % 4 === 0).select(
      (col("doc_id") + 100000).as("doc_id"), col("lang"),
      array_join(slice(split(lower(col("text")), " "), 1, 6), " ").as("text"))
    val withShorts = graft.plans.Materialize(d.unionByName(shorts))
    val gotC = CurationPipeline.fromYaml(withShorts,
      "steps:\n  - dedup_ngram: { threshold: 0.9, metric: containment }\n")
    // every synthetic short doc is contained in its parent -> dropped
    assert(gotC.filter(col("doc_id") >= 100000).count() == 0,
      "containment step kept embedded short docs")
    val dropC = Dedup.duplicateClusters(Dedup.ngramContainment(withShorts, 0.9, 1))
      .filter(col("doc_id") =!= col("cluster_rep")).select("doc_id")
    assert(ids(gotC).sorted ==
      ids(withShorts.join(dropC, Seq("doc_id"), "left_anti")).sorted)
    // and symmetric jaccard at the same threshold misses them (the
    // structural gap the metric closes)
    val gotJOnShorts = CurationPipeline.fromYaml(withShorts,
      "steps:\n  - dedup_ngram: { threshold: 0.9 }\n")
    assert(gotJOnShorts.filter(col("doc_id") >= 100000).count() > 0,
      "fixture no longer demonstrates the jaccard miss")

    // winnow
    val gotW = CurationPipeline.fromYaml(d,
      "steps:\n  - dedup_winnow: { min_shared: 2, k: 5, w: 4 }\n")
    val dropW = Dedup.duplicateClusters(Dedup.winnow(d, 2L, 5, 4, 256))
      .filter(col("doc_id") =!= col("cluster_rep")).select("doc_id")
    assert(ids(gotW).sorted ==
      ids(d.join(dropW, Seq("doc_id"), "left_anti")).sorted)

    // metric validation is loud
    val bad = intercept[IllegalArgumentException](CurationConfig.fromYaml(
      "steps:\n  - dedup_ngram: { threshold: 0.8, metric: cosine }\n"))
    assert(bad.getMessage.contains("jaccard|containment"))
  }

  test("dedup_embedding step equals operator composition and ingests by shard") {
    import graft.operators.Dedup
    val d = graft.plans.Materialize(docs.select("doc_id", "lang", "text"))
    val emb = graft.sources.Tables.table(spark, "/root/testdata/sf0.001", "embeddings")
    def ids(df: org.apache.spark.sql.DataFrame) = snap(df.select("doc_id"))
    val yaml =
      "steps:\n  - dedup_embedding: { embeddings: emb, threshold: 0.4, bits: 2 }\n"

    // batch step == operator composition over the LIVE embeddings
    val got = CurationPipeline.fromYaml(d, yaml, aux = Map("emb" -> emb))
    val live = emb.join(d.select(col("doc_id").as("vec_id")), Seq("vec_id"), "left_semi")
    val drop = Dedup.duplicateClusters(
        Dedup.embeddingNearDup(live, 0.4, bands = 32, bitsPerBand = 2))
      .filter(col("doc_id") =!= col("cluster_rep")).select("doc_id")
    assert(ids(got).sorted == ids(d.join(drop, Seq("doc_id"), "left_anti")).sorted)
    assert(got.count() < d.count(), "dedup_embedding dropped nothing on this fixture")

    // shard ingest through the persisted vector index == the batch step
    // restricted to the shard (the near-dup shard contract)
    val p = CurationConfig.fromYaml(yaml)
    val st = java.nio.file.Files.createTempDirectory("cpemb").toString + "/s"
    val a = CurationPipeline.applyShard(
      d.filter(col("doc_id") < 25), p, st, "0", aux = Map("emb" -> emb))
    val b = CurationPipeline.applyShard(
      d.filter(col("doc_id") >= 25), p, st, "1", aux = Map("emb" -> emb))
    assert(ids(a).sorted ==
      ids(CurationPipeline.apply(d.filter(col("doc_id") < 25), p,
        aux = Map("emb" -> emb))).sorted,
      "bootstrap shard diverged from the batch step over itself")
    assert(ids(b).sorted ==
      ids(CurationPipeline.apply(d, p, aux = Map("emb" -> emb))
        .filter(col("doc_id") >= 25)).sorted,
      "shard ingest diverged from the batch run restricted to the shard")

    // the genuinely corpus-global embedding fits still refuse shard mode
    val bad = intercept[IllegalArgumentException](CurationPipeline.applyShard(
      d, CurationConfig.fromYaml(
        "steps:\n  - dedup_semantic: { embeddings: emb, threshold: 0.4 }\n"),
      java.nio.file.Files.createTempDirectory("cpsem").toString + "/s", "0",
      aux = Map("emb" -> emb)))
    assert(bad.getMessage.contains("corpus-global"))
  }

  test("dedup_afp step equals operator composition and ingests by shard") {
    import graft.harness.MediaFixtures
    import graft.operators.{AudioFingerprint, Dedup}
    val d = graft.plans.Materialize(docs.select("doc_id", "lang", "text")
      .join(MediaFixtures.syntheticWavs(docs.select(col("doc_id")))
        .withColumnRenamed("media_id", "doc_id"), Seq("doc_id")))
    def ids(df: org.apache.spark.sql.DataFrame) = snap(df.select("doc_id"))
    val yaml = "steps:\n  - dedup_afp: { max_hamming: 2 }\n"

    val got = CurationPipeline.fromYaml(d, yaml)
    val drop = Dedup.duplicateClusters(
        AudioFingerprint.dedup(d.select(col("doc_id").as("media_id"),
          col("payload")), maxHamming = 2))
      .filter(col("doc_id") =!= col("cluster_rep")).select("doc_id")
    assert(ids(got).sorted == ids(d.join(drop, Seq("doc_id"), "left_anti")).sorted)
    assert(got.count() < d.count(), "dedup_afp dropped nothing on this fixture")

    // shard ingest through the persisted fingerprint index == the batch
    // step restricted to the shard (mid-family split at 25 guarantees
    // corpus-to-shard pairs)
    val p = CurationConfig.fromYaml(yaml)
    val st = java.nio.file.Files.createTempDirectory("cpafp").toString + "/s"
    val a = CurationPipeline.applyShard(d.filter(col("doc_id") < 25), p, st, "0")
    val b = CurationPipeline.applyShard(d.filter(col("doc_id") >= 25), p, st, "1")
    assert(ids(a).sorted ==
      ids(CurationPipeline.apply(d.filter(col("doc_id") < 25), p)).sorted,
      "bootstrap shard diverged from the batch step over itself")
    assert(ids(b).sorted ==
      ids(CurationPipeline.apply(d, p).filter(col("doc_id") >= 25)).sorted,
      "shard ingest diverged from the batch run restricted to the shard")
  }

  test("applyShard: ngram and winnow ingest against persisted shingle/fp indexes") {
    val corpus = graft.plans.Materialize(ingestCorpus.drop("url"))
    def key(df: org.apache.spark.sql.DataFrame) = snap(df.select("doc_id"))
    val shard0 = corpus.filter(col("doc_id") < 30)
    val shard1 = corpus.filter(col("doc_id") >= 30)
    for ((yaml, label) <- Seq(
        ("steps:\n  - dedup_ngram: { threshold: 0.5 }\n", "ngram-jaccard"),
        ("steps:\n  - dedup_ngram: { threshold: 0.9, metric: containment }\n",
          "ngram-containment"),
        ("steps:\n  - dedup_winnow: { min_shared: 2, k: 3, w: 2 }\n", "winnow"))) {
      val p = CurationConfig.fromYaml(yaml)
      val st = java.nio.file.Files.createTempDirectory("cpng").toString + "/s"
      val a = key(CurationPipeline.applyShard(shard0, p, st, "0"))
      val b = key(CurationPipeline.applyShard(shard1, p, st, "1"))
      assert(a.sorted == key(CurationPipeline.apply(shard0, p)).sorted,
        s"$label: bootstrap shard diverged from the batch step over itself")
      assert(b.sorted ==
        key(CurationPipeline.apply(corpus, p).filter(col("doc_id") >= 30)).sorted,
        s"$label: shard ingest diverged from the batch run restricted to the shard")
      assert(b.size < shard1.count(), s"$label dropped nothing on this fixture")
    }
  }

  test("purgeRelease erases docs from the standing release; purgeShardState re-admits their content") {
    val corpus = graft.plans.Materialize(ingestCorpus)
    val base = java.nio.file.Files.createTempDirectory("cppurge").toString
    val rel = s"$base/release"
    val state = s"$base/state"
    val yaml = s"steps:\n  - url_dedup: {}\n  - dedup_exact\n  - sink: { path: $rel }\n"
    CurationPipeline.fromYamlShard(
      corpus.filter(col("doc_id") < 30), yaml, state, "0").count()
    CurationPipeline.fromYamlShard(
      corpus.filter(col("doc_id") >= 30), yaml, state, "1").count()
    val before = spark.read.parquet(rel).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    val purgeIds = Seq(before.min, before.max)
    assert(purgeIds.toSet.subsetOf(before))

    CurationPipeline.purgeRelease(spark, rel, purgeIds.toDF("doc_id"))
    // Slices folded into one purged dir, purged rows gone, others intact.
    val names = new java.io.File(rel).listFiles().map(_.getName)
      .filter(_.startsWith("shard=")).toSeq
    assert(names == Seq("shard=c1"), s"unexpected release layout: $names")
    val after = spark.read.parquet(rel).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(after == before -- purgeIds,
      s"release purge mismatch: missing=${(before -- purgeIds) -- after} " +
        s"still-present=${after.intersect(purgeIds.toSet)}")
    // Idempotent: purging already-absent ids is a no-op rewrite.
    CurationPipeline.purgeRelease(spark, rel, purgeIds.toDF("doc_id"))
    assert(spark.read.parquet(rel).select("doc_id")
      .collect().map(_.getLong(0)).toSet == after)
    // Each pass left an audit receipt (underscore-hidden: the parquet
    // read above did not trip over it).
    val receipts = new java.io.File(s"$rel/_purge").listFiles()
      .filter(!_.getName.startsWith("."))
    assert(receipts.length == 2,
      s"expected one receipt per purge pass, got ${receipts.toSeq}")
    val line = scala.io.Source.fromFile(receipts.head).mkString
    assert(line.contains("\"op\":\"purgeRelease\"") && line.contains("\"keys\":2"), line)

    // Release-only purge keeps the indexes: a re-crawl of purged
    // content under a fresh id still drops (takedown suppression).
    val purgedRows = graft.plans.Materialize(
      corpus.filter(col("doc_id").isin(purgeIds: _*))
        .withColumn("doc_id", col("doc_id") + 5000L))
    val suppressed = CurationPipeline.fromYamlShard(purgedRows, yaml, state, "2")
    assert(suppressed.count() == 0,
      "re-crawl of purged content was admitted before the state purge")

    // State purge erases the derived rows: the SAME re-crawl is now
    // admitted fresh (erasure semantics), and the report names every
    // step dir with its action.
    val report = CurationPipeline.purgeShardState(
      spark, state, (purgeIds ++ purgeIds.map(_ + 5000L)).toDF("doc_id"))
    assert(report.toMap == Map(
      "step0=url_index" -> "purged on keeper",
      "step1=exact_index" -> "purged on __id"), s"unexpected report: $report")
    val urlIdx = spark.read.parquet(s"$state/step0=url_index")
    assert(urlIdx.filter(col("keeper").isin((purgeIds ++ purgeIds.map(_ + 5000L)): _*))
      .count() == 0, "purged keepers survive in the url index")
    val readmitted = CurationPipeline.fromYamlShard(
      purgedRows.withColumn("doc_id", col("doc_id") + 1000L), yaml, state, "3")
    assert(readmitted.count() == purgedRows.count(),
      "re-crawl of erased content was not admitted fresh")
    // …and the admitted re-crawls landed in the standing release.
    val relIds = spark.read.parquet(rel).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(relIds == after ++ purgeIds.map(_ + 6000L),
      s"release after re-admission diverged: $relIds")
  }

  test("purgeShardState retains aggregate-only layouts and refuses unregistered step dirs") {
    val corpus = graft.plans.Materialize(ingestCorpus)
    val state = java.nio.file.Files.createTempDirectory("cppurga").toString + "/s"
    val yaml = "steps:\n  - dedup_exact\n  - substring_remove: { k: 8 }\n" +
      "  - perplexity: { max_ppl: 1000, vocab: 20 }\n"
    val p = CurationConfig.fromYaml(yaml)
    CurationPipeline.applyShard(corpus.filter(col("doc_id") < 30), p, state, "0").count()
    val report = CurationPipeline.purgeShardState(spark, state, Seq(0L).toDF("doc_id"))
    assert(report.toMap == Map(
      "step0=exact_index" -> "purged on __id",
      "step1=substring_index" -> "retained-aggregate",
      "step2=lm" -> "retained-aggregate"), s"unexpected report: $report")
    // The retained window-count index is untouched (no fold, no rewrite).
    assert(new java.io.File(s"$state/step1=substring_index/batch=0").exists(),
      "retained aggregate index was rewritten")
    // An unregistered layout refuses loudly instead of silently retaining.
    val foreign = new java.io.File(s"$state/step7=mystery_index/batch=0")
    foreign.mkdirs()
    spark.range(3).write.mode("overwrite").parquet(foreign.toString)
    val err = intercept[IllegalArgumentException](
      CurationPipeline.purgeShardState(spark, state, Seq(0L).toDF("doc_id")))
    assert(err.getMessage.contains("step7=mystery_index"), err.getMessage)
    // A non-integral id frame refuses loudly — a lossy cast would
    // silently purge nothing.
    val typeErr = intercept[IllegalArgumentException](
      CurationPipeline.purgeShardState(spark, state, Seq("0").toDF("doc_id")))
    assert(typeErr.getMessage.contains("integral"), typeErr.getMessage)
  }

  test("explain names each probe's dropping step; sinks and corpus-sized probes refused") {
    import spark.implicits._
    val d = docs.select("doc_id", "lang", "text").limit(60)
    val p = CurationConfig.fromYaml(
      "steps:\n  - quality: { min_tokens: 10 }\n  - dedup_exact\n")
    val probes = d.select("doc_id").limit(10)
      .unionByName(Seq(424242L).toDF("doc_id"))
    val got = CurationPipeline.explain(d, p, probes)
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(got(424242L) == "absent")
    // Every reported fate replays: quality drops = under 10 tokens,
    // exact drops = not the min id for their text, rest kept.
    val qualIds = CurationPipeline.apply(d,
      CurationConfig.fromYaml("steps:\n  - quality: { min_tokens: 10 }\n"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val keptIds = CurationPipeline.apply(d, p)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    got.foreach { case (id, fate) =>
      if (id == 424242L) ()
      else if (keptIds.contains(id)) assert(fate == "kept", s"$id: $fate")
      else if (!qualIds.contains(id)) assert(fate == "quality", s"$id: $fate")
      else assert(fate == "dedup_exact", s"$id: $fate")
    }
    // A duplicating step (upsample) keeps a probe alive through any copy.
    val pUp = CurationConfig.fromYaml(
      "steps:\n  - upsample: { group: lang, factors: { en: 2.0, es: 2.0, fr: 2.0, de: 2.0, zh: 2.0 } }\n")
    val upFates = CurationPipeline.explain(d, pUp, d.select("doc_id").limit(5))
      .collect().map(_.getString(1)).toSet
    assert(upFates == Set("kept"), upFates.toString)
    // Refusals: terminal sinks and corpus-sized probe sets.
    val sinkErr = intercept[IllegalArgumentException](CurationPipeline.explain(
      d, CurationConfig.fromYaml("steps:\n  - sink: { path: /tmp/never }\n"),
      probes))
    assert(sinkErr.getMessage.contains("explain"), sinkErr.getMessage)
    val bigErr = intercept[IllegalArgumentException](CurationPipeline.explain(
      d, p, spark.range(20000).select(col("id").as("doc_id"))))
    assert(bigErr.getMessage.contains("10k"), bigErr.getMessage)
  }

  test("fsck: healthy layouts report nothing; orphan tmps and wedges are distinguished") {
    import graft.operators.StateCompaction
    val base = java.nio.file.Files.createTempDirectory("cpfsck").toString
    val d = new java.io.File(s"$base/batch=0"); d.mkdirs()
    spark.range(2).write.mode("overwrite").parquet(d.toString)
    assert(StateCompaction.fsck(spark, base).count() == 0)
    // Pre-commit crash leftover: tmp without marker = orphan, not wedge.
    new java.io.File(s"$base/_compact_tmp").mkdirs()
    val orphan = StateCompaction.fsck(spark, base).collect()
    assert(orphan.map(_.getString(0)).toSeq == Seq("orphan_tmp"), orphan.toSeq)
    // Post-commit crash: the marker wins (the tmp is the complete fold,
    // not an orphan — reporting both would tell the operator to delete
    // the only copy of the folded rows).
    new java.io.File(s"$base/_compact_commit").createNewFile()
    val wedged = StateCompaction.fsck(spark, base).collect()
    assert(wedged.map(_.getString(0)).toSeq == Seq("wedge"), wedged.toSeq)
    // Missing dir refuses by name.
    val err = intercept[IllegalArgumentException](
      StateCompaction.fsck(spark, s"$base/nope"))
    assert(err.getMessage.contains("fsck"), err.getMessage)
  }

  test("fsckShardState: healthy ingest state reports nothing; defects name their step dir") {
    val corpus = graft.plans.Materialize(ingestCorpus)
    val state = java.nio.file.Files.createTempDirectory("cpfsck2").toString + "/s"
    val yaml = "steps:\n  - url_dedup: {}\n  - dedup_exact\n" +
      "  - perplexity: { max_ppl: 1000, vocab: 20 }\n"
    CurationPipeline.fromYamlShard(
      corpus.filter(col("doc_id") < 30), yaml, state, "0").count()
    assert(CurationPipeline.fsckShardState(spark, state).count() == 0)
    // A wedged step compaction and a missing fingerprint both surface,
    // findings keyed by where they live.
    new java.io.File(s"$state/step0=url_index/_compact_commit").createNewFile()
    new java.io.File(s"$state/_pipeline").delete()
    val f = CurationPipeline.fsckShardState(spark, state).collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq
    assert(f == Seq(
      ("missing_pipeline", "_pipeline"),
      ("wedge", "step0=url_index/_compact_commit")), f)
    // Foreign entries are flagged whether they are dirs, plain FILES
    // (a wrong-path write of a marker or a stray parquet part), or
    // step-NAMED files (step state is always a directory); hidden
    // entries stay exempt.
    new java.io.File(s"$state/notes.txt").createNewFile()
    new java.io.File(s"$state/step9=ghost_index").createNewFile()
    new java.io.File(s"$state/.hidden").createNewFile()
    val f2 = CurationPipeline.fsckShardState(spark, state).collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq
    assert(f2.contains(("foreign_entry", "notes.txt")), f2)
    assert(f2.contains(("foreign_entry", "step9=ghost_index")), f2)
    assert(!f2.exists(_._2 == ".hidden"), f2)
  }

  test("purgeTarRelease removes purged members; emptying the release is refused") {
    val corpus = graft.plans.Materialize(ingestCorpus)
    val base = java.nio.file.Files.createTempDirectory("cppurgt").toString
    val rel = s"$base/release"
    val yaml = "steps:\n  - dedup_exact\n" +
      s"  - sink_tar: { path: $rel, target_bytes: 65536 }\n"
    CurationPipeline.fromYamlShard(
      corpus.filter(col("doc_id") < 30), yaml, s"$base/state", "0")
    CurationPipeline.fromYamlShard(
      corpus.filter(col("doc_id") >= 30), yaml, s"$base/state", "1")
    def keys() = graft.sources.WebDataset
      .scanTar(spark, rel, requireSuccess = true)
      .select("key").distinct().collect().map(_.getString(0)).toSet
    val before = keys()
    val purge = Seq(before.min, before.max)
    graft.sources.WebDataset.purgeTarRelease(
      spark, rel, purge.toDF("key"), targetShardBytes = 65536)
    assert(keys() == before -- purge,
      "tar release purge did not remove exactly the purged members")
    assert(new java.io.File(rel).listFiles().map(_.getName)
      .filter(_.startsWith("batch=")).toSeq == Seq("batch=c1"))
    val err = intercept[IllegalArgumentException](
      graft.sources.WebDataset.purgeTarRelease(
        spark, rel, keys().toSeq.toDF("key"), targetShardBytes = 65536))
    assert(err.getMessage.contains("empty the release"), err.getMessage)
    // The refused purge left the release intact and unwedged, and did
    // NOT write a receipt (no erasure happened); the successful pass did.
    assert(keys() == before -- purge, "refused purge mutated the release")
    val receipts = new java.io.File(s"$rel/_purge").listFiles()
      .filter(!_.getName.startsWith("."))
    assert(receipts.length == 1,
      s"expected exactly the successful pass's receipt, got ${receipts.toSeq}")
    assert(scala.io.Source.fromFile(receipts.head).mkString
      .contains("\"op\":\"purgeTarRelease\""))
  }
}
