package graft

import org.apache.spark.sql.functions._

import graft.sources.WebDataset

class WebDatasetSpec extends SparkSpec {

  import spark.implicits._

  private def fixture = (0L until 10L)
    .map(i => (i, s"text-$i-${"x" * i.toInt}", if (i % 2 == 0) "en" else "fr"))
    .toDF("doc_id", "text", "lang")
    .select(col("doc_id"),
      col("text").cast("binary").as("t"), col("lang").cast("binary").as("l"))

  test("writeTar/scanTar round trip: naming, sharding, payload bytes exact") {
    val dir = java.nio.file.Files.createTempDirectory("wds").toString + "/corpus"
    WebDataset.writeTar(fixture, dir, shards = 3, keyCol = "doc_id",
      members = Seq("txt" -> "t", "cls" -> "l"))
    val files = new java.io.File(dir).listFiles().map(_.getName)
      .filter(f => f.endsWith(".tar") && !f.startsWith(".")).sorted.toSeq
    assert(files == Seq("shard-00000.tar", "shard-00001.tar", "shard-00002.tar"))
    val m = WebDataset.scanTar(spark, dir)
    val rows = m.collect().map(r => (r.getString(0), r.getString(1), r.getString(2),
      new String(r.getAs[Array[Byte]](3), "UTF-8"), r.getLong(4)))
    assert(rows.length == 20, s"expected 2 members x 10 docs, got ${rows.length}")
    rows.foreach { case (shard, key, ext, payload, n) =>
      val id = key.toLong
      assert(shard == f"shard-${id % 3}%05d", s"doc $id landed in $shard")
      assert(Seq("txt", "cls").contains(ext))
      val want = if (ext == "txt") s"text-$id-${"x" * id.toInt}"
        else (if (id % 2 == 0) "en" else "fr")
      assert(payload == want, s"$key.$ext payload drifted")
      assert(n == payload.getBytes("UTF-8").length.toLong)
    }
  }

  test("samples pivot: one row per sample, missing modality null, binary integrity") {
    val dir = java.nio.file.Files.createTempDirectory("wds2").toString + "/corpus"
    // Give doc 0 no cls member by nulling its lang payload upstream —
    // writeTar writes a zero-byte member for null; drop the member
    // instead by writing two frames is overkill, so check null-payload
    // semantics: empty bytes, not a crash.
    WebDataset.writeTar(
      fixture.withColumn("l", when(col("doc_id") === 0, lit(null)).otherwise(col("l"))),
      dir, shards = 2, keyCol = "doc_id", members = Seq("txt" -> "t", "cls" -> "l"))
    val s = WebDataset.samples(WebDataset.scanTar(spark, dir), Seq("txt", "cls"))
    assert(s.count() == 10)
    val r0 = s.filter(col("key") === "0").head()
    assert(r0.getAs[Array[Byte]]("cls").isEmpty, "null payload must write as empty bytes")
    val r3 = s.filter(col("key") === "3").head()
    assert(new String(r3.getAs[Array[Byte]]("txt"), "UTF-8") == "text-3-xxx")
    assert(new String(r3.getAs[Array[Byte]]("cls"), "UTF-8") == "fr")
    // Unknown extension pivots to all-null column, not an error.
    val s2 = WebDataset.samples(WebDataset.scanTar(spark, dir), Seq("txt", "nope"))
    assert(s2.filter(col("nope").isNotNull).count() == 0)
  }

  test("rewrite with fewer shards clears stale shard files") {
    val dir = java.nio.file.Files.createTempDirectory("wds3").toString + "/corpus"
    WebDataset.writeTar(fixture, dir, shards = 4, keyCol = "doc_id",
      members = Seq("txt" -> "t"))
    assert(new java.io.File(dir).listFiles().count(_.getName.endsWith(".tar")) == 4)
    WebDataset.writeTar(fixture, dir, shards = 2, keyCol = "doc_id",
      members = Seq("txt" -> "t"))
    val files = new java.io.File(dir).listFiles().map(_.getName).filter(_.endsWith(".tar"))
    assert(files.sorted.toSeq == Seq("shard-00000.tar", "shard-00001.tar"),
      s"stale shards survived: ${files.mkString(",")}")
    assert(WebDataset.scanTar(spark, dir).count() == 10)
  }

  test("binary payloads round trip bit-exactly (media fixture bytes)") {
    val ids = (0L until 12L).toDF("doc_id")
    val payloads = graft.harness.MediaFixtures.syntheticContainers(ids)
    val dir = java.nio.file.Files.createTempDirectory("wds4").toString + "/media"
    WebDataset.writeTar(payloads, dir, shards = 3, keyCol = "media_id",
      members = Seq("bin" -> "payload"))
    val back = WebDataset.scanTar(spark, dir)
      .select(col("key").cast("long").as("media_id"), col("payload"))
      .collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]](1).toSeq).toMap
    val want = payloads.collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]](1).toSeq).toMap
    assert(back == want, "payload bytes drifted through the tar round trip")
  }

  test("streamTar tails the shard directory: batch parity, exactly-once across restarts") {
    import org.apache.spark.sql.streaming.Trigger
    val dir = java.nio.file.Files.createTempDirectory("wds7").toString + "/corpus"
    WebDataset.writeTar(fixture, dir, shards = 2, keyCol = "doc_id",
      members = Seq("txt" -> "t"))
    val ckpt = java.nio.file.Files.createTempDirectory("wds7ck").toString
    // foreachBatch (the only sink shape that RECOVERS from a checkpoint
    // — memory sink refuses) collecting each drain's rows driver-side.
    def drain(): Seq[(String, String, String, String)] = {
      val buf = scala.collection.mutable.ArrayBuffer.empty[(String, String, String, String)]
      val q = WebDataset.streamTar(spark, dir)
        .writeStream.outputMode("append")
        .option("checkpointLocation", ckpt)
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          buf ++= b.collect().map(r => (r.getString(0), r.getString(1), r.getString(2),
            new String(r.getAs[Array[Byte]](3), "UTF-8")))
          ()
        }
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      buf.toSeq
    }
    val first = drain()
    // Batch parity: the streamed members equal scanTar's, row for row.
    val batch = WebDataset.scanTar(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2),
        new String(r.getAs[Array[Byte]](3), "UTF-8")))
    assert(first.sorted == batch.toSeq.sorted)
    // A new shard lands (crawler finished another chunk): only IT is
    // processed on the next drain — the checkpoint remembers seen files.
    val scratch = java.nio.file.Files.createTempDirectory("wds7s").toString + "/late"
    WebDataset.writeTar(fixture.filter(col("doc_id") < 3), scratch, shards = 1,
      keyCol = "doc_id", members = Seq("txt" -> "t"))
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(scratch, "shard-00000.tar"),
      java.nio.file.Paths.get(dir, "shard-00099.tar"))
    val second = drain()
    assert(second.nonEmpty && second.forall(_._1 == "shard-00099"),
      s"restart re-processed old shards: ${second.map(_._1).distinct.mkString(",")}")
    assert(second.length == 3)
  }

  test("tarSink appends idempotent batch=<id> shard dirs; scanTar reads the layout as one corpus") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq = spark.sqlContext
    val out = java.nio.file.Files.createTempDirectory("wds8").toString + "/release"
    val ckpt = java.nio.file.Files.createTempDirectory("wds8ck").toString
    val input = MemoryStream[(Long, String)]
    val q = WebDataset.tarSink(
      input.toDF().toDF("doc_id", "text"), out, targetShardBytes = 64)
      .option("checkpointLocation", ckpt).start()
    try {
      input.addData((0L, "alpha"), (1L, "beta"), (2L, "gamma"))
      q.processAllAvailable()
      input.addData((3L, "delta"), (4L, "epsilon"))
      q.processAllAvailable()
    } finally q.stop()
    val m = WebDataset.scanTar(spark, out)
    val rows = m.collect().map(r => r.getString(1).toLong ->
      (r.getString(0), new String(r.getAs[Array[Byte]](3), "UTF-8"))).toMap
    assert(rows.keySet == Set(0L, 1L, 2L, 3L, 4L))
    assert(rows(0L)._2 == "alpha" && rows(4L)._2 == "epsilon")
    // Batch-qualified shard labels keep per-batch shard files distinct.
    assert(rows.values.forall(_._1.matches("batch=\\d+/shard-\\d{5}")),
      s"unqualified shard labels: ${rows.values.map(_._1).toSet}")
    assert(rows.values.map(_._1.split('/').head).toSet.size == 2, "expected two batch dirs")
    // Re-delivery of a batch (at-least-once) rewrites its own dir
    // byte-identically: same member set, same payloads, no duplicates.
    import spark.implicits._
    val redelivered = Seq((0L, "alpha"), (1L, "beta"), (2L, "gamma"))
      .toDF("doc_id", "text")
    WebDataset.writeTarAuto(redelivered, s"$out/batch=0", 64,
      keyCol = "doc_id", members = Seq("txt" -> "text"))
    assert(snap(WebDataset.scanTar(spark, out).drop("payload")) ==
      snap(m.drop("payload")), "re-delivered batch changed the corpus")
  }

  test("tokenSink streams batch-keyed int32 shards; scanTokens reads the standing layout") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.operators.Packing
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val out = java.nio.file.Files.createTempDirectory("wdst").toString + "/tokens"
    val ckpt = java.nio.file.Files.createTempDirectory("wdstck").toString
    // Fit-once vocab on a bounded sample, served to every batch.
    val sample = Seq((0L, "alpha beta gamma"), (1L, "alpha beta delta"))
      .toDF("doc_id", "text")
    val vocab = Packing.rankVocab(sample, vocabSize = 10)
    val input = MemoryStream[(Long, String)]
    val q = Packing.tokenSink(input.toDF().toDF("doc_id", "text"), vocab,
      budgetTokens = 4, outDir = out, buckets = 2, targetShardBytes = 1 << 20)
      .option("checkpointLocation", ckpt).start()
    try {
      input.addData((0L, "alpha beta gamma alpha"), (1L, "beta beta"))
      q.processAllAvailable()
      input.addData((2L, "gamma delta unseen alpha beta"))
      q.processAllAvailable()
    } finally q.stop()
    val got = graft.sources.TokenShards.scanTokens(spark, out)
    // Batch 0 occupies buckets [0, 2), batch 1 buckets [2, 4); each
    // batch's sequences equal a batch-local pack shifted into its range.
    val b0 = Packing.packTokenIds(
      Seq((0L, "alpha beta gamma alpha"), (1L, "beta beta")).toDF("doc_id", "text"),
      vocab, budgetTokens = 4, buckets = 2)
    val b1 = Packing.packTokenIds(
      Seq((2L, "gamma delta unseen alpha beta")).toDF("doc_id", "text"),
      vocab, budgetTokens = 4, buckets = 2)
      .withColumn("bucket", (col("bucket") + lit(2)).cast("int"))
    assert(snap(got) == snap(b0.unionByName(b1)),
      "standing token layout drifted from per-batch packing")
    // Re-delivery of batch 0 (at-least-once) rewrites its dir
    // byte-identically — the member set is unchanged.
    val before = snap(got)
    Packing.tokenTar(b0, s"$out/batch=0", 1 << 20)
    assert(snap(graft.sources.TokenShards.scanTokens(spark, out)) == before)
  }

  test("streamTokens tails a growing token release exactly once") {
    import graft.operators.Packing
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("toksrc").toString + "/shards"
    val ckpt = java.nio.file.Files.createTempDirectory("toksrcck").toString
    val vocab = Packing.rankVocab(
      Seq((0L, "alpha beta gamma")).toDF("doc_id", "text"), 10)
    Packing.tokenTar(Packing.packTokenIds(
      Seq((0L, "alpha beta gamma alpha")).toDF("doc_id", "text"), vocab, 4, 2),
      s"$dir/batch=0", 1 << 20)
    val q = graft.sources.TokenShards.streamTokens(spark, dir)
      .writeStream.format("memory").queryName("tok_stream").outputMode("append")
      .option("checkpointLocation", ckpt).start()
    try {
      q.processAllAvailable()
      assert(snap(spark.table("tok_stream")) ==
        snap(graft.sources.TokenShards.scanTokens(spark, dir)))
      // A new release batch lands: only IT is processed on the next
      // drain (checkpointed file tracking), and the feed equals the
      // batch scan of the whole standing layout.
      Packing.tokenTar(Packing.packTokenIds(
        Seq((1L, "beta gamma unseen")).toDF("doc_id", "text"), vocab, 4, 2)
        .withColumn("bucket", (col("bucket") + lit(2)).cast("int")),
        s"$dir/batch=1", 1 << 20)
      q.processAllAvailable()
      assert(snap(spark.table("tok_stream")) ==
        snap(graft.sources.TokenShards.scanTokens(spark, dir)))
    } finally q.stop()
  }

  test("tokenSink standing layouts repack losslessly (repackTar over bin members)") {
    import graft.operators.Packing
    import spark.implicits._
    val in = java.nio.file.Files.createTempDirectory("tokrepack").toString + "/tokens"
    val vocab = Packing.rankVocab(
      Seq((0L, "alpha beta gamma")).toDF("doc_id", "text"), 10)
    val b0 = Packing.packTokenIds(
      Seq((0L, "alpha beta gamma alpha beta")).toDF("doc_id", "text"), vocab, 4, 2)
    val b1 = Packing.packTokenIds(
      Seq((1L, "beta gamma unseen")).toDF("doc_id", "text"), vocab, 4, 2)
      .withColumn("bucket", (col("bucket") + lit(2)).cast("int")) // tokenSink's offset
    Packing.tokenTar(b0, s"$in/batch=0", 1 << 20)
    Packing.tokenTar(b1, s"$in/batch=1", 1 << 20)
    val out = java.nio.file.Files.createTempDirectory("tokrepacko").toString + "/flat"
    val n = WebDataset.repackTar(spark, in, out, 1 << 20, exts = Seq("bin"))
    assert(n == 1, s"tiny corpus should compact to one shard, got $n")
    assert(snap(graft.sources.TokenShards.scanTokens(spark, out)) ==
      snap(graft.sources.TokenShards.scanTokens(spark, in)),
      "repacked token layout decoded differently")
  }

  test("repackTar compacts accumulated batch dirs into one flat layout, members intact") {
    val in = java.nio.file.Files.createTempDirectory("wds9").toString + "/release"
    // Simulate three sink batches directly (writeTarAuto per batch dir).
    import spark.implicits._
    (0 until 3).foreach { b =>
      val batch = (0L until 4L).map(i => (b * 10L + i, s"doc-$b-$i"))
        .toDF("doc_id", "text")
      WebDataset.writeTarAuto(batch, s"$in/batch=$b", 16,
        keyCol = "doc_id", members = Seq("txt" -> "text"))
    }
    val before = WebDataset.scanTar(spark, in)
    assert(before.select("shard").distinct().count() > 3, "want many small shards")
    val out = java.nio.file.Files.createTempDirectory("wds9o").toString + "/flat"
    val n = WebDataset.repackTar(spark, in, out, targetShardBytes = 1 << 20)
    assert(n == 1, s"12 tiny docs fit one 1 MiB shard, got $n")
    val after = WebDataset.scanTar(spark, out)
    def members(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getString(1), r.getString(2),
        new String(r.getAs[Array[Byte]](3), "UTF-8"))).toSet
    assert(members(after) == members(before), "repack changed the member set")
    assert(after.select("shard").distinct().count() == 1)
    // In-place repack and duplicate keys are refused loudly.
    val inPlace = intercept[IllegalArgumentException](
      WebDataset.repackTar(spark, in, in, 1 << 20))
    assert(inPlace.getMessage.contains("in-place"))
    WebDataset.writeTarAuto(Seq((1L, "dup")).toDF("doc_id", "text"),
      s"$in/batch=9", 16, keyCol = "doc_id", members = Seq("txt" -> "text"))
    val dup = intercept[IllegalArgumentException](
      WebDataset.repackTar(spark, in, out + "2", 1 << 20))
    assert(dup.getMessage.contains("multiple shards"))
  }

  test("writeTar job commit: _SUCCESS stamped, _temporary cleaned, requireSuccess gates reads") {
    val dir = java.nio.file.Files.createTempDirectory("wdsc").toString + "/corpus"
    WebDataset.writeTar(fixture, dir, shards = 2, keyCol = "doc_id",
      members = Seq("txt" -> "t"))
    assert(WebDataset.isComplete(spark, dir), "_SUCCESS missing after writeTar")
    assert(!new java.io.File(dir, "_temporary").exists(),
      "_temporary survived job commit")
    // A verified read of the complete release succeeds…
    assert(WebDataset.scanTar(spark, dir, requireSuccess = true).count() == 10)
    // …and refuses once the marker is gone (simulated partial release).
    assert(new java.io.File(dir, "_SUCCESS").delete())
    val e = intercept[IllegalArgumentException](
      WebDataset.scanTar(spark, dir, requireSuccess = true))
    assert(e.getMessage.contains("_SUCCESS"))
  }

  test("commitShard: duplicate/speculative attempt loses the race losslessly") {
    val root = java.nio.file.Files.createTempDirectory("wdsd")
    val fs = new org.apache.hadoop.fs.Path(root.toString)
      .getFileSystem(spark.sessionState.newHadoopConf())
    def put(name: String, bytes: String): org.apache.hadoop.fs.Path = {
      val p = new org.apache.hadoop.fs.Path(root.toString, name)
      val o = fs.create(p, true); o.write(bytes.getBytes("UTF-8")); o.close(); p
    }
    val dest = new org.apache.hadoop.fs.Path(root.toString, "shard-00000.tar")
    // First attempt commits.
    WebDataset.commitShard(fs, put("_temporary/shard-00000.tar.attempt-1", "payload"), dest)
    assert(fs.exists(dest))
    // A zombie second attempt of the same task commits the same bytes:
    // the published shard stays intact and the loser's temp is dropped.
    val tmp2 = put("_temporary/shard-00000.tar.attempt-2", "payload")
    WebDataset.commitShard(fs, tmp2, dest)
    assert(!fs.exists(tmp2), "losing attempt's temp file survived")
    val in = fs.open(dest)
    val got = new String(in.readAllBytes(), "UTF-8"); in.close()
    assert(got == "payload", "published shard corrupted by duplicate attempt")
  }

  test("tarSink batch dirs each carry _SUCCESS; verified scan accepts the layout") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq = spark.sqlContext
    val out = java.nio.file.Files.createTempDirectory("wdse").toString + "/release"
    val ckpt = java.nio.file.Files.createTempDirectory("wdseck").toString
    val input = MemoryStream[(Long, String)]
    val q = WebDataset.tarSink(
      input.toDF().toDF("doc_id", "text"), out, targetShardBytes = 64)
      .option("checkpointLocation", ckpt).start()
    try {
      input.addData((0L, "alpha"), (1L, "beta"))
      q.processAllAvailable()
      input.addData((2L, "gamma"))
      q.processAllAvailable()
    } finally q.stop()
    // Each committed batch is marked; the verified scan reads the layout.
    assert(WebDataset.scanTar(spark, out, requireSuccess = true).count() == 3)
    // An unmarked batch dir (mid-write crash) fails the verified read.
    assert(new java.io.File(s"$out/batch=1", "_SUCCESS").delete())
    val e = intercept[IllegalArgumentException](
      WebDataset.scanTar(spark, out, requireSuccess = true))
    assert(e.getMessage.contains("batch"))
  }

  test("session Hadoop conf (spark.hadoop.* at launch) reaches tar-writer tasks") {
    // spark.hadoop.* launch settings (object-store credentials,
    // endpoints) land prefix-stripped in sc.hadoopConfiguration, which
    // sessionState.newHadoopConf() clones — simulate one directly.
    val key = "graft.test.webdataset.marker"
    spark.sparkContext.hadoopConfiguration.set(key, "it-made-it")
    try {
      // The exact mechanism writeTar uses: wrap the session conf and read
      // it back inside a task (closure-serialized through Spark proper).
      val serConf = new WebDataset.SerializableHadoopConf(
        spark.sessionState.newHadoopConf())
      assert(serConf.value.get(key) == "it-made-it",
        "session conf missing the setting driver-side")
      val seen = spark.range(4).rdd
        .mapPartitions(_ => Iterator.single(Option(serConf.value.get(key)).getOrElse("")))
        .distinct().collect().toSet
      assert(seen == Set("it-made-it"),
        s"task-side Hadoop conf dropped the session setting: $seen")
      // The pre-fix shape (a bare task-side `new Configuration()`) would
      // NOT see it — the wrapper is what carries session state across.
      assert(new org.apache.hadoop.conf.Configuration().get(key) == null)
    } finally spark.sparkContext.hadoopConfiguration.unset(key)
  }

  test("writeTarAuto derives shard count from payload bytes") {
    val dir = java.nio.file.Files.createTempDirectory("wds5").toString + "/corpus"
    // fixture txt payloads total sum(len("text-i-" + "x"*i)) = 10*7 + 45
    // = 115 bytes; cls adds 10*2 = 20 → 135. target 50 → ceil(135/50)=3.
    val n = WebDataset.writeTarAuto(fixture, dir, targetShardBytes = 50,
      keyCol = "doc_id", members = Seq("txt" -> "t", "cls" -> "l"))
    assert(n == 3, s"expected 3 shards for 135 payload bytes at target 50, got $n")
    val files = new java.io.File(dir).listFiles().map(_.getName).filter(_.endsWith(".tar"))
    assert(files.length == 3)
    // Assignment is the same closed form as writeTar at the derived count.
    WebDataset.scanTar(spark, dir).select("shard", "key").collect().foreach { r =>
      assert(r.getString(0) == f"shard-${r.getString(1).toLong % 3}%05d")
    }
    // Giant target → everything in one shard; null payloads count zero.
    val dir1 = java.nio.file.Files.createTempDirectory("wds6").toString + "/one"
    val n1 = WebDataset.writeTarAuto(
      fixture.withColumn("t", when(col("doc_id") < 5, col("t"))),
      dir1, targetShardBytes = 1L << 30, keyCol = "doc_id",
      members = Seq("txt" -> "t", "cls" -> "l"))
    assert(n1 == 1)
    assert(WebDataset.scanTar(spark, dir1).count() == 20)
  }

  test("a release under a dot/underscore-prefixed ANCESTOR dir still scans") {
    // The hidden-file convention applies below the scan root only: a
    // corpus that happens to live under `.corpora/` or `_work/` must
    // scan, while `_temporary`/`.hidden` INSIDE the root stay skipped.
    val base = java.nio.file.Files.createTempDirectory("wdsh").toString
    val dir = base + "/.corpora/_work/release"
    WebDataset.writeTar(fixture, dir, shards = 2, keyCol = "doc_id",
      members = Seq("txt" -> "t"))
    assert(WebDataset.scanTar(spark, dir).count() == 10,
      "release under hidden ancestors scanned as empty")
    // …and a hidden subdir below the root is still excluded.
    val sub = new java.io.File(dir, "_stale")
    assert(sub.mkdir())
    java.nio.file.Files.copy(
      new java.io.File(dir, "shard-00000.tar").toPath,
      new java.io.File(sub, "shard-00000.tar").toPath)
    assert(WebDataset.scanTar(spark, dir).count() == 10,
      "members under a hidden subdir leaked into the scan")
  }

  test("scanTar of a nonexistent path fails loudly, not empty") {
    val e = intercept[IllegalArgumentException](
      WebDataset.scanTar(spark, "/definitely/not/a/release",
        requireSuccess = false).count())
    assert(e.getMessage.contains("does not exist"))
  }

  test("header-only walk (readPayload = false) reports keys/exts/true sizes") {
    val dir = java.nio.file.Files.createTempDirectory("wdsm").toString + "/corpus"
    WebDataset.writeTar(fixture, dir, shards = 2, keyCol = "doc_id",
      members = Seq("txt" -> "t", "cls" -> "l"))
    val meta = WebDataset.scanTarPaths(spark, Seq(dir), readPayload = false)
    val full = WebDataset.scanTar(spark, dir)
    val m = meta.select("shard", "key", "ext", "n_bytes").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)) -> r.getLong(3)).toMap
    val f = full.select("shard", "key", "ext", "n_bytes").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)) -> r.getLong(3)).toMap
    assert(m == f, "metadata walk disagrees with the payload walk")
    assert(meta.select(max(length(col("payload")))).head.get(0) == 0,
      "metadata walk materialized payload bytes")
  }
}
