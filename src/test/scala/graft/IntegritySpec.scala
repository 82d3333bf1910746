package graft

import org.apache.spark.sql.functions._

import graft.operators.Integrity

/** The content fingerprint must be invariant to everything a legitimate
  * rewrite is allowed to change — row order, partition count, file
  * layout, column order at write time — and sensitive to everything it
  * is not: any cell, any row.
  */
class IntegritySpec extends SparkSpec {

  import spark.implicits._

  private def rel(rows: Seq[(Long, String)], dir: String, parts: Int,
      swapCols: Boolean = false): Unit = {
    val df = rows.toDF("id", "v").repartition(parts)
    val out = if (swapCols) df.select("v", "id") else df
    out.write.mode("overwrite").parquet(s"$dir/shard=0")
  }

  test("fingerprint is layout-invariant and content-sensitive") {
    val rows = (0L until 100L).map(i => (i, s"text-$i"))
    val a = java.nio.file.Files.createTempDirectory("integ_a").toString
    val b = java.nio.file.Files.createTempDirectory("integ_b").toString
    rel(rows, a, parts = 1)
    rel(scala.util.Random.shuffle(rows), b, parts = 7, swapCols = true)
    def fp(d: String) = Integrity.fingerprint(spark, d)
      .select("n_rows", "fp").head()
    assert(fp(a) == fp(b),
      "row order / partitioning / column order changed the fingerprint")
    // One changed cell must change it.
    val c = java.nio.file.Files.createTempDirectory("integ_c").toString
    rel(rows.updated(50, (50L, "text-50x")), c, parts = 1)
    assert(fp(a) != fp(c), "a changed cell left the fingerprint unchanged")
    // One dropped row must change both count and fingerprint.
    val d = java.nio.file.Files.createTempDirectory("integ_d").toString
    rel(rows.filterNot(_._1 == 99L), d, parts = 1)
    assert(fp(a) != fp(d))
  }

  test("a manifest from another recipe era refuses with a re-stamp hint") {
    val d = (0L until 20L).map(i => (i, s"r-$i")).toDF("id", "v")
    val dir = java.nio.file.Files.createTempDirectory("integ_rv").toString + "/rel"
    d.write.parquet(s"$dir/shard=0")
    Integrity.stamp(spark, dir)
    // Rewrite the manifest claiming an older recipe: every healthy slice
    // would hash differently, so verify must refuse, not cry corruption.
    val mani = spark.read.parquet(s"$dir/_integrity")
      .withColumn("recipe", lit(1)).collect()
    spark.createDataFrame(
        spark.sparkContext.parallelize(mani.toSeq),
        spark.read.parquet(s"$dir/_integrity").schema)
      .write.mode("overwrite").parquet(s"$dir/_integrity")
    spark.catalog.refreshByPath(s"$dir/_integrity")
    val err = intercept[IllegalArgumentException](Integrity.verify(spark, dir))
    assert(err.getMessage.contains("Re-stamp"), err.getMessage)
    // A pre-versioning manifest (no recipe column) is equally stale.
    spark.read.parquet(s"$dir/_integrity").drop("recipe")
      .write.mode("overwrite").parquet(s"$dir/_integrity2")
    // (moved aside first: overwrite reads its own input otherwise)
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    fs.delete(new org.apache.hadoop.fs.Path(s"$dir/_integrity"), true)
    fs.rename(new org.apache.hadoop.fs.Path(s"$dir/_integrity2"),
      new org.apache.hadoop.fs.Path(s"$dir/_integrity"))
    spark.catalog.refreshByPath(s"$dir/_integrity")
    val err2 = intercept[IllegalArgumentException](Integrity.verify(spark, dir))
    assert(err2.getMessage.contains("recipe v1"), err2.getMessage)
    // Re-stamping under the current recipe heals it.
    Integrity.stamp(spark, dir)
    assert(Integrity.verify(spark, dir).filter(col("status") =!= "ok").count() == 0)
    // A MIXED-recipe manifest (partial re-stamp / concatenated replica
    // manifests) must refuse with its own message — the gate checks ALL
    // rows, not just the first: a first-row-only read could pass on the
    // current-recipe row and then report the other era's healthy slices
    // as content_drift.
    d.write.parquet(s"$dir/shard=1")
    Integrity.stamp(spark, dir)
    val good = spark.read.parquet(s"$dir/_integrity")
    val mixedRows = good.withColumn("recipe",
        when(col("slice") === "shard=1", lit(1)).otherwise(col("recipe")))
      .collect()
    spark.createDataFrame(
        spark.sparkContext.parallelize(mixedRows.toSeq), good.schema)
      .write.mode("overwrite").parquet(s"$dir/_integrity")
    spark.catalog.refreshByPath(s"$dir/_integrity")
    val err3 = intercept[IllegalArgumentException](Integrity.verify(spark, dir))
    assert(err3.getMessage.contains("MIXED"), err3.getMessage)
    Integrity.stamp(spark, dir)
    assert(Integrity.verify(spark, dir).filter(col("status") =!= "ok").count() == 0)
  }

  test("folds keep a stamped release stamped; unstamped releases stay unstamped") {
    import graft.operators.CurationPipeline
    // Parquet face: stamp → purge (a fold that rewrites slice names) →
    // verify must be GREEN over the purged fold — the pre-round-16 bug
    // was a stale manifest reporting every renamed slice as
    // missing_slice/unstamped_slice.
    val dir = java.nio.file.Files.createTempDirectory("integ_f").toString + "/rel"
    val d = (0L until 40L).map(i => (i, s"f-$i")).toDF("doc_id", "v")
    d.filter(col("doc_id") < 20).write.parquet(s"$dir/shard=0")
    d.filter(col("doc_id") >= 20).write.parquet(s"$dir/shard=1")
    Integrity.stamp(spark, dir)
    CurationPipeline.purgeRelease(spark, dir, Seq(3L, 27L).toDF("doc_id"))
    val post = Integrity.verify(spark, dir)
    assert(post.filter(col("status") =!= "ok").count() == 0,
      "post-purge verify must be green over the re-stamped fold")
    assert(post.count() == 1, "one folded slice expected")
    // The re-stamped manifest fingerprints the POST-purge bytes: a
    // purged row resurrected by hand must surface as content_drift.
    val folded = new java.io.File(dir).listFiles()
      .map(_.getName).filter(_.startsWith("shard=")).head
    spark.read.parquet(s"$dir/$folded")
      .unionByName(d.filter(col("doc_id") === 3L))
      .write.mode("overwrite").parquet(s"$dir/shard=9")
    assert(Integrity.verify(spark, dir)
      .filter(col("status") === "unstamped_slice").count() == 1)
    // An UNSTAMPED release must not gain a manifest from a fold.
    val dir2 = java.nio.file.Files.createTempDirectory("integ_f2").toString + "/rel"
    d.filter(col("doc_id") < 20).write.parquet(s"$dir2/shard=0")
    d.filter(col("doc_id") >= 20).write.parquet(s"$dir2/shard=1")
    CurationPipeline.compactRelease(spark, dir2)
    assert(!new java.io.File(s"$dir2/_integrity").exists(),
      "a fold of an unstamped release must not invent a manifest")
    val err = intercept[IllegalArgumentException](Integrity.verify(spark, dir2))
    assert(err.getMessage.contains("stamp it first"), err.getMessage)
    // Tar face: a stamped batch-keyed tar release folds (repacked
    // members, new shard labels) and verifyTar stays green over the
    // re-stamped fold.
    import graft.sources.WebDataset
    val trel = java.nio.file.Files.createTempDirectory("integ_f3").toString + "/rel"
    val fix = (0L until 12L).map(i => (i, s"tar-payload-$i"))
      .toDF("doc_id", "text")
      .select(col("doc_id"), col("text").cast("binary").as("t"))
    WebDataset.writeTar(fix.filter(col("doc_id") < 6), s"$trel/batch=0",
      shards = 2, keyCol = "doc_id", members = Seq("txt" -> "t"))
    WebDataset.writeTar(fix.filter(col("doc_id") >= 6), s"$trel/batch=1",
      shards = 2, keyCol = "doc_id", members = Seq("txt" -> "t"))
    Integrity.stampTar(spark, trel)
    WebDataset.compactTarRelease(spark, trel)
    assert(Integrity.verifyTar(spark, trel)
      .filter(col("status") =!= "ok").count() == 0,
      "post-compaction verifyTar must be green over the re-stamped fold")
  }

  test("verify survives the worst damage: unreadable and fully-lost slices") {
    val d = (0L until 30L).map(i => (i, s"w-$i")).toDF("id", "v")
    val dir = java.nio.file.Files.createTempDirectory("integ_u").toString + "/rel"
    d.filter(col("id") < 15).write.parquet(s"$dir/shard=0")
    d.filter(col("id") >= 15).write.parquet(s"$dir/shard=1")
    Integrity.stamp(spark, dir)
    // Lost part files behind a surviving _SUCCESS → a row, not a crash.
    new java.io.File(s"$dir/shard=0").listFiles()
      .filter(_.getName.startsWith("part-")).foreach(f => assert(f.delete()))
    val got = Integrity.verify(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(got == Set(("shard=0", "unreadable_slice"), ("shard=1", "ok")),
      got.toString)
    // Every slice gone (a copy that died after the manifest transferred):
    // one missing_slice row each, still no exception.
    def rmrf(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rmrf)); f.delete(); ()
    }
    rmrf(new java.io.File(s"$dir/shard=0"))
    rmrf(new java.io.File(s"$dir/shard=1"))
    val gone = Integrity.verify(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(gone == Set(("shard=0", "missing_slice"), ("shard=1", "missing_slice")),
      gone.toString)
  }

  test("an empty slice records (0, 0) in the manifest and verifies ok") {
    val d = (0L until 10L).map(i => (i, s"e-$i")).toDF("id", "v")
    val dir = java.nio.file.Files.createTempDirectory("integ_e").toString + "/rel"
    d.write.parquet(s"$dir/shard=0")
    d.limit(0).write.parquet(s"$dir/shard=1")
    Integrity.stamp(spark, dir)
    val m = spark.read.parquet(s"$dir/_integrity").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(m == Map("shard=0" -> 10L, "shard=1" -> 0L), m.toString)
    assert(Integrity.verify(spark, dir).collect()
      .forall(_.getString(1) == "ok"))
  }

  test("tar releases stamp/verify per shard file, payload bytes included") {
    import graft.sources.WebDataset
    val fixture = (0L until 12L)
      .map(i => (i, s"payload-$i-${"y" * i.toInt}"))
      .toDF("doc_id", "text")
      .select(col("doc_id"), col("text").cast("binary").as("t"))
    val dir = java.nio.file.Files.createTempDirectory("integ_t").toString + "/rel"
    WebDataset.writeTar(fixture, dir, shards = 3, keyCol = "doc_id",
      members = Seq("txt" -> "t"))
    Integrity.stampTar(spark, dir)
    assert(Integrity.verifyTar(spark, dir).collect()
      .forall(_.getString(1) == "ok"))
    // Content drift: regenerate shard-00000.tar with one flipped payload
    // (same member count), splice it over the original.
    val alt = java.nio.file.Files.createTempDirectory("integ_t2").toString + "/rel"
    WebDataset.writeTar(
      fixture.withColumn("t",
        when(col("doc_id") === 0, lit("tampered").cast("binary"))
          .otherwise(col("t"))),
      alt, shards = 3, keyCol = "doc_id", members = Seq("txt" -> "t"))
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$alt/shard-00000.tar"),
      java.nio.file.Paths.get(s"$dir/shard-00000.tar"),
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    // Hadoop's LocalFileSystem keeps .crc sidecars; splicing the tar
    // behind its back must also drop the stale checksum (a REAL
    // bit-rot event flips bytes in place and the crc layer may not be
    // present at all on object stores).
    new java.io.File(s"$dir/.shard-00000.tar.crc").delete()
    // Missing + unstamped slices.
    assert(new java.io.File(s"$dir/shard-00001.tar").delete())
    new java.io.File(s"$dir/.shard-00001.tar.crc").delete()
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$alt/shard-00002.tar"),
      java.nio.file.Paths.get(s"$dir/shard-extra.tar"))
    val got = Integrity.verifyTar(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(got == Set(
      ("shard-00000", "content_drift"),
      ("shard-00001", "missing_slice"),
      ("shard-00002", "ok"),
      ("shard-extra", "unstamped_slice")), got.toString)
  }

  test("stamp/verify classifies every drift kind; re-stamp is idempotent") {
    val d = (0L until 40L).map(i => (i, s"t-$i")).toDF("id", "v")
    val dir = java.nio.file.Files.createTempDirectory("integ_v").toString + "/rel"
    d.filter(col("id") < 20).write.parquet(s"$dir/shard=0")
    d.filter(col("id") >= 20).write.parquet(s"$dir/shard=1")
    Integrity.stamp(spark, dir)
    assert(Integrity.verify(spark, dir).collect()
      .forall(_.getString(1) == "ok"))
    // Stage one of each drift.
    d.filter(col("id") < 20).withColumn("v", concat(col("v"), lit("!")))
      .write.mode("overwrite").parquet(s"$dir/shard=0")     // content
    def rmrf(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rmrf)); f.delete(); ()
    }
    rmrf(new java.io.File(s"$dir/shard=1"))                 // missing
    d.filter(col("id") < 3).write.parquet(s"$dir/shard=2")  // unstamped
    val got = Integrity.verify(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(got == Set(
      ("shard=0", "content_drift"),
      ("shard=1", "missing_slice"),
      ("shard=2", "unstamped_slice")), got.toString)
    // Re-stamping accepts the current state as the new baseline.
    Integrity.stamp(spark, dir)
    assert(Integrity.verify(spark, dir).collect()
      .forall(_.getString(1) == "ok"))
    // An unstamped dir refuses verification with the remedy named.
    val fresh = java.nio.file.Files.createTempDirectory("integ_f").toString + "/r"
    d.write.parquet(s"$fresh/shard=0")
    val e = intercept[IllegalArgumentException](
      Integrity.verify(spark, fresh))
    assert(e.getMessage.contains("stamp"), e.getMessage)
  }
}
