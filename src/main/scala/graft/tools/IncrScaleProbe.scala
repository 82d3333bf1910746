package graft.tools

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.config.CurationConfig
import graft.operators.CurationPipeline
import graft.sources.Tables

/** Shard-ingest scaling probe: the cost of curating ONE fixed-size crawl
  * shard ([[CurationPipeline.applyShard]] — url_dedup → dedup_lines →
  * dedup_exact against the persisted indexes) as the STANDING CORPUS
  * behind the state grows 1×/k×/K×, versus full batch recuration of
  * (corpus ∪ shard) — the measurement behind the "corpus never
  * recurated" claim. Ingest should scale with the shard plus thin index
  * joins (index rows are ~tens of bytes per line/url/hash, never
  * re-tokenized corpus text); recuration re-pays the whole corpus.
  *
  * Corpus replicas are SALTED per copy (the TextScaleProbe discipline)
  * so dup fractions stay constant as the corpus grows; the probe shard
  * is half exact re-crawls of copy-0 docs (must be dropped via the
  * standing indexes alone) and half fresh docs (must survive).
  *
  * Run: `sbt "runMain graft.tools.IncrScaleProbe [sfDir] [k] [K]
  * [firstwins|ngram|near|media]"`; results are committed to BENCH_NOTES.md.
  */
object IncrScaleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val midCopies = args.lift(1).map(_.toInt).getOrElse(8)
    val bigCopies = args.lift(2).map(_.toInt).getOrElse(32)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Tables
      .configure(
        SparkSession.builder()
          .master(s"local[$cpus]")
          .config("spark.sql.shuffle.partitions", cpus)
          .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val base = Tables.table(spark, sfDir, "documents").select("doc_id", "text")
    val idStride = base.agg(max(col("doc_id"))).head().getLong(0) + 1L

    // Lined + url-decorated corpus: the shared header exercises the
    // corpus-wide hot line, per-copy salting keeps dup fractions
    // constant, urls collide only within a copy (~1/60 of rows).
    // `urlId` derives the url residues: for re-crawls it is the ORIGINAL
    // doc id, so the url matches copy 0's byte-for-byte and the standing
    // url index fires.
    def decorate(df: DataFrame, copyTag: Column, urlId: Column): DataFrame = df
      .withColumn("text", concat_ws("\n",
        lit("shared boilerplate header line padded"),
        col("text"),
        substring(col("text"), 41, 40)))
      .withColumn("url", concat(
        lit("HTTPS://WWW.c"), copyTag,
        lit("-s"), urlId % 97, lit(".co.uk/Page"), urlId % 23,
        lit("?b=2&a=1")))
    def corpus(k: Int): DataFrame = decorate(
      (0 until k).map { i =>
        val salted =
          if (i == 0) col("text")
          else regexp_replace(col("text"), "\\S+", "$0_" + i)
        base.select((col("doc_id") + lit(i * idStride)).as("doc_id"), salted.as("text"))
      }.reduce(_ unionByName _),
      (col("doc_id") / idStride).cast("long"), col("doc_id")).cache()

    // Optional 4th arg picks the pipeline: `firstwins` (default — the
    // §17 measurement), `ngram` (url_dedup → trigram-Jaccard PPJoin
    // through the persisted shingle index — the near-dup ingest path,
    // whose corpus-sized input is thin (doc_id, shingle) index rows
    // with union-level df/size recompute, never re-shingled text), or
    // `near` (url_dedup → MinHash LSH through the persisted signature
    // index — the §22 measurement behind the shard-restricted banding).
    val pipeName = args.lift(3).getOrElse("firstwins")
    val pipeline = CurationConfig.fromYaml(pipeName match {
      case "ngram" =>
        """steps:
          |  - url_dedup: {}
          |  - dedup_ngram: { threshold: 0.8, shingle_n: 3 }
          |""".stripMargin
      case "near" =>
        """steps:
          |  - url_dedup: {}
          |  - dedup_minhash: { threshold: 0.5 }
          |""".stripMargin
      case "media" => // handled by the media branch below; parse-valid placeholder
        "steps:\n  - dedup_phash: { max_hamming: 2 }\n"
      case "firstwins" =>
        """steps:
          |  - url_dedup: {}
          |  - dedup_lines: { min_chars: 10 }
          |  - dedup_exact: {}
          |""".stripMargin
      // A silent fallback would label first-wins timings with the typo'd
      // name — mislabeled benchmark evidence is worse than a crash.
      case other => sys.error(
        s"unknown pipeline '$other' (expected firstwins, ngram, near, or media)")
    })

    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def loadavg(): Double =
      java.lang.management.ManagementFactory.getOperatingSystemMXBean.getSystemLoadAverage

    // `media` mode swaps the text corpus for synthetic BMP clips and the
    // pipeline for the perceptual step — the applyShard-level face of
    // the SigScaleProbe core measurement (state persist + prior-index
    // read included). Re-crawls repeat copy-0 PAYLOADS under fresh ids
    // (the signature index alone must drop them); fresh docs get their
    // own ids' bitmaps (family structure makes some of them near-dups of
    // each other — fine, `kept` is printed, not asserted).
    if (pipeName == "media") {
      val mediaPipeline = CurationConfig.fromYaml(
        "steps:\n  - dedup_phash: { max_hamming: 2 }\n")
      def mediaCorpus(k: Int): DataFrame = graft.plans.Materialize(
        graft.harness.MediaFixtures.syntheticBitmaps(
          (0 until k).map(i => base.select((col("doc_id") + lit(i * idStride)).as("doc_id")))
            .reduce(_ unionByName _).repartition(32, col("doc_id")))
          .withColumnRenamed("media_id", "doc_id")
          .withColumn("text", lit(""))) // the step never reads it
      Seq(1 -> "x1", midCopies -> s"x$midCopies", bigCopies -> s"x$bigCopies")
        .foreach { case (k, label) =>
          val c = mediaCorpus(k).cache()
          val n = c.count()
          val state = java.nio.file.Files.createTempDirectory(s"incrprobe_m_$label").toString
          val tBoot = time {
            CurationPipeline.applyShard(c, mediaPipeline, state, "0")
              .write.format("noop").mode("overwrite").save()
          }
          val shift = bigCopies * 2L * idStride
          val recrawl = graft.harness.MediaFixtures.syntheticBitmaps(
              base.filter(col("doc_id") % 2 === 0).select(col("doc_id"))
                .repartition(32, col("doc_id")))
            .select((col("media_id") + lit(shift)).as("doc_id"), col("payload"))
          val fresh = graft.harness.MediaFixtures.syntheticBitmaps(
              base.filter(col("doc_id") % 2 === 1)
                .select((col("doc_id") + lit(shift + idStride)).as("doc_id"))
                .repartition(32, col("doc_id")))
            .withColumnRenamed("media_id", "doc_id")
          val shard = graft.plans.Materialize(
            recrawl.unionByName(fresh).withColumn("text", lit("")))
          val sn = shard.count()
          val la0 = loadavg()
          val tIngest = time {
            CurationPipeline.applyShard(shard, mediaPipeline, state, "1")
              .write.format("noop").mode("overwrite").save()
          }
          val tRecurate = time {
            CurationPipeline.apply(c.unionByName(shard), mediaPipeline)
              .write.format("noop").mode("overwrite").save()
          }
          val kept = CurationPipeline.applyShard(shard, mediaPipeline, state, "1").count()
          println(f"[incr-scale] $pipeName%-9s $label%-4s corpus=$n%8d shard=$sn%6d kept=$kept%5d " +
            f"bootstrap=$tBoot%7.2fs ingest=$tIngest%6.2fs recurate=$tRecurate%7.2fs " +
            f"loadavg=$la0%.2f")
          c.unpersist()
        }
      spark.stop()
      return
    }

    Seq(1 -> "x1", midCopies -> s"x$midCopies", bigCopies -> s"x$bigCopies")
      .foreach { case (k, label) =>
        val c = corpus(k)
        val n = c.count()
        val state = java.nio.file.Files.createTempDirectory(s"incrprobe_$label").toString
        // Bootstrap: the whole standing corpus ingested once as shard 0
        // (this IS a full curation — the one-time cost).
        val tBoot = time {
          CurationPipeline.applyShard(c, pipeline, state, "0")
            .write.format("noop").mode("overwrite").save()
        }
        // The probe shard: half exact re-crawls of copy-0 docs (same
        // text AND url — every standing index must fire), half fresh
        // (unique urls, salted text — must survive every index).
        val shift = bigCopies * 2L * idStride
        val recrawl = base.filter(col("doc_id") % 2 === 0)
          .select((col("doc_id") + lit(shift)).as("doc_id"), col("text"))
        val fresh = base.filter(col("doc_id") % 2 === 1)
          .select((col("doc_id") + lit(shift + idStride)).as("doc_id"),
            regexp_replace(col("text"), "\\S+", "$0_sh").as("text"))
        val shard = decorate(recrawl, lit(0L), col("doc_id") - lit(shift))
          .unionByName(
            decorate(fresh, lit(bigCopies * 2L + 1L), col("doc_id"))
              // fully-unique fresh urls: the 'must survive' half must not
              // self-collide on (mod 97, mod 23) residue pairs.
              .withColumn("url",
                concat(lit("https://fresh.example/p"), col("doc_id"))))
          .cache()
        val sn = shard.count()
        val la0 = loadavg()
        val tIngest = time {
          CurationPipeline.applyShard(shard, pipeline, state, "1")
            .write.format("noop").mode("overwrite").save()
        }
        val tRecurate = time {
          CurationPipeline.apply(c.unionByName(shard), pipeline)
            .write.format("noop").mode("overwrite").save()
        }
        // Workload sanity: the re-crawled half must drop via the standing
        // indexes alone, the fresh half must survive (idempotent re-run
        // of the same shard label — state unchanged).
        val kept = CurationPipeline.applyShard(shard, pipeline, state, "1").count()
        println(f"[incr-scale] $pipeName%-9s $label%-4s corpus=$n%8d shard=$sn%6d kept=$kept%5d " +
          f"bootstrap=$tBoot%7.2fs ingest=$tIngest%6.2fs recurate=$tRecurate%7.2fs " +
          f"loadavg=$la0%.2f")
        c.unpersist(); shard.unpersist()
      }
    spark.stop()
  }
}
