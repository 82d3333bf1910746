package graft

import org.apache.spark.sql.SparkSession

import graft.harness.QueryCatalog

/** Benchmark main: times the headline queries on SPARK_GRAFT_SF_DIR and
  * prints one JSON line for the driver.
  *
  * Queries are forced with the `noop` sink (full materialization of every
  * column); a bare `count()` would let Spark prune projections and
  * under-report the work.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.sources.Tables
      .configure(
        SparkSession.builder()
          .master(s"local[$cpus]")
          .config("spark.sql.shuffle.partitions", cpus)
          .config("spark.ui.enabled", "false")
          .config("spark.sql.adaptive.enabled", "true"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val names = QueryCatalog.benchNames
    val fns = QueryCatalog.queries

    // Warm-up: JIT + file listing across the widest code path (the
    // flagship exercises scans, collapse, windows, joins, checkpoints).
    // A warm-up failure is a loud signal the flagship itself is broken —
    // surface the stack instead of letting the timed run print -1 mutely.
    try fns("aces_flagship")(spark, sfDir).write.format("noop").mode("overwrite").save()
    catch { case e: Throwable =>
      System.err.println(s"[bench] WARM-UP FAILED — flagship is broken: $e")
      e.printStackTrace()
    }

    // Noise evidence: this box is shared, and two consecutive driver
    // rounds recorded contended numbers that misrepresented the build.
    // Stamp the artifact with the 1-minute system loadavg before and
    // after the timed runs, plus each query's best-of-N spread — any
    // reader can self-adjudicate a suspicious total (loadavg >> core
    // count or spreads of tens of percent = contention, not regression).
    def loadavg(): Double =
      java.lang.management.ManagementFactory.getOperatingSystemMXBean.getSystemLoadAverage
    val loadStart = loadavg()

    // Best of 2 runs per query, ESCALATING to best of 3 under contention:
    // the minimum is the standard noise-robust estimator and every run is
    // a full end-to-end execution (no cross-run caches — Query releases
    // its own), but two contended runs can both be slow (BENCH_r07
    // recorded 6-12x phantom regressions at loadavg 10+). So when this
    // query STARTED on a loaded box (loadavg > cores/4) or its two runs
    // disagree badly (spread > 1.0), take a third sample — one more
    // chance for a quiet window the minimum can latch onto. All raw runs
    // are emitted (`raw_runs`) so any reader can re-adjudicate. A query
    // that failed ANY run reports -1: a flaky query must not produce a
    // clean-looking timing.
    val escalateLoad = cpus.toDouble / 4
    val warmupSet = QueryCatalog.warmupNames.toSet
    val results = names.map { name =>
      def once(): Double =
        try {
          val t0 = System.nanoTime()
          fns(name)(spark, sfDir).write.format("noop").mode("overwrite").save()
          (System.nanoTime() - t0) / 1e9
        } catch { case e: Throwable => System.err.println(s"[bench] $name: $e"); -1.0 }
      // Fit-heavy entries get ONE untimed warm-up: first-execution JIT of
      // the iterative fit loop (and index/model persistence for the _idx
      // serving entries) otherwise leaks into the timed best-of-N — r8's
      // ivfpq raw runs [52.7, 12.2, 6.1] are warm-up decay, not work.
      if (warmupSet(name)) once()
      val loadAtStart = loadavg()
      val two = Seq(once(), once())
      val spread2 =
        if (two.exists(_ < 0)) 0.0 else (two.max - two.min) / math.max(two.min, 1e-9)
      val contended = loadAtStart > escalateLoad || spread2 > 1.0
      val runs = if (contended && two.forall(_ >= 0)) two :+ once() else two
      if (contended)
        System.err.println(
          f"[bench] $name: contention escalation (loadavg $loadAtStart%.1f, spread $spread2%.2f) -> best of ${runs.length}")
      (name, if (runs.exists(_ < 0)) -1.0 else runs.min, runs)
    }
    val loadEnd = loadavg()
    val failed = results.collect { case (k, v, _) if v < 0 => k }
    val qs = results
      .map { case (k, v, _) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    // Per-query spread of the N runs around the reported minimum,
    // (max-min)/min — the per-query noise the minimum filtered out.
    val spreads = results
      .map { case (k, v, runs) =>
        val s = if (v <= 0) -1.0 else (runs.max - runs.min) / runs.min
        "\"" + k + "\":" + f"$s%.3f"
      }
      .mkString("{", ",", "}")
    // Every raw sample, so a suspicious minimum can be re-adjudicated
    // from the artifact alone (no re-run needed).
    val rawRuns = results
      .map { case (k, _, runs) =>
        "\"" + k + "\":" + runs.map(r => f"$r%.3f").mkString("[", ",", "]")
      }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val json =
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"sf":"$sfDir","failed":$failedJson,""" +
        f""""loadavg_start":$loadStart%.2f,"loadavg_end":$loadEnd%.2f,"run_spread":$spreads,"raw_runs":$rawRuns,""" +
        f""""noise_note":"shared box; best-of-2, escalated to best-of-3 when loadavg > cores/4 or spread > 1.0; distrust totals when loadavg >> ${cpus} cores or spreads exceed ~0.3"}"""
    // The driver scrapes the sbt log tail (r01–r03 artifacts all recorded
    // "parsed": null). Maximize its odds: quiesce the logger first, emit
    // the line on BOTH streams (sbt tags forked stdout [info] and stderr
    // [error] — we can't know which the scraper strips), and repeat it
    // after spark.stop() so the tail ENDS with the JSON whatever WARN
    // lines earlier queries produced. BENCH_LOCAL.json stays the exact
    // machine-readable copy.
    spark.sparkContext.setLogLevel("ERROR")
    println(json)
    System.out.flush()
    System.err.println(json)
    System.err.flush()
    val out = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH_LOCAL.json")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(out), (json + "\n").getBytes("UTF-8"))
    spark.stop()
    println(json)
    System.out.flush()
    if (failed.nonEmpty) {
      System.err.println(s"[bench] FAILED queries: ${failed.mkString(", ")}")
      sys.exit(1)
    }
  }
}
