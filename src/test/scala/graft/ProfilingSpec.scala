package graft

import org.apache.spark.sql.functions._
import graft.operators.Profiling

/** Sketch-profile correctness: exact stats are exact, approximate stats
  * land within their configured error bounds vs brute force.
  */
class ProfilingSpec extends SparkSpec {

  private lazy val docs =
    graft.sources.Tables.table(spark, "/root/testdata/sf0.001", "documents")

  test("corpusProfile: one row per column, ordered, exact stats match brute force") {
    val prof = Profiling.corpusProfile(docs).collect().map(r => r.getString(0) -> r).toMap
    assert(prof.keySet == docs.columns.toSet)

    val n = docs.count()
    val exactMinChars = docs.agg(min("n_chars")).head.getLong(0)
    val exactMaxChars = docs.agg(max("n_chars")).head.getLong(0)
    val exactMean = docs.agg(avg("n_chars")).head.getDouble(0)

    val nc = prof("n_chars")
    assert(nc.getAs[Long]("n_rows") == n)
    assert(nc.getAs[Long]("n_nulls") == 0L)
    assert(nc.getAs[String]("min_val") == exactMinChars.toString)
    assert(nc.getAs[String]("max_val") == exactMaxChars.toString)
    assert(math.abs(nc.getAs[Double]("mean") - exactMean) < 1e-6)
    assert(nc.getAs[String]("dtype") == "bigint")
  }

  test("corpusProfile: HLL distinct estimates within rsd bound of exact") {
    val prof = Profiling.corpusProfile(docs, rsd = 0.02)
      .collect().map(r => r.getString(0) -> r).toMap
    for (c <- Seq("doc_id", "lang", "source")) {
      val exact = docs.agg(count_distinct(col(c))).head.getLong(0)
      val est = prof(c).getAs[Long]("distinct_est")
      // 5x the configured relative sd is a generous but non-vacuous bound.
      assert(math.abs(est - exact).toDouble / exact <= 0.10,
        s"$c: est=$est exact=$exact")
    }
  }

  test("corpusProfile: numeric quantiles within rank tolerance of exact") {
    val prof = Profiling.corpusProfile(docs, quantiles = Seq(0.5))
      .collect().map(r => r.getString(0) -> r).toMap
    val approxMedian = prof("n_chars").getAs[Seq[Double]]("quantiles").head
    // Exact rank window: the approx median must sit between the 45th and
    // 55th exact percentiles (accuracy 10000 is far tighter than this).
    val bounds = docs.stat.approxQuantile("n_chars", Array(0.45, 0.55), 0.0)
    assert(approxMedian >= bounds(0) && approxMedian <= bounds(1),
      s"median=$approxMedian not in [${bounds(0)}, ${bounds(1)}]")
  }

  test("corpusProfile: string columns profile length; null accounting exact") {
    val s = spark
    import s.implicits._
    val toy = Seq(
      (1L, "ab"), (2L, "abcd"), (3L, null.asInstanceOf[String]), (4L, "abcdef")
    ).toDF("id", "t")
    val prof = Profiling.corpusProfile(toy, quantiles = Seq(0.5))
      .collect().map(r => r.getString(0) -> r).toMap

    val t = prof("t")
    assert(t.getAs[Long]("n_rows") == 4L)
    assert(t.getAs[Long]("n_nulls") == 1L)
    assert(math.abs(t.getAs[Double]("null_frac") - 0.25) < 1e-9)
    assert(t.getAs[String]("min_val") == "ab") // lexicographic, nulls ignored
    assert(math.abs(t.getAs[Double]("mean") - 4.0) < 1e-9) // (2+4+6)/3 lengths
    assert(t.getAs[String]("dtype") == "string")
  }

  test("corpusProfile: column subset and unknown-column fail-fast") {
    val prof = Profiling.corpusProfile(docs, cols = Seq("lang", "source"))
    assert(prof.collect().map(_.getString(0)).toSeq == Seq("lang", "source"))
    val err = intercept[IllegalArgumentException] {
      Profiling.corpusProfile(docs, cols = Seq("nope"))
    }
    assert(err.getMessage.contains("nope"))
  }

  test("profileDiff: ratios near 1.0 on identical snapshots, drift surfaces") {
    val s = spark
    import s.implicits._
    val prof = Profiling.corpusProfile(docs)
    val same = Profiling.profileDiff(prof, prof)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(same.keySet == docs.columns.toSet)
    for ((_, r) <- same) {
      assert(math.abs(r.getAs[Double]("rows_ratio") - 1.0) < 1e-9)
      assert(math.abs(r.getAs[Double]("distinct_ratio") - 1.0) < 1e-9)
    }

    // Drop half the rows and null-out a column: the drift must show up.
    val drifted = docs.filter(col("doc_id") % 2 === 0)
      .withColumn("lang", when(col("doc_id") % 4 =!= 0, col("lang"))) // ~half of retained rows → null
    val diff = Profiling.profileDiff(prof, Profiling.corpusProfile(drifted))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(diff("doc_id").getAs[Double]("rows_ratio") < 0.7)
    assert(diff("lang").getAs[Double]("null_frac_new") > 0.3) // was 0.0 in the old snapshot
    // A column on one side only still surfaces (full-outer).
    val extra = Profiling.corpusProfile(docs.withColumn("extra", lit(1)))
    val withExtra = Profiling.profileDiff(prof, extra)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(withExtra.contains("extra") && withExtra("extra").getAs[String]("dtype_old") == null)
  }

  test("flattenQuantiles: scalar q-columns equal the array entries, labels from probs") {
    val prof = Profiling.corpusProfile(docs, quantiles = Seq(0.25, 0.5, 0.75))
    val flat = Profiling.flattenQuantiles(prof)
    assert(flat.columns.toSeq ==
      prof.columns.filterNot(_ == "quantiles").toSeq ++ Seq("q25", "q50", "q75"))
    val byCol = prof.collect().map(r => r.getString(0) -> r).toMap
    flat.collect().foreach { r =>
      val arr = Option(byCol(r.getString(0)).getAs[scala.collection.Seq[Double]]("quantiles"))
      assert(r.getAs[Any]("q50") == arr.map(_(1)).orNull)
    }
    // Arbitrary probabilities label cleanly: 0.995 → q99_5.
    val odd = Profiling.flattenQuantiles(
      Profiling.corpusProfile(docs, quantiles = Seq(0.01, 0.995)), Seq(0.01, 0.995))
    assert(odd.columns.takeRight(2).toSeq == Seq("q1", "q99_5"))
  }

  test("corpusProfile: unorderable/unhashable columns degrade, never throw") {
    val s = spark
    import s.implicits._
    val withMap = Seq((1L, Map("a" -> 1)), (2L, Map("b" -> 2)), (3L, null))
      .toDF("id", "m")
    val prof = Profiling.corpusProfile(withMap)
      .collect().map(r => r.getString(0) -> r).toMap
    val m = prof("m")
    // Maps are neither orderable nor hashable in Spark: min/max and the
    // HLL estimate degrade to null; counts and null accounting stay exact.
    assert(m.getAs[Long]("n_rows") == 3L && m.getAs[Long]("n_nulls") == 1L)
    assert(m.getAs[Any]("min_val") == null && m.getAs[Any]("max_val") == null)
    assert(m.getAs[Any]("distinct_est") == null && m.getAs[Any]("mean") == null)
    // id still profiles fully alongside.
    assert(prof("id").getAs[String]("max_val") == "3")
  }

  test("corpusProfile: single aggregate — no row-level shuffle in the plan") {
    val plan = Profiling.corpusProfile(docs).queryExecution.executedPlan.toString
    // One partial + one final aggregate pair; a single exchange moving
    // only per-partition sketch state (single-partition final combine).
    val exchanges = "Exchange".r.findAllIn(plan).length -
      "ReusedExchange".r.findAllIn(plan).length
    assert(exchanges <= 2, s"expected sketch-combine exchanges only, got $exchanges:\n$plan")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("CartesianProduct"))
  }
}
