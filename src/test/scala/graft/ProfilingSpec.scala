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
    // Mismatched probs fail loudly instead of emitting null/mislabeled
    // scalar columns (getItem past the end would silently return null).
    val ex = intercept[Exception] {
      Profiling.flattenQuantiles(prof, Seq(0.25, 0.5, 0.75, 0.99)).collect()
    }
    assert(ex.getMessage.contains("flattenQuantiles") ||
      Option(ex.getCause).exists(_.getMessage.contains("flattenQuantiles")))
  }

  test("mergeShardProfiles rejects shards profiled under drifted dtypes") {
    val s = spark
    import s.implicits._
    val a = Profiling.shardProfile(Seq((1, "x")).toDF("n", "t"))
    val b = Profiling.shardProfile(Seq((2L, "y")).toDF("n", "t")) // n: int → bigint
    val ex = intercept[Exception] {
      Profiling.mergeShardProfiles(a.unionByName(b)).collect()
    }
    def msg(t: Throwable): String =
      Option(t.getMessage).getOrElse("") +
        Option(t.getCause).map(c => Option(c.getMessage).getOrElse("")).getOrElse("")
    assert(msg(ex).contains("mixed dtypes"))
    // Same dtype on both sides still merges fine.
    val c = Profiling.shardProfile(Seq((3, "z")).toDF("n", "t"))
    val ok = Profiling.profileFromShards(Profiling.mergeShardProfiles(a.unionByName(c)))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(ok("n").getAs[Long]("n_rows") == 2L)
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

  test("shardProfile merge: shard-fold equals one-shot on every statistic") {
    val a = docs.filter(col("doc_id") % 3 === 0)
    val b = docs.filter(col("doc_id") % 3 === 1)
    val c = docs.filter(col("doc_id") % 3 === 2)
    val folded = Profiling.profileFromShards(Profiling.mergeShardProfiles(
      Profiling.shardProfile(a)
        .unionByName(Profiling.shardProfile(b))
        .unionByName(Profiling.shardProfile(c))))
    val oneShot = Profiling.profileFromShards(Profiling.mergeShardProfiles(
      Profiling.shardProfile(docs)))
    // Exact statistics must be identical regardless of fold shape; the
    // HLL estimate may differ slightly (HIP estimator on an un-merged
    // sketch vs composite after union) — within the sketch's bound.
    assert(snap(folded.drop("distinct_est")) == snap(oneShot.drop("distinct_est")),
      "sufficient-statistic algebra must be fold-order-free")
    val dFold = folded.collect().map(r => r.getString(0) -> r.getAs[Long]("distinct_est")).toMap
    val dOne = oneShot.collect().map(r => r.getString(0) -> r.getAs[Long]("distinct_est")).toMap
    for ((c, e) <- dOne)
      assert(math.abs(dFold(c) - e).toDouble / math.max(e, 1L) <= 0.05, s"$c: ${dFold(c)} vs $e")
    // Associativity of the union itself: ((a+b)+c) equals (a+b+c) —
    // merged registers are merge-shape-free, estimates included.
    val left = Profiling.mergeShardProfiles(
      Profiling.mergeShardProfiles(
        Profiling.shardProfile(a).unionByName(Profiling.shardProfile(b)))
        .unionByName(Profiling.shardProfile(c)))
    assert(snap(Profiling.profileFromShards(left)) == snap(folded))
  }

  test("shardProfile estimates agree with corpusProfile exact stats; HLL within bound") {
    val view = Profiling.profileFromShards(Profiling.mergeShardProfiles(
      Profiling.shardProfile(docs)))
      .collect().map(r => r.getString(0) -> r).toMap
    val exactP = Profiling.flattenQuantiles(Profiling.corpusProfile(docs))
      .collect().map(r => r.getString(0) -> r).toMap
    for (c <- docs.columns) {
      val (s, e) = (view(c), exactP(c))
      assert(s.getAs[Long]("n_rows") == e.getAs[Long]("n_rows"))
      assert(s.getAs[Long]("n_nulls") == e.getAs[Long]("n_nulls"))
      assert(s.getAs[String]("min_val") == e.getAs[String]("min_val"))
      assert(s.getAs[String]("max_val") == e.getAs[String]("max_val"))
      if (e.getAs[Any]("mean") != null)
        assert(math.abs(s.getAs[Double]("mean") - e.getAs[Double]("mean")) <= 1e-4)
      // Different sketch families (DataSketches HLL vs HLL++): agree
      // within a generous-but-real bound of the exact count.
      val exact = docs.agg(count_distinct(col(c))).head.getLong(0)
      val est = s.getAs[Long]("distinct_est")
      assert(math.abs(est - exact).toDouble / exact <= 0.1, s"$c: est=$est exact=$exact")
    }
    // Numeric min/max merged by VALUE, not lexicographically: a corpus
    // spanning 9..10 must not report min "10".
    val s = spark
    import s.implicits._
    val toy = Seq(9L, 10L, 1000L).toDF("x")
    val m = Profiling.profileFromShards(Profiling.mergeShardProfiles(
      Profiling.shardProfile(toy.filter(col("x") === 9L))
        .unionByName(Profiling.shardProfile(toy.filter(col("x") =!= 9L)))))
      .head()
    assert(m.getAs[String]("min_val") == "9" && m.getAs[String]("max_val") == "1000")
  }

  test("logQuantileSketch: merge-exact, estimates within relative error alpha") {
    val alpha = 0.01
    val a = docs.filter(col("doc_id") % 2 === 0)
    val b = docs.filter(col("doc_id") % 2 === 1)
    val merged = Profiling.mergeLogSketches(
      Profiling.logQuantileSketch(a, alpha = alpha)
        .unionByName(Profiling.logQuantileSketch(b, alpha = alpha)))
    val oneShot = Profiling.logQuantileSketch(docs, alpha = alpha)
    assert(snap(merged) == snap(oneShot), "bucket-count merge must be exact")

    val probs = Seq(0.1, 0.5, 0.9)
    val ests = Profiling.quantilesFromLogSketch(oneShot, probs, alpha)
      .collect().map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(2)).toMap
    val xs = docs.select("n_chars").collect().map(_.getLong(0).toDouble).sorted
    for (p <- probs) {
      // Exact order statistic at the SAME rank rule the sketch uses
      // (first index whose 1-based rank exceeds p·(n−1)).
      val exact = xs(xs.indices.find(i => (i + 1) > p * (xs.length - 1)).get)
      val est = ests(("n_chars", p))
      assert(math.abs(est - exact) / exact <= alpha + 1e-6,
        s"q$p: est=$est exact=$exact exceeds relative error $alpha")
    }
    // Signed + sub-1 magnitudes route through (sign, index) correctly.
    val s = spark
    import s.implicits._
    val signed = (Seq.fill(100)(-50.0) ++ Seq.fill(100)(0.04) ++ Seq.fill(100)(2000.0))
      .toDF("x")
    val sk = Profiling.logQuantileSketch(signed, alpha = alpha)
    val q = Profiling.quantilesFromLogSketch(sk, Seq(0.1, 0.5, 0.9), alpha)
      .collect().map(r => r.getDouble(1) -> r.getDouble(2)).toMap
    assert(math.abs(q(0.1) - (-50.0)) / 50.0 <= alpha)
    assert(math.abs(q(0.5) - 0.04) / 0.04 <= alpha)
    assert(math.abs(q(0.9) - 2000.0) / 2000.0 <= alpha)
  }

  test("empty inputs: profiles and sketches return sane zero-state, never throw") {
    val empty = docs.filter(col("doc_id") < 0)
    val p = Profiling.corpusProfile(empty).collect().map(r => r.getString(0) -> r).toMap
    assert(p.size == docs.columns.length)
    assert(p("doc_id").getAs[Long]("n_rows") == 0L)
    assert(p("doc_id").getAs[Any]("min_val") == null)
    val sp = Profiling.profileFromShards(Profiling.mergeShardProfiles(
      Profiling.shardProfile(empty))).collect().map(r => r.getString(0) -> r).toMap
    assert(sp("doc_id").getAs[Long]("n_rows") == 0L)
    assert(sp("doc_id").getAs[Long]("distinct_est") == 0L)
    // Empty shard merged into a real one is a no-op.
    val withEmpty = Profiling.profileFromShards(Profiling.mergeShardProfiles(
      Profiling.shardProfile(docs).unionByName(Profiling.shardProfile(empty))))
    val alone = Profiling.profileFromShards(Profiling.mergeShardProfiles(
      Profiling.shardProfile(docs)))
    assert(snap(withEmpty) == snap(alone))
    // Quantile sketch of nothing: zero rows, and the estimator returns
    // zero rows rather than dividing by an absent n.
    val sk = Profiling.logQuantileSketch(empty)
    assert(sk.count() == 0)
    assert(Profiling.quantilesFromLogSketch(sk).count() == 0)
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
