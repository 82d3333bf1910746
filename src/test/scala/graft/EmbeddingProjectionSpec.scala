package graft

import org.apache.spark.sql.functions._

import graft.operators.EmbeddingProjection
import graft.operators.EmbeddingProjection.PcaModel

class EmbeddingProjectionSpec extends SparkSpec {

  import spark.implicits._

  private lazy val emb = graft.sources.Tables
    .table(spark, "/root/testdata/sf0.001", "embeddings")

  test("recovers a planted principal direction in closed form") {
    // Points on the line t * (3,4)/5 plus tiny orthogonal jitter: the
    // first component must be ±(0.6, 0.8) and capture ~all variance.
    val rnd = new scala.util.Random(7)
    val rows = (0 until 400).map { i =>
      val t = rnd.nextGaussian() * 10
      val j = rnd.nextGaussian() * 0.01
      (i.toLong, Seq((0.6 * t - 0.8 * j).toFloat, (0.8 * t + 0.6 * j).toFloat))
    }
    val df = rows.toDF("vec_id", "embedding")
    val m = EmbeddingProjection.fitPca(df, k = 2)
    assert(math.abs(math.abs(m.components(0)(0)) - 0.6) < 1e-3)
    assert(math.abs(math.abs(m.components(0)(1)) - 0.8) < 1e-3)
    assert(m.explained(0) > 0.999)
    assert(m.eigenvalues(0) > m.eigenvalues(1))
    // Canonical sign: largest-|entry| coordinate is positive.
    assert(m.components(0)(1) > 0)
  }

  test("components are orthonormal with descending eigenvalues") {
    val m = EmbeddingProjection.fitPca(emb, k = 8)
    for (i <- 0 until 8; j <- i until 8) {
      val dot = m.components(i).zip(m.components(j)).map { case (a, b) => a * b }.sum
      val want = if (i == j) 1.0 else 0.0
      assert(math.abs(dot - want) < 1e-9, s"<c$i, c$j> = $dot")
    }
    assert(m.eigenvalues.zip(m.eigenvalues.tail).forall { case (a, b) => a >= b })
    assert(m.explained.sum <= 1.0 + 1e-12)
    assert(m.totalVariance > 0)
  }

  test("k = d projection preserves total variance (rotation only)") {
    val small = emb.select(col("vec_id"), slice(col("embedding"), 1, 6).as("embedding"))
    val m = EmbeddingProjection.fitPca(small, k = 6)
    val proj = EmbeddingProjection.projectPca(small, m, roundDigits = 9)
    val r = proj.select(explode(col("proj")).as("x"))
      .agg(sum(col("x") * col("x")).as("ss"), count(lit(1)).as("n")).head()
    val ss = r.getDouble(0)
    val nRows = r.getLong(1).toDouble / 6 // n counts exploded coords
    // Projections are centered (mean removed), so Σ‖p‖²/N = Σλ = trace:
    // a full-rank PCA is a rotation and preserves total variance.
    val trace = m.eigenvalues.sum
    assert(math.abs(ss / nRows - trace) / trace < 1e-6,
      s"projected variance ${ss / nRows} vs trace $trace")
  }

  test("save/load round-trips the model and projections exactly") {
    val m = EmbeddingProjection.fitPca(emb, k = 4)
    val dir = java.nio.file.Files.createTempDirectory("pca").toString
    m.save(spark, s"$dir/model")
    val loaded = PcaModel.load(spark, s"$dir/model")
    assert(loaded.mean.sameElements(m.mean))
    assert(loaded.eigenvalues.sameElements(m.eigenvalues))
    assert(loaded.components.zip(m.components).forall { case (a, b) => a.sameElements(b) })
    assert(loaded.totalVariance == m.totalVariance)
    val a = snap(EmbeddingProjection.projectPca(emb, m))
    val b = snap(EmbeddingProjection.projectPca(emb, loaded))
    assert(a == b)
  }

  test("projection is stable under repartitioning at 6-decimal rounding") {
    val m1 = EmbeddingProjection.fitPca(emb, k = 4)
    val m7 = EmbeddingProjection.fitPca(emb.repartition(7), k = 4)
    val p1 = EmbeddingProjection.projectPca(emb, m1).orderBy("vec_id")
    val p7 = EmbeddingProjection.projectPca(emb, m7).orderBy("vec_id")
    val diffs = p1.select(col("vec_id"), col("proj").as("a"))
      .join(p7.select(col("vec_id"), col("proj").as("b")), Seq("vec_id"))
      .select(aggregate(zip_with(col("a"), col("b"), (x, y) => abs(x - y)),
        lit(0.0d), (acc, x) => greatest(acc, x)).as("md"))
      .agg(max("md")).head().getDouble(0)
    assert(diffs < 1e-5, s"max projection drift across partitionings: $diffs")
  }

  test("full-rank rotation preserves cosine top-k exactly and compacts energy") {
    val m = EmbeddingProjection.fitPca(emb, k = 64)
    val rot = EmbeddingProjection.rotateToBasis(emb, m)
    def pairs(df: org.apache.spark.sql.DataFrame) =
      graft.operators.Similarity.bruteForceTopK(df, df, k = 5)
        .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    assert(pairs(rot) == pairs(emb), "rotation must not change cosine neighbors")
    // Energy compaction: per-coordinate variance must be (weakly)
    // front-loaded — first coordinate's variance is the largest
    // eigenvalue, far above the mean coordinate's.
    val firstVar = rot.select(element_at(col("embedding"), 1).cast("double").as("x"))
      .agg(variance(col("x"))).head().getDouble(0)
    assert(firstVar > m.totalVariance / 64,
      s"first rotated coordinate variance $firstVar should exceed the per-dim mean ${m.totalVariance / 64}")
    // k < d is rejected (not a rotation).
    intercept[IllegalArgumentException](
      EmbeddingProjection.rotateToBasis(emb, EmbeddingProjection.fitPca(emb, k = 8)))
  }

  test("projection plan is map-side only (no exchange)") {
    val m = EmbeddingProjection.fitPca(emb, k = 4)
    val plan = EmbeddingProjection.projectPca(emb, m)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"projection must not shuffle:\n${plan.take(800)}")
  }

  test("guards: ragged dims, empty corpus, oversized d, bad k") {
    intercept[IllegalArgumentException](
      EmbeddingProjection.fitPca(emb, k = 0))
    intercept[IllegalArgumentException](
      EmbeddingProjection.fitPca(emb.filter(lit(false)), k = 2))
    val wide = emb.select(col("vec_id"),
      flatten(array_repeat(col("embedding"), 9)).as("embedding"))
    intercept[IllegalArgumentException](EmbeddingProjection.fitPca(wide, k = 2))
  }
}
