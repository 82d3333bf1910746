package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.VectorExpressions

/** Distributed PCA for embedding columns — the dimensionality-reduction
  * pass large embedding corpora run before indexing (compress 768-dim
  * to 64/128-dim before IVF/PQ; whiten before SemDeDup-style clustering).
  *
  * Scale shape (the textbook one-pass moment reduction): each partition
  * accumulates `(n, Σv, Σvvᵀ)` locally — `1 + d + d(d+1)/2` doubles per
  * PARTITION, independent of row count — and the per-partition rows
  * reduce to one; the covariance eigendecomposition then runs on the
  * driver on a d×d matrix (cyclic Jacobi, deterministic), which is the
  * right split because d is bounded (≤512 enforced) while N is not.
  * The corpus is touched exactly once at fit and never exchanged; the
  * projection is a map-side pass against literal (broadcast) components:
  * `proj_j = dot(v, comp_j) - dot(mean, comp_j)`, with the second term a
  * plan-time constant and the first the codegen'd
  * [[VectorExpressions.dot]] — no UDF, no shuffle, no driver loop over
  * rows.
  *
  * Determinism: partition-order-independent fit (the moment reduce is
  * exact-commutative only up to FP rounding, so the moments reduce is
  * performed in ASCENDING partition-id order on the driver — ≤ one thin
  * row per partition); eigenvector signs are canonicalized (largest-|x|
  * entry positive). Same input ⇒ bit-identical model and projections,
  * which is what lets `embedding_pca` carry a committed golden fixture.
  */
object EmbeddingProjection {

  /** A fitted PCA basis: `mean` (d), `eigenvalues` (k, descending) and
    * `components` (k rows × d), orthonormal. Persistable via [[save]] /
    * [[load]] — fit once per corpus, project any stream of shards.
    */
  final case class PcaModel(
      mean: Array[Double],
      eigenvalues: Array[Double],
      components: Array[Array[Double]],
      totalVariance: Double) {

    /** Fraction of total variance captured by each kept component. */
    def explained: Array[Double] =
      if (totalVariance <= 0) eigenvalues.map(_ => 0.0)
      else eigenvalues.map(_ / totalVariance)

    /** Persist as one parquet frame: component rows `(comp_id >= 0,
      * eigenvalue, vec)` + the mean as `comp_id = -1` (eigenvalue =
      * total variance).
      */
    def save(spark: SparkSession, path: String): Unit =
      toFrame(spark).write.mode("overwrite").parquet(path)

    def toFrame(spark: SparkSession): DataFrame = {
      import spark.implicits._
      val compRows = components.indices.map(i =>
        (i, eigenvalues(i), components(i).toSeq))
      (compRows :+ ((-1, totalVariance, mean.toSeq)))
        .toDF("comp_id", "eigenvalue", "vec")
    }
  }

  object PcaModel {
    def load(spark: SparkSession, path: String): PcaModel =
      fromFrame(spark.read.parquet(path))

    def fromFrame(df: DataFrame): PcaModel = {
      val rows = df.select("comp_id", "eigenvalue", "vec").collect()
        .map(r => (r.getInt(0), r.getDouble(1), r.getSeq[Double](2).toArray))
        .sortBy(_._1)
      val (meanRows, compRows) = rows.partition(_._1 < 0)
      require(meanRows.length == 1, "PCA model frame needs exactly one comp_id=-1 mean row")
      PcaModel(
        meanRows.head._3,
        compRows.map(_._2),
        compRows.map(_._3),
        meanRows.head._2)
    }
  }

  /** Fit the top-`k` principal components of `vecCol`. One corpus pass
    * (see class doc); `d` must be ≤512 (the driver solve is O(d³)).
    */
  def fitPca(
      vectors: DataFrame,
      k: Int,
      idCol: String = "vec_id",
      vecCol: String = "embedding"
  ): PcaModel = {
    val spark = vectors.sparkSession
    import spark.implicits._
    val dimRow = vectors.filter(col(vecCol).isNotNull)
      .select(size(col(vecCol))).limit(1).collect()
    require(dimRow.nonEmpty, "cannot fit PCA on an empty corpus")
    val d = dimRow(0).getInt(0)
    require(d <= 512, s"PCA driver eigensolve is O(d^3); got d=$d > 512 — " +
      "random-project first or raise the guard deliberately")
    require(k >= 1 && k <= d, s"k=$k must be in [1, $d]")

    val tri = d * (d + 1) / 2
    // Per-partition moment rows: (partitionId, n, sum[d], upper-tri S).
    // Partition id rides along so the driver-side merge can run in a
    // FIXED order — the reduction is then bit-deterministic regardless
    // of task completion order.
    val moments = vectors
      .filter(col(vecCol).isNotNull)
      .select(col(vecCol).cast("array<double>"))
      .as[Seq[Double]]
      .mapPartitions { it =>
        val pid = org.apache.spark.TaskContext.getPartitionId()
        var n = 0L
        val s = new Array[Double](d)
        val ss = new Array[Double](tri)
        while (it.hasNext) {
          val v = it.next()
          require(v.length == d, s"ragged embedding: ${v.length} != $d")
          n += 1
          var i = 0
          var t = 0
          while (i < d) {
            val vi = v(i)
            s(i) += vi
            var j = i
            while (j < d) { ss(t) += vi * v(j); j += 1; t += 1 }
            i += 1
          }
        }
        if (n == 0) Iterator.empty
        else Iterator.single((pid, n, s.toSeq, ss.toSeq))
      }
      .collect()
      .sortBy(_._1)

    require(moments.nonEmpty, "cannot fit PCA on an empty corpus")
    var n = 0L
    val sum = new Array[Double](d)
    val ssum = new Array[Double](tri)
    moments.foreach { case (_, pn, ps, pss) =>
      n += pn
      var i = 0
      while (i < d) { sum(i) += ps(i); i += 1 }
      i = 0
      while (i < tri) { ssum(i) += pss(i); i += 1 }
    }

    val mean = sum.map(_ / n)
    // Covariance (population, 1/n): C_ij = S_ij/n - mean_i * mean_j.
    val cov = Array.ofDim[Double](d, d)
    var t = 0
    var i = 0
    while (i < d) {
      var j = i
      while (j < d) {
        val c = ssum(t) / n - mean(i) * mean(j)
        cov(i)(j) = c
        cov(j)(i) = c
        j += 1
        t += 1
      }
      i += 1
    }

    val (values, basis) = symmetricEigen(cov)
    val order = values.indices.sortBy(idx => (-values(idx), idx)).take(k)
    val comps = order.map(idx => canonicalSign(basis.map(_(idx)))).toArray
    PcaModel(mean, order.map(values).toArray, comps, values.filter(_ > 0).sum)
  }

  /** Map-side projection of `vecCol` onto a fitted basis: one codegen'd
    * dot per component against broadcast-literal component vectors; mean
    * subtraction folds into a plan-time constant per component. Rounded
    * to `roundDigits` decimals for cross-run fixture stability.
    */
  def projectPca(
      vectors: DataFrame,
      model: PcaModel,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      outCol: String = "proj",
      roundDigits: Int = 6
  ): DataFrame = {
    val v = col(vecCol).cast("array<float>")
    val projCols = model.components.map { comp =>
      // Components ride as float literals (the dot expression's input
      // type); the mean bias uses the SAME float-rounded components so
      // the projection stays exactly mean-centered.
      val compF = comp.map(_.toFloat)
      val bias = compF.zip(model.mean).map { case (c, m) => c.toDouble * m }.sum
      round(VectorExpressions.dot(v, typedLit(compF.toSeq)) - lit(bias), roundDigits)
    }
    vectors.select(col(idCol), array(projCols.toIndexedSeq: _*).as(outCol))
  }

  /** Pure-rotation change of basis onto a FULL-RANK (k = d) PCA
    * eigenbasis — no mean subtraction, so dot products, norms, and
    * therefore cosine top-k sets are preserved EXACTLY (asserted in
    * EmbeddingProjectionSpec). The point is OPQ-style energy compaction
    * (Ge et al., "Optimized Product Quantization", CVPR 2013): after the
    * rotation, leading coordinates carry the most variance, so
    * per-subspace PQ codebooks spend their codewords where the signal
    * is — the cheap first-order win of OPQ without its iterative
    * rotation/codebook alternation. Feed the output straight to
    * [[ProductQuant.pqTopK]]/[[ProductQuant.ivfPqTopK]] (RecallProbe
    * measures the gain as `opq_lite`). Map-side only, like [[projectPca]].
    */
  def rotateToBasis(
      vectors: DataFrame,
      model: PcaModel,
      idCol: String = "vec_id",
      vecCol: String = "embedding"
  ): DataFrame = {
    require(model.components.length == model.mean.length,
      s"rotation needs a full-rank model: k=${model.components.length} != d=${model.mean.length}")
    val v = col(vecCol).cast("array<float>")
    val coords = model.components.map(comp =>
      VectorExpressions.dot(v, typedLit(comp.map(_.toFloat).toSeq)).cast("float"))
    val others = vectors.columns.filterNot(_ == vecCol).map(col)
    vectors.select(others.toIndexedSeq :+ array(coords.toIndexedSeq: _*).as(vecCol): _*)
  }

  /** Fit + project in one call (the one-shot form). */
  def pca(
      vectors: DataFrame,
      k: Int,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      outCol: String = "proj"
  ): DataFrame =
    projectPca(vectors, fitPca(vectors, k, idCol, vecCol), idCol, vecCol, outCol)

  /** Largest-|entry| element positive (first such index on ties) — the
    * standard sign canonicalization removing the eigenvector's ± freedom.
    */
  private def canonicalSign(vec: Array[Double]): Array[Double] = {
    var best = 0
    var i = 1
    while (i < vec.length) {
      if (math.abs(vec(i)) > math.abs(vec(best))) best = i
      i += 1
    }
    if (vec(best) < 0) vec.map(-_) else vec
  }

  /** Cyclic Jacobi eigendecomposition of a symmetric matrix: returns
    * (eigenvalues, column-eigenvector matrix), unsorted. Deterministic:
    * fixed sweep order, fixed convergence threshold, no pivoting by
    * magnitude. O(d³) per sweep, converges quadratically (≤50 sweeps
    * enforced; 64×64 covariance converges in ~8).
    */
  private[operators] def symmetricEigen(
      sym: Array[Array[Double]]): (Array[Double], Array[Array[Double]]) = {
    val d = sym.length
    val a = sym.map(_.clone())
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)

    def offNorm(): Double = {
      var s = 0.0
      var i = 0
      while (i < d) {
        var j = i + 1
        while (j < d) { s += a(i)(j) * a(i)(j); j += 1 }
        i += 1
      }
      math.sqrt(s)
    }
    val scale = math.max(1e-300, math.sqrt(
      (0 until d).map(i => a(i)(i) * a(i)(i)).sum + 2 * offNorm() * offNorm()))

    var sweep = 0
    while (sweep < 50 && offNorm() > 1e-14 * scale) {
      var p = 0
      while (p < d - 1) {
        var q = p + 1
        while (q < d) {
          val apq = a(p)(q)
          if (math.abs(apq) > 1e-300) {
            val theta = (a(q)(q) - a(p)(p)) / (2 * apq)
            val sg = if (theta >= 0) 1.0 else -1.0
            val tTan = sg / (math.abs(theta) + math.sqrt(theta * theta + 1))
            val c = 1.0 / math.sqrt(tTan * tTan + 1)
            val s = tTan * c
            var i = 0
            while (i < d) {
              val aip = a(i)(p)
              val aiq = a(i)(q)
              a(i)(p) = c * aip - s * aiq
              a(i)(q) = s * aip + c * aiq
              i += 1
            }
            i = 0
            while (i < d) {
              val api = a(p)(i)
              val aqi = a(q)(i)
              a(p)(i) = c * api - s * aqi
              a(q)(i) = s * api + c * aqi
              i += 1
            }
            i = 0
            while (i < d) {
              val vip = v(i)(p)
              val viq = v(i)(q)
              v(i)(p) = c * vip - s * viq
              v(i)(q) = s * vip + c * viq
              i += 1
            }
          }
          q += 1
        }
        p += 1
      }
      sweep += 1
    }
    ((0 until d).map(i => a(i)(i)).toArray, v)
  }
}
