package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`).
  *
  * Baseline: brute-force cosine top-k (cross join of queries × corpus —
  * correct, O(Q·N), broadcast the query side). Scale path: LSH-bucketed
  * ANN via deterministic random-hyperplane signatures — candidates only
  * within matching buckets, recall traded via band count.
  *
  * Dot products and norms are pure `zip_with`/`aggregate` expressions —
  * no UDFs.
  */
object Similarity {

  /** Cosine similarity of two float-array columns (double math), via the
    * codegen'd `FloatVectorCosine` expression — the higher-order
    * `zip_with`/`aggregate` formulation evaluates interpreted per element,
    * which dominates candidate scoring at corpus scale.
    */
  def cosine(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.VectorExpressions.cosine(a, b)

  /** The interpreted higher-order formulation, kept as the semantic
    * cross-check for the native expression (ExtensionsSpec asserts
    * agreement). Products round through float here, so low bits differ
    * from the double-math expression.
    */
  private[graft] def cosineInterpreted(a: Column, b: Column): Column = {
    val dot = aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0d), (acc, v) => acc + v)
    val na = sqrt(aggregate(a, lit(0.0d), (acc, v) => acc + v * v))
    val nb = sqrt(aggregate(b, lit(0.0d), (acc, v) => acc + v * v))
    dot / (na * nb)
  }

  /** Brute-force cosine top-k neighbors for each query vector.
    * The query side is broadcast; ranking is per-query via a window.
    *
    * @return (query_id, neighbor_id, rank, sim) with rank 1..k,
    *         self-matches excluded, ties broken by neighbor_id.
    */
  def bruteForceTopK(
      queries: DataFrame,
      corpus: DataFrame,
      k: Int,
      idCol: String = "vec_id",
      vecCol: String = "embedding"
  ): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
    val scored = broadcast(q)
      .crossJoin(c)
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(
        col("query_id"),
        col("neighbor_id"),
        cosine(col("qv"), col("cv")).as("sim"))
    val w = Window.partitionBy("query_id").orderBy(col("sim").desc, col("neighbor_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Deterministic pseudo-random hyperplane component for (plane, dim):
    * xxhash64 folded into [-1, 1). Same on every executor — no state.
    */
  private def planeComponent(plane: Int, dim: Column): Column =
    (pmod(xxhash64(lit(plane), dim), lit(20001L)) - 10000L).cast("double") / 10000.0

  /** Random-hyperplane signature bit for one plane: sign of <v, plane>. */
  private[operators] def planeBit(vec: Column, plane: Int): Column = {
    val dot = aggregate(
      zip_with(vec, sequence(lit(0), size(vec) - 1), (v, i) => v * planeComponent(plane, i)),
      lit(0.0d),
      (acc, v) => acc + v)
    when(dot >= 0, lit(1L)).otherwise(lit(0L))
  }

  /** Assign every vector to its max-cosine centroid (broadcast join). */
  private def assignToCentroids(base: DataFrame, centroids: DataFrame): DataFrame = {
    val wAssign = Window.partitionBy("id").orderBy(col("csim").desc, col("cid"))
    base
      .crossJoin(broadcast(centroids))
      .select(col("id"), col("v"), col("cid"), cosine(col("v"), col("cv")).as("csim"))
      .withColumn("__rk", row_number().over(wAssign))
      .filter(col("__rk") === 1)
      .select(col("id"), col("v"), col("cid"))
  }

  /** IVF (inverted-file) approximate nearest neighbors.
    *
    * Fit: `nlist` seed centroids chosen deterministically as the vectors
    * with the smallest `xxhash64(id)` (a seedless pseudo-random sample),
    * then `refineIters` Lloyd iterations: assign all vectors to their
    * max-cosine centroid, recompute each centroid as the element-wise
    * cluster mean (posexplode → per-(cluster, dim) avg → re-assemble —
    * one explode-shuffle of dim × N rows per iteration, the standard
    * distributed k-means cost). Assign: each vector to its max-cosine
    * centroid. Probe: each query scans only the `nprobe` clusters whose
    * centroids score highest, then exact cosine + per-query top-k.
    *
    * The centroid table stays tiny (`nlist` rows) and is broadcast on both
    * the assignment and probe joins; the corpus is never shuffled beyond
    * its cluster-id tag.
    */
  def ivfTopK(
      vectors: DataFrame,
      k: Int,
      nlist: Int = 16,
      nprobe: Int = 10,
      refineIters: Int = 2,
      idCol: String = "vec_id",
      vecCol: String = "embedding"
  ): DataFrame = {
    val base = vectors.select(col(idCol).as("id"), col(vecCol).as("v"))

    var centroids = base
      .withColumn("__h", xxhash64(col("id")))
      .orderBy("__h")
      .limit(nlist)
      .select(col("id").as("cid"), col("v").as("cv"))

    // Lloyd refinement. Centroid means are float-cast so `cv` keeps the
    // array<float> type the cosine expression expects; empty clusters
    // simply drop out (their seed stops attracting vectors).
    for (_ <- 1 to math.max(0, refineIters)) {
      centroids = assignToCentroids(base, centroids)
        .select(col("cid"), posexplode(col("v")).as(Seq("pos", "x")))
        .groupBy("cid", "pos")
        .agg(avg("x").as("m"))
        .groupBy("cid")
        .agg(collect_list(struct(col("pos"), col("m"))).as("dims"))
        .select(
          col("cid"),
          transform(array_sort(col("dims")), d => d.getField("m").cast("float")).as("cv"))
      centroids = graft.plans.Materialize(centroids, eager = true)
    }

    val assigned = assignToCentroids(base, centroids)

    val wProbe = Window.partitionBy("query_id").orderBy(col("csim").desc, col("cid"))
    val probes = base
      .crossJoin(broadcast(centroids))
      .select(col("id").as("query_id"), col("v").as("qv"), col("cid"),
        cosine(col("v"), col("cv")).as("csim"))
      .withColumn("__rk", row_number().over(wProbe))
      .filter(col("__rk") <= nprobe)
      .select(col("query_id"), col("qv"), col("cid"))

    val w = Window.partitionBy("query_id").orderBy(col("sim").desc, col("neighbor_id"))
    probes
      .join(assigned, Seq("cid"))
      .filter(col("query_id") =!= col("id"))
      .select(col("query_id"), col("id").as("neighbor_id"),
        cosine(col("qv"), col("v")).as("sim"))
      .dropDuplicates("query_id", "neighbor_id")
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** (id, band, bucket) rows from banded random-hyperplane signatures —
    * the shared LSH bucketing for ANN top-k and embedding near-dup.
    * Carries ids only; vectors are dropped before any shuffle.
    */
  def hyperplaneBuckets(
      vectors: DataFrame,
      bands: Int,
      bitsPerBand: Int,
      idCol: String = "vec_id",
      vecCol: String = "embedding"
  ): DataFrame =
    vectors.select(
      col(idCol).as("id"),
      explode(array((0 until bands).map { band =>
        val key = (0 until bitsPerBand)
          .map(bit => planeBit(col(vecCol), band * bitsPerBand + bit) * lit(1L << bit))
          .reduce(_ + _)
        struct(lit(band).as("band"), key.as("bucket"))
      }: _*)).as("bb"))
      .select(col("id"), col("bb.band"), col("bb.bucket"))

  /** LSH-bucketed approximate nearest neighbors: `bands` signatures of
    * `bitsPerBand` hyperplane bits each; vectors sharing any band bucket
    * become candidates, then exact cosine + per-query top-k.
    *
    * Scale shape (mirrors [[Dedup.minhashLsh]]): the candidate join and
    * the pair dedup shuffle ONLY (band, bucket, id) / (query_id,
    * neighbor_id) — at 1B×768-dim, carrying vector payloads through those
    * shuffles would dominate the exchange; instead the (much smaller)
    * deduped pair set re-joins the vectors before scoring.
    */
  def lshTopK(
      vectors: DataFrame,
      k: Int,
      bands: Int = 32,
      bitsPerBand: Int = 4,
      idCol: String = "vec_id",
      vecCol: String = "embedding"
  ): DataFrame = {
    val base = vectors.select(col(idCol).as("id"), col(vecCol).as("v"))
    val buckets = hyperplaneBuckets(base, bands, bitsPerBand, "id", "v")

    val a = buckets.select(col("band"), col("bucket"), col("id").as("query_id"))
    val b = buckets.select(col("band"), col("bucket"), col("id").as("neighbor_id"))
    val pairs = a
      .join(b, Seq("band", "bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select("query_id", "neighbor_id")
      .dropDuplicates("query_id", "neighbor_id")

    val candidates = pairs
      .join(base.select(col("id").as("query_id"), col("v").as("qv")), Seq("query_id"))
      .join(base.select(col("id").as("neighbor_id"), col("v").as("cv")), Seq("neighbor_id"))
      .select(
        col("query_id"),
        col("neighbor_id"),
        cosine(col("qv"), col("cv")).as("sim"))
    val w = Window.partitionBy("query_id").orderBy(col("sim").desc, col("neighbor_id"))
    candidates.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }
}
