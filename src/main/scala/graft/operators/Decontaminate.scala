package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark-contamination detection for training corpora: find documents
  * sharing any word n-gram with a probe set (e.g. eval-set passages) and
  * count the distinct matched n-grams per document — the standard
  * n-gram-overlap decontamination check run before training.
  *
  * Scale shape: the probe side (an eval set — tiny next to the corpus) is
  * shingled once and BROADCAST; the corpus streams through the codegen'd
  * shingle explode ([[Dedup.shingleRows]]) and a broadcast hash join — no
  * shuffle carries document text, and the per-doc aggregate combines
  * map-side on the doc_id clustering shingleRows already established.
  */
object Decontaminate {

  /** @return (doc_id, matched_ngrams) for corpus documents with at least
    *         one probe n-gram hit; clean documents are absent.
    */
  def matches(
      docs: DataFrame,
      probes: DataFrame,
      shingleN: Int = 3,
      textCol: String = "text",
      idCol: String = "doc_id",
      probeTextCol: String = "text"
  ): DataFrame = {
    val probeShingles = probes
      .select(explode(graft.functions.Texts.distinctShingles(col(probeTextCol), shingleN)).as("s"))
      .distinct()
    Dedup.shingleRows(docs, shingleN, textCol, idCol)
      .join(broadcast(probeShingles), Seq("s"))
      .groupBy("doc_id")
      .agg(count_distinct(col("s")).as("matched_ngrams"))
  }

  /** [[matches]] with a relational Bloom-filter pre-pass — the shape for
    * probe sets too large to broadcast as strings. The probe shingles
    * collapse into an `m`-bit bitmap held as `(word, bits)` rows (`m/64`
    * rows ≈ 10 bits per probe n-gram at the default two hashes — vs 64+
    * bits each for a broadcast hash set, and far less than the strings);
    * every corpus shingle checks its `bloomHashes` bit positions against
    * the BROADCAST bitmap and survives only if all are set. Bloom
    * membership has no false negatives, so the exact verify join on the
    * (tiny) surviving candidate set — a plain shuffled join, NOT a
    * broadcast of the probe strings — makes the result identical to
    * [[matches]]; false-positive shingles cost only wasted verify rows
    * (rate ~(1 - e^(-hn/m))^h). Everything is codegen column arithmetic:
    * no UDF, no driver-side sketch object.
    *
    * @param bloomBits bitmap width m; size for ~5-10 bits per distinct
    *                  probe n-gram.
    */
  def matchesBloom(
      docs: DataFrame,
      probes: DataFrame,
      shingleN: Int = 3,
      bloomBits: Long = 1L << 20,
      bloomHashes: Int = 2,
      textCol: String = "text",
      idCol: String = "doc_id",
      probeTextCol: String = "text"
  ): DataFrame = {
    require(bloomBits % 64 == 0, s"bloomBits must be a multiple of 64, got $bloomBits")
    val probeShingles = probes
      .select(explode(graft.functions.Texts.distinctShingles(col(probeTextCol), shingleN)).as("s"))
      .distinct()
    def positions(s: org.apache.spark.sql.Column) =
      array((0 until bloomHashes).map(j => pmod(xxhash64(lit(j), s), lit(bloomBits))): _*)
    val probeBits = probeShingles
      .select(explode(positions(col("s"))).as("__pos"))
      .select(shiftright(col("__pos"), 6).as("__word"),
        expr("shiftleft(1L, CAST(pmod(__pos, 64) AS INT))").as("__mask"))
      .groupBy("__word")
      .agg(expr("bit_or(__mask)").as("__bits"))
    val candidates = Dedup.shingleRows(docs, shingleN, textCol, idCol)
      .select(col("doc_id"), col("s"), explode(positions(col("s"))).as("__pos"))
      .select(col("doc_id"), col("s"), shiftright(col("__pos"), 6).as("__word"),
        expr("shiftleft(1L, CAST(pmod(__pos, 64) AS INT))").as("__mask"))
      .join(broadcast(probeBits), Seq("__word"), "left")
      .withColumn("__hit", coalesce(col("__bits"), lit(0L)).bitwiseAND(col("__mask")) =!= 0)
      .groupBy("doc_id", "s")
      .agg(sum(when(col("__hit"), 1).otherwise(0)).as("__nhit"))
      .filter(col("__nhit") === bloomHashes)
      .select("doc_id", "s")
    candidates
      .join(probeShingles, Seq("s"))
      .groupBy("doc_id")
      .agg(count_distinct(col("s")).as("matched_ngrams"))
  }

  /** Embedding-space decontamination: corpus documents whose embedding is
    * a COSINE near-duplicate (≥ `threshold`) of any eval-probe embedding
    * — the semantic complement of the n-gram check above, which
    * paraphrased or reformatted eval passages slip past. One row per
    * contaminated corpus doc with the evidence; clean docs are absent
    * (drop via left_anti, the [[matches]] convention).
    *
    * Scale shape: built on [[Dedup.embeddingNearDupIncremental]] with
    * the probe frame as the "shard" side — banded random-hyperplane LSH
    * buckets generate candidates (signatures are deterministic functions
    * of the vector, no fitted state), exact cosine verifies, the
    * candidate join's left side is restricted to probes. The corpus is
    * never compared against itself: corpus–corpus pairs cannot form
    * (left side is probes only) and probe–probe pairs are dropped by id
    * sign. Probe ids are remapped to a disjoint negative range
    * internally, so probe and corpus id spaces may overlap freely;
    * corpus ids must be non-negative.
    *
    * @return (doc_id, n_probes, max_cos) — contaminated corpus docs,
    *         how many probes they duplicate, and the strongest cosine
    *         (4 dp).
    */
  def matchesEmbedding(
      vectors: DataFrame,
      probes: DataFrame,
      threshold: Double,
      bands: Int = 32,
      bitsPerBand: Int = 4,
      maxBucketSize: Int = 256,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      probeIdCol: String = "vec_id",
      probeVecCol: String = "embedding"
  ): DataFrame = {
    // Loud in-plan guards on the id-sign contract (no extra corpus pass
    // at scale — the check rides the id projection itself): a negative
    // corpus id would silently be treated as a probe and its
    // contamination hits dropped; a negative probe id would remap INTO
    // the corpus range and could collide with a real corpus doc.
    // coalesce in the message: a NULL id (e.g. a non-castable string id)
    // must raise the SAME named error, not a message-less exception
    // (concat with a null id would null the whole message).
    def nonNegative(c: org.apache.spark.sql.Column, what: String) =
      when(c >= 0, c).otherwise(raise_error(concat(
        lit(s"matchesEmbedding: negative or null $what id "),
        coalesce(c.cast("string"), lit("NULL")),
        lit(" — ids must be non-negative (the probe remap reserves the negative range)")))
        .cast("long"))
    val corpus = vectors.select(
      nonNegative(col(idCol).cast("long"), "corpus").as(idCol), col(vecCol))
    val probeRemapped = probes.select(
      (-nonNegative(col(probeIdCol).cast("long"), "probe") - 1).as(idCol),
      col(probeVecCol).as(vecCol))
    Dedup.embeddingNearDupIncremental(
      probeRemapped, corpus, threshold, bands, bitsPerBand, maxBucketSize, idCol, vecCol)
      .select(
        when(col("doc_a") >= 0, col("doc_a")).otherwise(col("doc_b")).as("doc_id"),
        col("cos"))
      .filter(col("doc_id") >= 0) // probe–probe pairs are both negative
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_probes"), round(max("cos"), 4).as("max_cos"))
  }
}
