package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{Bpe, Texts, Unigram}

/** Sequence packing for training-data assembly: assign every document the
  * pack (fixed token budget) in which its text STARTS when documents are
  * concatenated in (bucket, doc_id) order — the standard concat-then-chunk
  * packing used to fill training context windows (documents may straddle a
  * boundary; chunking handles the tail).
  *
  * Scale shape: a TOTAL-order running token sum would serialize the whole
  * corpus through one task, so the corpus is first split into `buckets`
  * independent packing streams (`pmod(doc_id, buckets)`); each bucket's
  * cumulative sum is one growing-frame window pass over its own partition
  * — fully parallel, one shuffle on the bucket key, codegen'd end to end.
  * Pack ids are globally unique via `(bucket << 40) + pack-in-bucket`:
  * up to ~1.1e12 packs per bucket and 2^23 buckets before overflow —
  * beyond any real corpus (a 1e6 multiplier would silently collide at
  * ~2e9 tokens per bucket).
  */
object Packing {

  def packSequences(
      docs: DataFrame,
      budgetTokens: Long,
      buckets: Int = 1024,
      textCol: String = "text",
      idCol: String = "doc_id"
  ): DataFrame = {
    require(budgetTokens > 0, "budgetTokens must be positive")
    val w = Window.partitionBy("bucket").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    docs
      .select(
        col(idCol).as("doc_id"),
        size(Texts.tokens(col(textCol))).cast("long").as("n_tokens"))
      .withColumn("bucket", pmod(col("doc_id"), lit(buckets.toLong)))
      .withColumn("start_tok", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .select(
        col("doc_id"), col("n_tokens"), col("bucket"),
        (shiftleft(col("bucket"), 40) +
          floor(col("start_tok") / lit(budgetTokens.toDouble))).cast("long").as("pack_id"))
  }

  /** NO-SPLIT bin packing — "sample packing": every document lands WHOLE
    * in exactly one pack of capacity `budgetTokens` (documents longer
    * than the budget are rejected up front), packs are filled by
    * first-fit-decreasing (FFD — the classic 11/9·OPT + 6/9 guarantee),
    * minimizing padding waste. This is the packing regime training
    * pipelines use when cross-document attention contamination matters
    * (each sequence = whole documents + padding), versus
    * [[packSequences]]' concat-then-chunk regime (zero padding, split
    * documents).
    *
    * Scale shape: FFD is inherently sequential, so the corpus splits
    * into `buckets` independent packing streams (`pmod(doc_id,
    * buckets)`) like [[packSequences]]; each bucket's FFD runs inside
    * ONE `mapPartitions` pass over its hash partition (the genuine
    * per-partition imperative case — a bin fill-level array, bounded by
    * the bucket's pack count). One shuffle on the bucket key, rows are
    * thin (id, tokens); determinism comes from the in-bucket
    * (tokens desc, id asc) FFD order, independent of arrival order.
    * Per-bucket waste stays within FFD's bound of that bucket's
    * optimum; cross-bucket imbalance adds at most `buckets − 1`
    * under-full final packs (property-tested in ExtensionsSpec).
    *
    * @return (doc_id, n_tokens, bucket, pack_id, pack_fill) — pack_id
    *         globally unique via the [[packSequences]] bucket-shift
    *         scheme; `pack_fill` is the pack's total tokens (same value
    *         on every member row), always ≤ budgetTokens.
    */
  def packGreedyBins(
      docs: DataFrame,
      budgetTokens: Long,
      buckets: Int = 1024,
      textCol: String = "text",
      idCol: String = "doc_id"
  ): DataFrame = {
    require(budgetTokens > 0, "budgetTokens must be positive")
    val spark = docs.sparkSession
    import spark.implicits._
    val sized = docs.select(
      col(idCol).cast("long").as("doc_id"),
      size(Texts.tokens(col(textCol))).cast("long").as("n_tokens"))
    val over = sized.filter(col("n_tokens") > budgetTokens).limit(1).collect()
    require(over.isEmpty,
      s"doc ${over.headOption.map(_.getLong(0)).getOrElse(-1L)} exceeds the pack budget " +
        s"$budgetTokens — chunk long documents first (Chunking.chunk) or raise the budget")
    sized
      .withColumn("bucket", pmod(col("doc_id"), lit(buckets.toLong)))
      .repartition(col("bucket"))
      .as[(Long, Long, Long)]
      .mapPartitions { it =>
        // A hash partition may hold several buckets — pack each bucket
        // independently so results don't depend on partition assignment.
        it.toSeq.groupBy(_._3).iterator.flatMap { case (bucket, rows) =>
          val ordered = rows.sortBy(t => (-t._2, t._1)) // tokens desc, id asc
          val fills = scala.collection.mutable.ArrayBuffer.empty[Long]
          val members = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Int)]
          ordered.foreach { case (id, tok, _) =>
            var b = 0
            while (b < fills.length && fills(b) + tok > budgetTokens) b += 1
            if (b == fills.length) fills += 0L
            fills(b) += tok
            members += ((id, tok, b))
          }
          members.iterator.map { case (id, tok, b) =>
            (id, tok, bucket, (bucket << 40) + b, fills(b))
          }
        }
      }
      .toDF("doc_id", "n_tokens", "bucket", "pack_id", "pack_fill")
  }

  /** How documents become the ordered token stream the id-packing path
    * consumes — whitespace words (the closed-form, SQL-replayable
    * regime) or a learned subword model applied from a broadcast table
    * (BPE merges / unigram-LM pieces), the tokenizer families modern LM
    * releases actually ship.
    */
  sealed trait Tokenizer
  /** Whitespace word tokens — [[rankVocab]]'s closed-form regime. */
  case object WordTokenizer extends Tokenizer
  /** BPE subwords under a learned `(rank, left, right)` merge table
    * ([[Bpe.learnMerges]]); `byteLevel` must match the learn mode.
    */
  final case class BpeTokenizer(merges: DataFrame, byteLevel: Boolean = false)
      extends Tokenizer
  /** Unigram-LM pieces under a learned `(piece, logp)` table
    * ([[Unigram.learnPieces]]); `maxPieceLen` ≥ the learn-time value.
    */
  final case class UnigramTokenizer(pieces: DataFrame, maxPieceLen: Int = 8)
      extends Tokenizer

  /** The corpus as an ordered token stream `(doc_id, pos, tok)` — `pos`
    * is the 0-based token position within its document under the given
    * tokenizer. The word path is pure codegen (posexplode over split);
    * the subword paths broadcast their learned table and segment
    * map-side in one `mapPartitions` pass (the [[Bpe.tokenCounts]] /
    * [[Unigram.tokenCounts]] apply shape) — zero exchanges either way.
    * Word boundaries are single-space splits of the lowered text in all
    * three regimes, so switching tokenizers never reorders documents.
    */
  def tokenStream(
      docs: DataFrame,
      tokenizer: Tokenizer,
      textCol: String = "text",
      idCol: String = "doc_id"
  ): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    // The subword paths share one shape: lowered text in, a per-word
    // segmenter (closed over its broadcast table) flat-mapped across the
    // single-space word split, positions assigned by emission order.
    def subword(segmentWord: String => Array[String]): DataFrame =
      docs.select(col(idCol).cast("long").as("id"), lower(col(textCol)).as("t"))
        .as[(Long, String)]
        .mapPartitions(_.flatMap { case (id, t) =>
          t.split(" ").iterator.filter(_.nonEmpty)
            .flatMap(w => segmentWord(w).iterator)
            .zipWithIndex.map { case (p, i) => (id, i, p) }
        })
        .toDF("doc_id", "pos", "tok")
    tokenizer match {
      case WordTokenizer =>
        docs.select(
          col(idCol).cast("long").as("doc_id"),
          posexplode(filter(split(lower(col(textCol)), " "), t => t =!= ""))
            .as(Seq("pos", "tok")))
      case BpeTokenizer(merges, byteLevel) =>
        val ranks: Map[(String, String), Int] = merges
          .select("rank", "left", "right").collect()
          .map(r => ((r.getString(1), r.getString(2)), r.getInt(0))).toMap
        val bc = spark.sparkContext.broadcast(ranks)
        subword(w =>
          Bpe.encodeWord(if (byteLevel) Bpe.toByteSymbols(w) else w, bc.value))
      case UnigramTokenizer(pieces, maxPieceLen) =>
        val table: Map[String, Double] = pieces
          .select("piece", "logp").collect()
          .map(r => r.getString(0) -> r.getDouble(1)).toMap
        require(table.nonEmpty, "tokenStream: empty piece table")
        val floor = Unigram.oovFloor(table.valuesIterator.min)
        val bc = spark.sparkContext.broadcast(table)
        subword(w => Unigram.viterbiPieces(w, bc.value, maxPieceLen, floor))
    }
  }

  /** Frequency-ranked vocabulary `(tok, tok_id)` — `tok_id` is the
    * 1-based rank by `(count DESC, token ASC)`, the deterministic
    * cross-engine cut [[Vocabulary.unigramLm]] uses; id 0 is reserved
    * for out-of-vocab. The top-k is a `TakeOrdered` (distributed heap,
    * never a global sort); the rank window then runs over the ≤
    * `vocabSize`-row result, not the corpus vocabulary.
    */
  def rankVocab(
      docs: DataFrame,
      vocabSize: Int,
      textCol: String = "text",
      idCol: String = "doc_id"
  ): DataFrame =
    rankVocabFromTokens(tokenStream(docs, WordTokenizer, textCol, idCol), vocabSize)

  /** [[rankVocab]] over a prepared [[tokenStream]] — the entry the
    * subword release path uses so ids rank the tokens the tokenizer
    * ACTUALLY emits (BPE/unigram pieces), not raw words.
    */
  def rankVocabFromTokens(toks: DataFrame, vocabSize: Int): DataFrame = {
    require(vocabSize > 0, s"vocabSize must be positive, got $vocabSize")
    val counts = toks
      .groupBy("tok").agg(count(lit(1)).as("__c"))
      .orderBy(col("__c").desc, col("tok")).limit(vocabSize)
    counts
      .withColumn("tok_id",
        row_number().over(Window.orderBy(col("__c").desc, col("tok"))).cast("int"))
      .select("tok", "tok_id")
  }

  /** Release-QA statistics for a fitted tokenizer + released vocab —
    * the numbers that decide whether a vocab is acceptable BEFORE a
    * corpus-scale tokenization run. Per `langCol` group: document and
    * whitespace-word counts, UTF-8 text bytes, emitted tokens, the two
    * fertility readings (`tokens_per_word`, `tokens_per_kb` of text),
    * and `oov_rate` — the fraction of emitted tokens outside the
    * released vocab, i.e. exactly the mass [[packTokenIds]] would pack
    * as the reserved UNK id 0 (for byte-level BPE this doubles as the
    * byte-fallback residue: pieces too rare to earn a vocab id).
    *
    * Scale shape: one pass over the token stream collapsed per doc
    * (map-side combinable, vocab broadcast), one thin doc-level join
    * against the per-doc text metrics, then a tiny per-language rollup
    * — no corpus-sized exchange beyond the per-doc aggregate. Run it on
    * a corpus sample for quick vocab iteration; the result frame is
    * languages-sized either way.
    */
  def tokenizerStats(
      docs: DataFrame,
      tokenizer: Tokenizer,
      vocab: DataFrame,
      textCol: String = "text",
      idCol: String = "doc_id",
      langCol: String = "lang"
  ): DataFrame =
    tokenizerStatsFromStream(
      docs, tokenStream(docs, tokenizer, textCol, idCol), vocab,
      textCol, idCol, langCol)

  /** [[tokenizerStats]] over a prepared [[tokenStream]] — the entry the
    * release path uses (tokenize once, pack AND QA from the same
    * stream).
    */
  def tokenizerStatsFromStream(
      docs: DataFrame,
      stream: DataFrame,
      vocab: DataFrame,
      textCol: String = "text",
      idCol: String = "doc_id",
      langCol: String = "lang"
  ): DataFrame = {
    require(docs.columns.contains(langCol),
      s"tokenizerStats: no language column '$langCol' (have ${docs.columns.mkString(", ")}) — " +
        "pass langCol, or add a constant column for a corpus-total rollup")
    val perDoc = stream
      .join(broadcast(vocab.select("tok", "tok_id")), Seq("tok"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("__toks"),
        count(when(col("tok_id").isNull, 1)).as("__oov"))
    docs.select(
        col(idCol).cast("long").as("doc_id"),
        col(langCol).as("lang"),
        octet_length(col(textCol)).cast("long").as("__bytes"),
        size(filter(split(lower(col(textCol)), " "), t => t =!= ""))
          .cast("long").as("__words"))
      // left join: a doc whose text tokenizes to nothing still counts
      // its bytes (zero tokens, zero OOV).
      .join(perDoc, Seq("doc_id"), "left")
      .groupBy("lang")
      .agg(
        count(lit(1)).as("n_docs"),
        sum("__words").as("n_words"),
        sum("__bytes").as("n_text_bytes"),
        sum(coalesce(col("__toks"), lit(0L))).as("n_tokens"),
        sum(coalesce(col("__oov"), lit(0L))).as("n_oov"))
      .select(col("lang"), col("n_docs"), col("n_words"), col("n_text_bytes"),
        col("n_tokens"), col("n_oov"),
        round(col("n_tokens") / col("n_words"), 4).as("tokens_per_word"),
        round(col("n_tokens") * lit(1024.0) / col("n_text_bytes"), 4).as("tokens_per_kb"),
        round(col("n_oov") / col("n_tokens"), 4).as("oov_rate"))
  }

  /** Tokenize, id-map, and pack the corpus into FIXED-LENGTH token-id
    * sequences — the shape a training loader actually consumes (packed
    * context windows of ids, not documents). Documents concatenate in
    * `(bucket, doc_id, pos)` order within `buckets` independent streams
    * (the [[packSequences]] scale discipline: no total order, one
    * exchange on the bucket key) and chunk every `budgetTokens` ids;
    * each bucket's final partial sequence ships with its true length
    * `n < budgetTokens`. The chunker is a compiled streaming row loop
    * over the sorted partition (never a per-element HOF), emitting one
    * row per sequence.
    *
    * Deterministic end to end: the vocab rank, bucket assignment, and
    * concatenation order are all closed-form, so an exact SQL oracle
    * replays the whole tokenize→map→pack chain (the catalog's
    * `text_pack_ids` gate). OOV tokens map to id 0, [[rankVocab]]'s
    * reserved value — present in sequences (the loader's UNK), never
    * silently dropped.
    *
    * @return (bucket, seq, ids, n) — `seq` is the 0-based sequence
    *         index within its bucket; `(bucket, seq)` is the global key.
    */
  def packTokenIds(
      docs: DataFrame,
      vocab: DataFrame,
      budgetTokens: Int,
      buckets: Int = 1024,
      textCol: String = "text",
      idCol: String = "doc_id"
  ): DataFrame =
    packTokenIdsFrom(
      tokenStream(docs, WordTokenizer, textCol, idCol), vocab, budgetTokens, buckets)

  /** [[packTokenIds]] over a prepared [[tokenStream]] `(doc_id, pos,
    * tok)` — the entry the subword release path uses (tokenize once,
    * fit the id vocab and pack from the same stream).
    */
  def packTokenIdsFrom(
      stream: DataFrame,
      vocab: DataFrame,
      budgetTokens: Int,
      buckets: Int = 1024
  ): DataFrame = {
    require(budgetTokens > 0, s"budgetTokens must be positive, got $budgetTokens")
    require(buckets > 0, s"buckets must be positive, got $buckets")
    val spark = stream.sparkSession
    import spark.implicits._
    val toks = stream
      .join(broadcast(vocab), Seq("tok"), "left")
      .select(
        pmod(col("doc_id"), lit(buckets.toLong)).cast("int").as("bucket"),
        col("doc_id"), col("pos"),
        coalesce(col("tok_id"), lit(0)).cast("int").as("tok_id"))
    toks
      .repartition(col("bucket"))
      .sortWithinPartitions("bucket", "doc_id", "pos")
      .as[(Int, Long, Int, Int)]
      .mapPartitions { rows =>
        // Streaming chunker: one budget-sized buffer, rows in (bucket,
        // doc_id, pos) order; a bucket switch flushes the previous
        // bucket's partial tail. Nothing partition-sized is buffered.
        var curBucket = Int.MinValue
        var seqIdx = 0L
        val buf = new Array[Int](budgetTokens)
        var n = 0
        def emit(bucket: Int): (Int, Long, Array[Int], Int) = {
          val r = (bucket, seqIdx, java.util.Arrays.copyOf(buf, n), n)
          seqIdx += 1; n = 0
          r
        }
        new Iterator[(Int, Long, Array[Int], Int)] {
          private var ready: List[(Int, Long, Array[Int], Int)] = Nil
          private def fill(): Unit = {
            while (ready.isEmpty && rows.hasNext) {
              val (b, _, _, id) = rows.next()
              if (b != curBucket) {
                if (n > 0) ready ::= emit(curBucket)
                curBucket = b; seqIdx = 0L
              }
              buf(n) = id; n += 1
              if (n == budgetTokens) ready ::= emit(curBucket)
            }
            if (ready.isEmpty && !rows.hasNext && n > 0) ready ::= emit(curBucket)
          }
          def hasNext: Boolean = { fill(); ready.nonEmpty }
          def next(): (Int, Long, Array[Int], Int) = {
            fill(); val h = ready.head; ready = ready.tail; h
          }
        }
      }
      .toDF("bucket", "seq", "ids", "n")
  }

  /** Release [[packTokenIds]] sequences as WebDataset tar shards of raw
    * little-endian int32 payloads (`<key>.bin`, 4·n bytes — the
    * GPT-style pre-tokenized binary format training loaders mmap). The
    * member key packs `(bucket, seq)` into one long (`bucket·2³² + seq`
    * — up to 4.3e9 sequences per bucket before collision); shard count
    * derives from the byte budget ([[graft.sources.WebDataset.writeTarAuto]]).
    *
    * @return the shard count
    */
  /** STREAMING pre-tokenized release: pack each micro-batch of curated
    * documents against a PRE-FIT id vocabulary and append the int32
    * shards as the batch's own `batch=<id>` subdirectory
    * ([[graft.sources.WebDataset.tarSink]]'s idempotent convention — a
    * re-delivered batch rewrites its own dir byte-identically, since
    * the pack is a pure function of the batch rows). The vocab is fit
    * ONCE on a bounded corpus/sample ([[rankVocab]] /
    * [[rankVocabFromTokens]], persisted) — a frequency-ranked vocab
    * cannot be fit on an unbounded stream, the same fit-once/serve-many
    * split as the quality classifier. Sequence keys stay collision-free
    * as the layout accumulates: each batch's buckets shift to their own
    * range (`bucket + batchId·buckets`), so the `(bucket, seq)` scheme
    * survives and [[graft.sources.TokenShards.scanTokens]] reads the
    * whole standing directory directly. `batchId` must stay below
    * 2³¹ ∕ `buckets` (loud guard). Start with
    * `.option("checkpointLocation", …).start()`.
    */
  def tokenSink(
      stream: DataFrame,
      vocab: DataFrame,
      budgetTokens: Int,
      outDir: String,
      buckets: Int = 1024,
      targetShardBytes: Long = 256L << 20,
      textCol: String = "text",
      idCol: String = "doc_id"
  ): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    stream.writeStream.outputMode("append").foreachBatch {
      (batch: DataFrame, batchId: Long) =>
        require(batchId < Int.MaxValue.toLong / buckets,
          s"tokenSink: batchId $batchId overflows the bucket id range (buckets=$buckets)")
        val packed = packTokenIds(batch, vocab, budgetTokens, buckets, textCol, idCol)
          .withColumn("bucket", (col("bucket") + lit(batchId * buckets)).cast("int"))
        tokenTar(packed, s"$outDir/batch=$batchId", targetShardBytes)
        ()
    }

  def tokenTar(
      packed: DataFrame,
      outDir: String,
      targetShardBytes: Long
  ): Int = {
    val spark = packed.sparkSession
    import spark.implicits._
    val bin = packed.select(col("bucket"), col("seq"), col("ids"))
      .as[(Int, Long, Seq[Int])]
      .map { case (b, s, ids) =>
        val bb = java.nio.ByteBuffer.allocate(4 * ids.length)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        ids.foreach(bb.putInt)
        ((b.toLong << 32) | s, bb.array())
      }
      .toDF("key", "bin")
    graft.sources.WebDataset.writeTarAuto(
      bin, outDir, targetShardBytes, "key", Seq("bin" -> "bin"))
  }
}
