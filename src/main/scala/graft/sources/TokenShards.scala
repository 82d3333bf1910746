package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loader-side scan of a pre-tokenized binary release
  * ([[graft.operators.Packing.tokenTar]] / the curation language's
  * `sink_tokens` terminal step): WebDataset tar shards of raw
  * little-endian int32 payloads, one member per packed sequence, member
  * key = `bucket·2³² + seq`. This is the read path a training loader
  * uses — and the exact decode the `curation_release_tokens*` catalog
  * entries verify against their oracles, so scan-equals-release is
  * driver-gated.
  */
object TokenShards {

  /** Decode a released shard directory back to `(bucket, seq, ids, n)`
    * — the [[graft.operators.Packing.packTokenIds]] output shape. One
    * tar = one `binaryFile` row, so parallelism is per-shard (size
    * shards via `target_bytes` at write time); decode is a map-side
    * byte flip, zero exchanges.
    */
  def scanTokens(spark: SparkSession, shardsDir: String): DataFrame = {
    import spark.implicits._
    WebDataset.scanTar(spark, shardsDir)
      .select(col("key"), col("payload")).as[(String, Array[Byte])]
      .map { case (key, bytes) =>
        val k = key.toLong
        val bb = java.nio.ByteBuffer.wrap(bytes)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        val ids = Array.fill(bytes.length / 4)(bb.getInt())
        ((k >> 32).toInt, k & 0xffffffffL, ids, ids.length)
      }.toDF("bucket", "seq", "ids", "n")
  }

  /** STREAMING consumption of a GROWING token release — the loader tail
    * for corpora released continuously ([[graft.operators.Packing.tokenSink]]
    * appends `batch=<id>` shard dirs as curation batches land): tail the
    * shards directory via [[WebDataset.streamTar]] (checkpointed
    * exactly-once file tracking, `maxFilesPerTrigger` bounds per-batch
    * bytes) and decode members with the identical byte flip as
    * [[scanTokens]] — a training feed sees each packed sequence exactly
    * once, in shard-arrival order.
    */
  def streamTokens(
      spark: SparkSession, shardsDir: String,
      maxFilesPerTrigger: Int = 16): DataFrame = {
    import spark.implicits._
    WebDataset.streamTar(spark, shardsDir, maxFilesPerTrigger)
      .select(col("key"), col("payload")).as[(String, Array[Byte])]
      .map { case (key, bytes) =>
        val k = key.toLong
        val bb = java.nio.ByteBuffer.wrap(bytes)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        val ids = Array.fill(bytes.length / 4)(bb.getInt())
        ((k >> 32).toInt, k & 0xffffffffL, ids, ids.length)
      }.toDF("bucket", "seq", "ids", "n")
  }

  /** [[scanTokens]] joined with the released vocab (`path/vocab`) back
    * to token strings — the debugging/inspection decode: `(bucket, seq,
    * pos, tok_id, tok)`, OOV id 0 decodes to null. Vocab broadcasts;
    * the sequence explode is map-side.
    */
  def decodeTokens(spark: SparkSession, releaseDir: String): DataFrame = {
    val vocab = spark.read.parquet(s"$releaseDir/vocab")
    scanTokens(spark, s"$releaseDir/shards")
      .select(col("bucket"), col("seq"),
        posexplode(col("ids")).as(Seq("pos", "tok_id")))
      .join(broadcast(vocab), Seq("tok_id"), "left")
      .select("bucket", "seq", "pos", "tok_id", "tok")
  }
}
