package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: opaque `binary` payloads with typed
  * metadata, plus a partition-wise "decode / feature-extract" stage.
  *
  * The real pipeline shape for a 100 TB corpus: payloads stay opaque
  * binary; metadata (modality, codec, dims, durations) rides alongside in
  * typed columns; decode/resize/frame-sample runs partition-wise in
  * batches (the JVM analogue of `mapInPandas`) so codec state is
  * initialized once per partition, not per row.
  *
  * The actual media decode is STUBBED (no image/audio libs in this
  * container): `decodeStub` derives deterministic fake features from the
  * bytes. The Spark-side plumbing — schema, binary handling, partitioning,
  * per-partition batch shape — is real and tested.
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("modality", StringType, nullable = false),
    StructField("payload", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("codec", StringType, nullable = true),
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("duration_ms", LongType, nullable = true)
    )), nullable = true)
  ))

  /** Wrap any table with an id + string column into the media schema,
    * treating the string's UTF-8 bytes as the opaque payload.
    */
  def asMedia(df: DataFrame, idCol: String, payloadCol: String, modality: String): DataFrame =
    df.select(
      col(idCol).cast(LongType).as("media_id"),
      lit(modality).as("modality"),
      encode(col(payloadCol), "UTF-8").as("payload"),
      struct(
        lit("raw").as("codec"),
        lit(null).cast(IntegerType).as("width"),
        lit(null).cast(IntegerType).as("height"),
        lit(null).cast(LongType).as("duration_ms")).as("meta"))

  /** Pure-expression payload metrics — anything derivable WITHOUT a codec
    * stays a codegen'd Column over the binary payload; only the actual
    * decode belongs in the partition-wise [[extractFeatures]] hook.
    * (Routing these through the RDD hook forfeits whole-stage codegen and
    * AQE for no reason.)
    */
  def nBytes(payload: Column): Column = coalesce(octet_length(payload), lit(0)).cast(LongType)
  def payloadChecksum(payload: Column): Column = xxhash64(payload)

  private val featureSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("modality", StringType, nullable = false),
    StructField("n_bytes", LongType, nullable = false),
    StructField("checksum", LongType, nullable = false),
    StructField("feature", ArrayType(DoubleType, containsNull = false), nullable = false)
  ))

  /** Partition-wise decode/feature-extract over media rows, batched like a
    * Pandas-UDF pipeline. The per-byte "decode" is a deterministic stub
    * (rolling checksum + an 8-dim byte-histogram "embedding"); a real
    * deployment swaps ONLY the body of `decodeOne`.
    */
  def extractFeatures(media: DataFrame, batchSize: Int = 256): DataFrame = {
    val spark = media.sparkSession
    val rdd = media
      .select("media_id", "modality", "payload")
      .rdd
      .mapPartitions { rows =>
        // One-time per-partition "codec init" happens here in a real decoder.
        rows.grouped(batchSize).flatMap { batch =>
          batch.iterator.map { r =>
            val id = r.getLong(0)
            val modality = r.getString(1)
            val payload = if (r.isNullAt(2)) Array.empty[Byte] else r.getAs[Array[Byte]](2)
            val (checksum, hist) = decodeOne(payload)
            Row(id, modality, payload.length.toLong, checksum, hist.toSeq)
          }
        }
      }
    spark.createDataFrame(rdd, featureSchema)
  }

  /** STUB decode: rolling checksum + 8-bin byte histogram normalized to a
    * fake feature vector. Replace with the real codec call at deploy time.
    */
  private def decodeOne(payload: Array[Byte]): (Long, Array[Double]) = {
    var checksum = 0L
    val hist = new Array[Double](8)
    var i = 0
    while (i < payload.length) {
      val b = payload(i) & 0xff
      checksum = checksum * 31 + b
      hist(b % 8) += 1.0
      i += 1
    }
    val total = math.max(1.0, payload.length.toDouble)
    (checksum, hist.map(_ / total))
  }
}
