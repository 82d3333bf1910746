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

  /** Frame sampling over an opaque media payload: every `stride`-th
    * fixed-size chunk, as (media_id, frame_idx, frame_bytes) rows.
    *
    * For byte-addressable formats this is pure expressions (sequence →
    * explode → substring), fully codegen'd — sampling 1B payloads never
    * leaves Tungsten. Codec-addressable formats (video GOPs, audio
    * packets) swap in [[sampleFramesDecoded]], the partition-wise hook.
    */
  def sampleFrames(media: DataFrame, frameBytes: Int, stride: Int): DataFrame = {
    val nFrames = ceil(octet_length(col("payload")).cast("double") / frameBytes).cast("int")
    media
      .select(
        col("media_id"),
        explode(sequence(lit(0), greatest(nFrames - 1, lit(0)), lit(stride))).as("frame_idx"),
        col("payload"))
      .select(
        col("media_id"),
        col("frame_idx"),
        substring(col("payload"), col("frame_idx") * frameBytes + 1, lit(frameBytes)).as("frame_bytes"))
      .filter(octet_length(col("frame_bytes")) > 0)
  }

  private val frameSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("frame_idx", IntegerType, nullable = false),
    StructField("frame_bytes", BinaryType, nullable = true)
  ))

  /** Partition-wise frame sampling for codec-addressable media — the
    * `mapInPandas`-shaped hook where a real decoder (initialized once per
    * partition) would seek keyframes. The STUB slices fixed-size chunks,
    * matching [[sampleFrames]] exactly (asserted in tests).
    */
  def sampleFramesDecoded(media: DataFrame, frameBytes: Int, stride: Int): DataFrame = {
    val spark = media.sparkSession
    val rdd = media
      .select("media_id", "payload")
      .rdd
      .mapPartitions { rows =>
        // Real codecs initialize their decoder state here, once.
        rows.flatMap { r =>
          val id = r.getLong(0)
          val payload = if (r.isNullAt(1)) Array.empty[Byte] else r.getAs[Array[Byte]](1)
          val nFrames = math.max(1, (payload.length + frameBytes - 1) / frameBytes)
          (0 until nFrames by stride).iterator
            .map(i => Row(id, i, payload.slice(i * frameBytes, math.min((i + 1) * frameBytes, payload.length))))
            .filter(_.getAs[Array[Byte]](2).nonEmpty)
        }
      }
    spark.createDataFrame(rdd, frameSchema)
  }

  /** Resize metadata projection — the codec-free half of an image resize:
    * recompute target dims preserving aspect ratio as pure expressions.
    * The pixel work belongs in the [[extractFeatures]]-style hook; this
    * keeps the metadata column flowing through codegen.
    */
  def resizeMeta(media: DataFrame, maxDim: Int): DataFrame = {
    val w = col("meta.width").cast("double")
    val h = col("meta.height").cast("double")
    val scale = least(lit(1.0), lit(maxDim) / greatest(w, h))
    media.withColumn(
      "resize_meta",
      struct(
        round(w * scale).cast(IntegerType).as("target_width"),
        round(h * scale).cast(IntegerType).as("target_height"),
        scale.as("scale")))
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
