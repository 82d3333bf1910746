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
  * Decode status: REAL for all common image formats — [[decodeMedia]]
  * parses 24-bit BMP with pure byte arithmetic and JPEG / PNG / GIF via
  * `javax.imageio.ImageIO` (standard JDK, java.desktop module, fully
  * headless — no native library needed), producing dimensions + mean RGB
  * under one contract. 16-bit PCM WAV audio (sample rate, duration,
  * amplitude stats) is likewise parsed with byte arithmetic. Only video
  * containers (MP4/WebM) and compressed audio (MP3/AAC/Opus) remain
  * behind the deterministic stub (`decodeOne`) — those DO require codec
  * libraries (ffmpeg et al.) the JDK does not ship; a deployment swaps
  * only that body. The Spark-side plumbing — schema, binary handling,
  * partitioning, per-partition batch shape — is real and tested either way.
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

  /** STUB decode for formats the JDK cannot decode — video containers
    * (MP4/WebM) and compressed audio (MP3/AAC/Opus), which need external
    * codec libraries (ffmpeg et al.): rolling checksum + 8-bin byte
    * histogram as a deterministic fake feature vector. Images (BMP via
    * byte arithmetic, JPEG/PNG/GIF via ImageIO) and PCM WAV are decoded
    * for REAL above; a deployment swaps only this body.
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

  // ==========================================================================
  // REAL decode — BMP (byte arithmetic), JPEG/PNG/GIF (javax.imageio,
  // standard JDK, headless), PCM WAV (byte arithmetic). Dimensions + mean
  // RGB channels for images; sample rate / duration + mean-abs / RMS
  // amplitude for audio. Only video containers and compressed audio remain
  // behind the documented stub — those need external codecs (ffmpeg) the
  // JDK does not ship.
  // ==========================================================================

  private def le16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)
  private def le32(b: Array[Byte], off: Int): Int =
    le16(b, off) | (le16(b, off + 2) << 16)

  /** Decoded-media row: `format` is what the magic bytes identified
    * ("bmp" | "wav" | "opaque"); image fields null for audio and vice
    * versa; `feature` = mean-RGB (bmp), [meanAbs, rms] amplitude (wav), or
    * the byte-histogram fallback (opaque).
    */
  val decodedSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("format", StringType, nullable = false),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("duration_ms", LongType, nullable = true),
    StructField("feature", ArrayType(DoubleType, containsNull = false), nullable = false)
  ))

  /** Uncompressed 24-bit BMP: (width, height, [meanR, meanG, meanB]).
    * Rows are bottom-up (or top-down when height < 0) and padded to 4-byte
    * multiples; pixels are stored B,G,R. Channel means are /255-normalized.
    */
  private[operators] def decodeBmp(p: Array[Byte]): Option[(Int, Int, Array[Double])] = {
    if (p.length < 54 || p(0) != 'B' || p(1) != 'M') return None
    val dataOffset = le32(p, 10)
    val width = le32(p, 18)
    val heightRaw = le32(p, 22)
    val height = math.abs(heightRaw)
    val bpp = le16(p, 28)
    val compression = le32(p, 30)
    if (bpp != 24 || compression != 0 || width <= 0 || height == 0) return None
    val rowSize = ((24 * width + 31) / 32) * 4
    if (dataOffset.toLong + rowSize.toLong * height > p.length) return None
    var (sr, sg, sb) = (0.0, 0.0, 0.0)
    var row = 0
    while (row < height) {
      val base = dataOffset + row * rowSize
      var c = 0
      while (c < width) {
        sb += (p(base + c * 3) & 0xff)
        sg += (p(base + c * 3 + 1) & 0xff)
        sr += (p(base + c * 3 + 2) & 0xff)
        c += 1
      }
      row += 1
    }
    val n = width.toDouble * height * 255.0
    Some((width, height, Array(sr / n, sg / n, sb / n)))
  }

  /** Magic-byte sniff for the compressed image formats ImageIO handles.
    * Cheap reject before paying for a decoder lookup on non-image payloads.
    */
  private[graft] def imageFormat(p: Array[Byte]): Option[String] = {
    if (p.length < 8) None
    else if ((p(0) & 0xff) == 0xff && (p(1) & 0xff) == 0xd8 && (p(2) & 0xff) == 0xff) Some("jpeg")
    else if ((p(0) & 0xff) == 0x89 && p(1) == 'P' && p(2) == 'N' && p(3) == 'G') Some("png")
    else if (p(0) == 'G' && p(1) == 'I' && p(2) == 'F' && p(3) == '8') Some("gif")
    else None
  }

  /** JPEG / PNG / GIF via `javax.imageio.ImageIO` — standard JDK
    * (java.desktop), decodes headlessly with no native dependency.
    * Returns (width, height, [meanR, meanG, meanB]) /255-normalized,
    * the same feature contract as [[decodeBmp]]. Channel means are taken
    * over the decoded ARGB pixels (alpha ignored), one row-batch of ints
    * at a time to bound allocation on large images.
    */
  private[graft] def decodeImage(p: Array[Byte]): Option[(Int, Int, Array[Double])] = {
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(p))
      if (img == null) return None
      val w = img.getWidth; val h = img.getHeight
      if (w <= 0 || h <= 0) return None
      var (sr, sg, sb) = (0.0, 0.0, 0.0)
      val rowBuf = new Array[Int](w)
      var y = 0
      while (y < h) {
        img.getRGB(0, y, w, 1, rowBuf, 0, w)
        var x = 0
        while (x < w) {
          val argb = rowBuf(x)
          sr += (argb >>> 16) & 0xff
          sg += (argb >>> 8) & 0xff
          sb += argb & 0xff
          x += 1
        }
        y += 1
      }
      val n = w.toDouble * h * 255.0
      Some((w, h, Array(sr / n, sg / n, sb / n)))
    } catch {
      case _: Exception => None // corrupt payload → caller falls back to opaque
    }
  }

  /** PCM WAV (16-bit): (durationMs, [meanAbs, rms]) with amplitudes
    * normalized to [0, 1] by 32768. Walks RIFF chunks for `fmt ` + `data`.
    */
  private[operators] def decodeWav(p: Array[Byte]): Option[(Long, Array[Double])] = {
    if (p.length < 44 || p(0) != 'R' || p(1) != 'I' || p(2) != 'F' || p(3) != 'F' ||
        p(8) != 'W' || p(9) != 'A' || p(10) != 'V' || p(11) != 'E') return None
    var off = 12
    var sampleRate = 0; var channels = 0; var bits = 0; var fmtCode = 0
    var dataOff = -1; var dataLen = 0
    while (off + 8 <= p.length) {
      val id = new String(p.slice(off, off + 4), "US-ASCII")
      val size = le32(p, off + 4)
      if (id == "fmt " && off + 24 <= p.length) {
        fmtCode = le16(p, off + 8)
        channels = le16(p, off + 10)
        sampleRate = le32(p, off + 12)
        bits = le16(p, off + 22)
      } else if (id == "data") {
        dataOff = off + 8
        dataLen = math.min(size, p.length - dataOff)
      }
      off += 8 + size + (size & 1) // chunks are word-aligned
    }
    if (fmtCode != 1 || bits != 16 || sampleRate <= 0 || channels <= 0 || dataOff < 0) return None
    val bytesPerSec = sampleRate.toLong * channels * (bits / 8)
    val durationMs = dataLen * 1000L / bytesPerSec
    var sumAbs = 0.0; var sumSq = 0.0; var i = dataOff; var n = 0L
    while (i + 1 < dataOff + dataLen) {
      val s = (le16(p, i) << 16 >> 16) / 32768.0 // sign-extend 16-bit LE
      sumAbs += math.abs(s); sumSq += s * s; n += 1
      i += 2
    }
    val cnt = math.max(1L, n).toDouble
    Some((durationMs, Array(sumAbs / cnt, math.sqrt(sumSq / cnt))))
  }

  /** Partition-wise REAL decode, dispatching on magic bytes: BMP (byte
    * arithmetic) and JPEG/PNG/GIF (ImageIO) → dims + mean RGB; PCM WAV
    * audio → duration + amplitude stats; anything else (video, compressed
    * audio, corrupt payloads) → the byte-histogram fallback with format
    * "opaque". Same batch shape as [[extractFeatures]] (codec state, were
    * one needed, would initialize once per partition).
    */
  def decodeMedia(media: DataFrame, batchSize: Int = 256): DataFrame = {
    val spark = media.sparkSession
    val rdd = media
      .select("media_id", "payload")
      .rdd
      .mapPartitions { rows =>
        // ImageIO is headless-safe for decoding; pin it explicitly so a
        // misconfigured executor JVM never tries to touch a display, and
        // skip its disk cache (payloads are in-memory byte arrays).
        System.setProperty("java.awt.headless", "true")
        javax.imageio.ImageIO.setUseCache(false)
        rows.grouped(batchSize).flatMap { batch =>
          batch.iterator.map { r =>
            val id = r.getLong(0)
            val p = if (r.isNullAt(1)) Array.empty[Byte] else r.getAs[Array[Byte]](1)
            decodeBmp(p) match {
              case Some((w, h, rgb)) => Row(id, "bmp", w, h, null, rgb.toSeq)
              case None =>
                imageFormat(p).flatMap(fmt => decodeImage(p).map(d => (fmt, d))) match {
                  case Some((fmt, (w, h, rgb))) => Row(id, fmt, w, h, null, rgb.toSeq)
                  case None =>
                    decodeWav(p) match {
                      case Some((ms, amp)) => Row(id, "wav", null, null, ms, amp.toSeq)
                      case None =>
                        val (_, hist) = decodeOne(p)
                        Row(id, "opaque", null, null, null, hist.toSeq)
                    }
                }
            }
          }
        }
      }
    spark.createDataFrame(rdd, decodedSchema)
  }
}
