package graft.harness

import java.io.ByteArrayOutputStream

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/** Deterministic container-payload generators for the oracle harness:
  * given a doc id, emit a tiny VALID MP4 / MP3 / WebM byte stream whose
  * metadata (dims, duration, bitrate) is a closed-form function of the
  * id. The correctness driver can then check
  * [[graft.operators.Multimodal.containerMeta]] against plain SQL on
  * doc_id — builder (writes boxes) and parser (walks boxes) are
  * independent code paths, so the oracle genuinely exercises the parse.
  *
  * Parameter map (id = doc_id):
  *   - id % 6 == 0 → MP4:  width 16 + id%64, height 16 + (7·id)%64,
  *     timescale 1000, duration 500 + id%1000 ticks → duration_ms same.
  *   - id % 6 == 1 → MP3:  MPEG-1 Layer III, 128 kbps, 44100 Hz,
  *     5 + id%20 frames → duration_ms = frames·1152·1000 / 44100 (floor).
  *   - id % 6 == 2 → WebM: width 32 + id%128, height 32 + (3·id)%128,
  *     TimecodeScale 1 000 000 ns, Duration 250 + id%500 ticks (ms).
  *   - id % 6 == 3 → FLAC: 44100 Hz, total samples (10 + id%50)·4410 →
  *     duration_ms = (10 + id%50)·100 exactly.
  *   - id % 6 == 4 → Ogg/Vorbis: 44100 Hz, nominal 112000 bps → 112
  *     kbps, last-page granule (20 + id%100)·441 →
  *     duration_ms = (20 + id%100)·10 exactly.
  *   - id % 6 == 5 → AAC ADTS: 44100 Hz, 3 + id%15 frames of 200 bytes,
  *     1024 samples each → duration_ms = frames·1024·1000 / 44100
  *     (floor), bitrate_kbps = frames·200·8 / duration_ms (floor).
  */
object MediaFixtures {

  private def be16(o: ByteArrayOutputStream, v: Int): Unit = {
    o.write((v >>> 8) & 0xff); o.write(v & 0xff)
  }
  private def be32(o: ByteArrayOutputStream, v: Long): Unit = {
    be16(o, ((v >>> 16) & 0xffff).toInt); be16(o, (v & 0xffff).toInt)
  }
  private def box(name: String, content: Array[Byte]): Array[Byte] = {
    val o = new ByteArrayOutputStream()
    be32(o, content.length + 8L)
    o.write(name.getBytes("US-ASCII"))
    o.write(content)
    o.toByteArray
  }

  def mp4Payload(id: Long): Array[Byte] = {
    val width = 16 + (id % 64).toInt
    val height = 16 + ((7 * id) % 64).toInt
    val duration = 500 + (id % 1000)

    val ftyp = {
      val o = new ByteArrayOutputStream()
      o.write("isom".getBytes("US-ASCII")); be32(o, 0L)
      box("ftyp", o.toByteArray)
    }
    val mvhd = {
      val o = new ByteArrayOutputStream()
      be32(o, 0L)          // version 0 + flags
      be32(o, 0L); be32(o, 0L) // creation, modification
      be32(o, 1000L)       // timescale
      be32(o, duration)    // duration (ticks = ms at timescale 1000)
      be32(o, 0x00010000L) // rate 1.0
      be16(o, 0x0100)      // volume 1.0
      o.write(new Array[Byte](10)) // reserved
      o.write(new Array[Byte](36)) // matrix
      o.write(new Array[Byte](24)) // pre_defined
      be32(o, 2L)          // next_track_ID
      box("mvhd", o.toByteArray)
    }
    val tkhd = {
      val o = new ByteArrayOutputStream()
      be32(o, 0L)          // version 0 + flags
      be32(o, 0L); be32(o, 0L) // creation, modification
      be32(o, 1L)          // track_ID
      be32(o, 0L)          // reserved
      be32(o, duration)    // duration
      o.write(new Array[Byte](8)) // reserved
      be16(o, 0); be16(o, 0)      // layer, alternate_group
      be16(o, 0); be16(o, 0)      // volume (video: 0), reserved
      o.write(new Array[Byte](36)) // matrix
      be32(o, width.toLong << 16)  // 16.16 fixed
      be32(o, height.toLong << 16)
      box("tkhd", o.toByteArray)
    }
    val moov = box("moov", box("trak", tkhd) ++ mvhd)
    ftyp ++ moov
  }

  def mp3Payload(id: Long): Array[Byte] = {
    val frames = 5 + (id % 20).toInt
    val frameLen = 144000 * 128 / 44100 // 417, no padding
    val o = new ByteArrayOutputStream()
    var f = 0
    while (f < frames) {
      o.write(0xff); o.write(0xfb) // sync + MPEG1 + Layer III + no CRC
      o.write(0x90)                // bitrate idx 9 (128k), 44100, no pad
      o.write(0x00)
      var i = 4
      while (i < frameLen) { o.write(((id + f + i) & 0xff).toInt); i += 1 }
      f += 1
    }
    o.toByteArray
  }

  def webmPayload(id: Long): Array[Byte] = {
    val width = 32 + (id % 128).toInt
    val height = 32 + ((3 * id) % 128).toInt
    val durationTicks = (250 + (id % 500)).toFloat

    def elem(idBytes: Array[Int], content: Array[Byte]): Array[Byte] = {
      require(content.length <= 126)
      val o = new ByteArrayOutputStream()
      idBytes.foreach(o.write)
      o.write(0x80 | content.length) // 1-byte size vint
      o.write(content)
      o.toByteArray
    }
    def uint(v: Long, n: Int): Array[Byte] =
      (1 to n).map(i => ((v >>> (8 * (n - i))) & 0xff).toByte).toArray

    val ebml = elem(Array(0x1a, 0x45, 0xdf, 0xa3), Array.empty)
    val info = elem(Array(0x15, 0x49, 0xa9, 0x66),
      elem(Array(0x2a, 0xd7, 0xb1), uint(1000000L, 3)) ++
        elem(Array(0x44, 0x89), uint(java.lang.Float.floatToIntBits(durationTicks).toLong & 0xffffffffL, 4)))
    val video = elem(Array(0xe0),
      elem(Array(0xb0), uint(width.toLong, 2)) ++ elem(Array(0xba), uint(height.toLong, 2)))
    val tracks = elem(Array(0x16, 0x54, 0xae, 0x6b), elem(Array(0xae), video))
    val segment = elem(Array(0x18, 0x53, 0x80, 0x67), info ++ tracks)
    ebml ++ segment
  }

  def flacPayload(id: Long): Array[Byte] = {
    val totalSamples = (10 + id % 50) * 4410
    val o = new ByteArrayOutputStream()
    o.write("fLaC".getBytes("US-ASCII"))
    o.write(0x80) // last block + type 0 (STREAMINFO)
    o.write(0); be16(o, 34) // 3-byte length
    be16(o, 4096); be16(o, 4096) // min/max block size
    o.write(new Array[Byte](6))  // min/max frame size (unknown)
    // 20-bit sample rate 44100 | 3-bit channels-1 (1) | 5-bit bps-1 (15)
    // | 36-bit total samples, packed MSB-first into 8 bytes.
    val sr = 44100L
    val packed = (sr << 44) | (1L << 41) | (15L << 36) | totalSamples
    (0 until 8).foreach(i => o.write(((packed >>> (8 * (7 - i))) & 0xff).toInt))
    o.write(new Array[Byte](16)) // MD5
    o.toByteArray
  }

  def oggPayload(id: Long): Array[Byte] = {
    val granule = (20 + id % 100) * 441
    def le32o(o: ByteArrayOutputStream, v: Long): Unit =
      (0 until 4).foreach(i => o.write(((v >>> (8 * i)) & 0xff).toInt))
    def page(typeFlag: Int, gran: Long, seq: Int, payload: Array[Byte]): Array[Byte] = {
      require(payload.length < 255)
      val o = new ByteArrayOutputStream()
      o.write("OggS".getBytes("US-ASCII")); o.write(0); o.write(typeFlag)
      (0 until 8).foreach(i => o.write(((gran >>> (8 * i)) & 0xff).toInt))
      le32o(o, 0x6772L); le32o(o, seq.toLong); le32o(o, 0L) // serial, seq, crc (unchecked)
      o.write(1); o.write(payload.length) // one lacing segment
      o.write(payload)
      o.toByteArray
    }
    val idHeader = {
      val o = new ByteArrayOutputStream()
      o.write(0x01); o.write("vorbis".getBytes("US-ASCII"))
      le32o(o, 0L)      // version
      o.write(2)        // channels
      le32o(o, 44100L)  // sample rate
      le32o(o, 0L); le32o(o, 112000L); le32o(o, 0L) // br max/nominal/min
      o.write(0xb8); o.write(0x01) // blocksizes + framing
      o.toByteArray
    }
    page(0x02, 0L, 0, idHeader) ++ page(0x04, granule, 1, Array[Byte](0x00))
  }

  def adtsPayload(id: Long): Array[Byte] = {
    val frames = (3 + id % 15).toInt
    val frameLen = 200
    val o = new ByteArrayOutputStream()
    var f = 0
    while (f < frames) {
      o.write(0xff); o.write(0xf1)  // sync + MPEG-4 + layer 00 + no CRC
      o.write((1 << 6) | (4 << 2))  // AAC-LC, sample-rate index 4 (44100)
      o.write((2 << 6) | ((frameLen >> 11) & 0x03)) // 2 channels + len hi
      o.write((frameLen >> 3) & 0xff)               // len mid
      o.write(((frameLen & 0x07) << 5) | 0x1f)      // len lo + buffer fullness
      o.write(0xfc)                                 // fullness lo + rdb = 0 (1 block)
      var i = 7
      while (i < frameLen) { o.write(((id + f + i) & 0xff).toInt); i += 1 }
      f += 1
    }
    o.toByteArray
  }

  def payloadFor(id: Long): Array[Byte] = (id % 6) match {
    case 0 => mp4Payload(id)
    case 1 => mp3Payload(id)
    case 2 => webmPayload(id)
    case 3 => flacPayload(id)
    case 4 => oggPayload(id)
    case _ => adtsPayload(id)
  }

  private val mediaIdPayloadSchema = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("payload", BinaryType, nullable = true)))

  /** (media_id, payload) frame of synthetic container payloads, one per
    * input id — generated partition-wise (pure function of the id; no
    * driver-side materialization).
    */
  def syntheticContainers(ids: DataFrame): DataFrame = {
    val spark = ids.sparkSession
    val rdd = ids.rdd.mapPartitions(_.map { r =>
      val id = r.getLong(0)
      Row(id, payloadFor(id))
    })
    spark.createDataFrame(rdd, mediaIdPayloadSchema)
  }
}
