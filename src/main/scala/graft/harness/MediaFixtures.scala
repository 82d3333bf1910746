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
  *   - id % 3 == 0 → MP4:  width 16 + id%64, height 16 + (7·id)%64,
  *     timescale 1000, duration 500 + id%1000 ticks → duration_ms same.
  *   - id % 3 == 1 → MP3:  MPEG-1 Layer III, 128 kbps, 44100 Hz,
  *     5 + id%20 frames → duration_ms = frames·1152·1000 / 44100 (floor).
  *   - id % 3 == 2 → WebM: width 32 + id%128, height 32 + (3·id)%128,
  *     TimecodeScale 1 000 000 ns, Duration 250 + id%500 ticks (ms).
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

  def payloadFor(id: Long): Array[Byte] = (id % 3) match {
    case 0 => mp4Payload(id)
    case 1 => mp3Payload(id)
    case _ => webmPayload(id)
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
