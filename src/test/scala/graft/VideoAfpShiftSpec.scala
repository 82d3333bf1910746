package graft

import org.apache.spark.sql.functions._

import graft.harness.MediaFixtures
import graft.operators.{AudioFingerprint, VideoFingerprint}

/** Round-14 multimodal additions: video near-dup (stored-raw-frame
  * clips, per-frame dHash rollup) and the AFP multi-anchor shift
  * tolerance (offset re-encodes pairing at Hamming 0).
  */
class VideoAfpShiftSpec extends SparkSpec {

  private lazy val ids = spark.range(0, 60)
    .select(col("id").as("doc_id")).repartition(8, col("doc_id"))

  test("videoPayload frames hash back to their closed-form targets") {
    val p = MediaFixtures.videoPayload(7L)
    assert(p.length == MediaFixtures.BmpFrameBytes * MediaFixtures.VideoFrames)
    (0 until MediaFixtures.VideoFrames).foreach { j =>
      val frame = p.slice(j * MediaFixtures.BmpFrameBytes,
        (j + 1) * MediaFixtures.BmpFrameBytes)
      assert(graft.operators.PerceptualHash.dhash(frame)
        .contains(MediaFixtures.videoFrameTarget(7L, j)),
        s"frame $j did not hash to its target")
    }
  }

  test("video dedup recovers the family clique structure with exact shared counts") {
    val clips = MediaFixtures.syntheticVideos(ids)
    val got = VideoFingerprint.dedup(clips,
        frameBytes = MediaFixtures.BmpFrameBytes, minShared = 3L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val expected = (for {
      a <- 0L until 60L; b <- (a + 1) until 60L
      if a / 5 == b / 5
      shared = MediaFixtures.VideoFrames - math.max(a % 5, b % 5)
      if shared >= 3
    } yield (a, b, shared)).toSet
    assert(got == expected,
      s"missing=${(expected -- got).take(3)} extra=${(got -- expected).take(3)}")
    assert(got.nonEmpty)
  }

  test("clipSignatures matches the DataFrame signature lattice clip-for-clip") {
    import spark.implicits._
    val clips = MediaFixtures.syntheticVideos(ids)
    val fromDf = VideoFingerprint
      .signatures(clips, frameBytes = MediaFixtures.BmpFrameBytes, stride = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap
    val fromSingle = clips.select("media_id", "payload")
      .as[(Long, Array[Byte])].collect()
      .map { case (id, p) =>
        id -> VideoFingerprint
          .clipSignatures(p, MediaFixtures.BmpFrameBytes, stride = 2).toSeq
      }.toMap
    assert(fromSingle == fromDf)
    // Degenerate payloads: empty and sub-frame slices behave like the lattice.
    assert(VideoFingerprint.clipSignatures(
      Array.empty[Byte], MediaFixtures.BmpFrameBytes).isEmpty)
    assert(VideoFingerprint.clipSignatures(
      "short".getBytes("UTF-8"), MediaFixtures.BmpFrameBytes).isEmpty)
  }

  test("incremental video dedup matches the full run restricted to shard pairs") {
    val clips = MediaFixtures.syntheticVideos(ids)
    val dir = java.nio.file.Files.createTempDirectory("graft_vfp_idx_").toString
    VideoFingerprint.signatures(clips.filter(col("media_id") < 30),
        frameBytes = MediaFixtures.BmpFrameBytes)
      .write.mode("overwrite").parquet(dir)
    val incr = VideoFingerprint.dedupIncremental(
        clips.filter(col("media_id") >= 30), spark.read.parquet(dir),
        frameBytes = MediaFixtures.BmpFrameBytes, minShared = 3L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val full = VideoFingerprint.dedup(clips,
        frameBytes = MediaFixtures.BmpFrameBytes, minShared = 3L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .filter { case (a, b, _) => a >= 30 || b >= 30 }.toSet
    assert(incr == full,
      s"missing=${(full -- incr).take(3)} extra=${(incr -- full).take(3)}")
    assert(incr.nonEmpty, "fixture split should produce cross-frame video pairs")
    val bad = intercept[IllegalArgumentException] {
      VideoFingerprint.dedupIncrementalSigs(
        clips.limit(1), spark.read.parquet(dir))
    }
    assert(bad.getMessage.contains("VideoFingerprint.signatures"))
  }

  test("multi-anchor AFP: offset re-encodes share an aligned anchor and pair at 0") {
    val hop = AudioFingerprint.AnchorHop
    val base = MediaFixtures.wavPayload(0L)
    val baseFp = AudioFingerprint.fingerprint(base).get
    // The padded clip's anchor k IS the clean clip's anchor 0.
    (1 to 3).foreach { k =>
      val padded = MediaFixtures.wavPayloadShifted(0L, k * hop)
      val fps = AudioFingerprint.fingerprints(padded)
      assert(fps.contains(baseFp), s"shift of $k hops lost the aligned anchor")
      assert(fps.size <= AudioFingerprint.MaxAnchors)
    }
    // A 3-frame clip carries exactly its anchor-0 fingerprint.
    assert(AudioFingerprint.fingerprints(base) == Seq(baseFp))
    // End-to-end: clean/padded pairs surface at Hamming 0.
    val media = MediaFixtures.syntheticWavsShifted(
      spark.range(0, 20).select(col("id").as("doc_id")).repartition(4, col("doc_id")))
    val got = AudioFingerprint.dedup(media, maxHamming = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val expected = (0L until 10L).map(f => (2 * f, 2 * f + 1, 0)).toSet
    assert(got == expected,
      s"missing=${(expected -- got).take(3)} extra=${(got -- expected).take(3)}")
  }

  test("malformed WAV with two fmt chunks reads all format fields from the first") {
    // A second fmt chunk with bits-per-sample 8 must not poison the
    // 16-bit parse of the first (the advisor's two-fmt finding).
    val good = MediaFixtures.wavPayload(1L)
    val extra = new java.io.ByteArrayOutputStream()
    extra.write(good, 0, 12) // RIFF....WAVE
    extra.write(good, 12, 8 + 16) // the real fmt chunk
    // forged second fmt chunk: PCM mono 8000 Hz but 8 bits/sample
    extra.write("fmt ".getBytes("US-ASCII"))
    extra.write(Array[Byte](16, 0, 0, 0))
    extra.write(Array[Byte](1, 0, 1, 0))
    extra.write(Array[Byte](0x40, 0x1f, 0, 0)) // 8000
    extra.write(Array[Byte](0x40, 0x1f, 0, 0)) // byte rate (8-bit mono)
    extra.write(Array[Byte](1, 0, 8, 0))       // block align 1, bps 8
    extra.write(good, 12 + 8 + 16, good.length - (12 + 8 + 16)) // data chunk
    val forged = extra.toByteArray
    assert(AudioFingerprint.fingerprint(forged) ==
      AudioFingerprint.fingerprint(good),
      "second fmt chunk changed the decode")
  }
}
