package graft.multimodal

import graft.SparkSpec

/** MP3 frame-walk identity: re-tagged copies collide, re-encodes
  * separate, malformations keep as None. */
class Mp3FramesSpec extends SparkSpec {
  import spark.implicits._

  test("parse walks every frame: count, exact duration, CBR flag, " +
      "rate/channels from the stream not the tags") {
    val m = Mp3Frames.parse(Mp3Frames.mp3Payload(5L, nFrames = 24)).get
    assert(m.version == 3 && m.sampleRate == 44100 && m.channels == 2)
    assert(m.nFrames == 24 && m.cbr)
    // 24 frames x 1152 samples at 44100 Hz = 626.9 ms, integer floor
    assert(m.durationMs == 24L * 1152L * 1000L / 44100L)
    // frame region: 8 padded (f%3==0) + 16 unpadded frames
    assert(m.frameBytes == 8L * 418 + 16L * 417)
  }

  test("a re-tagged copy (different ID3v2 AND ID3v1) collides on the " +
      "stream fingerprint; different content and frame counts separate") {
    val a = Mp3Frames.parse(Mp3Frames.mp3Payload(3L)).get
    val b = Mp3Frames.parse(Mp3Frames.mp3Payload(3L, retagSeed = 9L)).get
    assert(Mp3Frames.mp3Payload(3L).length !=
      Mp3Frames.mp3Payload(3L, retagSeed = 9L).length,
      "the tag rewrite must actually change the file bytes")
    assert(a.streamFp == b.streamFp && a.nFrames == b.nFrames)
    val c = Mp3Frames.parse(Mp3Frames.mp3Payload(4L)).get
    assert(a.streamFp != c.streamFp)
    val d = Mp3Frames.parse(Mp3Frames.mp3Payload(3L, nFrames = 23)).get
    assert(a.streamFp != d.streamFp)
  }

  test("keep paths: truncation mid-frame, garbage, an empty frame " +
      "region, free-format and reserved headers all parse to None") {
    val good = Mp3Frames.mp3Payload(7L)
    assert(Mp3Frames.parse(good).isDefined)
    assert(Mp3Frames.parse(good.take(good.length - 200)).isEmpty,
      "mid-frame truncation must reject")
    assert(Mp3Frames.parse(null).isEmpty)
    assert(Mp3Frames.parse("not audio".getBytes).isEmpty)
    // free-format bitrate (index 0) is unsupported: frame length unknown
    val free = good.clone()
    val firstFrame = {
      var i = 10 + "TIT2-title-3000-".length // skip ID3v2 sizing varies —
      // find the sync instead
      var j = 0
      while (!((free(j) & 0xFF) == 0xFF && (free(j + 1) & 0xE0) == 0xE0))
        j += 1
      j
    }
    free(firstFrame + 2) = (free(firstFrame + 2) & 0x0F).toByte // brIdx=0
    assert(Mp3Frames.parse(free).isEmpty)
    // mid-stream garbage between frames rejects (the strict-walk pin)
    val glued = good.dropRight(128) ++ Array[Byte](0, 1, 2, 3) ++
      Mp3Frames.mp3Payload(7L).drop(
        10 + s"TIT2-title-7000-".getBytes.length).dropRight(128)
    assert(Mp3Frames.parse(glued).isEmpty)
  }

  test("mp3Frame keeps unparsable rows as nulls in one distributed pass") {
    val rows = Seq(
      (1L, Mp3Frames.mp3Payload(1L)),
      (2L, Mp3Frames.mp3Payload(1L, retagSeed = 5L)),
      (3L, Mp3Frames.mp3Payload(2L)),
      (4L, Mp3Frames.mp3Payload(2L, truncateTo = 300)))
      .toDF("media_id", "payload")
    val got = Mp3Frames.mp3Frame(rows, "media_id", "payload")
      .select($"media_id", $"stream_fp", $"n_frames", $"cbr")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None
         else Some((r.getLong(1), r.getInt(2), r.getBoolean(3))))).toMap
    assert(got(4L).isEmpty)
    assert(got(1L).isDefined && got(1L) == got(2L))
    assert(got(3L).isDefined && got(3L) != got(1L))
  }
}
