package graft.multimodal

import graft.SparkSpec

/** ISO-BMFF box-walk identity: re-muxed containers of the same streams
  * collide on the stream fingerprint, different content separates, and
  * every malformation takes the null keep path. */
class Mp4BoxesSpec extends SparkSpec {
  import spark.implicits._

  test("parse reads brand, timescale, duration, and per-track sample " +
      "tables exactly") {
    val m = Mp4Boxes.parse(Mp4Boxes.mp4Payload(7L, nSamples = 24)).get
    assert(m.majorBrand == "isom")
    assert(m.timescaleHz == 600L && m.durationTicks == 6000L)
    assert(m.durationMs == 10000L)
    assert(m.tracks.map(_.codec) == Seq("avc1", "mp4a"))
    val (vid, aud) = Mp4Boxes.sampleSizes(7L, 24)
    assert(m.tracks(0).sampleCount == 24L &&
      m.tracks(0).sampleBytes == vid.sum)
    assert(m.tracks(1).sampleCount == 24L &&
      m.tracks(1).sampleBytes == aud.sum)
  }

  test("a re-mux (mdat-first, doubled timescale, shifted chunk offsets, " +
      "pad box) collides on the stream fingerprint; different content " +
      "and different sample counts separate") {
    val a = Mp4Boxes.parse(Mp4Boxes.mp4Payload(3L)).get
    val b = Mp4Boxes.parse(Mp4Boxes.mp4Payload(3L, remux = true)).get
    // the containers genuinely differ...
    assert(a.timescaleHz != b.timescaleHz)
    // ...but wall duration and stream identity agree
    assert(a.durationMs == b.durationMs)
    assert(Mp4Boxes.streamFingerprint(a) == Mp4Boxes.streamFingerprint(b))
    val c = Mp4Boxes.parse(Mp4Boxes.mp4Payload(4L)).get
    assert(Mp4Boxes.streamFingerprint(a) != Mp4Boxes.streamFingerprint(c))
    val d = Mp4Boxes.parse(Mp4Boxes.mp4Payload(3L, nSamples = 47)).get
    assert(Mp4Boxes.streamFingerprint(a) != Mp4Boxes.streamFingerprint(d))
  }

  test("keep paths: truncation anywhere, a non-BMFF payload, a box " +
      "overrunning the file, and a hostile sample count all parse to " +
      "None — never a throw or unbounded work") {
    val good = Mp4Boxes.mp4Payload(5L)
    assert(Mp4Boxes.parse(good).isDefined)
    Seq(0, 8, 40, good.length / 2, good.length - 3).foreach { cut =>
      assert(Mp4Boxes.parse(good.take(cut)).isEmpty, s"truncateTo=$cut")
    }
    assert(Mp4Boxes.parse(null).isEmpty)
    assert(Mp4Boxes.parse("not an mp4 at all".getBytes).isEmpty)
    // declared box size overruns the payload
    val overrun = good.clone()
    overrun(0) = 0x7F // first box claims ~2 GB
    assert(Mp4Boxes.parse(overrun).isEmpty)
    // an stsz claiming 2^31 samples must hit the fence, not allocate
    val hostile = good.clone()
    val stszAt = {
      var i = -1
      var j = 0
      while (i < 0 && j + 4 <= hostile.length) {
        if (hostile(j) == 's' && hostile(j + 1) == 't' &&
          hostile(j + 2) == 's' && hostile(j + 3) == 'z') i = j
        j += 1
      }
      i
    }
    assert(stszAt > 0)
    // sample_count field sits 8 bytes into the stsz payload
    hostile(stszAt + 12) = 0x7F.toByte
    assert(Mp4Boxes.parse(hostile).isEmpty)
  }

  test("a version-1 mvhd with a truncated payload (28-31 bytes at EOF) " +
      "takes the keep path instead of reading past the buffer") {
    def be32(v: Long): Array[Byte] = Array(((v >> 24) & 0xFF).toByte,
      ((v >> 16) & 0xFF).toByte, ((v >> 8) & 0xFF).toByte, (v & 0xFF).toByte)
    def bx(typ: String, body: Array[Byte]): Array[Byte] =
      be32(body.length + 8L) ++ typ.getBytes("US-ASCII") ++ body
    val ftyp = bx("ftyp", "isom".getBytes("US-ASCII") ++ be32(512L) ++
      "isom".getBytes("US-ASCII"))
    (28 to 31).foreach { n =>
      // v1 mvhd needs a >= 32-byte payload (duration is u64 at +24);
      // the box ends at EOF so an unguarded u64 read would throw
      val short = bx("mvhd", Array[Byte](1, 0, 0, 0) ++
        Array.fill[Byte](n - 4)(0))
      assert(Mp4Boxes.parse(ftyp ++ bx("moov", short)).isEmpty, s"payload=$n")
    }
  }

  test("an all-tracks-empty stsz (the fragmented-MP4 moov shape) " +
      "abstains instead of minting a degenerate colliding fingerprint") {
    // sample sizes live in moof/traf/trun for fMP4 — the walk never
    // visits them, so fingerprinting (codec, 0, 0, fnvOffset) would
    // merge every fMP4 with the same codec layout
    assert(Mp4Boxes.parse(Mp4Boxes.mp4Payload(5L, nSamples = 0)).isEmpty)
    assert(Mp4Boxes.parse(Mp4Boxes.mp4Payload(11L, nSamples = 0)).isEmpty)
    // a container with real sample tables still parses
    assert(Mp4Boxes.parse(Mp4Boxes.mp4Payload(5L, nSamples = 4)).isDefined)
  }

  test("mp4Frame keeps unparsable rows as nulls and hashes the rest " +
      "in one distributed pass") {
    val rows = Seq(
      (1L, Mp4Boxes.mp4Payload(1L)),
      (2L, Mp4Boxes.mp4Payload(1L, remux = true)),
      (3L, Mp4Boxes.mp4Payload(2L)),
      (4L, Mp4Boxes.mp4Payload(2L, truncateTo = 60)))
      .toDF("media_id", "payload")
    val got = Mp4Boxes.mp4Frame(rows, "media_id", "payload")
      .select($"media_id", $"stream_fp", $"n_tracks", $"codecs")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some((r.getLong(1), r.getInt(2),
          r.getString(3))))).toMap
    assert(got(4L).isEmpty)
    assert(got(1L).isDefined && got(1L) == got(2L))
    assert(got(3L).isDefined && got(3L) != got(1L))
    assert(got(1L).get._2 == 2 && got(1L).get._3 == "avc1,mp4a")
  }
}
