package graft.multimodal

import java.nio.{ByteBuffer, ByteOrder}

import graft.SparkSpec

class AudioHeadersSpec extends SparkSpec {
  import spark.implicits._

  private def wav(rate: Int, ch: Int, dataBytes: Int): Array[Byte] = {
    val bb = ByteBuffer.allocate(44 + dataBytes)
      .order(ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataBytes)
    bb.put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
    bb.putShort(1)                  // PCM
    bb.putShort(ch.toShort)
    bb.putInt(rate)
    bb.putInt(rate * ch * 2)        // byte rate
    bb.putShort((ch * 2).toShort)   // block align
    bb.putShort(16)                 // bits per sample
    bb.put("data".getBytes("US-ASCII")).putInt(dataBytes)
    bb.array()
  }

  private def flac(rate: Int, ch: Int): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 + 34 + 16)
    bb.put("fLaC".getBytes("US-ASCII"))
    bb.put(0x80.toByte)             // last-block flag + type 0 STREAMINFO
    bb.put(Array(0, 0, 34).map(_.toByte)) // block length
    bb.put(new Array[Byte](10))     // block/frame size fields
    // 20-bit sample rate, 3-bit channels-1, 5-bit bps-1 packed big-endian
    bb.put((rate >> 12).toByte)
    bb.put(((rate >> 4) & 0xFF).toByte)
    bb.put((((rate & 0xF) << 4) | ((ch - 1) << 1)).toByte)
    bb.array()
  }

  private def mp3(withId3: Boolean): Array[Byte] = {
    val id3 = if (withId3) {
      val t = ByteBuffer.allocate(10 + 100)
      t.put("ID3".getBytes("US-ASCII")).put(3.toByte).put(0.toByte)
      t.put(0.toByte)               // flags
      t.put(Array(0, 0, 0, 100).map(_.toByte)) // synchsafe size = 100
      t.array()
    } else Array.emptyByteArray
    // MPEG1 Layer III, 44100 Hz (rate index 0), joint stereo
    val frame = Array(0xFF, 0xFB, 0x90, 0x40).map(_.toByte) ++
      new Array[Byte](64)
    id3 ++ frame
  }

  test("WAV/FLAC/MP3 headers parse to sample rate + channels; ID3 tags " +
       "skip; junk stays unknown") {
    assert(AudioHeaders.parse(wav(44100, 2, 1000)) ==
      (("wav", 44100, 2, 1000L)))
    assert(AudioHeaders.parse(wav(16000, 1, 320)) ==
      (("wav", 16000, 1, 320L)))
    assert(AudioHeaders.parse(flac(48000, 2))._1 == "flac")
    assert(AudioHeaders.parse(flac(48000, 2))._2 == 48000)
    assert(AudioHeaders.parse(flac(48000, 2))._3 == 2)
    assert(AudioHeaders.parse(flac(22050, 1))._2 == 22050)
    val m = AudioHeaders.parse(mp3(withId3 = false))
    assert(m._1 == "mp3" && m._2 == 44100 && m._3 == 2)
    val mId3 = AudioHeaders.parse(mp3(withId3 = true))
    assert(mId3._1 == "mp3" && mId3._2 == 44100)
    assert(AudioHeaders.parse("not audio".getBytes("UTF-8"))._1
      == "unknown")
    assert(AudioHeaders.parse(Array.emptyByteArray)._1 == "unknown")
    assert(AudioHeaders.parse(wav(44100, 2, 1000).take(20))._1
      == "unknown")
    // a RIFF with a corrupt (overflowing) chunk size stops the walk
    // cleanly — the fmt fields parsed BEFORE the corruption still
    // report (the data-chunk size is simply never reached)
    val bad = wav(44100, 2, 8)
    bad(16) = 0xFF.toByte; bad(17) = 0xFF.toByte
    bad(18) = 0xFF.toByte; bad(19) = 0xFF.toByte
    val parsed = AudioHeaders.parse(bad)
    assert(parsed._1 == "wav" && parsed._2 == 44100 && parsed._3 == 2)
  }

  test("headerCodec binds audio into the SAME decodePartitions seam as " +
       "images: meta dims carry (sample_rate, channels)") {
    val rows = Seq(
      (1L, wav(44100, 2, 1000)), (2L, flac(48000, 1)),
      (3L, mp3(withId3 = true)), (4L, "junk".getBytes("UTF-8")))
      .toDF("media_id", "payload")
    val out = Multimodal.decodePartitions(rows, "media_id", "payload",
        codec = AudioHeaders.headerCodec)
      .select($"media_id", $"meta.format", $"meta.width", $"meta.height")
      .as[(Long, String, Int, Int)].collect().sortBy(_._1).toSeq
    assert(out == Seq(
      (1L, "wav", 44100, 2), (2L, "flac", 48000, 1),
      (3L, "mp3", 44100, 2), (4L, "unknown", 0, 0)))
  }
}
