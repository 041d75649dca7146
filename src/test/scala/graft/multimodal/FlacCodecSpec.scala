package graft.multimodal

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** FLAC subset codec: exact round trips across predictor orders,
  * partitions, block sizes, and channel counts; CRC/truncation keep
  * paths; cross-codec fingerprint collapse against WAV. */
class FlacCodecSpec extends SparkSpec {
  import spark.implicits._

  private def signal(seed: Long, n: Int): Array[Int] = {
    val win = n / 65
    Array.tabulate(n) { i =>
      val amp = AudioSamples.envelopeAmpQ(seed, i / win)
      if (i % 2 == 0) amp else -amp
    }
  }

  test("decode(encode(s)) returns the exact samples for every FIXED " +
      "order, partition order, multi-frame stream, and partial tail") {
    val s = signal(3L, 65 * 80) // 5200 samples: 2 blocks incl. partial
    for (order <- 0 to 4; pOrd <- Seq(0, 2)) {
      val bytes = FlacCodec.encode(s, 44100, channels = 1,
        blockSize = 4096, order = order, partitionOrder = pOrd)
      val Some((rate, ch, out)) = FlacCodec.decode(bytes)
      assert(rate == 44100 && ch == 1, s"order $order pOrd $pOrd")
      assert(out.toSeq == s.map(_.toLong).toSeq, s"order $order pOrd $pOrd")
    }
    // tiny blocks force >128 frames (the 2-byte coded-number path)
    val small = FlacCodec.encode(signal(4L, 65 * 40), 8000,
      blockSize = 16)
    assert(FlacCodec.decode(small).get._3.length == 65 * 40)
  }

  test("stereo decorrelation round-trips exactly: left-side, right-side, " +
      "and mid-side streams reconstruct asymmetric L/R and mono-mix to " +
      "L+R") {
    val l = signal(7L, 65 * 80)
    val r = l.map(_ / 2) // exact: quantized amps are multiples of 256
    val want = l.indices.map(i => l(i).toLong + r(i)).toSeq
    for (mode <- Seq("left-side", "right-side", "mid-side");
         order <- Seq(0, 2)) {
      val bytes = FlacCodec.encode(l, 44100, channels = 2,
        blockSize = 4096, order = order, right = Some(r),
        stereoMode = mode)
      val Some((_, ch, out)) = FlacCodec.decode(bytes)
      assert(ch == 2 && out.toSeq == want, s"mode $mode order $order")
      // and the decorrelated stream is not just independent in disguise
      val indep = FlacCodec.encode(l, 44100, channels = 2,
        blockSize = 4096, order = order, right = Some(r))
      assert(FlacCodec.decode(indep).get._3.toSeq == want)
      assert(!bytes.sameElements(indep), s"mode $mode stores differently")
    }
    // odd L+R exercises the mid-side parity bit: use L and L-1
    val l2 = signal(8L, 65 * 4)
    val r2 = l2.map(v => if (v > -32768) v - 1 else v)
    val ms = FlacCodec.encode(l2, 8000, channels = 2, right = Some(r2),
      stereoMode = "mid-side")
    assert(FlacCodec.decode(ms).get._3.toSeq ==
      l2.indices.map(i => l2(i).toLong + r2(i)).toSeq)
  }

  test("stereo mono-mixes by exact channel sum; FLAC and WAV encodes " +
      "of one signal land on the SAME fingerprint") {
    (0L until 6L).foreach { seed =>
      val wav = AudioSamples.audioHashOfAny(
        AudioSamples.wavPayloadDepth(seed, 65 * 60, 44100, "pcm16")).get
      for ((ch, order) <- Seq((1, 0), (2, 2))) {
        val flac = AudioSamples.audioHashOfAny(FlacCodec.flacPayload(
          seed, 65 * 60, 44100, channels = ch, order = order))
        assert(flac.contains(wav), s"seed $seed ch $ch order $order")
      }
    }
    // channel sum is exact 2x (scale cancels in the hash, but pin the
    // mix arithmetic directly too)
    val mono = FlacCodec.decode(FlacCodec.flacPayload(1L, 65 * 4, 8000))
      .get._3
    val stereo = FlacCodec.decode(FlacCodec.flacPayload(1L, 65 * 4, 8000,
      channels = 2)).get._3
    assert(stereo.toSeq == mono.map(_ * 2).toSeq)
  }

  test("keep paths: truncation, a flipped byte (CRC), a wrong magic, " +
      "and a wrong sync all decode to None — never a throw") {
    val good = FlacCodec.flacPayload(2L, 65 * 60, 44100)
    assert(FlacCodec.decode(good).isDefined)
    assert(FlacCodec.decode(good.take(30)).isEmpty)
    assert(FlacCodec.decode(good.take(good.length / 2)).isEmpty)
    val flipped = good.clone()
    flipped(good.length / 2) = (flipped(good.length / 2) ^ 0x55).toByte
    assert(FlacCodec.decode(flipped).isEmpty, "CRC must catch a flip")
    assert(FlacCodec.decode("fLaX".getBytes ++ good.drop(4)).isEmpty)
    val badSync = good.clone()
    badSync(42) = 0 // somewhere in the first frame header region
    assert(FlacCodec.decode(badSync).isEmpty)
    assert(FlacCodec.decode(null).isEmpty)
  }

  test("an adversarial wasted-bits count >= the subframe width is " +
      "rejected, not decoded to garbage behind 2^-16 CRC odds") {
    // encode() writes a mono 16-bit stream whose first frame starts at
    // byte 42 ("fLaC" 4 + STREAMINFO block header 4 + STREAMINFO 34);
    // the frame header is 7 bytes + 1 CRC8 byte, so the subframe header
    // byte sits at offset 50: [0 | type:6 | wasted-flag]. FIXED order 0
    // is type 8 → 0x10; setting the flag (0x11) makes the decoder read
    // a unary wasted count from the following (ex-sample) bits.
    val good = FlacCodec.encode(
      Array.tabulate(64)(i => (i * 37 % 101) - 50), 44100, blockSize = 64)
    assert(FlacCodec.decode(good).isDefined)
    val evil = good.clone()
    evil(50) = 0x11
    evil(51) = 0x00 // 8 unary zeros
    evil(52) = 0x00 // 8 more
    evil(53) = 0x80.toByte // terminator → wasted = 16 + 1 = 17 >= bps 16
    assert(FlacCodec.decode(evil).isEmpty,
      "wasted >= bps must reject the stream")
  }

  test("audioHash64 cross-window compare is exact under 128-bit " +
      "products — values that wrap a raw Long cross-multiply") {
    // e * len near the fence: 2^20-magnitude canonical floats summed
    // over ~2^29/65 samples, cross-multiplied by a 2^23 window length
    val cases = Seq(
      (8646911284551352320L, 8257536L, 8646911284551352319L, 8257536L),
      (1L << 62, 4L, (1L << 62) - 1, 4L),
      (7L, 3L, 2L, 11L),
      (0L, 5L, 1L, 5L),
      (Long.MaxValue, Long.MaxValue, Long.MaxValue, Long.MaxValue - 1))
    cases.foreach { case (a, b, c, d) =>
      val exact = (BigInt(a) * BigInt(b)) < (BigInt(c) * BigInt(d))
      assert(AudioSamples.crossLt(a, b, c, d) == exact,
        s"crossLt($a,$b,$c,$d)")
      assert(AudioSamples.crossLt(c, d, a, b) ==
        ((BigInt(c) * BigInt(d)) < (BigInt(a) * BigInt(b))))
    }
  }

  test("audioHashFrameAny dispatches on magic: WAV and FLAC rows hash " +
      "in one pass with their fmt surfaced; corrupt FLAC keeps as null") {
    val rows = Seq(
      (1L, AudioSamples.wavPayloadDepth(9L, 65 * 60, 44100, "pcm16")),
      (2L, FlacCodec.flacPayload(9L, 65 * 60, 44100)),
      (3L, FlacCodec.flacPayload(9L, 65 * 60, 44100, truncateTo = 40)))
      .toDF("media_id", "payload")
    val got = AudioSamples.audioHashFrameAny(rows, "media_id", "payload")
      .select($"media_id", $"ahash", $"fmt")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some((r.getLong(1), r.getString(2)))))
      .toMap
    assert(got(1L).isDefined && got(2L).isDefined && got(3L).isEmpty)
    assert(got(1L).get._1 == got(2L).get._1, "cross-codec collapse")
    assert(got(1L).get._2 == "pcm16" && got(2L).get._2 == "flac")
  }
}
