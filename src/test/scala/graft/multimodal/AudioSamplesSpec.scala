package graft.multimodal

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** WAV PCM16 decode + energy-envelope fingerprint: exact bit
  * semantics, decode keep paths, clone invariances, exhaustive pair
  * recount. */
class AudioSamplesSpec extends SparkSpec {
  import spark.implicits._

  test("decodePcm16 parses rate/channels/samples exactly and mono-mixes " +
      "stereo by exact channel sum") {
    val mono = AudioSamples.wavPayload(3L, 130, 8000)
    val Some((rate, ch, samples)) = AudioSamples.decodePcm16(mono)
    assert(rate == 8000 && ch == 1 && samples.length == 130)
    // the rendered square wave alternates +amp/-amp on the window grid
    val amp0 = AudioSamples.envelopeAmp(3L, 0)
    assert(samples(0) == amp0 && samples(1) == -amp0)
    val stereo = AudioSamples.wavPayload(3L, 130, 8000, channels = 2)
    val Some((_, ch2, s2)) = AudioSamples.decodePcm16(stereo)
    assert(ch2 == 2 && s2.length == 130 && s2(0) == 2 * amp0)
  }

  test("decode keep path: truncated, non-RIFF, and short payloads are " +
      "None; audioHashFrame keeps them as null rows") {
    val wav = AudioSamples.wavPayload(1L, 130, 8000)
    assert(AudioSamples.decodePcm16(wav.take(20)).isEmpty)
    assert(AudioSamples.decodePcm16("not audio at all not audio at all"
      .getBytes ++ new Array[Byte](20)).isEmpty)
    assert(AudioSamples.decodePcm16(null).isEmpty)
    val rows = Seq((1L, wav), (2L, wav.take(20))).toDF("media_id", "payload")
    val got = AudioSamples.audioHashFrame(rows, "media_id", "payload")
      .orderBy($"media_id")
      .select($"media_id", $"ahash".isNull, $"sample_rate")
      .as[(Long, Boolean, Option[Int])].collect().toSeq
    assert(got == Seq((1L, false, Some(8000)), (2L, true, None)))
  }

  test("fingerprint bits follow strict rising-energy comparisons; " +
      "monotone envelopes saturate the hash") {
    // strictly rising amplitudes -> every bit set
    val n = 65 * 2
    val up = Array.tabulate(n)(i => (i / 2 + 1) * (if (i % 2 == 0) 1 else -1))
    assert(AudioSamples.audioHash64(up) == -1L)
    val flat = Array.fill(n)(7)
    assert(AudioSamples.audioHash64(flat) == 0L)
  }

  test("clone invariances: gain shift, 65-aligned length scaling, rate " +
      "relabel, and stereo re-encode all reproduce the hash exactly") {
    (0L until 24L).foreach { seed =>
      val orig = AudioSamples.audioHashOf(
        AudioSamples.wavPayload(seed, 65 * 60, 44100)).get
      val clone = AudioSamples.audioHashOf(AudioSamples.wavPayload(
        seed, 65 * 120, 22050, channels = 2, gainShift = 1)).get
      assert(orig == clone, s"seed $seed")
    }
  }

  test("distinct seeds separate far beyond the pairing fence") {
    val hs = (0L until 24L).map(s => AudioSamples.audioHashOf(
      AudioSamples.wavPayload(s, 65 * 60, 44100)).get)
    val minDist = (for {
      i <- hs.indices; j <- hs.indices if i < j
    } yield java.lang.Long.bitCount(hs(i) ^ hs(j))).min
    assert(minDist > 8, s"cross-seed min hamming $minDist too small")
  }

  test("audioNearDups equals the exhaustive driver recount on a planted " +
      "clone corpus and drops only undecodable rows") {
    val ids = (0L until 24L).toDF("id")
    val media = AudioSamples.fixtureFrame(ids, "id", 65 * 60, 44100)
      .unionByName(AudioSamples.fixtureFrame(
        ids.filter($"id" % 3 === 0), "id", 65 * 120, 22050, channels = 2,
        gainShift = 1, idOffset = 100000L))
      .unionByName(AudioSamples.fixtureFrame(ids.filter($"id" === 0),
        "id", 65 * 2, 8000, idOffset = 999999L, truncateTo = 20))
    val got = AudioSamples.audioNearDups(media, "media_id", "payload",
        maxDist = 4)
      .as[(Long, Long, Int)].collect().toSet
    val hs = ((0L until 24L).map(s => s -> AudioSamples.audioHashOf(
        AudioSamples.wavPayload(s, 65 * 60, 44100)).get)
      ++ (0L until 24L).filter(_ % 3 == 0).map(s => (s + 100000L) ->
        AudioSamples.audioHashOf(AudioSamples.wavPayload(s, 65 * 120,
          22050, channels = 2, gainShift = 1)).get))
    val want = (for {
      (a, ha) <- hs; (b, hb) <- hs if a < b
      d = java.lang.Long.bitCount(ha ^ hb) if d <= 4
    } yield (a, b, d)).toSet
    assert(got == want)
    assert(want.size == 8)
    assert(want.forall { case (a, b, d) => b - a == 100000L && d == 0 })
  }
}
