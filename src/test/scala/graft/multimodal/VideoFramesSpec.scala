package graft.multimodal

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Multi-frame video fingerprinting: pixel-exact GIF round trips,
  * rate/size/brightness clone invariances, half-overlap fence,
  * keep paths, exhaustive pair recount. */
class VideoFramesSpec extends SparkSpec {
  import spark.implicits._

  test("sampled hashes decode pixel-exactly: every sampled position " +
      "equals the driver dHash of its rendered source frame") {
    val bytes = VideoFrames.gifPayload(7L, nFrames = 12, 36, 32)
    val Some((n, hs)) = VideoFrames.sampledHashes(bytes, k = 8)
    assert(n == 12 && hs.length == 8)
    hs.zipWithIndex.foreach { case (h, j) =>
      val frame = (j.toLong * 12 / 8).toInt
      assert(h == ImagePixels.dHash64(
        ImagePixels.renderImage(7L * 1000003L + frame, 36, 32)), s"pos $j")
    }
  }

  test("clone invariances: upscaled, frame-rate-doubled, brightness-" +
      "shifted re-encodes sample identical hashes at every position") {
    (0L until 6L).foreach { seed =>
      val orig = VideoFrames.sampledHashes(
        VideoFrames.gifPayload(seed, 12, 72, 64), 8).get
      val clone = VideoFrames.sampledHashes(
        VideoFrames.gifPayload(seed, 12, 144, 128, shift = 3, rate = 2), 8)
        .get
      assert(clone._1 == 24 && orig._2 == clone._2, s"seed $seed")
    }
  }

  test("undecodable payloads keep as one null row and never pair") {
    val good = VideoFrames.gifPayload(1L, 4, 36, 32)
    val rows = Seq((1L, good), (2L, good.take(15)),
      (3L, "not a gif".getBytes ++ new Array[Byte](40)))
      .toDF("media_id", "payload")
    val hashes = VideoFrames.videoHashFrame(rows, "media_id", "payload", 4)
    val nulls = hashes.filter($"fhash".isNull)
      .select($"media_id").as[Long].collect().toSet
    assert(nulls == Set(2L, 3L))
    assert(hashes.filter($"fhash".isNotNull).count() == 4L)
  }

  test("half-diverged copies sit exactly at the ceil(k/2) fence; exact " +
      "clones match all positions; recount equals the driver reference") {
    val ids = (0L until 6L).toDF("id")
    val media = VideoFrames.fixtureFrame(ids, "id", 12, 72, 64)
      .unionByName(VideoFrames.fixtureFrame(ids.filter($"id" === 0),
        "id", 12, 144, 128, shift = 3, rate = 2, idOffset = 100L))
      .unionByName(VideoFrames.fixtureFrame(ids.filter($"id" === 1),
        "id", 12, 72, 64, idOffset = 200L, divergeFrom = 6))
    val got = VideoFrames.videoNearDups(media, "media_id", "payload",
        k = 8, maxDist = 4)
      .as[(Long, Long, Long)].collect().toSet
    // driver recount over all decodable videos
    val specs = (0L until 6L).map(s => s -> (s, 72, 64, 0, 1, Int.MaxValue)) ++
      Seq(100L -> ((0L, 144, 128, 3, 2, Int.MaxValue)),
        201L -> ((1L, 72, 64, 0, 1, 6)))
    val hs = specs.map { case (id, (seed, w, h, sh, rate, div)) =>
      id -> VideoFrames.sampledHashes(
        VideoFrames.gifPayload(seed, 12, w, h, sh, rate, div), 8).get._2
    }
    val want = (for {
      (a, ha) <- hs; (b, hb) <- hs if a < b
      m = ha.zip(hb).count { case (x, y) =>
        java.lang.Long.bitCount(x ^ y) <= 4 }
      if m >= 4
    } yield (a, b, m.toLong)).toSet
    assert(got == want)
    // the exact clone matches all 8; the half-diverged copy exactly 4
    assert(want.contains((0L, 100L, 8L)))
    assert(want.contains((1L, 201L, 4L)))
  }
}
