package graft.tools

/** Dev probe: does the GIF89a delta-frame encode → composited decode
  * round trip hold? `runMain graft.tools.ProbeDeltaGif`. */
object ProbeDeltaGif {
  def main(args: Array[String]): Unit = {
    import graft.multimodal.{ImagePixels, VideoFrames}
    val (seed, n, w, h, k) = (42L, 6, 45, 40, 4)
    val delta = VideoFrames.deltaGifPayload(seed, n, w, h)
    val full = VideoFrames.fullGifPayload(seed, n, w, h)
    println(s"delta bytes=${delta.length} full bytes=${full.length}")
    val dh = VideoFrames.sampledHashes(delta, k)
    val fh = VideoFrames.sampledHashes(full, k)
    println(s"delta composited: $dh")
    println(s"full composited:  $fh")
    println(s"EQUAL=${dh == fh}")
    val rawDelta = VideoFrames.sampledHashes(delta, k, composite = false)
    println(s"delta RAW (should differ): $rawDelta  differs=${rawDelta != fh}")
    // content sanity: composited hash at position j equals dHash of the
    // content frame the sample grid picks
    val expected = (0 until k).map { j =>
      ImagePixels.dHash64(
        VideoFrames.deltaContentFrame(seed, (j.toLong * n / k).toInt, w, h))
    }
    println(s"expected content hashes: ${expected.toList}")
    println(s"content-exact=${fh.exists(_._2 == expected)}")
    // restoreToPrevious: flash frame then rewind
    val flash = VideoFrames.encodeDeltaGif(w, h, Seq(
      VideoFrames.DeltaFrame(VideoFrames.deltaContentFrame(seed, 0, w, h), 0, 0, "doNotDispose"),
      VideoFrames.DeltaFrame(ImagePixels.renderImage(999L, w / 3, h / 3), 5, 5, "restoreToPrevious"),
      VideoFrames.DeltaFrame(ImagePixels.renderImage(seed * 1000003L + 2, w / 3, h / 3), w / 4 + 1, h / 4 + 1, "doNotDispose")))
    val flashHs = VideoFrames.sampledHashes(flash, 3)
    val flashExpected = Seq(
      ImagePixels.dHash64(VideoFrames.deltaContentFrame(seed, 0, w, h)),
      -1L, // flash frame: content 0 overlaid at (5,5) — just print it
      ImagePixels.dHash64(VideoFrames.deltaContentFrame(seed, 2, w, h)))
    println(s"flash composited: $flashHs")
    println(s"flash expected f0/f2: ${flashExpected(0)} / ${flashExpected(2)}")
    println(s"restorePrev ok=${flashHs.exists(x => x._2(0) == flashExpected(0) && x._2(2) == flashExpected(2))}")
  }
}
