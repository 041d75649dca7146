package graft.multimodal

/** REAL audio-header parsing — the [[ImageHeaders]] discipline for the
  * three container formats crawled audio actually arrives in (WAV,
  * FLAC, MP3): format by magic bytes, sample rate / channel count
  * straight from the header layout, dependency-free. Sample rate and
  * channels are what audio curation filters on (bandwidth gates,
  * mono/stereo routing, resample planning) and they need no codec.
  * Unknown/truncated payloads return ("unknown", 0, 0, 0) — filterable
  * rows, never exceptions. */
object AudioHeaders {

  /** Binds into [[Multimodal.decodePartitions]]'s codec seam. The
    * generic meta dims carry (sample_rate_hz, channels) for audio —
    * same struct shape as images, so one decode pipeline serves both
    * modalities and downstream filters read `meta.width`/`meta.height`
    * as the modality's two header dims. */
  def headerCodec(payload: Array[Byte]): Multimodal.DecodedMeta = {
    val (fmt, rate, ch, bytes) = parse(payload)
    Multimodal.DecodedMeta(bytes, fmt, rate, ch)
  }

  /** (format, sample_rate_hz, channels, data_bytes);
    * ("unknown", 0, 0, 0) when unparseable. `data_bytes` is the WAV
    * data-chunk size where declared, else the payload remainder. */
  def parse(b: Array[Byte]): (String, Int, Int, Long) = {
    def u8(i: Int): Int = b(i) & 0xFF
    def le16(i: Int): Int = u8(i) | (u8(i + 1) << 8)
    def le32(i: Int): Long =
      (u8(i) | (u8(i + 1) << 8) | (u8(i + 2) << 16)).toLong |
        ((u8(i + 3).toLong) << 24)
    def ascii(i: Int, n: Int): String =
      if (b.length >= i + n) new String(b.slice(i, i + n), "US-ASCII")
      else ""

    if (ascii(0, 4) == "RIFF" && ascii(8, 4) == "WAVE") {
      // chunk walk: [id(4) size(4) data(size, word-aligned)]*; the fmt
      // chunk carries channels/sampleRate, the data chunk its size
      var i = 12
      var fmt: Option[(Int, Int)] = None
      var dataBytes = -1L
      var live = true
      while (live && (fmt.isEmpty || dataBytes < 0) && i + 8 <= b.length) {
        val id = ascii(i, 4)
        val size = le32(i + 4)
        // fmt chunk data: format(2) channels(2) sampleRate(4) ...
        if (id == "fmt " && i + 16 <= b.length)
          fmt = Some((le32(i + 12).toInt, le16(i + 10)))
        if (id == "data") dataBytes = size
        // a declared size past the payload end (truncation, corruption)
        // stops the walk — whatever parsed before it still reports
        if (size > b.length - i - 8) live = false
        else i += 8 + size.toInt + (size.toInt & 1)
      }
      fmt match {
        case Some((rate, ch)) if rate > 0 && ch > 0 =>
          ("wav", rate, ch, if (dataBytes >= 0) dataBytes
            else (b.length - 44L).max(0L))
        case _ => ("unknown", 0, 0, 0L)
      }
    } else if (ascii(0, 4) == "fLaC" && b.length >= 8 + 18 + 3) {
      // STREAMINFO is the mandatory first metadata block (4-byte block
      // header at 4, data at 8): sample rate = 20 bits starting at data
      // offset 10, then 3 channel bits (stored as channels-1)
      val d = 8
      val rate = (u8(d + 10) << 12) | (u8(d + 11) << 4) | (u8(d + 12) >> 4)
      val ch = ((u8(d + 12) >> 1) & 0x7) + 1
      if (rate > 0) ("flac", rate, ch, (b.length - d - 34L).max(0L))
      else ("unknown", 0, 0, 0L)
    } else {
      // MP3: optional ID3v2 prefix (synchsafe size), then a frame sync
      var i = 0
      if (ascii(0, 3) == "ID3" && b.length >= 10)
        i = 10 + ((u8(6) << 21) | (u8(7) << 14) | (u8(8) << 7) | u8(9))
      if (i + 4 <= b.length && u8(i) == 0xFF && (u8(i + 1) & 0xE0) == 0xE0) {
        val versionBits = (u8(i + 1) >> 3) & 0x3 // 3=MPEG1 2=MPEG2 0=2.5
        val rateIdx = (u8(i + 2) >> 2) & 0x3
        val rates: Seq[Int] = versionBits match {
          case 3 => Seq(44100, 48000, 32000)
          case 2 => Seq(22050, 24000, 16000)
          case 0 => Seq(11025, 12000, 8000)
          case _ => Seq.empty // 1 is reserved
        }
        val mode = (u8(i + 3) >> 6) & 0x3 // 3 = single channel
        if (rateIdx < rates.size)
          ("mp3", rates(rateIdx), if (mode == 3) 1 else 2,
            (b.length - i).toLong)
        else ("unknown", 0, 0, 0L)
      } else ("unknown", 0, 0, 0L)
    }
  }
}
