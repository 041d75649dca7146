package graft.multimodal

/** REAL image-header parsing — dependency-free byte logic over the four
  * container formats a crawl actually serves (PNG, JPEG, GIF, BMP):
  * format detection by magic bytes and pixel dimensions straight from
  * the header layout. This is a genuine binding for the
  * [[Multimodal.decodePartitions]] codec seam (not the deterministic
  * stub): per-partition batch iteration, schema, and partitioning are
  * unchanged — exactly the swap the seam was designed for. Full-frame
  * DECODE (pixels) still needs a codec library; header metadata is what
  * curation needs (resolution filters, aspect-ratio buckets, format
  * stats) and it needs no library at all.
  *
  * Unknown/truncated/corrupt payloads return format "unknown" with
  * 0×0 dimensions — a filterable row, never an exception (at crawl
  * scale malformed media is data, not an error). */
object ImageHeaders {

  /** The [[Multimodal.decodePartitions]] binding. */
  def headerCodec(payload: Array[Byte]): Multimodal.DecodedMeta = {
    val (fmt, w, h) = parse(payload)
    Multimodal.DecodedMeta(payload.length.toLong, fmt, w, h)
  }

  /** (format, width, height); ("unknown", 0, 0) when unparseable. */
  def parse(b: Array[Byte]): (String, Int, Int) = {
    def u8(i: Int): Int = b(i) & 0xFF
    def be16(i: Int): Int = (u8(i) << 8) | u8(i + 1)
    def be32(i: Int): Int =
      (u8(i) << 24) | (u8(i + 1) << 16) | (u8(i + 2) << 8) | u8(i + 3)
    def le16(i: Int): Int = u8(i) | (u8(i + 1) << 8)
    def le32(i: Int): Int =
      u8(i) | (u8(i + 1) << 8) | (u8(i + 2) << 16) | (u8(i + 3) << 24)

    if (b.length >= 24 &&
        b(0) == 0x89.toByte && b(1) == 'P' && b(2) == 'N' && b(3) == 'G' &&
        b(4) == 0x0D && b(5) == 0x0A && b(6) == 0x1A && b(7) == 0x0A &&
        new String(b.slice(12, 16), "US-ASCII") == "IHDR")
      // PNG: 8-byte signature, IHDR chunk: width/height big-endian at
      // fixed offsets 16/20
      ("png", be32(16), be32(20))
    else if (b.length >= 10 &&
        b(0) == 'G' && b(1) == 'I' && b(2) == 'F' && b(3) == '8' &&
        (b(4) == '7' || b(4) == '9') && b(5) == 'a')
      // GIF87a/89a: logical screen width/height little-endian at 6/8
      ("gif", le16(6), le16(8))
    else if (b.length >= 26 && b(0) == 'B' && b(1) == 'M')
      // BMP: BITMAPINFOHEADER width/height little-endian at 18/22
      // (height may be negative = top-down rows; magnitude is the size)
      ("bmp", le32(18), math.abs(le32(22)))
    else if (b.length >= 4 && u8(0) == 0xFF && u8(1) == 0xD8) {
      // JPEG: walk the marker stream to the first SOF (C0-CF except the
      // non-frame C4/C8/CC); height/width big-endian at +5/+7 of the
      // segment payload
      var i = 2
      var res: (String, Int, Int) = null
      while (res == null && i + 9 < b.length) {
        if (u8(i) != 0xFF) return ("unknown", 0, 0) // lost sync
        val marker = u8(i + 1)
        if (marker == 0xFF) i += 1 // fill byte
        else if (marker == 0xD8 || (marker >= 0xD0 && marker <= 0xD7))
          i += 2 // standalone markers, no length
        else if (marker >= 0xC0 && marker <= 0xCF &&
            marker != 0xC4 && marker != 0xC8 && marker != 0xCC)
          res = ("jpeg", be16(i + 7), be16(i + 5))
        else {
          val len = be16(i + 2)
          if (len < 2) return ("unknown", 0, 0)
          i += 2 + len
        }
      }
      if (res == null) ("unknown", 0, 0) else res
    }
    else ("unknown", 0, 0)
  }
}
