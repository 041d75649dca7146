package graft.multimodal

import graft.SparkSpec

class ImageHeadersSpec extends SparkSpec {
  import spark.implicits._

  private def png(w: Int, h: Int): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(33)
    bb.put(Array(0x89, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A)
      .map(_.toByte))
    bb.putInt(13)                         // IHDR length
    bb.put("IHDR".getBytes("US-ASCII"))
    bb.putInt(w).putInt(h)
    bb.put(Array(8, 6, 0, 0, 0).map(_.toByte)) // depth/color/etc
    bb.array()
  }

  private def gif(w: Int, h: Int): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(13)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("GIF89a".getBytes("US-ASCII"))
    bb.putShort(w.toShort).putShort(h.toShort)
    bb.put(Array(0, 0, 0).map(_.toByte))
    bb.array()
  }

  private def bmp(w: Int, h: Int): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(54)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put('B'.toByte).put('M'.toByte)
    bb.putInt(54).putInt(0).putInt(54)    // size, reserved, data offset
    bb.putInt(40)                         // BITMAPINFOHEADER size
    bb.putInt(w).putInt(h)
    bb.array()
  }

  private def jpeg(w: Int, h: Int): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(41)
    bb.put(Array(0xFF, 0xD8).map(_.toByte))          // SOI
    bb.put(Array(0xFF, 0xE0).map(_.toByte))          // APP0 segment
    bb.putShort(18.toShort)                          // APP0 length (incl. itself)
    bb.put(new Array[Byte](16))                      // APP0 payload
    bb.put(Array(0xFF, 0xC0).map(_.toByte))          // SOF0
    bb.putShort(17.toShort)                          // SOF length (incl. itself)
    bb.put(8.toByte)                                 // precision
    bb.putShort(h.toShort).putShort(w.toShort)       // height, width
    bb.put(new Array[Byte](10))                      // component specs
    bb.array()
  }

  test("PNG/GIF/BMP/JPEG headers parse to exact dimensions; junk, " +
       "truncation, and top-down BMPs behave") {
    assert(ImageHeaders.parse(png(640, 480)) == (("png", 640, 480)))
    assert(ImageHeaders.parse(gif(320, 200)) == (("gif", 320, 200)))
    assert(ImageHeaders.parse(bmp(1024, 768)) == (("bmp", 1024, 768)))
    assert(ImageHeaders.parse(jpeg(800, 600)) == (("jpeg", 800, 600)))
    // top-down BMP stores a negative height; magnitude is the size
    val td = bmp(100, -50)
    assert(ImageHeaders.parse(td) == (("bmp", 100, 50)))
    // junk / truncated payloads are filterable rows, never exceptions
    assert(ImageHeaders.parse("not an image".getBytes("UTF-8"))._1
      == "unknown")
    assert(ImageHeaders.parse(Array.emptyByteArray)._1 == "unknown")
    assert(ImageHeaders.parse(png(640, 480).take(10))._1 == "unknown")
    // a JPEG that never reaches a frame header is unknown, not a hang
    assert(ImageHeaders.parse(Array(0xFF, 0xD8, 0xFF, 0xE0, 0x00, 0x04,
      0x00, 0x00).map(_.toByte))._1 == "unknown")
  }

  test("headerCodec binds into the decodePartitions seam: real formats " +
       "through the SAME pipeline shape as the stub") {
    val rows = Seq(
      (1L, png(640, 480)), (2L, gif(320, 200)),
      (3L, jpeg(800, 600)), (4L, "junk".getBytes("UTF-8")))
      .toDF("media_id", "payload")
    val out = Multimodal.decodePartitions(rows, "media_id", "payload",
        codec = ImageHeaders.headerCodec)
      .select($"media_id", $"meta.format", $"meta.width", $"meta.height")
      .as[(Long, String, Int, Int)].collect().sortBy(_._1).toSeq
    assert(out == Seq(
      (1L, "png", 640, 480), (2L, "gif", 320, 200),
      (3L, "jpeg", 800, 600), (4L, "unknown", 0, 0)))
  }
}
