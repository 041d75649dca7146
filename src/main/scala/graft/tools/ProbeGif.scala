package graft.tools

/** Dev probe: can javax.imageio write + read multi-frame GIFs with
  * pixel-exact grayscale round trips? `runMain graft.tools.ProbeGif`. */
object ProbeGif {
  def main(args: Array[String]): Unit = {
    import graft.multimodal.ImagePixels
    val frames = (0 until 4).map(f => ImagePixels.renderImage(100L + f, 36, 32))
    // write an animated GIF via the sequence API
    val bos = new java.io.ByteArrayOutputStream()
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    frames.foreach { img =>
      writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
    }
    writer.endWriteSequence()
    ios.close()
    val bytes = bos.toByteArray
    println(s"gif bytes: ${bytes.length}")
    // read back all frames
    val reader = javax.imageio.ImageIO.getImageReadersByFormatName("gif").next()
    reader.setInput(javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(bytes)))
    val n = reader.getNumImages(true)
    println(s"frames read: $n")
    (0 until n).foreach { i =>
      val img = reader.read(i)
      val orig = frames(i)
      var identical = true
      for (y <- 0 until 32; x <- 0 until 36)
        if ((img.getRGB(x, y) & 0xFFFFFF) != (orig.getRGB(x, y) & 0xFFFFFF))
          identical = false
      println(s"frame $i: ${img.getWidth}x${img.getHeight} pixelExact=$identical " +
        s"dhash=${ImagePixels.dHash64(img)} origDhash=${ImagePixels.dHash64(orig)}")
    }
  }
}
