package graft.tools
object ProbeChain {
  def main(args: Array[String]): Unit = {
    import graft.multimodal.ImagePixels._
    for (s <- Seq(0L,2L,4L,6L,8L,10L,12L,14L,16L,18L,20L,22L)) {
      val o = dHashOf(fixturePayload(s, 72, 64, "png")).get
      val x = dHashOf(fixturePayload(s, 72, 64, "png", divergeRows = Seq(2))).get
      val y = dHashOf(fixturePayload(s, 72, 64, "png", divergeRows = Seq(2,5))).get
      def d(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
      println(s"seed $s: d(O,X)=${d(o,x)} d(X,Y)=${d(x,y)} d(O,Y)=${d(o,y)}")
    }
  }
}
