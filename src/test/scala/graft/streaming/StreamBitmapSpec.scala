package graft.streaming

import java.nio.file.Files

import graft.SparkSpec

/** The streaming exact-bitmap monitor's input contract: negative ids
  * fail loudly (mirroring batch [[graft.functions.Bitmap.bitmaps]])
  * instead of silently corrupting the maintained words. */
class StreamBitmapSpec extends SparkSpec {
  import spark.implicits._

  test("a negative id fails the stream loudly, like the batch contract") {
    val dir = Files.createTempDirectory("sbitmap").toString
    val src = s"$dir/landing"
    val rows = Seq(("k", 5L), ("k", -1L))
    val schema = rows.toDF("g", "v").schema
    rows.toDF("g", "v").write.mode("append").parquet(src)
    val e = intercept[Exception] {
      StreamBitmap.runAvailableNow(spark, src, schema, "g", "v",
        s"$dir/sink", s"$dir/ckpt")
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("negative")))
  }

  test("non-negative ids maintain words identical to the batch bitmap") {
    val dir = Files.createTempDirectory("sbitmap2").toString
    val src = s"$dir/landing"
    val rows = Seq(("a", 0L), ("a", 62L), ("a", 63L), ("b", 5L),
      ("a", 62L))
    val schema = rows.toDF("g", "v").schema
    rows.toDF("g", "v").write.mode("append").parquet(src)
    StreamBitmap.runAvailableNow(spark, src, schema, "g", "v",
      s"$dir/sink", s"$dir/ckpt")
    val got = StreamBitmap.currentBitmap(spark, s"$dir/sink")
      .as[(String, Long, Long)].collect().toSet
    val want = graft.functions.Bitmap.bitmaps(
        rows.toDF("g", "v"), "g", "v")
      .as[(String, Long, Long)].collect().toSet
    assert(got == want)
  }
}
