package graft.functions

import graft.SparkSpec

/** Morton interleave: bit lanes, masking, locality. */
class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  private def z(a: Long, b: Long, bits: Int = 16): Long =
    Seq((a, b)).toDF("a", "b")
      .select(ZOrder.interleave2($"a", $"b", bits)).as[Long].head()

  test("hand-checked interleave: a in even lanes, b in odd") {
    assert(z(0L, 0L) == 0L)
    assert(z(1L, 0L) == 1L)  // a bit 0 -> position 0
    assert(z(0L, 1L) == 2L)  // b bit 0 -> position 1
    assert(z(3L, 0L) == 5L)  // 0b11 -> 0b0101
    assert(z(0L, 3L) == 10L) // 0b11 -> 0b1010
    assert(z(3L, 3L) == 15L)
    assert(z(5L, 2L) == 0b011001L) // a=101, b=010 -> 0 1 1 0 0 1
  }

  test("inputs mask to the low bits; result stays non-negative") {
    // bits=4: only low 4 bits survive
    assert(z(0x13L, 0L, 4) == z(0x3L, 0L, 4))
    assert(z((1L << 31) - 1, (1L << 31) - 1, 31) > 0L)
  }

  test("z-locality: quadrant prefix — high input bits dominate") {
    // points in the same (high-bit) quadrant sort together: every z in
    // quadrant (1,1) of a 2-bit space exceeds every z in quadrant (0,0)
    val q00 = for (a <- 0L to 1L; b <- 0L to 1L) yield z(a, b, 2)
    val q11 = for (a <- 2L to 3L; b <- 2L to 3L) yield z(a, b, 2)
    assert(q00.max < q11.min)
  }

  test("SQL restatement matches the column expression") {
    val rows = Seq((513L, 77L), (65535L, 1L), (70000L, 70000L))
      .toDF("a", "b")
    val viaCol = rows.select(ZOrder.interleave2($"a", $"b", 16))
      .as[Long].collect().toSeq
    rows.createOrReplaceTempView("zin")
    val viaSql = spark.sql("SELECT CAST(" +
        ZOrder.interleave2Sql("a", "b", 16) + " AS BIGINT) FROM zin")
      .as[Long].collect().toSeq
    assert(viaCol == viaSql)
  }
}
