package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources.{GreaterThanOrEqual, LessThanOrEqual}
import graft.SparkSpec
import graft.sources.lakesim.{LakeIndex, LakeSimSource}

class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  /** Reference Morton interleave on the driver. */
  private def zRef(coords: Seq[Long], bits: Int): Long = {
    var z = 0L
    val n = coords.size
    for (j <- coords.indices; i <- 0 until bits)
      z |= (((coords(j) & ((1L << bits) - 1)) >> i) & 1L) << (i * n + j)
    z
  }

  test("zValue matches the reference interleave bit-for-bit") {
    val rows = Seq((0L, 0L), (1L, 0L), (0L, 1L), (3L, 5L), (65535L, 65535L),
      (12345L, 54321L))
    val got = rows.toDF("a", "b")
      .select($"a", $"b", ZOrder.zValue(Seq($"a", $"b"), 16).as("z"))
      .as[(Long, Long, Long)].collect()
    got.foreach { case (a, b, z) => assert(z == zRef(Seq(a, b), 16), s"($a,$b)") }
  }

  test("zValue interleaves three columns and rejects overflow") {
    val z = Seq((1L, 2L, 3L)).toDF("a", "b", "c")
      .select(ZOrder.zValue(Seq($"a", $"b", $"c"), 8).as("z"))
      .as[Long].head()
    assert(z == zRef(Seq(1L, 2L, 3L), 8))
    intercept[IllegalArgumentException] {
      ZOrder.zValue(Seq($"a", $"b", $"c"), 21)
    }
  }

  test("bucketize maps the numeric range onto [0, 2^bits), clamping BOTH ends") {
    val got = Seq(0.0, 50.0, 100.0).toDF("x")
      .select(ZOrder.bucketize($"x", 0.0, 100.0, 4).as("b"))
      .as[Long].collect().toSeq
    assert(got.head == 0L && got.last == 15L)
    assert(got.forall(b => b >= 0 && b < 16))
    // out-of-range values (stale driver-known min/max) clamp, never wrap
    val oob = Seq(-10.0, 500.0).toDF("x")
      .select(ZOrder.bucketize($"x", 0.0, 100.0, 4).as("b"))
      .as[Long].collect().toSeq
    assert(oob == Seq(0L, 15L))
  }

  test("z-ordered lake write prunes on BOTH columns; single-sort only on one") {
    def writeLake(df: org.apache.spark.sql.DataFrame): String = {
      val dir = Files.createTempDirectory("lakesim_z").toString
      df.write.format(classOf[LakeSimSource].getName)
        .option("path", dir).mode("overwrite").save()
      dir
    }
    // 64×64 grid of (x, y) points
    val grid = (0 until 64).flatMap(x => (0 until 64).map(y =>
      (x.toLong, y.toLong, x * 64L + y))).toDF("x", "y", "id")
    val zDir = writeLake(ZOrder.cluster(grid, Seq($"x", $"y"), numFiles = 16,
      bits = 6))
    val xDir = writeLake(grid.repartitionByRange(16, $"x", $"y")
      .sortWithinPartitions($"x", $"y"))
    def matched(dir: String, colName: String): Int = {
      val f = Seq(GreaterThanOrEqual(colName, 10L), LessThanOrEqual(colName, 13L))
      LakeIndex.prune(LakeIndex.load(dir), f).size
    }
    // x-range filter: both layouts prune
    assert(matched(xDir, "x") <= 4)
    assert(matched(zDir, "x") <= 8)
    // y-range filter: only the z-order layout prunes; the x-sorted one
    // reads every file (each file spans the full y range)
    assert(matched(xDir, "y") == 16)
    assert(matched(zDir, "y") <= 8)
  }
}
