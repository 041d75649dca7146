package graft.expressions

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.functions.Dedup

class JaccardSortedExprSpec extends SparkSpec {
  import spark.implicits._

  test("merge-walk jaccard equals the generic set jaccard on hashed shingles") {
    val rnd = new scala.util.Random(3)
    val texts = Seq.fill(30)(Seq.fill(20 + rnd.nextInt(40))(
      ('a' + rnd.nextInt(6)).toChar).mkString)
    val pairs = texts.zip(texts.tail)
    val df = pairs.toDF("ta", "tb").select(
      Dedup.hashedShingles(Dedup.charShingles($"ta", 3)).as("a"),
      Dedup.hashedShingles(Dedup.charShingles($"tb", 3)).as("b"))
    val out = df.select(
      Dedup.jaccardSorted($"a", $"b").as("native"),
      Dedup.jaccard($"a", $"b").as("generic"))
      .as[(Double, Double)].collect()
    out.foreach { case (n, g) => assert(n == g, s"native=$n generic=$g") }
  }

  test("edge cases: identical, disjoint, empty") {
    val df = Seq(
      (Seq(1L, 2L, 3L), Seq(1L, 2L, 3L)),
      (Seq(1L, 2L), Seq(3L, 4L)),
      (Seq.empty[Long], Seq.empty[Long]),
      (Seq.empty[Long], Seq(1L))).toDF("a", "b")
    val out = df.select(Dedup.jaccardSorted($"a", $"b")).as[Double].collect().toSeq
    assert(out == Seq(1.0, 0.0, 0.0, 0.0))
  }
}
