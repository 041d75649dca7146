package graft.expressions

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.functions.Dedup

class HashedShinglesExprSpec extends SparkSpec {
  import spark.implicits._

  test("fused expression equals the composed HOF pipeline, incl. edge cases") {
    val texts = Seq(
      "the quick brown fox", "ab", "", "aaaaaaa", "héllo wörld ünïcode")
    val out = texts.toDF("t").select(
      Dedup.hashedCharShingles(lower($"t"), 5).as("fused"),
      Dedup.hashedShingles(Dedup.charShingles(lower($"t"), 5)).as("composed"))
      .as[(Seq[Long], Seq[Long])].collect()
    out.foreach { case (f, c) => assert(f == c, s"fused=$f composed=$c") }
  }

  test("null string yields null; hashes stay in [0, P)") {
    val df = Seq(Option("abc"), None).toDF("t")
    val out = df.select(Dedup.hashedCharShingles($"t", 3))
      .collect().map(r => Option(r.get(0)))
    assert(out(0).isDefined && out(1).isEmpty)
    val vals = Seq("some text to shingle").toDF("t")
      .select(Dedup.hashedCharShingles($"t", 4)).as[Seq[Long]].collect()
      .flatten.toSeq
    assert(vals.forall(v => v >= 0 && v < 2147483647L))
    assert(vals == vals.sorted && vals.distinct.size == vals.size)
  }
}
