package graft.expressions

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.functions.Similarity

class DotProductExprSpec extends SparkSpec {
  import spark.implicits._

  test("native dot matches the HOF formulation bit-for-bit on float vectors") {
    val rnd = new scala.util.Random(7)
    val vecs = Seq.fill(50)(Seq.fill(64)(rnd.nextFloat() - 0.5f))
    val q = Seq.fill(64)(rnd.nextDouble() - 0.5)
    val out = vecs.toDF("v").select(
      Similarity.dot($"v", typedLit(q)).as("native"),
      Similarity.dotHof($"v", typedLit(q)).as("hof"))
      .as[(Double, Double)].collect()
    out.foreach { case (n, h) =>
      assert(java.lang.Double.doubleToLongBits(n) ==
        java.lang.Double.doubleToLongBits(h))
    }
  }

  test("cosine built on the native dot keeps its invariants") {
    val out = Seq((Seq(3.0f, 4.0f), 1)).toDF("v", "i")
      .select(Similarity.cosine($"v", typedLit(Seq(3.0, 4.0))).as("c"),
        Similarity.norm($"v").as("n"))
      .as[(Double, Double)].collect().head
    assert(math.abs(out._1 - 1.0) < 1e-15)
    assert(out._2 == 5.0)
  }

  test("null arrays yield null") {
    val df = Seq((Some(Seq(1.0f)), 1), (None, 2)).toDF("v", "i")
    val out = df.select(Similarity.dot($"v", typedLit(Seq(2.0))))
      .collect().map(r => Option(r.get(0)))
    assert(out(0).contains(2.0) && out(1).isEmpty)
  }
}
