package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

class FeatureHashSpec extends SparkSpec {
  import spark.implicits._

  /** The hashing trick restated naively on the driver. */
  private def naive(toks: Seq[String], dim: Int): Seq[Double] = {
    def hash60(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      java.lang.Long.parseLong(
        d.take(8).map(b => f"${b & 0xff}%02x").mkString.take(15), 16)
    }
    val v = new Array[Double](dim)
    toks.foreach { t =>
      val b = (hash60(t) % dim).toInt
      v(b) += (if (hash60(t + "#") % 2 == 0) 1.0 else -1.0)
    }
    v.toSeq
  }

  test("vectorize matches the naive hashing-trick restatement") {
    val docs = Seq(
      (1L, Seq("the", "cat", "sat", "the", "cat")),
      (2L, Seq("dog")),
      (3L, Seq.empty[String]))
    val got = FeatureHash.vectorize(docs.toDF("id", "toks"), "id",
        $"toks", dim = 16)
      .as[(Long, Seq[Double])].collect().toMap
    assert(got(1L) == naive(docs(0)._2, 16))
    assert(got(2L) == naive(docs(1)._2, 16))
    assert(!got.contains(3L)) // no tokens → no vector row, not a zero row
  }

  test("vectorize is deterministic under repartitioning") {
    val d = (1L to 200L).map(i => (i, Seq.fill(5)(s"w${i % 37}")))
      .toDF("id", "toks")
    val a = FeatureHash.vectorize(d, "id", $"toks", 32)
      .as[(Long, Seq[Double])].collect().toMap
    val b = FeatureHash.vectorize(d.repartition(9), "id", $"toks", 32)
      .as[(Long, Seq[Double])].collect().toMap
    assert(a == b)
  }

  test("cosine: exact on handcrafted vectors, null on zero norms") {
    // 3-4-5 vectors keep the norms exact, so the quotient is exactly 1.0
    val d = Seq(
      (Seq(3.0, 4.0, 0.0), Seq(6.0, 8.0, 0.0)),  // parallel → 1.0
      (Seq(1.0, 0.0, 0.0), Seq(0.0, 3.0, 0.0)),  // orthogonal → 0.0
      (Seq(0.0, 0.0, 0.0), Seq(1.0, 1.0, 1.0)))  // zero norm → null
      .toDF("a", "b")
    val got = d.select(FeatureHash.cosine($"a", $"b").as("c"))
      .as[Option[Double]].collect().toSeq
    assert(got == Seq(Some(1.0), Some(0.0), None))
  }
}
