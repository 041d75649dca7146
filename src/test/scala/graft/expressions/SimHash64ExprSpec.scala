package graft.expressions

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.functions.{Dedup, TextAnalysis}

class SimHash64ExprSpec extends SparkSpec {
  import spark.implicits._

  val texts = Seq(
    "the quick brown fox jumps over the lazy dog",
    "the quick brown fox jumps over the lazy cat",
    "completely different text about spark shuffles",
    "", "   single")

  test("native expression matches the built-in HOF formulation exactly") {
    val df = texts.toDF("t").select(
      Dedup.simhash64(TextAnalysis.tokens(lower($"t"))).as("native"),
      Dedup.simhash64Hof(TextAnalysis.tokens(lower($"t"))).as("hof"))
    val rows = df.as[(Long, Long)].collect()
    rows.foreach { case (n, h) => assert(n == h, s"native=$n hof=$h") }
  }

  test("null input array yields null; null tokens vote like the HOF formulation") {
    val df = Seq((Some(Seq("a", "b")), 1), (None, 2)).toDF("toks", "i")
    val out = df.select(SimHash64Expr.simhash64($"toks").as("s"))
      .collect().map(r => Option(r.get(0)))
    assert(out(0).isDefined && out(1).isEmpty)
    // a null token votes with the untouched xxhash64 seed (42) in BOTH
    // formulations — kernel and executable spec agree on null elements
    val withNull = Seq(Seq[String]("a", null, "b")).toDF("toks")
      .select(SimHash64Expr.simhash64($"toks").as("native"),
        Dedup.simhash64Hof($"toks").as("hof"))
      .as[(Long, Long)].collect().head
    assert(withNull._1 == withNull._2)
  }

  test("registered SQL functions evaluate (extensions hook)") {
    GraftExtensions.register(spark)
    val out = spark.sql(
      "SELECT simhash64(array('a','b')) = simhash64(array('a','b')) AS eq, " +
      "simhash64(array('a','b')) <> simhash64(array('x','y','z')) AS ne")
      .as[(Boolean, Boolean)].head()
    assert(out == ((true, true)))
    // the whole native-expression surface is SQL-callable and agrees with
    // the Column-level entry points
    val sql = spark.sql(
      """SELECT
        | minhash_sig(hashed_shingles('hello world docs', 5), 16) AS sig,
        | word_shingle_hash(array('a','b','c','d'), 3) AS ws,
        | jaccard_sorted(array(1L, 2L, 3L), array(2L, 3L, 4L)) AS j,
        | dot_product(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d""".stripMargin)
      .collect().head
    val viaColumns = spark.range(1).select(
        graft.functions.Dedup.minhashSignatureFromHashes(
          graft.functions.Dedup.hashedCharShingles(lit("hello world docs"), 5), 16).as("sig"),
        graft.functions.Dedup.hashedWordShingles(
          typedLit(Seq("a", "b", "c", "d")), 3).as("ws"))
      .collect().head
    assert(sql.getSeq[Long](0) == viaColumns.getSeq[Long](0))
    assert(sql.getSeq[Long](1) == viaColumns.getSeq[Long](1))
    assert(sql.getDouble(2) == 0.5)
    assert(sql.getDouble(3) == 11.0)
  }

  test("codegen and interpreted paths agree") {
    val toks = TextAnalysis.tokens(lit("alpha beta gamma delta"))
    val viaDf = spark.range(1).select(SimHash64Expr.simhash64(toks))
      .as[Long].head()
    // force interpreted path through the kernel directly
    val arr = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
      Array("alpha", "beta", "gamma", "delta")
        .map(org.apache.spark.unsafe.types.UTF8String.fromString))
    assert(viaDf == SimHash64Expr.simhashOf(arr))
  }
}
