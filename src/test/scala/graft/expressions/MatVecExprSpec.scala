package graft.expressions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class MatVecExprSpec extends SparkSpec {
  import spark.implicits._

  test("kernel equals the element_at chain BIT-FOR-BIT on float arrays " +
       "(same left-to-right IEEE accumulation)") {
    val signs = graft.functions.Similarity.signMatrix(inDim = 64, outDim = 8)
    val rnd = new scala.util.Random(7)
    val df = Seq.fill(50)(Seq.fill(64)(rnd.nextFloat() * 2 - 1))
      .zipWithIndex.map(_.swap).toDF("id", "v")
    val chain = array(signs.map { row =>
      row.zipWithIndex.map { case (sgn, i) =>
        element_at($"v", i + 1).cast("double") * lit(sgn)
      }.reduceLeft(_ + _)
    }: _*)
    val zero = Seq.fill(64)(0.0)
    val out = df.select(
        chain.as("a"), MatVecExpr.matVec($"v", signs, zero).as("b"))
      .as[(Seq[Double], Seq[Double])].collect()
    out.foreach { case (a, b) =>
      assert(a == b) // exact, not approximate
    }
  }

  test("shift centers before the product; short inputs contribute " +
       "their prefix") {
    val m = Seq(Seq(1.0, 0.0, 0.0), Seq(0.0, 2.0, -1.0))
    val df = Seq((1, Seq(5.0, 3.0, 2.0)), (2, Seq(1.0, 1.0))).toDF("id", "v")
    val out = df.orderBy($"id")
      .select(MatVecExpr.matVec($"v", m, Seq(1.0, 1.0, 1.0)).as("y"))
      .as[Seq[Double]].collect().toSeq
    assert(out(0) == Seq(4.0, 2.0 * 2 - 1.0)) // (5-1, 2(3-1) - (2-1))
    assert(out(1) == Seq(0.0, 0.0))           // prefix only: (1-1)·…
  }

  test("a null ELEMENT nulls the whole output row — never a " +
       "silently-zeroed component") {
    val m = Seq(Seq(1.0, 1.0))
    val df = Seq((1, Seq[java.lang.Double](2.0, 3.0)),
        (2, Seq[java.lang.Double](2.0, null)))
      .toDF("id", "v")
    val out = df.orderBy($"id")
      .select(MatVecExpr.matVec($"v", m, Seq(0.0, 0.0)).as("y"))
      .collect()
    assert(out(0).getSeq[Double](0) == Seq(5.0))
    assert(out(1).isNullAt(0))
  }

  test("integer and long arrays work; null rows stay null") {
    val m = Seq(Seq(1.0, 1.0))
    val df = Seq((1, Some(Seq(2, 3))), (2, None))
      .toDF("id", "v")
    val out = df.orderBy($"id")
      .select(MatVecExpr.matVec($"v", m, Seq(0.0, 0.0)).as("y"))
      .collect()
    assert(out(0).getSeq[Double](0) == Seq(5.0))
    assert(out(1).isNullAt(0))
  }

  test("stays inside whole-stage codegen at (k=8, d=64) — the shape " +
       "that bails the chain formulation to interpreted eval") {
    val signs = graft.functions.Similarity.signMatrix(inDim = 64, outDim = 8)
    // a file scan, not a local relation — local constants fold away
    // before any codegen question arises
    val df = graft.sources.Tables.load(spark, "/root/testdata/sf0.001",
      "embeddings")
    val out = df.select(MatVecExpr.matVec($"embedding", signs,
      Seq.fill(64)(0.0)))
    out.collect() // finalize the adaptive plan
    val plan = out.queryExecution.executedPlan.toString
    // "*(n)" prefixes mark WholeStageCodegen stages in the plan string
    assert(plan.linesIterator.exists(_.trim.matches("""^(\+-|:-)?\s*\*\(\d+\).*matvec.*""")),
      plan)
  }
}
