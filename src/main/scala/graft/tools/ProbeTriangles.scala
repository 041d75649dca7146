package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe backing the q214/q216 scale rationale: measures the
  * co-order graph's nodes, edges, ORIENTED wedge count (the work the
  * degree-oriented join actually does — Σ outdeg·(outdeg−1)/2), and
  * triangles at each SF dir passed as an arg.
  * `runMain graft.tools.ProbeTriangles /root/testdata/sf0.1 ...` */
object ProbeTriangles {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", 16)
      .config("spark.ui.enabled", false).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    args.foreach { dir =>
      val li = spark.read.parquet(s"$dir/lineitem.parquet")
        .filter(col("l_linenumber") <= 3)
        .select(col("l_orderkey"), col("l_partkey"))
      val pairs = li.as("a").join(li.as("b"),
          col("a.l_orderkey") === col("b.l_orderkey") &&
            col("a.l_partkey") < col("b.l_partkey"))
        .select(col("a.l_partkey").as("u"), col("b.l_partkey").as("v"))
      val edges = graft.operators.Triangles.canonicalEdges(pairs, "u", "v")
        .localCheckpoint()
      val m = edges.count()
      val n = edges.select(col("u").as("x"))
        .unionAll(edges.select(col("v"))).distinct().count()
      // oriented out-degrees -> wedge volume the join generates
      val deg = edges.select(col("u").as("node"))
        .unionAll(edges.select(col("v").as("node")))
        .groupBy("node").agg(count(lit(1)).as("deg"))
      val ranked = edges
        .join(deg.select(col("node").as("u"), col("deg").as("du")), "u")
        .join(deg.select(col("node").as("v"), col("deg").as("dv")), "v")
      val src = ranked.select(
        when(struct(col("du"), col("u")) < struct(col("dv"), col("v")),
          col("u")).otherwise(col("v")).as("src"))
      val wedges = src.groupBy("src").agg(count(lit(1)).as("d"))
        .agg(sum(expr("d * (d - 1) div 2")).as("w"))
        .head().getLong(0)
      val tris = graft.operators.Triangles.triangles(edges).count()
      println(s"PROBE $dir: nodes=$n edges=$m orientedWedges=$wedges " +
        s"triangles=$tris")
    }
    spark.stop()
  }
}
