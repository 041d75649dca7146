package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: after a hot-cell split, does the spliced (rebalanced)
  * index equal a FULL re-encode against the post-split coarse list —
  * i.e. do any foreign rows migrate to the new sub-centroids?
  * `runMain graft.tools.ProbeRebalance`. */
object ProbeRebalance {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", false).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val S = graft.functions.Similarity
    val dir = "/root/testdata/sf0.01"
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val coarse = S.ivfCentroidsTrainedPortable(e, "embedding", "vec_id",
      k = 8, iters = 0)
    val cbs = S.ivfPqCodebooks(e, "embedding", "vec_id", coarse,
      m = 8, ksub = 16, iters = 0)
    val idx0 = S.ivfPqEncode(e, "embedding", coarse, cbs,
      cellCol = "cell", codesCol = "codes")
      .select(col("vec_id"), col("cell"), col("codes")).localCheckpoint()
    val counts0 = S.ivfPqCellCounts(idx0, "cell")
    counts0.orderBy(col("cell")).show()
    // plant a hot wave: clone the biggest cell's vectors under new ids
    val hot = counts0.orderBy(col("n_vecs").desc).head().getInt(0)
    println(s"hot cell = $hot")
    val wave = e.join(idx0.filter(col("cell") === hot)
        .select(col("vec_id")), Seq("vec_id"))
      .select((col("vec_id") + 10000000L).as("vec_id"), col("embedding"))
    val source = e.unionByName(wave).localCheckpoint()
    val (idx1, counts1) = S.ivfPqMaintain(idx0, counts0, wave,
      "vec_id", "embedding", "cell", "codes", coarse, cbs)
    val bal = S.ivfPqCellBalance(counts1, "cell", 21L, 20L)
    bal.orderBy(col("cell")).show()
    val flagged = bal.filter(col("rebalance")).select(col("cell"))
      .collect().map(_.getInt(0)).toSeq.sorted
    println(s"flagged = $flagged")
    val idx1c = idx1.localCheckpoint()
    val (coarse2, idx2) = S.ivfPqRebalance(idx1c, "vec_id", "cell",
      "codes", source, "embedding", coarse, cbs, flagged, splitK = 3,
      iters = 3)
    println(s"coarse ${coarse.size} -> ${coarse2.size}")
    val idx2c = idx2.localCheckpoint()
    val full = S.ivfPqEncode(source, "embedding", coarse2, cbs,
      cellCol = "cell", codesCol = "codes")
      .select(col("vec_id"), col("cell"), col("codes")).localCheckpoint()
    val d1 = idx2c.exceptAll(full).count()
    val d2 = full.exceptAll(idx2c).count()
    println(s"spliced-vs-full diffs: $d1 / $d2 (rows ${idx2c.count()})")
    S.ivfPqCellCounts(idx2c, "cell").orderBy(col("cell")).show(20)
    // serving check
    val q = e.filter(col("vec_id") === 0).head().getSeq[Float](1)
      .map(_.toDouble).toSeq
    val s1 = S.ivfPqTopKFromIndex(idx2c, "vec_id", "cell", "codes", q,
      coarse2, cbs, k = 10, nProbe = 4)
    val s2 = S.ivfPqTopKFromIndex(full, "vec_id", "cell", "codes", q,
      coarse2, cbs, k = 10, nProbe = 4)
    println(s"serve diff: ${s1.exceptAll(s2).count()} / ${s2.exceptAll(s1).count()}")
    spark.stop()
  }
}
