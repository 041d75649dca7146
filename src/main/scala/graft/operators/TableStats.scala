package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.Sketches

/** ANALYZE-style column statistics in ONE scan: per column the row/null
  * counts, a KMV NDV estimate, and typed min/max bounds — the statistics a
  * cost-based optimizer (join ordering, broadcast decisions, filter
  * selectivity) and a data-quality gate both feed on.
  *
  * Scale shape: a single aggregation pass over the table computes EVERY
  * column's sketch and bounds together (partial state per partition: k
  * longs + min/max per column — bounded, map-side combined); the driver
  * receives ONE row which unpivots to the per-column report. No
  * per-column rescans, no driver data.
  *
  * Bounds are computed on the TYPED column (a lexicographic min over
  * string renderings would say "10" < "9") and rendered to string only
  * for the uniform report schema. NDV rides the portable md5 hash60 seam,
  * so the whole report restates in SQL (q120). Columns whose string
  * rendering differs across engines (double, timestamp) should be
  * projected to a stable form first.
  */
object TableStats {

  /** Oracle-portable stats pass (md5 NDV hash — restatable in SQL, the
    * q120 seam). Production callers should prefer [[columnStatsFast]]. */
  def columnStats(df: DataFrame, cols: Seq[String], k: Int = 256): DataFrame =
    statsFrom(df, cols, k, c => Sketches.hash60(col(c).cast("string")))

  /** Production stats pass: same single-scan report on the xxhash64
    * `hash60Fast` seam — whole-stage-codegen'd, ~10× cheaper per value
    * than the md5 chain. NDV estimates agree with [[columnStats]] within
    * KMV error (both hashes are uniform over the same 2^60 space; exact
    * below k — pinned by TableStatsSpec); bounds and counts are
    * hash-independent and identical. */
  def columnStatsFast(df: DataFrame, cols: Seq[String], k: Int = 256)
      : DataFrame =
    statsFrom(df, cols, k, c => Sketches.hash60Fast(col(c).cast("string")))

  /** Equi-width histogram of a numeric column — the selectivity feed a
    * cost-based optimizer adds on top of [[columnStats]]' bounds/NDV:
    * `(bucket, bucket_lo, bucket_hi, n_rows)` for all `nBuckets` buckets,
    * empty ones included. Bucket of a value is
    * `least(floor((v − lo) · n / (hi − lo)), n − 1)` (the max value lands
    * in the last bucket; a constant column collapses into bucket 0), with
    * every arithmetic step a left-to-right IEEE double chain so an
    * external engine restates the exact counts (q159). Nulls are excluded
    * from every bucket (their count is [[columnStats]]' business).
    *
    * Two scans by design — bounds, then counts — with the 1-row bounds
    * frame broadcast into the bucketing pass; the alternative single-pass
    * sketch (quantile summary) is [[graft.functions.Sketches]]' business.
    * All-null input yields the full bucket list with null bounds and zero
    * counts. */
  def histogram(df: DataFrame, colName: String, nBuckets: Int): DataFrame = {
    require(nBuckets >= 1, s"histogram: need >= 1 bucket, got $nBuckets")
    val v = col(colName).cast("double")
    val bounds = df.agg(min(v).as("_graft_lo"), max(v).as("_graft_hi"))
    val width = col("_graft_hi") - col("_graft_lo")
    val counts = df.select(v.as("_graft_v")).filter(col("_graft_v").isNotNull)
      .crossJoin(broadcast(bounds))
      .withColumn("bucket",
        when(width === 0.0, lit(0L))
          .otherwise(least(
            floor((col("_graft_v") - col("_graft_lo")) * nBuckets / width),
            lit((nBuckets - 1).toLong)).cast("long")))
      .groupBy(col("bucket")).agg(count(lit(1)).as("n_rows"))
    bounds
      .select(explode(sequence(lit(0L), lit((nBuckets - 1).toLong)))
        .as("bucket"), col("_graft_lo"), col("_graft_hi"))
      .withColumn("bucket_lo",
        col("_graft_lo") + col("bucket") * width / nBuckets)
      .withColumn("bucket_hi",
        col("_graft_lo") + (col("bucket") + 1) * width / nBuckets)
      .join(counts, Seq("bucket"), "left")
      .select(col("bucket"), col("bucket_lo"), col("bucket_hi"),
        coalesce(col("n_rows"), lit(0L)).as("n_rows"))
  }

  /** Files-per-table hygiene report — the observable that says WHEN
    * [[graft.sources.lakesim.LakeOptimize.compact]] /
    * [[graft.streaming.Scd2Stream.compact]] are needed, the ops-tooling
    * analog of the reference's log scanner (A6): one row per table path
    * with file count, byte totals, and the small-file count under
    * `smallFileBytes` (default 32 MiB — well under a right-sized 128 MiB
    * scan split). Driver-side streaming aggregation over the recursive
    * listing (O(files) time, O(1) memory — never materializes per-file
    * rows); hidden files (`_`/`.` prefixed: commit markers, checkpoints)
    * are excluded, matching what a scan would read. */
  def fileStats(spark: org.apache.spark.sql.SparkSession,
                paths: Seq[String],
                smallFileBytes: Long = 32L << 20): DataFrame = {
    import org.apache.hadoop.fs.Path
    val rows = paths.map { p =>
      val hp = new Path(p)
      val fs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
      var n = 0L; var small = 0L; var total = 0L
      var minB = Long.MaxValue; var maxB = 0L
      if (fs.exists(hp)) {
        val it = fs.listFiles(hp, true)
        // Spark's file index prunes hidden path SEGMENTS, not just leaf
        // names — a file under .checkpoints/ is invisible to a scan even
        // if its own name is clean, so test every segment below the root
        def visible(path: Path): Boolean = {
          var cur = path
          while (cur != null && cur.toUri.getPath != hp.toUri.getPath) {
            val seg = cur.getName
            // partition dirs like `_gbucket=3` stay visible (Spark's
            // hidden-path rule exempts `=`-bearing segments)
            if ((seg.startsWith("_") || seg.startsWith(".")) &&
                !seg.contains("=")) return false
            cur = cur.getParent
          }
          true
        }
        while (it.hasNext) {
          val st = it.next()
          if (visible(st.getPath)) {
            n += 1; total += st.getLen
            if (st.getLen < smallFileBytes) small += 1
            minB = math.min(minB, st.getLen)
            maxB = math.max(maxB, st.getLen)
          }
        }
      }
      (p, n, total, if (n > 0) total / n else 0L,
        if (n > 0) minB else 0L, maxB, small)
    }
    import spark.implicits._
    rows.toDF("table_path", "n_files", "total_bytes", "avg_bytes",
      "min_bytes", "max_bytes", "n_small_files")
  }

  private def statsFrom(df: DataFrame, cols: Seq[String], k: Int,
                        hash: String => org.apache.spark.sql.Column)
      : DataFrame = {
    require(cols.nonEmpty, "columnStats: need at least one column")
    // pre-project every hash into the codegen'd SELECT so the sketch
    // agg's child is a plain field read rather than an md5 expression
    // re-evaluated inside the (object) aggregation operator
    val projected = df.select(
      cols.map(col) ++ cols.map(c => hash(c).as(s"_graft_h_$c")): _*)
    val aggs =
      count(lit(1)).as("_graft_n") +:
        cols.flatMap { c =>
          Seq(
            count(col(c)).as(s"_graft_nn_$c"),
            Sketches.kmvSketch(col(s"_graft_h_$c"), k).as(s"_graft_sk_$c"),
            min(col(c)).as(s"_graft_min_$c"),
            max(col(c)).as(s"_graft_max_$c"))
        }
    val one = projected.agg(aggs.head, aggs.tail: _*)
    one.select(explode(array(cols.map { c =>
        struct(
          lit(c).as("column_name"),
          col("_graft_n").as("n_rows"),
          (col("_graft_n") - col(s"_graft_nn_$c")).as("n_nulls"),
          Sketches.kmvEstimate(col(s"_graft_sk_$c"), k).as("ndv_est"),
          col(s"_graft_min_$c").cast("string").as("min_val"),
          col(s"_graft_max_$c").cast("string").as("max_val"))
      }: _*)).as("_graft_s"))
      .select(col("_graft_s.*"))
  }
}
