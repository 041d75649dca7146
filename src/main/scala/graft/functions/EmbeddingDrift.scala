package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Embedding-space corpus composition monitor — per-group centroid
  * alignment against the global centroid: "is this source/cluster's
  * embedding mass still pointing where the corpus points, or has a
  * crawl change / encoder regression rotated it away". The
  * vector-space sibling of the categorical chi-squared drift audit
  * (q207): there the signal is count mix, here it is direction.
  *
  * Exactness: each float coordinate quantizes FIRST
  * (`floor(x · 2^10)` as long) so every downstream sum is exact
  * integer arithmetic with no float-summation order sensitivity —
  * centroid sums, dot products, and squared norms all restate in SQL
  * digit for digit. The cosine verdict never divides or roots:
  * `cos(a, g) ≥ t` cross-multiplies to
  * `dot ≥ 0 ∧ dot² · tDen² ≥ |a|² · |g|² · tNum²`, evaluated in
  * DECIMAL(38,0) (dot² reaches ~10³² at 10× gate scale — past Long,
  * nowhere near the decimal ceiling). Output integers stay BIGINT —
  * the q207 lesson: decimal OUTPUT columns read differently across
  * gate reader paths.
  *
  * Scale shape: one posexplode scan (rows × dims, the columnar form
  * the PCA moments use), two map-side-combinable aggregations
  * (per-group-per-dim, per-dim global), then dimension-sized joins —
  * group × dims rows, never row-scale shuffles. Unnormalized sums
  * stand in for means: cosine is scale-invariant, so dividing by n
  * would only cost exactness. */
object EmbeddingDrift {

  /** `(groupCol, n, dot, na2, nb2, aligned)` — exact quantized
    * centroid-sum dot/norms against the global centroid and the
    * cross-multiplied `cos ≥ tNum/tDen` verdict. `vecCol` is an
    * array<float/double> of `dims` coordinates. */
  def centroidAlignment(df: DataFrame, groupCol: String, vecCol: String,
                        dims: Int, tNum: Long, tDen: Long): DataFrame = {
    require(dims >= 1, "dims must be positive")
    require(tDen > 0, s"threshold $tNum/$tDen needs a positive denominator")
    val x = df.select(col(groupCol).as("g"),
        posexplode(transform(col(vecCol),
          v => floor(v.cast("double") * 1024).cast("long")))
          .as(Seq("pos", "v")))
      .filter(col("pos") < dims)
    val perGroup = x.groupBy(col("g"), col("pos"))
      .agg(sum(col("v")).as("gs"), count(lit(1)).as("cnt"))
    val global = x.groupBy(col("pos")).agg(sum(col("v")).as("gv"))
    val dec = "decimal(38,0)"
    val joined = perGroup.join(global, Seq("pos"))
    // the per-pos products run in DECIMAL(38,0) BEFORE summing: gv is
    // ~N·1024 for the global centroid, so Long-summed gv² wraps at
    // ~10M-row corpora under the non-ANSI default and would flip the
    // verdict — the decimal sums keep `aligned` exact. The BIGINT
    // casts below are display-level only (gate-stable hashing); they
    // null past ±9.2e18 while the decimal verdict stays correct.
    val d = joined.groupBy(col("g"))
      .agg(max(col("cnt")).as("n"),
        sum(col("gs").cast(dec) * col("gv")).as("dotd"),
        sum(col("gs").cast(dec) * col("gs")).as("na2d"),
        sum(col("gv").cast(dec) * col("gv")).as("nb2d"))
    d.select(col("g").as(groupCol), col("n"),
        col("dotd").cast("long").as("dot"),
        col("na2d").cast("long").as("na2"),
        col("nb2d").cast("long").as("nb2"),
        (col("dotd") >= 0 &&
          col("dotd") * col("dotd") * lit(tDen) * lit(tDen) >=
            col("na2d") * col("nb2d") * lit(tNum) * lit(tNum))
          .as("aligned"))
  }
}
