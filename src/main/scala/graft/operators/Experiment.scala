package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Experiment readout — per-variant conversion vs a control variant
  * with an exact cross-multiplied shift verdict: the A/B guardrail a
  * pipeline runs on every assignment wave ("did variant 2's conversion
  * move more than `tolPpm` away from control"). No floats: the
  * conversion-rate difference `k/n − k₀/n₀` clears to the integer
  * rational `diff_num/diff_den = (k·n₀ − k₀·n) / (n·n₀)` and the
  * verdict cross-multiplies against the ppm tolerance — so the whole
  * readout restates in SQL, and significance-style thresholds stay
  * deterministic. (This is the exact-effect-size gate; a p-value needs
  * transcendentals and belongs to the notebooks, not the hash gate.)
  *
  * Scale shape: one unit-level aggregate (map-side combinable), a
  * variant-cardinality frame, a 1-row broadcast of the control. */
object Experiment {

  /** `(variant, n, k, diff_num, diff_den, shifted)` — one row per
    * variant (control included with zero diff). `df` is ONE ROW PER
    * UNIT with a boolean `convertedCol`; `variantCol` is compared as a
    * string. Throws if the control variant is absent. */
  def conversionAudit(df: DataFrame, variantCol: String,
                      convertedCol: String, control: String,
                      tolPpm: Long): DataFrame = {
    require(tolPpm >= 0, "tolerance must be non-negative")
    val v = df.select(col(variantCol).cast("string").as("variant"),
        col(convertedCol).cast("boolean").as("c"))
      .groupBy(col("variant"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("c"), 1L).otherwise(0L)).as("k"))
    val ctrl = v.filter(col("variant") === control)
      .select(col("n").as("n0"), col("k").as("k0"))
      .localCheckpoint()
    require(ctrl.count() == 1,
      s"conversionAudit: control variant '$control' absent")
    v.crossJoin(broadcast(ctrl))
      .select(col("variant"), col("n"), col("k"),
        (col("k") * col("n0") - col("k0") * col("n")).as("diff_num"),
        (col("n") * col("n0")).as("diff_den"),
        (abs(col("k") * col("n0") - col("k0") * col("n")) * 1000000L >
          lit(tolPpm) * col("n") * col("n0")).as("shifted"))
  }
}
