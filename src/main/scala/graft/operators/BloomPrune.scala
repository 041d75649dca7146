package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge.{column, expression}
import org.apache.spark.sql.types.BinaryType

/** Explicit bloom-filter join pruning — the manual form of the runtime row
  * filter Spark's AQE injects for shuffle joins (InjectRuntimeFilter), usable
  * where the optimizer can't: across separately-submitted stages, against a
  * pre-shuffled/bucketed probe side, or pushed ahead of an expensive probe
  * pipeline (decode, dedup) that runs BEFORE the join.
  *
  * Shape: the build side aggregates its join keys into one bloom filter with
  * the native codegen'd [[BloomFilterAggregate]] (partial filters build
  * map-side and OR-merge — one tiny shuffle row per partition); the single
  * binary blob (`numBits/8` bytes, independent of build-side row count) is
  * the only thing that reaches the driver, and is inlined as a literal into
  * a [[BloomFilterMightContain]] predicate on the probe side, where it
  * filters rows BEFORE the join's exchange. The join still runs, so false
  * positives (rate `fpp`) are eliminated exactly; false negatives are
  * impossible — results are bit-identical to the unpruned join while the
  * probe-side shuffle carries ~`fpp` of its non-matching rows.
  *
  * At 100 TB: the classic use is a selective dim-filter driving a fact-scan
  * prune where the fact side is too large to shuffle unfiltered and the dim
  * side is too large to broadcast as a hash relation (a 100M-key build fits
  * in a few MB of bloom bits but not in a broadcast hash join).
  */
object BloomPrune {

  /** Bloom filter of `keyCol`, built distributed, returned as the serialized
    * blob. `expectedItems` sizes the filter for the target `fpp`.
    *
    * BloomFilterAggregate SILENTLY clamps both its item and bit parameters
    * to `spark.sql.optimizer.runtime.bloomFilter.maxNumItems` / `maxNumBits`
    * (defaults 4M / 67.1M) — a large build would otherwise get ~1 bit per
    * key and an fpp near 1 with no error, paying full build cost for zero
    * pruning. The confs are raised to this build's request for the duration
    * of the aggregation and restored after. */
  def buildFilter(build: DataFrame, keyCol: String,
                  expectedItems: Long, fpp: Double = 0.03): Array[Byte] = {
    require(expectedItems > 0, "expectedItems must be positive")
    // numBits formula of BloomFilter.optimalNumOfBits (public sketch API)
    val numBits = math.max(64L,
      (-expectedItems * math.log(fpp) / (math.log(2) * math.log(2))).toLong)
    val agg = new BloomFilterAggregate(
      new XxHash64(Seq(expression(col(keyCol)))),
      Literal(expectedItems), Literal(numBits)).toAggregateExpression()
    val conf = build.sparkSession.conf
    val itemsKey = "spark.sql.optimizer.runtime.bloomFilter.maxNumItems"
    val bitsKey = "spark.sql.optimizer.runtime.bloomFilter.maxNumBits"
    val (oldItems, oldBits) = (conf.get(itemsKey), conf.get(bitsKey))
    val row =
      try {
        conf.set(itemsKey, math.max(oldItems.toLong, expectedItems).toString)
        conf.set(bitsKey, math.max(oldBits.toLong, numBits).toString)
        build.select(column(agg).as("bf")).head()
      } finally {
        conf.set(itemsKey, oldItems)
        conf.set(bitsKey, oldBits)
      }
    if (row.isNullAt(0)) Array.emptyByteArray else row.getAs[Array[Byte]](0)
  }

  /** Predicate: `keyCol` might be in the serialized bloom filter. Codegen'd
    * (BloomFilterMightContain deserializes once per task, not per row). */
  def mightContain(filter: Array[Byte], key: Column): Column =
    if (filter.isEmpty) lit(false)
    else column(new BloomFilterMightContain(
      Literal(filter, BinaryType), new XxHash64(Seq(expression(key)))))

  /** Prune `probe` to rows whose `probeKey` might match a `buildKey` of
    * `build`, then the caller joins as usual. Null probe keys are dropped
    * (they can never equi-match). */
  def prune(probe: DataFrame, probeKey: String,
            build: DataFrame, buildKey: String,
            expectedItems: Long, fpp: Double = 0.03): DataFrame = {
    val bf = buildFilter(build.filter(col(buildKey).isNotNull), buildKey,
      expectedItems, fpp)
    probe.filter(mightContain(bf, col(probeKey)))
  }

  /** Bloom-pruned inner equi-join: exact join result (the join clears the
    * bloom's false positives), with the probe-side exchange fed only rows
    * that might match. */
  def join(probe: DataFrame, probeKey: String,
           build: DataFrame, buildKey: String,
           expectedItems: Long, fpp: Double = 0.03): DataFrame = {
    // frame-qualified refs: col(...) === col(...) would be ambiguous (or a
    // trivially-true self-reference) when both sides name the key alike
    val pruned = prune(probe, probeKey, build, buildKey, expectedItems, fpp)
    pruned.join(build, pruned(probeKey) === build(buildKey))
  }

  /** Bloom-pruned left-semi join (EXISTS): the probe rows with at least one
    * build-side match — same exactness argument as [[join]]. */
  def semiJoin(probe: DataFrame, probeKey: String,
               build: DataFrame, buildKey: String,
               expectedItems: Long, fpp: Double = 0.03): DataFrame = {
    val pruned = prune(probe, probeKey, build, buildKey, expectedItems, fpp)
    pruned.join(build, pruned(probeKey) === build(buildKey), "left_semi")
  }
}
