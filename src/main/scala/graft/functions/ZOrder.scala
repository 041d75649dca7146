package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) interleaving — the multi-dimension clustering key
  * behind lake-layout optimization: sorting/bucketing by `z(a, b)`
  * keeps rows close in BOTH dimensions close on disk, so min/max
  * object pruning (the [[graft.sources.lakesim.LakeIndex]] range
  * stats) cuts scans for predicates on either column, where a
  * lexicographic sort only serves its leading column.
  *
  * The interleave is a STATIC unrolled expression — `bits` shift/mask
  * terms OR-folded at plan-build time, whole-stage-codegen-friendly,
  * no UDF — and pure bit arithmetic, so the oracle restates the same
  * chain term for term. Inputs are masked to `bits` low bits first
  * (callers range-compress wider domains; at 100 TB the standard
  * recipe is percentile-bucketing each dimension to 2^bits ranks
  * — [[graft.functions.Sketches.groupQuantiles]] supplies the cuts —
  * then z-ordering the ranks). */
object ZOrder {

  /** Morton-interleave the low `bits` bits of two non-negative longs:
    * bit i of `a` lands at position 2i, bit i of `b` at 2i+1. `bits`
    * ≤ 31 keeps the result in a positive long. */
  def interleave2(a: Column, b: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1, 31], got $bits")
    val am = a.cast("long").bitwiseAND(lit((1L << bits) - 1))
    val bm = b.cast("long").bitwiseAND(lit((1L << bits) - 1))
    (0 until bits).foldLeft(lit(0L): Column) { (acc, i) =>
      acc
        .bitwiseOR(shiftleft(shiftright(am, i).bitwiseAND(lit(1L)), 2 * i))
        .bitwiseOR(shiftleft(shiftright(bm, i).bitwiseAND(lit(1L)),
          2 * i + 1))
    }
  }

  /** The identical chain as ANSI SQL (for oracles/codegen review):
    * masked inputs, one `((x >> i) & 1) * 2^p` term per bit, summed —
    * `+` of disjoint powers of two equals the engine's OR-fold. */
  def interleave2Sql(a: String, b: String, bits: Int): String = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1, 31], got $bits")
    val mask = (1L << bits) - 1
    val terms = (0 until bits).flatMap { i =>
      Seq(s"((($a & $mask) >> $i) & 1) * ${1L << (2 * i)}",
        s"((($b & $mask) >> $i) & 1) * ${1L << (2 * i + 1)}")
    }
    terms.mkString("(", " + ", ")")
  }
}
