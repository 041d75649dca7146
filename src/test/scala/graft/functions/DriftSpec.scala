package graft.functions

import graft.SparkSpec

/** Chi-squared drift audit: exact rational per-category contributions of
  * the 2×K homogeneity test, verdict by cross-multiplication. */
class DriftSpec extends SparkSpec {
  import spark.implicits._

  private def audit(ref: Seq[String], cur: Seq[String],
                    tNum: Long = 1, tDen: Long = 4) =
    Drift.chiSquaredAudit(ref.toDF("cat"), cur.toDF("cat"), "cat",
        tNum, tDen)
      .select("category", "ref_n", "cur_n", "chi_num", "chi_den", "drifted")
      .collect()
      .map(r => (Option(r.getString(0)), r.getLong(1), r.getLong(2),
        BigDecimal(r.getDecimal(3)).toBigInt,
        BigDecimal(r.getDecimal(4)).toBigInt, r.getBoolean(5)))
      .toSet

  test("identical distributions contribute exactly zero") {
    val snap = Seq("a", "a", "b")
    // d = r_i·C − c_i·R = 0 per category when ref == cur
    assert(audit(snap, snap).forall { case (_, _, _, num, _, drifted) =>
      num == 0 && !drifted
    })
  }

  test("exact rational values on a hand-checked table") {
    // ref: a×3, b×1 (R=4); cur: a×1, b×3 (C=4)
    // d_a = 3·4 − 1·4 = 8, num = 64, den = 4·4·4 = 64 → contrib 1 > 1/4
    val got = audit(Seq("a", "a", "a", "b"), Seq("a", "b", "b", "b"))
    assert(got == Set(
      (Some("a"), 3L, 1L, BigInt(64), BigInt(64), true),
      (Some("b"), 1L, 3L, BigInt(64), BigInt(64), true)))
  }

  test("a vanished and a brand-new category have defined contributions") {
    // ref: a×2, gone×2 (R=4); cur: a×2, new×2 (C=4)
    // gone: d = 2·4 − 0 = 8, num 64, den 4·4·2 = 32 → contrib 2
    val got = audit(Seq("a", "a", "gone", "gone"), Seq("a", "a", "new", "new"))
    assert(got.contains((Some("gone"), 2L, 0L, BigInt(64), BigInt(32), true)))
    assert(got.contains((Some("new"), 0L, 2L, BigInt(64), BigInt(32), true)))
    assert(got.contains((Some("a"), 2L, 2L, BigInt(0), BigInt(64), false)))
  }

  test("verdict sits exactly on the threshold boundary: strict >") {
    // contrib exactly 1/4: need num·tDen == den·tNum → not drifted
    // ref a×1,b×1 (R=2); cur a×1,b×1 → zero. Construct: ref a×3,b×1;
    // cur a×1,b×1 (C=2): d_a = 3·2−1·4 = 2, num 4, den 4·2·4 = 32,
    // contrib = 1/8 ≤ 1/4 → clean; at tNum/tDen = 1/8 it must STILL be
    // clean (strict >), and at 1/9 it drifts
    val ref = Seq("a", "a", "a", "b"); val cur = Seq("a", "b")
    def verdictAt(n: Long, d: Long) =
      audit(ref, cur, n, d).find(_._1.contains("a")).get._6
    assert(!verdictAt(1, 8))
    assert(verdictAt(1, 9))
  }

  test("billion-scale counts stay exact in the DECIMAL(38,0) path") {
    // 2e9-scale counts: chi_num ~ (r·C − c·R)² ≈ 1e37 — far past
    // Long.MaxValue, so the internal DECIMAL(38,0) arithmetic is the
    // only thing keeping the rational exact. The gate queries cast the
    // OUTPUT to BIGINT (values ≤ ~1.3e14 at gate SFs); this pin keeps
    // that cast from ever leaking into the operator itself.
    val r = BigInt(2100000000L); val c = BigInt(1900000000L)
    val refCounts = Seq(("a", 2100000000L), ("b", 400000000L))
      .toDF("category", "ref_n")
    val curCounts = Seq(("a", 1900000000L), ("b", 900000000L))
      .toDF("category", "cur_n")
    val got = Drift.chiSquaredAuditFromCounts(refCounts, curCounts, 1, 4)
      .collect()
      .map(row => (row.getString(0), BigDecimal(row.getDecimal(3)).toBigInt,
        BigDecimal(row.getDecimal(4)).toBigInt, row.getBoolean(5)))
      .map { case (k, n, d, v) => k -> ((n, d, v)) }
      .toMap
    val R = BigInt(2500000000L); val C = BigInt(2800000000L)
    def expect(rn: BigInt, cn: BigInt) = {
      val dd = rn * C - cn * R
      (dd * dd, R * C * (rn + cn))
    }
    val (na, da) = expect(r, c)
    assert(na > BigInt(Long.MaxValue), "pin must exceed BIGINT range")
    assert(got("a") == ((na, da, na * 4 > da)))
    val (nb, db) = expect(BigInt(400000000L), BigInt(900000000L))
    assert(got("b") == ((nb, db, nb * 4 > db)))
  }

  test("null categories audit like any other (null-safe join)") {
    val ref = Seq[Option[String]](None, None, Some("a")).toDF("cat")
    val cur = Seq[Option[String]](None, Some("a")).toDF("cat")
    val rows = Drift.chiSquaredAudit(ref, cur, "cat", 1, 4)
      .collect()
    assert(rows.length == 2) // null group merged across snapshots
    val nullRow = rows.find(_.isNullAt(0)).get
    assert(nullRow.getLong(1) == 2L && nullRow.getLong(2) == 1L)
  }
  test("tvdDrift: hand-checked rational, absent buckets count as zero, " +
      "verdict splits at the fence") {
    import spark.implicits._
    // A: x=3 y=1 (N=4); B: x=1 y=2 z=1 (N=4)
    // contribs: x |3*4-1*4|=8, y |1*4-2*4|=4, z |0-1*4|=4 -> num=16
    // tvd = 16 / (2*16) = 1/2
    val a = Seq(("g", "x"), ("g", "x"), ("g", "x"), ("g", "y"))
      .toDF("g", "b")
    val b = Seq(("g", "x"), ("g", "y"), ("g", "y"), ("g", "z"))
      .toDF("g", "b")
    val at = Drift.tvdDrift(a, b, "g", "b", 1L, 2L)
      .as[(String, String, Long, Long, Long, Long, Boolean)]
      .collect().toSet
    assert(at == Set(
      ("g", "x", 3L, 1L, 8L, 16L, true),
      ("g", "y", 1L, 2L, 4L, 16L, true),
      ("g", "z", 0L, 1L, 4L, 16L, true)))
    // just above the fence: tvd = 1/2 < 51/100 -> not drifted
    val over = Drift.tvdDrift(a, b, "g", "b", 51L, 100L)
      .selectExpr("drifted").distinct().collect()
    assert(over.length == 1 && !over.head.getBoolean(0))
  }
}
