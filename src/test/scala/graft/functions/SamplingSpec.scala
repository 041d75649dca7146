package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  val df = (1L to 2000L).toDF("id")
    .withColumn("stratum", when($"id" % 2 === 0, "a").otherwise("b"))

  test("thresholdHex maps rates to lowercase 8-hex prefixes") {
    assert(Sampling.thresholdHex(0.5) == "80000000")
    assert(Sampling.thresholdHex(0.25) == "40000000")
    assert(Sampling.thresholdHex(0.0) == "00000000")
    assert(Sampling.thresholdHex(1.0) == "ffffffff")
  }

  test("hashSample is deterministic, near-rate, and monotone in the rate") {
    val s25 = Sampling.hashSample(df, "id", 0.25).select("id").as[Long].collect().toSet
    assert(s25 == Sampling.hashSample(df, "id", 0.25)
      .select("id").as[Long].collect().toSet)
    assert(math.abs(s25.size / 2000.0 - 0.25) < 0.05)
    // growing the rate strictly grows the sample (same cut coordinate)
    val s50 = Sampling.hashSample(df, "id", 0.5).select("id").as[Long].collect().toSet
    assert(s25.subsetOf(s50))
  }

  test("stratifiedSample applies per-stratum rates with a default") {
    val out = Sampling.stratifiedSample(df, "id", "stratum",
        Map("a" -> 0.5), defaultRate = 0.1)
      .groupBy("stratum").count()
      .as[(String, Long)].collect().toMap
    assert(math.abs(out("a") / 1000.0 - 0.5) < 0.08)
    assert(math.abs(out("b") / 1000.0 - 0.1) < 0.06)
  }

  test("rate 1.0 keeps every row (no strict-threshold boundary loss)") {
    val df = (1 to 500).map(_.toLong).toDF("k")
    assert(Sampling.hashSample(df, "k", 1.0).count() == 500)
    assert(Sampling.hashSample(df, "k", 1.5).count() == 500)
    val strat = (1 to 500).map(i => (i.toLong, if (i % 2 == 0) "a" else "b"))
      .toDF("k", "s")
    assert(Sampling.stratifiedSample(strat, "k", "s",
      Map("a" -> 1.0), defaultRate = 1.0).count() == 500)
  }

  test("perGroupSample keeps exactly min(k, |group|) rows per group") {
    val sizes = Sampling.perGroupSample(df, "id", "stratum", 300)
      .groupBy("stratum").count().as[(String, Long)].collect().toMap
    // both strata have 1000 rows → exactly 300 each
    assert(sizes == Map("a" -> 300L, "b" -> 300L))
    val tiny = Seq((1L, "x"), (2L, "x"), (3L, "y")).toDF("id", "stratum")
    assert(Sampling.perGroupSample(tiny, "id", "stratum", 10).count() == 3)
  }

  test("perGroupSample is deterministic under repartitioning and prefix-stable in k") {
    val s100 = Sampling.perGroupSample(df, "id", "stratum", 100)
      .select("id").as[Long].collect().toSet
    val reshuffled = Sampling.perGroupSample(df.repartition(13), "id", "stratum", 100)
      .select("id").as[Long].collect().toSet
    assert(s100 == reshuffled)
    // the k=100 pick is a prefix of the k=250 pick (same sort coordinate)
    val s250 = Sampling.perGroupSample(df, "id", "stratum", 250)
      .select("id").as[Long].collect().toSet
    assert(s100.subsetOf(s250))
  }

  test("perGroupSample drops its helper column") {
    val out = Sampling.perGroupSample(df, "id", "stratum", 5)
    assert(out.columns.toSeq == df.columns.toSeq)
  }

  test("perGroupSample fails fast on a null sampling KEY (would silently vanish)") {
    // the rank machinery rejoins full rows via an equi-semi-join on the
    // key, so a null key can never come back — the coordinate guard must
    // raise, not drop the row
    val df = Seq((Some(1L), "a"), (None, "a"), (Some(3L), "b"))
      .toDF("id", "g")
    val ex = intercept[Exception] {
      Sampling.perGroupSample(df, "id", "g", 2).collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(ex).exists(m =>
      m.contains("perGroupSample") && m.contains("non-null")))
    val ex2 = intercept[Exception] {
      Sampling.mixtureSample(df.withColumn("g", lit("a")), "id", "g",
        Map("a" -> 1.0)).collect()
    }
    assert(messages(ex2).exists(m =>
      m.contains("mixtureSample") && m.contains("non-null")))
  }

  test("perGroupSample treats a null group as its own group") {
    val df = Seq((1L, Some("a")), (2L, Some("a")), (3L, None),
      (4L, None), (5L, None)).toDF("id", "g")
    val out = Sampling.perGroupSample(df, "id", "g", 2)
      .select("g").as[Option[String]].collect().toSeq
    // 2 from group "a" and 2 from the null group — null rows are
    // sampled, never silently dropped by the rank machinery's joins
    assert(out.count(_.contains("a")) == 2)
    assert(out.count(_.isEmpty) == 2)
  }

  test("pruneByScore keeps each group's lowest-scoring floor(frac*n) rows") {
    val rows = (0L until 100L).map(i =>
      (i, if (i % 2 == 0) "a" else "b", (i * 7919) % 101)) // distinct scores
    val in = rows.toDF("id", "g", "score")
    val kept = Sampling.pruneByScore(in, "id", "g", "score", 0.7)
      .select("id").as[Long].collect().toSet
    // driver reference: per group, sort by (score, id), keep floor(0.7*50)
    val expected = rows.groupBy(_._2).flatMap { case (_, grp) =>
      grp.sortBy(r => (r._3, r._1))
        .take(math.floor(0.7 * grp.size).toInt).map(_._1)
    }.toSet
    assert(kept == expected && kept.size == 70)
    // deterministic under repartitioning; monotone in keepFrac
    assert(Sampling.pruneByScore(in.repartition(13), "id", "g", "score", 0.7)
      .select("id").as[Long].collect().toSet == kept)
    val kept50 = Sampling.pruneByScore(in, "id", "g", "score", 0.5)
      .select("id").as[Long].collect().toSet
    assert(kept50.subsetOf(kept))
    // edges: keepFrac 1.0 keeps everything, 0.0 nothing
    assert(Sampling.pruneByScore(in, "id", "g", "score", 1.0).count() == 100)
    assert(Sampling.pruneByScore(in, "id", "g", "score", 0.0).count() == 0)
    // column order preserved
    assert(Sampling.pruneByScore(in, "id", "g", "score", 0.5)
      .columns.toSeq == in.columns.toSeq)
  }

  test("pruneByScore keeps null groups and fails fast on null keys") {
    val in = Seq((1L, Some("a"), 5L), (2L, Some("a"), 3L), (3L, None, 1L),
      (4L, None, 2L), (5L, None, 9L)).toDF("id", "g", "score")
    val out = Sampling.pruneByScore(in, "id", "g", "score", 0.7)
      .select("g").as[Option[String]].collect().toSeq
    // floor(0.7*2)=1 from "a", floor(0.7*3)=2 from the null group —
    // null groups prune like any other group (null-safe counts join)
    assert(out.count(_.contains("a")) == 1)
    assert(out.count(_.isEmpty) == 2)
    val nullKey = Seq((Some(1L), "a", 1L), (None, "a", 2L))
      .toDF("id", "g", "score")
    val ex = intercept[Exception] {
      Sampling.pruneByScore(nullKey, "id", "g", "score", 0.9).collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(ex).exists(m =>
      m.contains("pruneByScore") && m.contains("non-null")))
  }

  test("mixtureSample hits the target proportions, scaled by the scarcest stratum") {
    // 1000 a-rows, 1000 b-rows; ask for a 75/25 mix → a is scarcest:
    // K = 1000/0.75 = 1333.3…, keep floor(K·0.75)=1000 a, floor(K·0.25)=333 b
    val out = Sampling.mixtureSample(df, "id", "stratum",
        Map("a" -> 0.75, "b" -> 0.25))
      .groupBy("stratum").count().as[(String, Long)].collect().toMap
    assert(out == Map("a" -> 1000L, "b" -> 333L))
  }

  test("mixtureSample drops non-target strata and is deterministic") {
    val three = ((1 to 600).map(i => (i.toLong, "a")) ++
      (601 to 800).map(i => (i.toLong, "b")) ++
      (801 to 900).map(i => (i.toLong, "c"))).toDF("id", "stratum")
    val targets = Map("a" -> 0.5, "b" -> 0.5)
    val out = Sampling.mixtureSample(three, "id", "stratum", targets)
    assert(out.filter($"stratum" === "c").count() == 0)
    // b is scarcest: K = 400 → 200 of each
    val sizes = out.groupBy("stratum").count().as[(String, Long)].collect().toMap
    assert(sizes == Map("a" -> 200L, "b" -> 200L))
    val again = Sampling.mixtureSample(three.repartition(7), "id", "stratum", targets)
      .select("id").as[Long].collect().toSet
    assert(again == out.select("id").as[Long].collect().toSet)
  }

  test("mixtureSample with an empty target stratum is empty (infeasible mix)") {
    assert(Sampling.mixtureSample(df, "id", "stratum",
      Map("a" -> 0.5, "zz" -> 0.5)).count() == 0)
  }

  test("mixtureSample accepts a non-string stratum column") {
    val coded = ((1 to 400).map(i => (i.toLong, 1)) ++
      (401 to 600).map(i => (i.toLong, 2))).toDF("id", "lang_id")
    val out = Sampling.mixtureSample(coded, "id", "lang_id",
        Map("1" -> 0.5, "2" -> 0.5))
      .groupBy("lang_id").count().as[(Int, Long)].collect().toMap
    // 2 is scarcest: K = 400 → 200 of each
    assert(out == Map(1 -> 200L, 2 -> 200L))
  }

  test("hashSplit: every row in exactly one split, fractions roughly hold") {
    val out = Sampling.hashSplit(df, "id",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    assert(out.count() == 2000L)
    val sizes = out.groupBy("split").count().as[(String, Long)].collect().toMap
    assert(sizes.keySet == Set("train", "val", "test"))
    assert(sizes.values.sum == 2000L)
    // binomial(2000, 0.8) is within ±5σ ≈ ±90 of 1600 essentially always
    assert(math.abs(sizes("train") - 1600L) < 120,
      s"train split ${sizes("train")} too far from 1600")
  }

  test("hashSplit is deterministic and stable under corpus growth") {
    val splits = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val small = Sampling.hashSplit(df.limit(500), "id", splits)
      .select($"id", $"split").as[(Long, String)].collect().toMap
    val full = Sampling.hashSplit(df.repartition(7), "id", splits)
      .select($"id", $"split").as[(Long, String)].collect().toMap
    // a row's split never changes when more rows arrive or layout changes
    small.foreach { case (id, s) => assert(full(id) == s) }
  }

  test("hashSplit matches the hashBucket thresholds exactly") {
    val splits = Seq("lo" -> 0.25, "hi" -> 0.75)
    val t = Sampling.thresholdHex(0.25)
    val got = Sampling.hashSplit(df, "id", splits)
      .withColumn("b", Sampling.hashBucket($"id"))
      .select($"split", $"b").as[(String, String)].collect()
    got.foreach { case (s, b) =>
      assert(if (b < t) s == "lo" else s == "hi")
    }
  }

  // --- weightedSample (deterministic weighted lottery) ---

  /** The lottery restated naively on the driver: hash60 (md5 top 15 hex
    * as a long) of "key:i" per ticket, min ticket, top-k by
    * (priority, key-string). */
  private def naiveWeighted(rows: Seq[(Long, Long)], k: Int): Set[Long] = {
    def hash60(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      java.lang.Long.parseLong(
        d.take(8).map(b => f"${b & 0xff}%02x").mkString.take(15), 16)
    }
    rows.map { case (id, w) =>
      id -> (0L until w).map(i => hash60(s"$id:$i")).min
    }.sortBy { case (id, p) => (p, id.toString) }.take(k).map(_._1).toSet
  }

  test("weightedSample matches the naive lottery restatement exactly") {
    val rows = (1L to 300L).map(id => (id, 1L + id % 5))
    val got = Sampling.weightedSample(
        rows.toDF("id", "w"), "id", "w", k = 40)
      .select($"id").as[Long].collect().toSet
    assert(got == naiveWeighted(rows, 40))
  }

  test("weightedSample is deterministic under repartitioning and exact-k") {
    val d = (1L to 1000L).toDF("id").withColumn("w", lit(1L) + $"id" % 8)
    val a = Sampling.weightedSample(d, "id", "w", 100)
      .select($"id").as[Long].collect().toSet
    val b = Sampling.weightedSample(d.repartition(13), "id", "w", 100)
      .select($"id").as[Long].collect().toSet
    assert(a == b && a.size == 100)
  }

  test("weightedSample favors heavy rows in proportion to weight") {
    // half the corpus at weight 1, half at weight 10: a winner is ~10×
    // likelier to be heavy, so a 200-of-2000 sample is overwhelmingly
    // heavy (binomial tail: <1e-12 chance of heavy ≤ 2× light)
    val d = (1L to 2000L).toDF("id")
      .withColumn("w", when($"id" <= 1000L, 1L).otherwise(10L))
    val heavy = Sampling.weightedSample(d, "id", "w", 200)
      .filter($"id" > 1000L).count()
    assert(heavy > 2 * (200 - heavy), s"heavy=$heavy of 200")
  }

  // --- sqrtAllocatedSample ---

  test("sqrtAllocatedSample: floor-sqrt integer allocation, exact per-stratum k") {
    // 400/100/25 rows → ⌊√⌋ = 20/10/5, Σ = 35; budget 70 → k = 40/20/10
    val d = ((1 to 400).map(i => (i.toLong, "a")) ++
      (401 to 500).map(i => (i.toLong, "b")) ++
      (501 to 525).map(i => (i.toLong, "c"))).toDF("id", "g")
    val got = Sampling.sqrtAllocatedSample(d, "id", "g", 70L)
      .groupBy("g").count().as[(String, Long)].collect().toMap
    assert(got == Map("a" -> 40L, "b" -> 20L, "c" -> 10L))
  }

  test("sqrtAllocatedSample caps at stratum size and damps the head") {
    // tiny stratum with outsized allocation keeps everything it has
    val d = ((1 to 900).map(i => (i.toLong, "big")) ++
      (901 to 903).map(i => (i.toLong, "tiny"))).toDF("id", "g")
    // ⌊√⌋ = 30/1, Σ = 31; budget 620 → big 600, tiny 20 → capped at 3
    val got = Sampling.sqrtAllocatedSample(d, "id", "g", 620L)
      .groupBy("g").count().as[(String, Long)].collect().toMap
    assert(got == Map("big" -> 600L, "tiny" -> 3L))
    // sub-linear: big is 300× larger but gets 200× the rows, not 300×
  }

  // --- ringNegatives ---

  test("ringNegatives: k per anchor, balanced usage, never self") {
    val d = (1L to 200L).toDF("id")
    val out = Sampling.ringNegatives(d, "id", 4)
      .as[(Long, Long, Long)].collect().toSeq
    assert(out.size == 200 * 4)
    // exactly k rows per anchor, with neg_idx 1..k
    out.groupBy(_._1).foreach { case (_, rows) =>
      assert(rows.map(_._2).sorted == Seq(1L, 2L, 3L, 4L))
    }
    // fixed rotations → every doc serves as a negative exactly k times
    val usage = out.groupBy(_._3).view.mapValues(_.size).toMap
    assert(usage.size == 200 && usage.values.forall(_ == 4))
    // no self-pairs
    assert(out.forall { case (a, _, b) => a != b })
  }

  test("ringNegatives is deterministic under repartitioning") {
    val d = (1L to 300L).toDF("id")
    val a = Sampling.ringNegatives(d, "id", 3)
      .as[(Long, Long, Long)].collect().toSet
    val b = Sampling.ringNegatives(d.repartition(11), "id", 3)
      .as[(Long, Long, Long)].collect().toSet
    assert(a == b)
  }

  test("ringNegatives rejects infeasible k") {
    val d = (1L to 3L).toDF("id")
    intercept[IllegalArgumentException] {
      Sampling.ringNegatives(d, "id", 3)
    }
  }

  test("weightedSample fails fast on null keys and invalid weights") {
    val nullKey = Seq((Some(1L), 2L), (None, 3L))
      .toDF("id", "w")
    intercept[Exception] {
      Sampling.weightedSample(nullKey, "id", "w", 1).collect()
    }
    val zeroW = Seq((1L, 1L), (2L, 0L)).toDF("id", "w")
    intercept[Exception] {
      Sampling.weightedSample(zeroW, "id", "w", 1).collect()
    }
    val hugeW = Seq((1L, 1L), (2L, 5000L)).toDF("id", "w")
    intercept[Exception] {
      Sampling.weightedSample(hugeW, "id", "w", 1).collect()
    }
  }

  test("clusterSafeSplit: pair-connected rows NEVER straddle a split " +
      "boundary; singletons split like hashSplit of their own id") {
    import spark.implicits._
    // 3 chained clusters {1,2,3}, {10,11}, and singletons 20, 21
    val df = (Seq(1L, 2L, 3L, 10L, 11L, 20L, 21L)).toDF("id")
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val out = Sampling.clusterSafeSplit(df, "id", pairs, "id_a", "id_b",
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .select("id", "cluster_id", "split")
      .as[(Long, Long, String)].collect().toSeq
    val byId = out.map(r => r._1 -> r).toMap
    // transitive members share cluster AND split
    assert(byId(1L)._2 == 1L && byId(2L)._2 == 1L && byId(3L)._2 == 1L)
    assert(Set(byId(1L)._3, byId(2L)._3, byId(3L)._3).size == 1)
    assert(byId(10L)._2 == 10L && byId(11L)._2 == 10L &&
      byId(10L)._3 == byId(11L)._3)
    // a singleton's cluster is itself, so its split IS hashSplit's
    val solo = Sampling.hashSplit(Seq(20L, 21L).toDF("id"), "id",
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .as[(Long, String)].collect().toMap
    assert(byId(20L)._3 == solo(20L) && byId(21L)._3 == solo(21L))
  }

  test("massBudgetSelect equals the naive global-sort selection, keeps " +
       "the boundary row, breaks priority ties by id, and never plans " +
       "a single-partition global window") {
    val rnd = new scala.util.Random(11)
    val rows = (1L to 500L).map(i => (i, (rnd.nextInt(90) + 10).toLong))
    val in = rows.toDF("id", "w").repartition(7)
    val got = Sampling.massBudgetSelect(in, "id", "w", "w", 6, 10)
      .as[(Long, Long)].collect().toSet
    // naive: sort by (w desc, id), keep while exclusive prefix < 0.6*tot
    val tot = rows.map(_._2).sum
    var acc = 0L
    val want = rows.sortBy { case (id, w) => (-w, id) }.takeWhile { case (_, w) =>
      val keep = acc * 10 < tot * 6; acc += w; keep
    }.toSet
    assert(got == want && got.nonEmpty && got.size < rows.size)
    // frac 0 keeps nothing; frac 1 keeps all
    assert(Sampling.massBudgetSelect(in, "id", "w", "w", 0, 1).count() == 0)
    assert(Sampling.massBudgetSelect(in, "id", "w", "w", 1, 1).count()
      == rows.size)
    // no single-partition global window: the only window partitions by
    // the range-exchange pid
    val plan = Sampling.massBudgetSelect(in, "id", "w", "w", 6, 10)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window [") ||
      !plan.contains("SinglePartition"), plan)
  }

  test("massBudgetSelectBy fills each group's own budget: per-group " +
       "naive equivalence, groups never cross-subsidize") {
    val rnd = new scala.util.Random(13)
    val rows = (1L to 600L).map(i =>
      (i, if (i % 3 == 0) "big" else "small", (rnd.nextInt(50) + 1).toLong))
    val in = rows.toDF("id", "g", "w").repartition(5)
    val got = Sampling.massBudgetSelectBy(in, Seq("g"), "id", "w", "w", 1, 2)
      .select($"id", $"g", $"w").as[(Long, String, Long)].collect().toSet
    val want = rows.groupBy(_._2).values.flatMap { grp =>
      val tot = grp.map(_._3).sum
      var acc = 0L
      grp.sortBy { case (id, _, w) => (-w, id) }.takeWhile { case (_, _, w) =>
        val keep = acc * 2 < tot * 1; acc += w; keep
      }
    }.toSet
    assert(got == want && got.nonEmpty)
    // each group holds roughly half ITS mass — not half the global mass
    for (g <- Seq("big", "small")) {
      // toSeq before map: Set.map would dedup equal weights
      val kept = got.toSeq.filter(_._2 == g).map(_._3).sum.toDouble
      val tot = rows.filter(_._2 == g).map(_._3).sum.toDouble
      assert(kept / tot >= 0.5 && kept / tot < 0.6, s"$g: ${kept / tot}")
    }
  }

  test("mass budget hardening: a NULL group is still a group, a double " +
       "priority orders at full precision, a null priority raises") {
    // NULL-group rows survive at frac=1 (an equi-join would drop them)
    val withNull = Seq((1L, Some("a"), 5L), (2L, None, 7L), (3L, None, 3L))
      .toDF("id", "g", "w")
    val all = Sampling.massBudgetSelectBy(withNull, Seq("g"), "id", "w", "w", 1, 1)
      .select($"id").as[Long].collect().toSet
    assert(all == Set(1L, 2L, 3L))
    // and the null group selects against ITS OWN total (7 of 10 → 7 kept)
    val half = Sampling.massBudgetSelectBy(withNull, Seq("g"), "id", "w", "w", 1, 2)
      .select($"id").as[Long].collect().toSet
    assert(half == Set(1L, 2L)) // per-group boundary rows
    // double priority: 0.9 outranks 0.1 — no silent cast-to-long collapse
    val dbl = Seq((1L, 0.1, 10L), (2L, 0.9, 10L)).toDF("id", "p", "w")
    val top = Sampling.massBudgetSelect(dbl, "id", "p", "w", 1, 2)
      .select($"id").as[Long].collect().toSeq
    assert(top == Seq(2L))
    // null priority fails loudly, not silently-first
    val err = intercept[Exception] {
      Sampling.massBudgetSelect(
        Seq((1L, Some(1.0), 1L), (2L, None, 1L)).toDF("id", "p", "w"),
        "id", "p", "w", 1, 2).collect()
    }
    def chain(t: Throwable): Seq[Throwable] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(8).toSeq
    assert(chain(err).exists(c => Option(c.getMessage)
      .exists(_.contains("null p"))), err)
  }

  test("temperatureAllocation: integer allocations sum exactly to the budget") {
    val groups = Seq.fill(10000)("en") ++ Seq.fill(2500)("fr") ++
      Seq.fill(400)("sw") ++ Seq.fill(9)("is")
    val df = groups.zipWithIndex.map { case (g, i) => (i.toLong, g) }
      .toDF("id", "lang")
    val out = Sampling.temperatureAllocation(df, "lang", budget = 1000L)
      .as[(String, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(out.values.map(_._4).sum == 1000L)
    // weights are floor(sqrt(n)): 100, 50, 20, 3 → W = 173
    assert(out("en")._3 == 100L && out("fr")._3 == 50L &&
      out("sw")._3 == 20L && out("is")._3 == 3L)
    // largest-remainder over quotas 1000*w/173: en 578.03, fr 289.02,
    // sw 115.6, is 17.3 → floors 578+289+115+17 = 999, 1 seat to sw
    assert(out("en")._4 == 578L && out("fr")._4 == 289L &&
      out("sw")._4 == 116L && out("is")._4 == 17L)
  }

  test("temperatureAllocation flattens the head relative to proportional") {
    val df = (Seq.fill(9000)("head") ++ Seq.fill(90)("tail")).zipWithIndex
      .map { case (g, i) => (i.toLong, g) }.toDF("id", "lang")
    val out = Sampling.temperatureAllocation(df, "lang", budget = 100L)
      .as[(String, Long, Long, Long)].collect().map(r => r._1 -> r._4).toMap
    // proportional would give head ~99/100; sqrt gives ~94/(94+9) ≈ 91
    assert(out("head") < 95L && out("tail") > 5L)
    assert(out("head") + out("tail") == 100L)
  }

  test("temperatureAllocation: zero budget allocates zero everywhere") {
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "g")
    val out = Sampling.temperatureAllocation(df, "g", budget = 0L)
      .as[(String, Long, Long, Long)].collect()
    assert(out.forall(_._4 == 0L))
  }

  // --- weightedReservoir (deterministic E-S bottom-k) ---

  private def esRank(id: Long, w: Long): (Long, Long) = {
    val h = graft.expressions.Hash60Expr.hash60(
      id.toString.getBytes("UTF-8"))
    (h / w, h)
  }

  test("weightedReservoir matches the naive rank restatement, in order") {
    val rows = (1L to 200L).map(i => (i, 1L + i % 13))
    val got = Sampling.weightedReservoir(
        rows.toDF("id", "w"), "id", "w", k = 25)
      .select($"sample_rank".cast("long"), $"id", $"w")
      .as[(Long, Long, Long)].collect().toSeq
    val want = rows.map { case (id, w) =>
        val (r, h) = esRank(id, w); (r, h, id, w)
      }.sortBy(t => (t._1, t._2, t._3)).take(25).zipWithIndex
      .map { case ((_, _, id, w), i) => (i + 1L, id, w) }
    assert(got == want)
  }

  test("weightedReservoir: maintenance is entry-identical to one-shot " +
      "under any batching, in any wave order, with re-delivery") {
    val rows = (1L to 300L).map(i => (i, 1L + i % 29))
    val oneShot = Sampling.weightedReservoir(
        rows.toDF("id", "w"), "id", "w", k = 20)
      .select($"id", $"w", $"sample_rank".cast("long"))
      .as[(Long, Long, Long)].collect().toSet
    val empty = Seq.empty[(Long, Long)].toDF("id", "w")
    // waves split 3 ways; wave 2 re-delivers a slice of wave 1
    val w1 = rows.filter(_._1 % 3 == 0)
    val w2 = rows.filter(_._1 % 3 == 1) ++ w1.filter(_._1 % 2 == 0)
    val w3 = rows.filter(_._1 % 3 == 2)
    def fold(waves: Seq[Seq[(Long, Long)]]): Set[(Long, Long, Long)] =
      waves.foldLeft(empty) { (st, wv) =>
        val next = Sampling.weightedReservoirMaintain(
          st, wv.toDF("id", "w"), "id", "w", k = 20)
        assert(next.count() <= 20) // state stays bounded at k
        next
      }.select($"id", $"w", $"sample_rank".cast("long"))
        .as[(Long, Long, Long)].collect().toSet
    assert(fold(Seq(w1, w2, w3)) == oneShot)
    assert(fold(Seq(w3, w1, w2)) == oneShot)
  }

  test("largestRemainderSample: allocations sum to the budget exactly " +
      "and spare rows follow the remainder order") {
    // strata sizes 7 / 5 / 3 (N=15), budget 7: quotas 49/15, 35/15,
    // 21/15 -> floors 3,2,1 (sum 6), remainders 4,5,6 -> spare to "c"
    val rows = (1L to 7L).map((_, "a")) ++ (8L to 12L).map((_, "b")) ++
      (13L to 15L).map((_, "c"))
    val got = Sampling.largestRemainderSample(
        rows.toDF("id", "g"), "id", "g", budget = 7L)
      .groupBy($"g").count().as[(String, Long)].collect().toMap
    assert(got == Map("a" -> 3L, "b" -> 2L, "c" -> 2L))
    assert(got.values.sum == 7L)
  }

  test("largestRemainderSample: budget equal to corpus keeps everything; " +
      "budget beyond it fails loudly") {
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "g")
    assert(Sampling.largestRemainderSample(df, "id", "g", 2L).count() == 2L)
    val e = intercept[Exception] {
      Sampling.largestRemainderSample(df, "id", "g", 3L).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("largestRemainderSample")))
  }

  test("weightedReservoir fails loudly on weight < 1") {
    val e = intercept[Exception] {
      Sampling.weightedReservoir(
        Seq((1L, 0L)).toDF("id", "w"), "id", "w", k = 5).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("weightedReservoir")))
  }
  test("weightedReservoirByGroup matches the per-group naive rank order " +
      "and caps each group at k") {
    val rows = (1L to 60L).map(i => (i, if (i % 2 == 0) "a" else "b",
      1L + i % 9))
    val got = Sampling.weightedReservoirByGroup(
        rows.toDF("id", "g", "w"), "id", "g", "w", k = 5)
      .select($"g", $"sample_rank", $"id")
      .as[(String, Long, Long)].collect().toSeq.sorted
    val want = rows.groupBy(_._2).toSeq.flatMap { case (g, members) =>
      members.map { case (id, _, w) =>
        val (r, h) = esRank(id, w); (r, h, id)
      }.sortBy(t => (t._1, t._2, t._3)).take(5).zipWithIndex
        .map { case ((_, _, id), i) => (g, i + 1L, id) }
    }.sorted
    assert(got == want)
    assert(got.count(_._1 == "a") == 5 && got.count(_._1 == "b") == 5)
  }
}
