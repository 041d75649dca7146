package graft.functions

import graft.SparkSpec

class SeqPackSpec extends SparkSpec {
  import spark.implicits._

  private val chunks = (1 to 300).map(i => (i.toLong, (i % 23 + 1).toLong))
  private val df = chunks.toDF("key", "w")
  private val C = 50L

  /** Naive reference: serial concat-and-cut over the in-order chunk list. */
  private def naiveManifest(rows: Seq[(Long, Long)], cap: Long)
      : Map[Long, (Long, Long, Long)] = {
    var start = 0L
    val perSeq = scala.collection.mutable.Map[Long, (Long, Long)]()
      .withDefaultValue((0L, 0L)) // (n_chunks, n_tokens)
    rows.sortBy(_._1).foreach { case (_, w) =>
      val last = start + w - 1
      (start / cap to last / cap).foreach { s =>
        val share = math.min(last, (s + 1) * cap - 1) -
          math.max(start, s * cap) + 1
        val (c, t) = perSeq(s)
        perSeq(s) = (c + 1, t + share)
      }
      start += w
    }
    perSeq.map { case (s, (c, t)) => s -> (c, t, 0L) }.toMap
  }

  test("manifest equals the serial concat-and-cut reference") {
    val packed = Sharding.packSequences(df, "key", "w", C, numPartitions = 7)
    val got = Sharding.sequenceManifest(packed, "key")
      .select("seq_id", "n_chunks", "n_tokens")
      .as[(Long, Long, Long)].collect()
      .map { case (s, c, t) => s -> (c, t, 0L) }.toMap
    assert(got == naiveManifest(chunks, C))
  }

  test("every sequence fills to capacity except the last; ids consecutive") {
    val packed = Sharding.packSequences(df, "key", "w", C, numPartitions = 5)
    val man = Sharding.sequenceManifest(packed, "key")
      .orderBy("seq_id").select("seq_id", "n_tokens")
      .as[(Long, Long)].collect()
    assert(man.map(_._1).toSeq == (0L until man.length.toLong))
    man.init.foreach { case (_, t) => assert(t == C) }
    assert(man.last._2 <= C)
    assert(man.map(_._2).sum == chunks.map(_._2).sum)
  }

  test("a chunk wider than the capacity straddles multiple sequences") {
    val wide = Seq((1L, 10L), (2L, 120L), (3L, 10L)).toDF("key", "w")
    val packed = Sharding.packSequences(wide, "key", "w", C)
    val spans = packed.select("key", "seq_id", "seq_tokens")
      .as[(Long, Long, Long)].collect().groupBy(_._1)
    // chunk 2 starts at offset 10, ends 129 → sequences 0,1,2
    assert(spans(2L).map(_._2).sorted.toSeq == Seq(0L, 1L, 2L))
    assert(spans(2L).map(_._3).sum == 120L)
  }

  test("zero-weight rows are dropped, not assigned") {
    val mixed = Seq((1L, 5L), (2L, 0L), (3L, 7L)).toDF("key", "w")
    val packed = Sharding.packSequences(mixed, "key", "w", C)
    assert(!packed.select("key").as[Long].collect().contains(2L))
  }
}
