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
}
