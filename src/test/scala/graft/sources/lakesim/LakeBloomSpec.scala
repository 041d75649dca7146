package graft.sources.lakesim

import org.scalatest.funsuite.AnyFunSuite

/** Pure-function behavior of the per-object bloom filters: no false
  * negatives ever, low false positives at design capacity, canonical
  * key encoding shared by writer and planner, and the serialization
  * round trip. */
class LakeBloomSpec extends AnyFunSuite {

  test("no false negatives: every added key is contained") {
    val bits = LakeBloom.empty()
    val keys = (1 to 1000).map(i => LakeBloom.keyOf(i.toLong).get) ++
      (1 to 200).map(i => LakeBloom.keyOf(s"value-$i").get)
    keys.foreach(LakeBloom.add(bits, _))
    assert(keys.forall(LakeBloom.mightContain(bits, _)))
  }

  test("false-positive rate is low at design capacity (1000 longs)") {
    val bits = LakeBloom.empty()
    (1 to 1000).foreach(i => LakeBloom.add(bits, LakeBloom.keyOf(i.toLong).get))
    val fp = (100001 to 110000).count(i =>
      LakeBloom.mightContain(bits, LakeBloom.keyOf(i.toLong).get))
    assert(fp < 300, s"false positives: $fp / 10000") // design ~0.9%
  }

  test("integral widths share one canonical encoding; doubles are not bloomed") {
    assert(LakeBloom.keyOf(42).get.toSeq == LakeBloom.keyOf(42L).get.toSeq)
    assert(LakeBloom.keyOf(42.toShort).get.toSeq ==
      LakeBloom.keyOf(42L).get.toSeq)
    assert(LakeBloom.keyOf(
      org.apache.spark.unsafe.types.UTF8String.fromString("abc")).get.toSeq ==
      LakeBloom.keyOf("abc").get.toSeq)
    assert(LakeBloom.keyOf(42.0).isEmpty)
    assert(LakeBloom.keyOf(true).isEmpty)
  }

  test("base64 round trip preserves the bit array") {
    val bits = LakeBloom.empty()
    (1 to 100).foreach(i => LakeBloom.add(bits, LakeBloom.keyOf(i * 7L).get))
    val back = LakeBloom.fromBase64(LakeBloom.toBase64(bits))
    assert(back.toSeq == bits.toSeq)
  }

}
