package graft.sources.lakesim

/** Per-object bloom filters for lakesim data skipping on EQUALITY
  * predicates — the complement of the index's min/max ranges (reference
  * semantics: `datalakewrapper.py:88-102` serves object properties the
  * planner prunes with; ranges catch range filters, blooms catch the
  * point-lookup a range can't: a high-cardinality id scattered across the
  * whole value domain leaves every object's [min,max] containing it).
  *
  * Shape at 100 TB: one 1 KiB bit array per (object, bloomed field) in the
  * index — planner-side only, never shipped to executors. A point lookup
  * on a bloomed field prunes ~every non-matching object at the index walk,
  * turning "scan all objects whose range happens to straddle the id" into
  * "open the one object that holds it" — the difference between a full
  * lake scan and a single-split read for needle queries.
  *
  * Determinism/portability: the filter is rebuilt from canonical value
  * bytes (integral → little-endian long, string → UTF-8), so the writer's
  * task-side adds and the planner's probe agree regardless of JVM or
  * platform. False positives only ever UNDER-prune (an object is read and
  * its records filtered record-side) — never wrong results.
  *
  * Sizing: m = 8192 bits, k = 6 gives ~0.009 false-positive rate at 1000
  * distinct values per object and ~0.33 at 10k (degrading toward
  * no-pruning, never toward wrong pruning).
  */
object LakeBloom {

  val NumBits = 8192
  val NumHashes = 6
  private val NumLongs = NumBits / 64

  def empty(): Array[Long] = new Array[Long](NumLongs)

  /** Canonical probe bytes for a value both sides hash identically.
    * Only integrals and strings participate (double equality pushdown is
    * not bloomed — writer-side field type and filter literal type can
    * disagree on representation). */
  def keyOf(v: Any): Option[Array[Byte]] = v match {
    case l: Long  => Some(longBytes(l))
    case i: Int   => Some(longBytes(i.toLong))
    case s: Short => Some(longBytes(s.toLong))
    case b: Byte  => Some(longBytes(b.toLong))
    case s: String => Some(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    case u: org.apache.spark.unsafe.types.UTF8String => Some(u.getBytes)
    case _ => None
  }

  private def longBytes(l: Long): Array[Byte] = {
    val b = new Array[Byte](8)
    var i = 0
    while (i < 8) { b(i) = ((l >>> (8 * i)) & 0xff).toByte; i += 1 }
    b
  }

  // FNV-1a 64 over the bytes, avalanched (splitmix64 finalizer) — two
  // independent streams via different seeds, combined Kirsch-Mitzenmacher
  // style: index_i = (h1 + i*h2) mod m with h2 forced odd.
  private def fnv(bytes: Array[Byte], seed: Long): Long = {
    var h = 0xcbf29ce484222325L ^ seed
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h *= 0x100000001b3L
      i += 1
    }
    // splitmix64 avalanche
    h ^= (h >>> 30); h *= 0xbf58476d1ce4e5b9L
    h ^= (h >>> 27); h *= 0x94d049bb133111ebL
    h ^ (h >>> 31)
  }

  def add(bits: Array[Long], key: Array[Byte]): Unit = {
    val h1 = fnv(key, 0L)
    val h2 = fnv(key, 0x9e3779b97f4a7c15L) | 1L
    var i = 0
    while (i < NumHashes) {
      val idx = java.lang.Long.remainderUnsigned(h1 + i * h2, NumBits).toInt
      bits(idx >>> 6) |= (1L << (idx & 63))
      i += 1
    }
  }

  def mightContain(bits: Array[Long], key: Array[Byte]): Boolean = {
    val h1 = fnv(key, 0L)
    val h2 = fnv(key, 0x9e3779b97f4a7c15L) | 1L
    var i = 0
    while (i < NumHashes) {
      val idx = java.lang.Long.remainderUnsigned(h1 + i * h2, NumBits).toInt
      if ((bits(idx >>> 6) & (1L << (idx & 63))) == 0L) return false
      i += 1
    }
    true
  }

  def toBase64(bits: Array[Long]): String = {
    val bb = java.nio.ByteBuffer.allocate(NumLongs * 8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bits.foreach(bb.putLong)
    java.util.Base64.getEncoder.encodeToString(bb.array())
  }

  def fromBase64(s: String): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(java.util.Base64.getDecoder.decode(s))
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val out = new Array[Long](NumLongs)
    var i = 0
    while (i < NumLongs) { out(i) = bb.getLong(); i += 1 }
    out
  }
}
