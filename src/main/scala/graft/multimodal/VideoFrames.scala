package graft.multimodal

import java.awt.image.BufferedImage

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Frame-level VIDEO operators on the in-JDK multi-frame container
  * (animated GIF — `javax.imageio` reads and writes frame sequences
  * pixel-exactly for ≤ 256-color content, probed by ProbeGif): a video
  * is fingerprinted as the dHashes of `k` EVENLY-SAMPLED frames, and
  * two videos near-duplicate when at least `minMatches` sampled
  * positions agree within a hamming fence — the standard
  * frame-signature approach to video dedup, built entirely from the
  * [[ImagePixels]] kernel.
  *
  * The sampling grid is RATE-INVARIANT by construction: sample j reads
  * frame `⌊j·n/k⌋`, so a frame-doubled re-encode (every frame
  * duplicated — the 2× frame-rate copy) samples the same CONTENT at
  * every position (`⌊2jn/k⌋ ∈ {2a, 2a+1}` both showing original frame
  * `a = ⌊jn/k⌋`), and with [[ImagePixels.dHash64]]'s resize/brightness
  * invariances a re-encoded, upscaled, rate-doubled, brightness-
  * shifted copy matches at ALL k positions exactly. Scale shape: the
  * pairing is per-position chunk-pigeonhole joins (never all-pairs),
  * then one map-side-combinable match count per candidate pair.
  *
  * Undecodable payloads survive as a single null row (the keep path). */
object VideoFrames {

  /** Encode frames as one animated GIF (the ImageIO sequence API). */
  def encodeAnimatedGif(frames: Seq[BufferedImage]): Array[Byte] = {
    require(frames.nonEmpty, "encodeAnimatedGif: need at least one frame")
    val bos = new java.io.ByteArrayOutputStream()
    val writer =
      javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      frames.foreach(img => writer.writeToSequence(
        new javax.imageio.IIOImage(img, null, null), null))
      writer.endWriteSequence()
    } finally {
      writer.dispose()
      ios.close()
    }
    bos.toByteArray
  }

  /** dHashes of the `k` evenly-sampled frames (sample j = frame
    * ⌊j·n/k⌋) plus the frame count; None on anything undecodable.
    * Only the sampled frames are decoded. */
  def sampledHashes(bytes: Array[Byte], k: Int): Option[(Int, Seq[Long])] = {
    require(k >= 1, "sampledHashes: k must be positive")
    if (bytes == null || bytes.isEmpty) return None
    var reader: javax.imageio.ImageReader = null
    try {
      val it = javax.imageio.ImageIO.getImageReaders(
        javax.imageio.ImageIO.createImageInputStream(
          new java.io.ByteArrayInputStream(bytes)))
      if (!it.hasNext) return None
      reader = it.next()
      reader.setInput(javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(bytes)))
      val n = reader.getNumImages(true)
      if (n < 1) return None
      val hashes = (0 until k).map { j =>
        ImagePixels.dHash64(reader.read((j.toLong * n / k).toInt))
      }
      Some((n, hashes))
    } catch {
      case _: Exception => None
    } finally if (reader != null) reader.dispose()
  }

  /** `(idCol, n_frames, sample_idx, fhash)` — one row per sampled
    * position per decodable video; an undecodable payload keeps as ONE
    * all-null row. Decode runs per partition; only sampled frames are
    * read. */
  def videoHashFrame(df: DataFrame, idCol: String, payloadCol: String,
                     k: Int = 8): DataFrame = {
    val spark = df.sparkSession
    val outSchema = StructType(Seq(
      StructField(idCol, LongType),
      StructField("n_frames", IntegerType),
      StructField("sample_idx", IntegerType),
      StructField("fhash", LongType)))
    val rdd = df.select(col(idCol), col(payloadCol)).rdd.mapPartitions { it =>
      it.flatMap { r =>
        sampledHashes(r.getAs[Array[Byte]](1), k) match {
          case Some((n, hs)) =>
            hs.zipWithIndex.map { case (h, j) => Row(r.getLong(0), n, j, h) }
          case None => Seq(Row(r.getLong(0), null, null, null))
        }
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** Video near-dup pairs `(idCol_a, idCol_b, n_matched)`: sampled
    * positions pair per-index through the chunk-pigeonhole join at
    * hamming ≤ `maxDist`, and a video pair qualifies when ≥
    * `minMatches` of the k positions match (default ⌈k/2⌉ — a
    * half-overlapping cut sits exactly at the fence). */
  def videoNearDups(df: DataFrame, idCol: String, payloadCol: String,
                    k: Int = 8, maxDist: Int = 4,
                    minMatchesOpt: Option[Int] = None): DataFrame =
    videoNearDupsFromHashes(
      videoHashFrame(df, idCol, payloadCol, k)
        .filter(col("fhash").isNotNull)
        .localCheckpoint(), // decode once: both join sides read it
      idCol, k, maxDist, minMatchesOpt)

  /** The pairing half of [[videoNearDups]] over an already-computed
    * `(idCol, sample_idx, fhash)` frame (null-hash rows excluded). */
  def videoNearDupsFromHashes(hashes: DataFrame, idCol: String,
                              k: Int = 8, maxDist: Int = 4,
                              minMatchesOpt: Option[Int] = None): DataFrame = {
    require(maxDist >= 0 && maxDist < 8,
      s"maxDist must be in [0, 8) for the 8x8-bit chunk grid, got $maxDist")
    val minMatches = minMatchesOpt.getOrElse((k + 1) / 2)
    val chunks = hashes.select(col(idCol), col("sample_idx"), col("fhash"),
        posexplode(transform(sequence(lit(0), lit(7)), i =>
          call_function("shiftright", col("fhash"), i * lit(8))
            .bitwiseAND(lit(0xFFL)))))
      .toDF(idCol, "sample_idx", "fhash", "chunk_idx", "chunk")
    val a = chunks.toDF(s"${idCol}_a", "sample_idx", "fhash_a",
      "chunk_idx", "chunk")
    val b = chunks.toDF(s"${idCol}_b", "sample_idx", "fhash_b",
      "chunk_idx", "chunk")
    a.join(b, Seq("sample_idx", "chunk_idx", "chunk"))
      .filter(col(s"${idCol}_a") < col(s"${idCol}_b"))
      .select(col(s"${idCol}_a"), col(s"${idCol}_b"), col("sample_idx"),
        bit_count(col("fhash_a").bitwiseXOR(col("fhash_b"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxDist)
      .groupBy(col(s"${idCol}_a"), col(s"${idCol}_b"))
      .agg(count(lit(1)).as("n_matched"))
      .filter(col("n_matched") >= minMatches)
  }

  /** Deterministic animated-GIF payload: `nFrames` frames of the
    * [[ImagePixels.renderImage]] pattern keyed by `(seed, frame)`;
    * frames ≥ `divergeFrom` re-key with an offset seed (the
    * half-overlap fixture). `truncateTo >= 0` keeps only that many
    * leading bytes. */
  def gifPayload(seed: Long, nFrames: Int, w: Int, h: Int, shift: Int = 0,
                 rate: Int = 1, divergeFrom: Int = Int.MaxValue,
                 truncateTo: Int = -1): Array[Byte] = {
    require(rate >= 1, "gifPayload: rate must be >= 1")
    val frames = (0 until nFrames).flatMap { f =>
      val s = if (f >= divergeFrom) seed + 500000L else seed
      Seq.fill(rate)(ImagePixels.renderImage(s * 1000003L + f, w, h, shift))
    }
    val bytes = encodeAnimatedGif(frames)
    if (truncateTo >= 0) bytes.take(truncateTo) else bytes
  }

  /** `(media_id, payload)` animated-GIF fixture frame — the
    * [[ImagePixels.fixtureFrame]] shape; `rate` duplicates every frame
    * that many times (the frame-rate-change clone). */
  def fixtureFrame(df: DataFrame, idCol: String, nFrames: Int, w: Int,
                   h: Int, shift: Int = 0, rate: Int = 1,
                   idOffset: Long = 0L, divergeFrom: Int = Int.MaxValue,
                   truncateTo: Int = -1): DataFrame = {
    require(rate >= 1, "fixtureFrame: rate must be >= 1")
    val spark = df.sparkSession
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("payload", BinaryType)))
    val rdd = df.select(col(idCol)).rdd.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        Row(id + idOffset, gifPayload(id, nFrames, w, h, shift, rate,
          divergeFrom, truncateTo))
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }
}
