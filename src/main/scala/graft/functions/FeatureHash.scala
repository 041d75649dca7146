package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Hashing-trick text vectorizer (Weinberger et al.'s feature hashing):
  * token t adds ±1 to bucket hash(t) mod dim, giving every document a
  * fixed-width numeric vector with NO trained model, NO vocabulary
  * artifact, and NO driver state — the embedding IS a deterministic
  * function of the text, so two corpora vectorize identically without
  * sharing anything. The sign hash keeps bucket collisions unbiased
  * (E[collision contribution] = 0, the standard hashing-trick argument).
  *
  * This is the model-free seam of the text→vector→ANN pipeline: at
  * 100 TB the vectorization is a pure map (no shuffle beyond the
  * per-(doc, bucket) combine), and downstream the full Similarity
  * toolkit (brute-force / LSH / IVF / JL) applies unchanged. Counts are
  * integer-valued doubles and both hashes ride the portable md5 seam,
  * so vectors — and cosine rankings over them — restate exactly in SQL
  * (q117).
  */
object FeatureHash {

  /** Signed bucket contribution of one token: (bucket, ±1). */
  private def bucketOf(t: Column, dim: Int): Column =
    pmod(Sketches.hash60(t), lit(dim.toLong))
  private def signOf(t: Column): Column =
    when(pmod(Sketches.hash60(concat(t, lit("#"))), lit(2L)) === 0L,
      lit(1.0)).otherwise(lit(-1.0))

  /** Per-document feature-hashed vectors: one row per id that has at
    * least one token, with a dense `array<double>` of length `dim`.
    * Token-less documents (empty/whitespace-only text) produce NO row —
    * there is nothing to embed and a zero vector has no cosine; filter
    * or route them before vectorizing (FeatureHashSpec pins the drop).
    *
    * Scale shape: explode → one partially-aggregating shuffle on
    * (id, bucket) → one id-keyed reassembly whose per-doc state is ≤ dim
    * entries. The reassembly map is bounded by `dim`, never by document
    * length. */
  def vectorize(df: DataFrame, idCol: String, toksCol: Column,
                dim: Int): DataFrame = {
    require(dim >= 2, s"featureHash: dim must be >= 2, got $dim")
    val cells = df.select(col(idCol), explode(toksCol).as("_graft_t"))
      .select(col(idCol), bucketOf(col("_graft_t"), dim).as("_graft_b"),
        signOf(col("_graft_t")).as("_graft_s"))
      .groupBy(col(idCol), col("_graft_b"))
      .agg(sum(col("_graft_s")).as("_graft_v"))
    cells.groupBy(col(idCol))
      .agg(map_from_entries(collect_list(
        struct(col("_graft_b"), col("_graft_v")))).as("_graft_m"))
      .select(col(idCol),
        transform(sequence(lit(0L), lit(dim - 1L)),
          i => coalesce(element_at(col("_graft_m"), i), lit(0.0)))
          .as("vec"))
  }

  /** Exact cosine between two equal-length double vectors. Products and
    * sums of integer-valued doubles are exact; the sqrt and the final
    * division are the only rounded steps and restate identically in
    * SQL. Zero-norm inputs yield null (filter them, don't rank them). */
  def cosine(a: Column, b: Column): Column = {
    def dot(x: Column, y: Column): Column =
      aggregate(zip_with(x, y, (p, q) => p * q), lit(0.0), (acc, v) => acc + v)
    val na = sqrt(dot(a, a))
    val nb = sqrt(dot(b, b))
    when(na > 0.0 && nb > 0.0, dot(a, b) / (na * nb))
  }
}
