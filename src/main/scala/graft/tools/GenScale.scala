package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev tool: derive an sf1-scale dataset from the read-only sf0.1 tables,
  * for SCALE-VALIDATION benching only (no oracle runs against it).
  *
  *  - relational tables + events: 10 shifted copies (keys offset per copy,
  *    so key cardinality scales 10× while per-key structure is unchanged);
  *    region/nation stay fixed (they are fixed-size dimensions at any SF).
  *  - documents: synthesized fresh from the observed sf0.1 shape (31-word
  *    vocab, 8-96 word lengths, 20 sources, 5 langs, ~0.16% exact-dup
  *    injection) — NOT replicated, because text copies would plant 10
  *    exact clones of every document and near-dup candidate generation
  *    would super-linearly explode BY DATA CONSTRUCTION, which is not the
  *    scaling question. Text is a pure hash function of doc_id, so dup
  *    rows can copy an earlier doc's text without a join.
  *  - embeddings: 10× random unit vectors (the sf0.1 vectors are
  *    statistically random unit vectors with uniform labels — measured
  *    same-label avg cos ≈ 0).
  *
  * Usage: `runMain graft.tools.GenScale [outDir]` (default target/sf1).
  */
object GenScale {

  def main(args: Array[String]): Unit = {
    val srcDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val outDir = args.headOption.getOrElse("target/sf1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def copies(df: DataFrame, n: Int, shift: Map[String, Long]): DataFrame =
      (0 until n).map { i =>
        shift.foldLeft(df) { case (d, (c, width)) =>
          d.withColumn(c, col(c) + lit(i * width))
        }
      }.reduce(_ unionByName _)

    def load(t: String) = spark.read.parquet(s"$srcDir/$t.parquet")
    def save(df: DataFrame, t: String): Unit = {
      df.write.mode("overwrite").parquet(s"$outDir/$t.parquet")
      println(s"$t: ${spark.read.parquet(s"$outDir/$t.parquet").count()} rows")
    }

    // fixed-size dimensions: unchanged
    save(load("region"), "region")
    save(load("nation"), "nation")

    // key-offset widths: one above each table's max key at sf0.1 so the
    // 10 copies never collide
    val W = 10L * 1000L * 1000L
    save(copies(load("customer"), 10, Map("c_custkey" -> W)), "customer")
    save(copies(load("supplier"), 10, Map("s_suppkey" -> W)), "supplier")
    save(copies(load("part"), 10, Map("p_partkey" -> W)), "part")
    save(copies(load("orders"), 10,
      Map("o_orderkey" -> W, "o_custkey" -> W)), "orders")
    save(copies(load("lineitem"), 10,
      Map("l_orderkey" -> W, "l_partkey" -> W, "l_suppkey" -> W)), "lineitem")
    save(copies(load("events"), 10,
      Map("event_id" -> W, "user_id" -> W)), "events")

    // documents: fresh synthesis from the observed shape
    val vocab = load("documents")
      .select(explode(split(lower(col("text")), "\\s+")).as("w"))
      .filter(col("w") =!= "").distinct()
      .orderBy(col("w")).collect().map(_.getString(0))
    val nDocs = 10L * load("documents").count()
    val vlit = array(vocab.map(lit): _*)
    def h(seed: String, c: org.apache.spark.sql.Column) =
      abs(xxhash64(lit(seed), c))
    // text as a PURE function of an id column — reused for dup injection
    def textFor(id: org.apache.spark.sql.Column) = {
      val nWords = (h("len", id) % 89 + 8).cast("int")
      concat_ws(" ", transform(sequence(lit(1), nWords),
        i => element_at(vlit, (h("w", id * 131 + i) % vocab.length)
          .cast("int") + 1)))
    }
    val docs = spark.range(nDocs).toDF("doc_id")
      // ~0.16% of docs copy an earlier doc's text (the sf0.1 organic
      // exact-dup rate), everything else is unique by construction
      .withColumn("_src_id",
        when(h("dup", col("doc_id")) % 625 === 0 && col("doc_id") >= 100,
          col("doc_id") - (h("dupof", col("doc_id")) % 100) - 1)
        .otherwise(col("doc_id")))
      .withColumn("text", textFor(col("_src_id")))
      .withColumn("lang", element_at(
        array(Seq("en", "zh", "fr", "de", "es").map(lit): _*),
        (h("lang", col("doc_id")) % 5).cast("int") + 1))
      .withColumn("source",
        concat(lit("src"), (h("src", col("doc_id")) % 20).cast("string")))
      .withColumn("n_chars", length(col("text")))
      .select("doc_id", "text", "lang", "source", "n_chars")
    save(docs, "documents")

    // embeddings: random unit vectors, uniform labels 0-9
    val nVecs = 10L * load("embeddings").count()
    val raw = transform(sequence(lit(1), lit(64)),
      i => (h("e", col("vec_id") * 67 + i) % 2000001).cast("double")
        / lit(1000000.0) - lit(1.0))
    val vecs = spark.range(nVecs).toDF("vec_id")
      .withColumn("_raw", raw)
      .withColumn("_nrm", sqrt(aggregate(col("_raw"), lit(0.0d),
        (acc, x) => acc + x * x)))
      .withColumn("embedding",
        transform(col("_raw"), x => (x / col("_nrm")).cast("float")))
      .withColumn("label", (h("lbl", col("vec_id")) % 10).cast("int"))
      .select("vec_id", "embedding", "label")
    save(vecs, "embeddings")

    spark.stop()
  }
}
