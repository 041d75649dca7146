package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import graft.SparkSpec
import graft.functions.{Pii, QualityFilters, TextAnalysis}

/** The per-row curation battery is pure projection — it must run
  * UNCHANGED under Structured Streaming and produce byte-identical
  * results to the batch path. This is the live-ingest claim: quality
  * gates, PII redaction, language ID, and token accounting apply to a
  * stream without any operator rewrite. */
class StreamCurationSpec extends SparkSpec {
  import spark.implicits._

  private def curate(df: DataFrame): DataFrame =
    df.select(col("doc_id"),
        Pii.redact(col("text")).as("clean_text"),
        TextAnalysis.langId(col("text")).as("lang_pred"),
        TextAnalysis.tokenCount(col("text")).as("n_tokens"),
        TextAnalysis.qualityScore(col("text")).as("quality"))
      .withColumn("_toks", TextAnalysis.tokens(lower(col("clean_text"))))
      .withColumn("logit", QualityFilters.linearScoreFromTokens(col("_toks")))
      .drop("_toks")

  test("streamed curation equals the batch curation row-for-row") {
    implicit val sc = spark.sqlContext
    val rows = Seq(
      (1L, "Contact me at alice@example.com or 555-123-4567 today"),
      (2L, "the quick brown fox jumps over the lazy dog"),
      (3L, "der schnelle braune fuchs springt"),
      (4L, ""),
      (5L, "192.168.0.1 is a private address"))
    val input = MemoryStream[(Long, String)]
    val query = curate(input.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("curated_stream")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(rows.take(2): _*)
      query.processAllAvailable()
      input.addData(rows.drop(2): _*) // second micro-batch
      query.processAllAvailable()
      val streamed = spark.table("curated_stream")
        .as[(Long, String, String, Long, Double, Double)]
        .collect().sortBy(_._1).toSeq
      val batch = curate(rows.toDF("doc_id", "text"))
        .as[(Long, String, String, Long, Double, Double)]
        .collect().sortBy(_._1).toSeq
      assert(streamed == batch)
      // and the redaction actually fired on the streamed rows
      val byId = streamed.map(r => r._1 -> r._2).toMap
      assert(byId(1L).contains("<EMAIL>") && byId(1L).contains("<PHONE>"))
      assert(byId(5L).contains("<IP>"))
    } finally query.stop()
  }
}
