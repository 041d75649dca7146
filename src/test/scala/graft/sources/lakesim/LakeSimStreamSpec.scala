package graft.sources.lakesim

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._
import graft.SparkSpec

/** Streaming lake extraction: exactly-once per data object across restarts
  * via checkpointed object-count offsets. */
class LakeSimStreamSpec extends SparkSpec {
  import spark.implicits._

  val schema = StructType(Seq(
    StructField("id", LongType), StructField("amount", DoubleType)))

  def writeObject(dir: String, name: String, ids: Range): Unit =
    Files.writeString(Paths.get(s"$dir/$name"),
      ids.map(i => s"""{"id": $i, "amount": ${i * 10}}""").mkString("\n"))

  def writeIndex(dir: String, files: Seq[(String, Int)]): Unit =
    Files.writeString(Paths.get(s"$dir/index.json"),
      files.map { case (f, n) => s"""{"file": "$f", "count": $n}""" }
        .mkString("{\"objects\": [", ",", "]}"))

  def runOnce(dir: String, ckpt: String, out: String): Unit = {
    val q = spark.readStream.format(classOf[LakeSimSource].getName)
      .schema(schema).option("path", dir).load()
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
  }

  test("micro-batches cover new objects exactly once across restarts") {
    val base = Files.createTempDirectory("lakestream").toString
    val (ckpt, out) = (s"$base/ckpt", s"$base/out")
    writeObject(base, "obj0.ndjson", 1 to 10)
    writeIndex(base, Seq("obj0.ndjson" -> 10))
    runOnce(base, ckpt, out)
    assert(spark.read.parquet(out).count() == 10)

    // two more objects appear in the lake; restart processes ONLY them
    writeObject(base, "obj1.ndjson", 11 to 15)
    writeObject(base, "obj2.ndjson", 16 to 20)
    writeIndex(base, Seq("obj0.ndjson" -> 10, "obj1.ndjson" -> 5,
      "obj2.ndjson" -> 5))
    runOnce(base, ckpt, out)
    val ids = spark.read.parquet(out).select("id").as[Long].collect().sorted
    assert(ids.toSeq == (1L to 20L).toSeq) // no replays, no gaps

    // idempotent: nothing new → nothing appended
    runOnce(base, ckpt, out)
    assert(spark.read.parquet(out).count() == 20)
  }
}
