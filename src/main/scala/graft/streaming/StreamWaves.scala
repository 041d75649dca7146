package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Wave staging + rate-limited file-source plumbing shared by the
  * multi-wave streaming gates.
  *
  * Why: an `AvailableNow` query lifecycle (start, checkpoint/state load,
  * drain, stop) carries a fixed ~1-2 s cost that dwarfs the data work at
  * gate scale. A gate whose invariant is *per-micro-batch* (cross-batch
  * state folds, watermark advance between batches) doesn't need one
  * lifecycle per wave: the file source splits pre-staged files into
  * micro-batches under `maxFilesPerTrigger`, and state/watermark
  * semantics across micro-batches inside ONE lifecycle are identical to
  * those across separate drains. Gates whose invariant is *restart*
  * semantics (checkpoint state reload, exactly-once replay — q98, q153)
  * keep their multiple lifecycles; replay-safety of each state family is
  * pinned by its ScalaTest spec.
  *
  * Ordering contract: Spark's `FileStreamSource` admits files in
  * modification-time order (`latestFirst=false`, the default), so
  * [[stage]] forces strictly increasing mtimes — one parquet part-file
  * per wave, spaced a minute apart — making "wave N = micro-batch N"
  * deterministic rather than a same-millisecond coin flip.
  */
object StreamWaves {

  /** Stage each wave as exactly ONE parquet part-file in `src`, with
    * strictly increasing modification times (wave i at now − 1 h + i
    * min), so a `maxFilesPerTrigger=1` source drains one wave per
    * micro-batch in staging order. */
  private val lastMtime = new java.util.concurrent.atomic.AtomicLong(0L)

  def stage(src: String, waves: Seq[DataFrame]): Unit = {
    val dir = new java.io.File(src)
    waves.zipWithIndex.foreach { case (w, i) =>
      val before = Option(dir.list()).map(_.toSet).getOrElse(Set.empty[String])
      w.coalesce(1).write.mode("append").parquet(src)
      val fresh = dir.list().filter(n => n.startsWith("part-") && !before(n))
      require(fresh.length == 1,
        s"StreamWaves.stage: wave $i landed as ${fresh.length} part files")
      // recent enough that FileStreamSource's maxFileAge window (7 days,
      // relative to the newest file) never drops a wave, and monotonic
      // across stage() calls so a wave staged after an earlier drain
      // never sorts before that drain's files
      val t = lastMtime.updateAndGet(prev => math.max(
        ((System.currentTimeMillis() - 3600000L) / 1000L) * 1000L,
        prev + 60000L))
      val f = new java.io.File(dir, fresh.head)
      require(f.setLastModified(t),
        s"StreamWaves.stage: cannot set mtime on $f")
    }
  }

  /** Stage independent wave sets into DISTINCT directories concurrently
    * (one driver thread per directory — Spark runs the write jobs at
    * once, so a two-sided fixture pays one side's wall, not the sum).
    * Within a directory waves stay sequential: [[stage]]'s fresh-file
    * detection diffs the listing per write. Cross-directory mtime
    * interleaving is irrelevant — each file source orders only its own
    * directory. */
  def stageAll(dirs: Seq[(String, Seq[DataFrame])]): Unit = {
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.max(1, dirs.size))
    try dirs.map { case (d, ws) =>
        pool.submit(new Runnable { override def run(): Unit = stage(d, ws) })
      }.foreach(_.get())
    finally pool.shutdown()
  }

  /** A schema'd parquet file-source reader with an optional
    * files-per-micro-batch cap. */
  def reader(spark: SparkSession, schema: StructType, path: String,
             maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    val r = spark.readStream.schema(schema)
    maxFilesPerTrigger.fold(r)(n => r.option("maxFilesPerTrigger", n))
      .parquet(path)
  }
}
