package graft.jobs

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.sinks.Sinks

/** Subject-area pipeline runner — the reference's orchestration loop
  * (`workflow.ps1:469-509`: per business class, load_s3 → load_staging →
  * load_data_warehouse, with per-class success/failure recording via
  * `report_job`, `workflow.ps1:192-203`) as one driver program.
  *
  * Per business class: read raw NDJSON from the lake root → drift-ingest
  * (IngestPipeline) → versioned bronze append → silver overwrite. Failures
  * are isolated per class (the reference logs and continues the area), and
  * the job report carries what the reference writes to its `job_tracker`
  * table (A8).
  */
object PipelineRunner {

  final case class JobReport(
      configName: String,
      businessClass: String,
      success: Boolean,
      rows: Long,
      schemaVersions: Int,
      durationSec: Double,
      error: Option[String])

  def runSubjectArea(spark: SparkSession, config: EngineConfig,
                     subjectArea: String, lakeRoot: String,
                     bronzeRoot: String, silverRoot: String): Seq[JobReport] =
    config.tablesFor(subjectArea).map { case (name, tc) =>
      val t0 = System.nanoTime()
      try {
        val raw = spark.read.text(s"$lakeRoot/${tc.businessClassName}.ndjson")
          .withColumnRenamed("value", "rec")
        val result = IngestPipeline.ingest(spark, raw, "rec")
        Sinks.writeVersioned(result.silver, s"$bronzeRoot/${tc.stagingTableName}")
        Sinks.writeMerged(result.silver.drop("schema_version"),
          s"$silverRoot/${tc.warehouseTableName}")
        val rows = spark.read.parquet(s"$silverRoot/${tc.warehouseTableName}").count()
        JobReport(name, tc.businessClassName, success = true, rows,
          result.registry.withoutSeed.versions.size,
          (System.nanoTime() - t0) / 1e9, None)
      } catch {
        case e: Exception =>
          JobReport(name, tc.businessClassName, success = false, 0L, 0,
            (System.nanoTime() - t0) / 1e9, Some(e.getMessage))
      }
    }

  /** A8: append job reports to a metrics table (the reference's
    * `job_tracker` insert, `utilities/helpers/report_job.py:64-92`). */
  def recordReports(spark: SparkSession, reports: Seq[JobReport],
                    table: String): Unit = {
    import spark.implicits._
    reports.toDF()
      .withColumn("reported_at", current_timestamp())
      .write.mode("append").saveAsTable(table)
  }
}
