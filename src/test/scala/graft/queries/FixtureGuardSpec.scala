package graft.queries

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The lakesim/cursorsim fixture builders collect the input driver-side
  * to lay it out as NDJSON objects / cursor pages — fine at test scale,
  * a driver OOM at real scale. Pins that the collect is row-capped and
  * fails loudly past the cap (and that the collect itself is bounded by
  * a limit, so the failure is an error, not an OOM). */
class FixtureGuardSpec extends SparkSpec {

  test("fixture collect under the cap returns all rows") {
    val rows = PipelineQueries.collectFixture(
      spark.range(100).toDF("id"), "test")
    assert(rows.length == 100)
  }

  test("fixture collect past the cap fails with an actionable error") {
    val big = spark.range(PipelineQueries.MaxFixtureRows + 1L).toDF("id")
    val ex = intercept[IllegalArgumentException] {
      PipelineQueries.collectFixture(big, "lakesimScanQ")
    }
    assert(ex.getMessage.contains("lakesimScanQ") &&
      ex.getMessage.contains(PipelineQueries.MaxFixtureRows.toString))
  }
}
