package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: replicate the driver's smoke check (entry() rows > 0). */
object EntrySmoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val n = graft.SparkEntry.entry(spark).count()
    println(s"entry rows: $n")
    assert(n > 0, "entry returned no rows")
    spark.stop()
  }
}
