package graft

import org.apache.spark.sql.SparkSession

/** Dev smoke mirroring the driver's t1 check: run [[SparkEntry.entry]] on
  * sf0.001 and require rows > 0. */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.entry(spark)
    val n = df.count()
    df.show(5, truncate = false)
    println(s"ENTRY_ROWS=$n QUERIES=${SparkEntry.queries.size} ORACLES=${SparkEntry.oracleSql.size}")
    spark.stop()
    if (n <= 0) sys.exit(1)
  }
}
