package graft

import org.apache.spark.sql.SparkSession

/** Dev smoke mirroring the driver's t1 check: run [[SparkEntry.entry]] on
  * sf0.001 and require rows > 0. */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(app = "graft-smoke")
    val df = SparkEntry.entry(spark)
    val n = df.count()
    df.show(5, truncate = false)
    println(s"ENTRY_ROWS=$n QUERIES=${SparkEntry.queries.size} ORACLES=${SparkEntry.oracleSql.size}")
    spark.stop()
    if (n <= 0) sys.exit(1)
  }
}
