package graft
import org.apache.spark.sql.SparkSession
/** Dev tool: print formatted physical plans for named queries. */
object Explain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions","8").config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (name <- args) {
      println(s"===== $name =====")
      Queries.byName(name).run(spark, "/root/testdata/sf0.01").explain("formatted")
    }
    spark.stop()
  }
}
