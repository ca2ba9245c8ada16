package graft

import org.apache.spark.sql.SparkSession

/** Session factory with the engine's tuned defaults: AQE (runtime
  * re-planning, skew-join splitting, partition coalescing), shuffle
  * partitions sized to cores (not 200), UTC, UI off, and the native
  * function extensions registered. All driver-contract mains build
  * through here. */
object GraftSession {
  def local(cores: String = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"),
            app: String = "graft"): SparkSession = {
    val spark = SparkSession.builder()
      .appName(app)
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.plans.GraftExtensions.register(spark)
    spark
  }
}
