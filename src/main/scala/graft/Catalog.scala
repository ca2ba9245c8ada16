package graft

import org.apache.spark.sql.SparkSession

/** SQL-first surface: register every testdata table as a temp view so the
  * entire engine is drivable from plain `spark.sql(...)` — the interface a
  * reference user who writes SQL (not DataFrames) switches to. Views go
  * through [[Queries.tbl]], so the events nanos-timestamp normalization
  * and pruning/pushdown behavior are identical to the DataFrame path
  * (temp views are lazy plans: scans still prune columns and push
  * filters). */
object Catalog {
  val Tables: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  def register(spark: SparkSession, dir: String): Unit =
    Tables.foreach(t => Queries.tbl(spark, dir, t).createOrReplaceTempView(t))
}
