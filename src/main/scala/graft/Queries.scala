package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A named, oracle-checked query: `run` is the Spark plan over the tables
  * in `sfDir`; `oracle` is equivalent ANSI/DuckDB SQL over the same
  * parquet tables (None → driver falls back to a rows-only check).
  * Column names and row order must match the oracle exactly — every
  * query ends in a deterministic ORDER BY and aliases every output. */
final case class Q(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    headline: Boolean = false)

object Queries {
  /** Read one testdata table (column-pruned, filter-pushdown-friendly).
    * Parquet TIMESTAMP(NANOS) (events.ts) is unrepresentable in Spark; we
    * read it as raw nanos (legacy long mode) and truncate to microsecond
    * timestamps — all queries format at second granularity, so the oracle
    * (which reads ns natively) still matches bit-for-bit. */
  def tbl(s: SparkSession, dir: String, name: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = s.read.parquet(s"$dir/$name.parquet")
    if (name == "events")
      df.withColumn("ts",
        org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.col("ts") / 1000L cast "long"))
    else df
  }

  lazy val all: Seq[Q] =
    RelQueries.all ++ TextQueries.all ++ VecQueries.all ++ CleanQueries.all

  lazy val byName: Map[String, Q] = all.map(q => q.name -> q).toMap
}
