package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Physical-layout utilities for shuffle avoidance at scale.
  *
  * The single biggest cost in a 100 TB join pipeline is re-shuffling fact
  * tables on every query. Bucketing pre-partitions data by join key at
  * write time: two tables bucketed the same way join with ZERO exchanges
  * (Spark trusts `HashPartitioning(key, n)` from the bucket spec), and a
  * groupBy on the bucket key skips its exchange too. The trade: a fixed
  * bucket count chosen at layout time — size it to keep bucket files in
  * the 100MB–1GB band at target scale.
  */
object Layout {

  /** Write `df` as a bucketed+sorted managed table (sorted buckets also
    * enable merge-join without a sort step). Drops any previous
    * registration AND its on-disk location first: the in-memory catalog
    * dies with the session but the warehouse directory does not, and
    * `saveAsTable` refuses a managed-table location left behind by an
    * earlier session (LOCATION_ALREADY_EXISTS). */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val loc = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), table.toLowerCase)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    df.write
      .bucketBy(buckets, key)
      .sortBy(key)
      .mode("overwrite")
      .format("parquet")
      .saveAsTable(table)
  }

  /** Co-located equi-join of two same-bucketed tables — plans with no
    * Exchange on either side. */
  def bucketedJoin(spark: SparkSession, left: String, right: String,
                   key: String, joinType: String = "inner"): DataFrame = {
    val l = spark.table(left)
    val r = spark.table(right)
    l.join(r, Seq(key), joinType)
  }

  /** Pre-shuffle a frame once for N downstream aggregations on the same
    * key: `repartition(key)` + persist shares the single exchange. */
  def repartitionFor(df: DataFrame, key: String, partitions: Int): DataFrame =
    df.repartition(partitions, df(key))
}
