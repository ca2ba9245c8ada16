package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

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

  // NOTE (round 14): a scale-adaptive "spreadForCpu" hash-repartition
  // before CPU-heavy expression stages (minhash signatures, text
  // classifiers run as 1 task on the single-file sf corpora) was
  // implemented and adjudicated OUT: interleaved fresh-JVM min-of-legs
  // A/B over q22/q119/q138/q158/q172 measured the spread binary at
  // 13.46 s vs 9.42 s without it (sf0.1, 32 cores) — the extra
  // exchange, per-task overheads, and concurrency-inflated per-row CPU
  // exceed the parallelism gain at sub-MB inputs, and at real scale
  // inputs arrive multi-file/multi-split so the premise disappears
  // (a generated sf3 corpus lands as 32 part files). See
  // OPTIMIZATION_r14.md "negative results".

  /** Morton (Z-order) interleave of two `bits`-bit non-negative keys:
    * bit i of `a` lands at position 2i+1 and bit i of `b` at 2i, so rows
    * close in Z-value are close in BOTH key dimensions. Pure
    * shift/and/or integer expression (codegen'd) — the curve value a
    * `writeZOrdered` layout sorts by, and the reason a range predicate
    * on EITHER key prunes most files at 100 TB (each file's min/max
    * Z-range covers a bounded rectangle of the key plane, so parquet
    * footer stats skip files that a single-column sort could not). */
  def zorder2(a: Column, b: Column, bits: Int = 8): Column =
    (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      acc
        .bitwiseOR(shiftleft(shiftright(a.cast("long"), i).bitwiseAND(lit(1L)), 2 * i + 1))
        .bitwiseOR(shiftleft(shiftright(b.cast("long"), i).bitwiseAND(lit(1L)), 2 * i))
    }

  /** Z-ordered layout: range-partition + sort by the interleaved value,
    * so every output file holds a compact rectangle of (a, b) space. */
  def writeZOrdered(df: DataFrame, aCol: String, bCol: String, path: String,
                    partitions: Int = 32, bits: Int = 8): Unit =
    df.withColumn("_z", zorder2(col(aCol), col(bCol), bits))
      .repartitionByRange(partitions, col("_z"))
      .sortWithinPartitions("_z")
      .drop("_z")
      .write.mode("overwrite").parquet(path)

  /** Hive-style partitioned layout: `path/<partCol>=<value>/…` directories.
    * The coarsest and cheapest pruning lever at 100 TB: a filter on the
    * partition column is resolved at PLANNING time against the directory
    * listing (it shows as PartitionFilters on the scan), so non-matching
    * directories are never listed into the scan — no file open, no footer
    * read, no task. Partition by a low-cardinality column the workload
    * filters on (date, source, lang); a high-cardinality partition column
    * recreates the small-file problem ([[compact]]). */
  def writePartitioned(df: DataFrame, partCol: String, path: String): Unit =
    df.write.partitionBy(partCol).mode("overwrite").parquet(path)

  /** Small-file compaction: rewrite a parquet directory as
    * ⌈totalBytes / targetFileBytes⌉ evenly-sized files. The small-file
    * problem is the slow death of big tables — a streaming sink or an
    * over-parallel write leaves KB-sized files, and from then on every
    * reader pays per-file open + footer costs and the driver pays the
    * listing. The fix is one read + one round-robin repartition + one
    * write (no sort, no skew sensitivity); file count derives from actual
    * on-disk bytes, so re-running after growth re-targets automatically.
    * Writes to a NEW directory — swap-in is the caller's atomic rename,
    * never an in-place overwrite a concurrent reader could observe
    * half-done. Returns (filesBefore, filesAfter). */
  def compact(spark: SparkSession, inPath: String, outPath: String,
              targetFileBytes: Long = 128L << 20): (Int, Int) = {
    require(inPath != outPath, "compact to a new directory, then swap")
    def parquetFiles(dir: String) = {
      val p = new org.apache.hadoop.fs.Path(dir)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.listStatus(p).filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
    }
    val before = parquetFiles(inPath)
    val n = math.max(1,
      math.ceil(before.map(_.getLen).sum.toDouble / targetFileBytes).toInt)
    spark.read.parquet(inPath).repartition(n)
      .write.mode("overwrite").parquet(outPath)
    (before.length, parquetFiles(outPath).length)
  }
}
