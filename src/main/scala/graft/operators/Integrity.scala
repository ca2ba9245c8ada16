package graft.operators

import graft.functions.TextFns
import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** Order-independent table fingerprinting — the cheap cross-system
  * equality check a 100 TB pipeline runs after every copy/migration/
  * backfill instead of a sort-and-diff (which would be a global sort of
  * both sides).
  *
  * Each row canonicalizes to one string (columns joined on 0x01, NULL
  * marked 0x00 — control bytes that cannot appear in the data), hashes
  * through the portable 60-bit md5 hash, and folds into commutative
  * aggregates (XOR + min + max + count) — so the fingerprint is
  * independent of row order and partitioning, computable map-side in one
  * narrow pass, and reproducible by ANY engine that has md5 (the DuckDB
  * oracle re-derives it bit-for-bit).
  *
  * Caller contract: pass a canonical column list — keys, strings, dates,
  * and integer-quantized numerics (e.g. money as cents). Raw doubles are
  * excluded because double→string formatting is not engine-portable
  * (scientific-notation thresholds differ).
  */
object Integrity {

  /** One-row fingerprint of `df` over `cols`. */
  def checksum(df: DataFrame, cols: Seq[String]): DataFrame = {
    val row = concat_ws("\u0001",
      cols.map(c => coalesce(col(c).cast("string"), lit("\u0000"))): _*)
    df.select(TextFns.portableHash(row).as("h"))
      .agg(count(lit(1)).as("n_rows"),
        expr("bit_xor(h)").as("hash_xor"),
        min(col("h")).as("hash_min"),
        max(col("h")).as("hash_max"))
  }

  /** The DuckDB spelling of the same fingerprint. */
  def checksumSql(table: String, colsSql: Seq[String]): String = {
    val row = s"concat_ws(chr(1), ${colsSql.map(c => s"coalesce(CAST($c AS VARCHAR), chr(0))").mkString(", ")})"
    val h = TextFns.portableHashSql(row)
    s"""WITH hs AS (SELECT $h AS h FROM $table)
      SELECT COUNT(*) AS n_rows, bit_xor(h) AS hash_xor,
        MIN(h) AS hash_min, MAX(h) AS hash_max FROM hs"""
  }

  /** Key-level reconciliation of two snapshots (the answer to "what
    * changed between yesterday's copy and today's?"): each side reduces
    * to (key, row-hash) — same canonical-column contract as [[checksum]],
    * so no raw doubles — then a full outer join on the key classifies
    * every key as `added` / `removed` / `changed` / `unchanged`.
    *
    * Requires unique keys per side (snapshot grain). Scale shape: each
    * side is one narrow hash projection; the only wide work is the
    * key-partitioned full outer join of two slim (key, hash) relations —
    * never the full rows. Output: keyCols ++ (status). */
  def diff(left: DataFrame, right: DataFrame, keyCols: Seq[String],
           valCols: Seq[String]): DataFrame = {
    def hashed(df: DataFrame, tag: String) = {
      val row = concat_ws("\u0001",
        valCols.map(c => coalesce(col(c).cast("string"), lit("\u0000"))): _*)
      df.select(keyCols.map(col) :+ TextFns.portableHash(row).as(s"__h_$tag"): _*)
    }
    hashed(left, "l").join(hashed(right, "r"), keyCols, "full_outer")
      .withColumn("status",
        when(col("__h_r").isNull, "removed")
          .when(col("__h_l").isNull, "added")
          .when(col("__h_l") === col("__h_r"), "unchanged")
          .otherwise("changed"))
      .drop("__h_l", "__h_r")
  }
}
