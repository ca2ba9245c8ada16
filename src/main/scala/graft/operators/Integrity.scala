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

  // ── declarative constraint checks (dbt-test / Deequ shape) ───────────

  /** Rows violating primary-key uniqueness on `cols`: one shuffle at key
    * grain, returns the number of EXCESS rows (total − distinct keys). */
  def pkViolations(df: DataFrame, cols: Seq[String]): DataFrame =
    df.groupBy(cols.map(col): _*).agg(count(lit(1)).as("n"))
      .agg(coalesce(sum(col("n") - 1), lit(0L)).as("n_violations"))

  /** Child rows whose `childKey` has no match in `parent.parentKey`
    * (FK orphans): a left-anti join at key grain — the parent side
    * reduces to its distinct key relation first, so the join carries
    * (key) longs, never parent rows. */
  def fkViolations(child: DataFrame, childKey: String,
                   parent: DataFrame, parentKey: String): DataFrame =
    child.select(col(childKey))
      .join(parent.select(col(parentKey).as(childKey)).distinct(),
        Seq(childKey), "left_anti")
      .agg(count(lit(1)).as("n_violations"))

  /** Rows where `c` is null — the not-null constraint. */
  def nullViolations(df: DataFrame, c: String): DataFrame =
    df.agg(sum(col(c).isNull.cast("long")).as("n_violations"))

  /** Run a named set of constraint frames (each one row, one
    * `n_violations` column) into the standard report: (constraint,
    * n_violations, ok) ordered by name. Each check is an independent
    * aggregate; the union is a driver-side assembly of 1-row frames. */
  def constraintReport(checks: Seq[(String, DataFrame)]): DataFrame =
    checks.map { case (name, f) =>
      f.select(lit(name).as("constraint"),
        col("n_violations").cast("long").as("n_violations"),
        (col("n_violations") === 0L).as("ok"))
    }.reduce(_ unionByName _).orderBy("constraint")
}
