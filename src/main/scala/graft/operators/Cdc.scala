package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** Changelog → slowly-changing-dimension (SCD type 2) apply: turn an
  * append-only event log into per-key validity intervals, keeping only
  * rows where the tracked state actually changed.
  *
  * Shape: one hash shuffle on `key`, then two window passes over the SAME
  * partitioning (Catalyst reuses the single Exchange; the second sort is
  * cheap because the filter between them preserves order):
  *
  *   1. `lag(state)` per key in `seq` order; keep rows where the state
  *      differs null-safely from its predecessor (first row always kept);
  *   2. `valid_to = lead(seq.head)` over the surviving change rows;
  *      `is_current = valid_to IS NULL`.
  *
  * At 100 TB this is the standard CDC-compaction plan: no join against
  * the previous snapshot, no driver state, skew bounded by the hottest
  * single key's history (salt upstream if one key dominates).
  */
object Cdc {

  /** @param seq ordering columns within a key — must be a deterministic
    *            total order (e.g. event time + a unique id tiebreak).
    * @param state the tracked attribute; consecutive equal values (null-
    *              safe) collapse into one interval. */
  def scd2(log: DataFrame, key: String, seq: Seq[String], state: String): DataFrame = {
    val w = Window.partitionBy(key).orderBy(seq.map(col): _*)
    log
      .withColumn("_prev", lag(col(state), 1).over(w))
      .filter(!(col("_prev") <=> col(state)))
      .drop("_prev")
      .withColumn("valid_to", lead(col(seq.head), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
  }
}
