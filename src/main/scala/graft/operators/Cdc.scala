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

  /** Row-level MERGE (CDC apply / upsert): apply a change batch tagged
    * `opCol` ∈ {'I','U','D'} to `target`, keyed on `key`. Several
    * changes for one key collapse to the LATEST by `seqCols` (Debezium
    * compaction rule) before applying; the result is
    * target ∖ touched-keys ∪ surviving-change payloads.
    *
    * Scale shape: the change-batch compaction is one window on the
    * (small) batch; the apply is ONE anti-join of the target against the
    * touched-key set — broadcast when the compacted key count is at most
    * `maxBroadcastKeys` (so the 100 TB target is never shuffled for
    * normal change batches), degrading to a shuffled left_anti for
    * oversized batches (e.g. a backfill) instead of OOMing the driver —
    * plus a union. No full outer join, no target rewrite beyond the
    * rows actually touched. Counting the compacted keys costs one extra
    * batch-grain job; the compacted batch is consumed three times
    * (count + both union branches), so the DEFAULT is
    * `materialize = true`: the compaction window runs once into a lazy
    * localCheckpoint. Streaming callers must pass `materialize = false`
    * — foreachBatch threads must not touch the single-writer [[Ckpt]]
    * registry, and there [[graft.streaming.Streams]] already persists
    * the micro-batch for the merge's scope.
    *
    * `changes` must carry every `target` column plus `opCol` (+ seq). */
  def merge(target: DataFrame, changes: DataFrame, key: String,
            opCol: String, seqCols: Seq[String],
            maxBroadcastKeys: Long = 5000000L,
            materialize: Boolean = true): DataFrame = {
    val w = Window.partitionBy(key).orderBy(seqCols.map(c => col(c).desc): _*)
    val compacted = changes
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
    val latest = if (materialize) Ckpt.local(compacted) else compacted
    val keys = latest.select(col(key))
    val keyRel = if (keys.count() <= maxBroadcastKeys) broadcast(keys) else keys
    val survivors = target.join(keyRel, Seq(key), "left_anti")
    val applied = latest.filter(col(opCol) =!= "D")
      .select(target.columns.map(col).toIndexedSeq: _*)
    survivors.unionByName(applied)
  }
}
