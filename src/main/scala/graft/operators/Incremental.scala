package graft.operators

import graft.functions.Det
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Incremental aggregate maintenance (IVM): keep a per-key aggregate
  * snapshot current by merging only the delta batch, never rescanning the
  * base table.
  *
  * At 100 TB the full `groupBy` is a full scan + full shuffle on every
  * refresh; with a maintained snapshot the refresh cost is
  * O(|delta| + |snapshot|) — the delta partial-aggregates at key grain
  * (map-side combine shrinks it before the shuffle) and the merge is a
  * key-grain union+sum. Only algebraic aggregates maintain this way
  * (count / sum / min / max); the sums are exact DECIMAL so the
  * incremental result is bit-identical to the full recompute — which is
  * exactly what the q111 oracle asserts.
  *
  * Deletes/updates: feed them as a delta with negated counts/sums
  * (standard IVM delta semantics); min/max would need re-derivation and
  * are deliberately not offered here.
  */
object Incremental {

  /** Build the initial per-key snapshot: (key, cnt, sum_v) with an exact
    * decimal sum (mergeable without float drift). */
  def snapshotCountSum(df: DataFrame, key: String, value: String,
                       scale: Int = 2): DataFrame =
    df.groupBy(col(key))
      .agg(count(lit(1)).as("cnt"),
        sum(col(value).cast(DecimalType(28, scale))).as("sum_v"))

  /** Merge a prior snapshot with a delta batch: the delta partial-aggregates
    * first, then one key-grain union+sum. Result schema = snapshot schema. */
  def mergeCountSum(prior: DataFrame, delta: DataFrame, key: String,
                    value: String, scale: Int = 2): DataFrame =
    prior.select(col(key), col("cnt"), col("sum_v"))
      .unionByName(snapshotCountSum(delta, key, value, scale))
      .groupBy(col(key))
      .agg(sum("cnt").as("cnt"), sum("sum_v").as("sum_v"))

  /** Render a snapshot for comparison: exact decimal sum → double, with
    * the engine-portable rounding used across the oracle surface. */
  def render(snapshot: DataFrame, key: String): DataFrame =
    snapshot.select(col(key), col("cnt"),
      Det.roundAt(col("sum_v").cast("double"), 6).as("total"))
}
