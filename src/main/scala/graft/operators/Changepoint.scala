package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** One-sided CUSUM change detection (Page 1954) over per-key ordered
  * series: `s_t = max(0, s_{t-1} + x_t − drift)`, alarm when `s_t`
  * clears a threshold.
  *
  * Like the EWMA in [[Resample.ewma]], the clamp at zero makes this a
  * genuine recurrence — `max(0, ·)` is not linear, so there is no
  * prefix-sum closed form and no window-aggregate rewrite. The
  * distributed shape is the canonical one for sequential state: ONE
  * hash repartition on the key, an in-partition (key, rn) sort, then a
  * single O(n) `mapPartitions` scan carrying one double of state per
  * in-flight key. No driver collection, no per-step shuffle.
  *
  * At 100 TB the series length per key is bounded by the time grain
  * (hourly buckets grow with the calendar, not the row count — the
  * raw-event reduction happens in the upstream groupBy's map-side
  * partial aggregate), so the sequential tail is tiny even when the
  * input is huge. Low key cardinality (e.g. 5 event types) is fine:
  * the recurrence input is the *bucketed* series, already reduced.
  *
  * Determinism: with the fixed evaluation order `(s + x) − drift` and
  * IEEE max, every step is exactly-rounded double arithmetic — the
  * trajectory is bit-identical to the oracle's recursive-CTE replay.
  */
object Changepoint {

  /** @param series one row per (key, step) with the monitored value and
    *               the per-key drift `μ + κ` already joined in (stats
    *               are tiny — broadcast them onto the series upstream).
    * @param ordCol a per-key step index (1-based, dense) — must be a
    *               deterministic total order.
    * @return (k, rn, cusum) with the running CUSUM statistic. */
  def cusum(series: DataFrame, keyCol: String, ordCol: String,
            xCol: String, driftCol: String): DataFrame = {
    val sess = series.sparkSession
    import sess.implicits._
    series.select(col(keyCol).cast("string").as("k"),
        col(ordCol).cast("long").as("rn"),
        col(xCol).cast("double").as("x"),
        col(driftCol).cast("double").as("drift"))
      .repartition(col("k"))
      .sortWithinPartitions("k", "rn")
      .as[(String, Long, Double, Double)]
      .mapPartitions { it =>
        var cur: String = null
        var s = 0.0
        it.map { case (k, rn, x, drift) =>
          if (cur == null || k != cur) { cur = k; s = 0.0 }
          s = math.max(0.0, s + x - drift)
          (k, rn, s)
        }
      }
      .toDF("k", "rn", "cusum")
  }
}
