package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series regularization — the pandas `resample().ffill()` /
  * `.interpolate()` the reference's ecosystem leans on, re-expressed for
  * scale: snap events to a fixed grain, build each key's dense time grid,
  * and fill gaps from the neighboring observations.
  *
  * Scale shape: the per-(key, bucket) collapse is one key-grain shuffle
  * with a rank-1 window; the dense grid is `sequence()` + explode off
  * the per-key bounds relation (grid rows ∝ keys × span/grain — sized
  * by the GRID, independent of raw event count); the fill is one
  * last-non-null (and for interpolation one first-non-null) running
  * window over the same (key, time) partitioning the join already
  * established. No collect, no cross join; grid explosion is the
  * caller's grain choice.
  *
  * Determinism: the per-bucket survivor is the LAST event by
  * (ts, event_id) — total order, no ties; the forward fill propagates
  * exact observed values; the interpolation formula
  * `v0 + (v1 - v0) * ((t - t0) / (t1 - t0))` is pure IEEE double ops,
  * bit-identical in any engine given the same observations.
  */
object Resample {

  /** (key k, bucket, last observed v per bucket) at `grain`, plus the
    * dense per-key grid — shared base for both fill strategies. */
  private def gridWithObs(events: DataFrame, keyCol: String, tsCol: String,
                          valCol: String, grain: String): DataFrame = {
    val bucketed = events.select(
      col(keyCol).as("k"),
      date_trunc(grain, col(tsCol)).as("bucket"),
      col(tsCol).as("__ts"), col("event_id").as("__id"), col(valCol).as("v"))
    val wLast = Window.partitionBy("k", "bucket")
      .orderBy(col("__ts").desc, col("__id").desc)
    val perBucket = bucketed
      .withColumn("__rn", row_number().over(wLast))
      .filter(col("__rn") === 1)
      .select(col("k"), col("bucket"), col("v"))
    val grid = perBucket.groupBy("k")
      .agg(min(col("bucket")).as("__b0"), max(col("bucket")).as("__b1"))
      .select(col("k"), explode(
        sequence(col("__b0"), col("__b1"), expr(s"INTERVAL 1 $grain"))).as("bucket"))
    grid.join(perBucket, Seq("k", "bucket"), "left")
  }

  /** Forward-filled dense grid at `grain` (a `date_trunc` unit). Output:
    * (key, bucket, observed value or null, filled value, is_gap). */
  def ffillGrid(events: DataFrame, keyCol: String, tsCol: String,
                valCol: String, grain: String = "hour"): DataFrame = {
    val wFill = Window.partitionBy("k").orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    gridWithObs(events, keyCol, tsCol, valCol, grain)
      .withColumn("filled", last(col("v"), ignoreNulls = true).over(wFill))
      .withColumn("is_gap", col("v").isNull)
  }

  /** Per-key exponentially-weighted moving average (pandas
    * `groupby(key)[val].ewm(alpha, adjust=False).mean()`):
    * ew₁ = x₁, ewₜ = α·xₜ + (1−α)·ewₜ₋₁ in event order (ts, event_id).
    *
    * A linear RECURRENCE, not a windowed aggregate — the closed-form
    * window spelling (Σ(1−α)^(t−j)xⱼ) overflows for long histories, so
    * this is the one family where per-partition imperative logic is the
    * right distributed shape: repartition by key, sort within partitions
    * by (key, time), one O(n) `mapPartitions` scan carrying the running
    * state across rows of the same key. One shuffle total; no state
    * bigger than a scalar per in-flight key.
    *
    * Determinism: fixed evaluation order `α·x + (1−α)·ew` (two products,
    * one sum — exactly-rounded IEEE ops, so any engine replaying the
    * same recurrence gets bit-identical doubles). Output: (k, event_id,
    * ew). */
  def ewma(events: DataFrame, keyCol: String, tsCol: String,
           valCol: String, alpha: Double): DataFrame = {
    val s = events.sparkSession
    import s.implicits._
    val oneMinus = 1.0 - alpha
    events.select(col(keyCol).cast("long").as("k"),
        col(tsCol).as("__ts"), col("event_id").cast("long").as("event_id"),
        col(valCol).cast("double").as("v"))
      .repartition(col("k"))
      .sortWithinPartitions("k", "__ts", "event_id")
      .as[(Long, java.sql.Timestamp, Long, Double)]
      .mapPartitions { it =>
        var curKey = 0L
        var ew = 0.0
        var seen = false
        it.map { case (k, _, id, v) =>
          if (!seen || k != curKey) { curKey = k; ew = v; seen = true }
          else ew = alpha * v + oneMinus * ew
          (k, id, ew)
        }
      }
      .toDF("k", "event_id", "ew")
  }

  /** Linearly-interpolated dense grid at `grain` (pandas
    * `resample(grain).interpolate('linear')` semantics). Grid endpoints
    * are always observed (the grid spans min..max observed bucket per
    * key), so every gap has both a previous and a next observation —
    * no extrapolation case exists. Two running windows (backward-looking
    * last-non-null, forward-looking first-non-null) over the one
    * (key, time) sort; no self-join. */
  def interpGrid(events: DataFrame, keyCol: String, tsCol: String,
                 valCol: String, grain: String = "hour"): DataFrame = {
    val wPrev = Window.partitionBy("k").orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wNext = Window.partitionBy("k").orderBy("bucket")
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val obsBucket = when(col("v").isNotNull, col("bucket"))
    def secs(c: Column): Column = unix_timestamp(c).cast("double")
    val v0 = last(col("v"), ignoreNulls = true).over(wPrev)
    val t0 = last(obsBucket, ignoreNulls = true).over(wPrev)
    val v1 = first(col("v"), ignoreNulls = true).over(wNext)
    val t1 = first(obsBucket, ignoreNulls = true).over(wNext)
    gridWithObs(events, keyCol, tsCol, valCol, grain)
      .withColumn("filled",
        when(col("v").isNotNull, col("v"))
          .otherwise(v0 + (v1 - v0) * ((secs(col("bucket")) - secs(t0)) / (secs(t1) - secs(t0)))))
      .withColumn("is_gap", col("v").isNull)
  }
}
