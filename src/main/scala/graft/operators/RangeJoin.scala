package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Bucketized range (interval) join — the scalable encoding of
  * `l JOIN r ON l.key = r.key AND r.ts BETWEEN l.ts+lower AND l.ts+upper`.
  *
  * Spark plans a raw inequality conjunct as a SortMergeJoin on the equi
  * part with a post-join filter — correct, but every (key, l, r) pair in
  * the same key group is materialized before the residual filter, which
  * is O(per-key n²) on hot keys. This operator instead quantizes time
  * into buckets of exactly the window length `w = upper - lower`:
  *
  *   - a right row lands in ONE bucket, `floorDiv(rt, w)`;
  *   - a left row's admissible window `[lt+lower, lt+upper]` spans at
  *     most TWO buckets (its length is exactly `w`), enumerated with
  *     `sequence(...)` — so the duplication factor is ≤ 2;
  *   - the join becomes a plain equi-join on `(key, bucket)` plus a
  *     residual `BETWEEN` on exact microseconds.
  *
  * Each matching pair joins exactly once (the right bucket is unique),
  * so no post-dedup is needed. At 100 TB this shuffles `2·|L| + |R|`
  * slim rows on `(key, bucket)` — hash-partitioned, AQE-splittable —
  * instead of sorting whole key groups and filtering n² candidates.
  * All integer math: `unix_micros` + `pmod` floor-division, codegen'd.
  */
object RangeJoin {

  /** Exact floor division on longs (`/` truncates toward zero). */
  private def floorDiv(x: Column, d: Long): Column =
    (x - pmod(x, lit(d))) / lit(d)

  /** Inner interval join: rows of `right` whose `rightTs` falls in
    * `[leftTs + lowerSec, leftTs + upperSec]` for a same-key `left` row.
    * Both input frames must already have disjoint column names. */
  def intervalJoin(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      leftTs: String,
      rightTs: String,
      lowerSec: Long,
      upperSec: Long): DataFrame = {
    require(upperSec > lowerSec, "empty interval")
    val w = (upperSec - lowerSec) * 1000000L
    val lm = unix_micros(col(leftTs))
    val lo = lm + lit(lowerSec * 1000000L)
    val hi = lm + lit(upperSec * 1000000L)
    val lb = left.withColumn("_rj_bucket",
      explode(sequence(floorDiv(lo, w).cast("long"), floorDiv(hi, w).cast("long"))))
    val rb = right.withColumn("_rj_bucket",
      floorDiv(unix_micros(col(rightTs)), w).cast("long"))
    lb.join(rb,
        lb(leftKey) === rb(rightKey) && lb("_rj_bucket") === rb("_rj_bucket") &&
          unix_micros(rb(rightTs)).between(
            unix_micros(lb(leftTs)) + lit(lowerSec * 1000000L),
            unix_micros(lb(leftTs)) + lit(upperSec * 1000000L)))
      .drop("_rj_bucket")
  }
}
