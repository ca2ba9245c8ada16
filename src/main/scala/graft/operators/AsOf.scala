package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (backward) join — for each left row, the single most recent right
  * row with the same key and `rightTime <= leftTime` (pandas `merge_asof`
  * / DuckDB `ASOF JOIN` semantics, left-outer: no prior match → nulls).
  *
  * Spark has no native as-of operator; the classic scalable encoding is a
  * tagged UNION + one running window, not a range join: tag both inputs,
  * union them, and carry the last non-null right payload forward within
  * each key ordered by time. That is exactly ONE shuffle (the window's
  * key partitioning) and a single linear pass per partition — an
  * inequality join would rewrite to a broadcast-nested-loop (O(n·m)) and
  * a bucketed range join would still duplicate the right side per time
  * bucket. At 100 TB the union shape holds: width is |left| + |right|
  * rows of slim payload, skew follows the key distribution (AQE handles
  * it), and nothing is broadcast or collected.
  *
  * Determinism: right rows must be unique per (key, time) — pre-aggregate
  * duplicates before calling (ties inside one timestamp would otherwise
  * make "the most recent row" ambiguous in ANY engine, DuckDB included).
  * A right row carrying the exact left timestamp matches (`<=`), so right
  * rows sort before left rows at equal time.
  */
object AsOf {

  /** Backward as-of join.
    *
    * @param pickCols  right columns carried to the output struct `asof`
    *                  (null struct when no right row precedes the left row)
    * @param toleranceSec  optional max staleness: a match older than
    *                  `leftTime - toleranceSec` is discarded (nulls, like
    *                  pandas merge_asof's `tolerance`)
    */
  def backward(left: DataFrame, right: DataFrame,
               leftKey: String, rightKey: String,
               leftTime: String, rightTime: String,
               pickCols: Seq[String],
               toleranceSec: Option[Long] = None): DataFrame =
    asofJoin(left, right, leftKey, rightKey, leftTime, rightTime,
      pickCols, toleranceSec, fwd = false)

  /** Forward as-of join — the EARLIEST right row with
    * `rightTime >= leftTime` per key (pandas `merge_asof
    * (direction='forward')` / DuckDB `ASOF ... ON l.ts <= r.ts`): the
    * "next event after" lookup (next maintenance window, next price
    * tick). Same tagged-union + single-window encoding, traversed in
    * DESCENDING time order — still exactly one shuffle. */
  def forward(left: DataFrame, right: DataFrame,
              leftKey: String, rightKey: String,
              leftTime: String, rightTime: String,
              pickCols: Seq[String],
              toleranceSec: Option[Long] = None): DataFrame =
    asofJoin(left, right, leftKey, rightKey, leftTime, rightTime,
      pickCols, toleranceSec, fwd = true)

  private def asofJoin(left: DataFrame, right: DataFrame,
                       leftKey: String, rightKey: String,
                       leftTime: String, rightTime: String,
                       pickCols: Seq[String],
                       toleranceSec: Option[Long],
                       fwd: Boolean): DataFrame = {
    require(pickCols.nonEmpty, "pickCols must name at least one right column")
    val leftCols = left.columns.toSeq
    val lStructT = left.select(struct(leftCols.map(col): _*)).schema.head.dataType
    val rPayload = struct(col(rightTime).as("__rt") +: pickCols.map(col): _*)
    val rStructT = right.select(rPayload).schema.head.dataType

    val l = left.select(
      col(leftKey).as("__k"), col(leftTime).as("__t"), lit(1).as("__evt"),
      struct(leftCols.map(col): _*).as("__l"), lit(null).cast(rStructT).as("__r"))
    val r = right.select(
      col(rightKey).as("__k"), col(rightTime).as("__t"), lit(0).as("__evt"),
      lit(null).cast(lStructT).as("__l"), rPayload.as("__r"))

    // backward walks time ascending (last right ≤ t); forward walks it
    // descending (so "last right seen" = first right ≥ t). Right rows
    // sort before left rows at equal time in BOTH directions (__evt 0
    // first), so an exact-timestamp right row matches its left row.
    val timeOrd = if (fwd) col("__t").desc else col("__t").asc
    val w = Window.partitionBy("__k").orderBy(timeOrd, col("__evt"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = l.unionByName(r)
      .withColumn("__last", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__evt") === 1)
    val inTolerance = toleranceSec match {
      case Some(tol) if !fwd => matched.withColumn("__last",
        when(col("__last.__rt") >= col("__t") - expr(s"INTERVAL $tol SECOND"), col("__last")))
      case Some(tol) => matched.withColumn("__last",
        when(col("__last.__rt") <= col("__t") + expr(s"INTERVAL $tol SECOND"), col("__last")))
      case None => matched
    }
    inTolerance.select(
      leftCols.map(c => col(s"__l.`$c`").as(c)) :+
        when(col("__last").isNotNull,
          struct(pickCols.map(p => col(s"__last.`$p`").as(p)): _*)).as("asof"): _*)
  }
}
