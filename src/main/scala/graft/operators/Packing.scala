package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Sequence packing (the second half of context-length chunking): lay all
  * chunks out contiguously in a deterministic global order and split the
  * token stream every `budget` tokens — the concat-then-split packing LLM
  * pretraining uses, where a chunk may straddle a window boundary and
  * every window except the last holds exactly `budget` tokens.
  *
  * The global token offset of each chunk is a prefix sum, computed
  * scalably in two levels instead of one single-partition window:
  *
  *   1. per-group running sum, partitioned by a caller-supplied coarse
  *      `groupCol` that must be monotone in the global order (e.g.
  *      `doc_id / 64`) — shuffles once, parallel across groups;
  *   2. group offsets: one tiny window over the per-group totals (rows =
  *      number of groups, thousands at most), broadcast-joined back.
  *
  * Each chunk then explodes into the ≤ ⌈chunk/budget⌉+1 windows its span
  * `[start, end)` covers, with exact per-window token counts — pure
  * integer math, codegen'd, no driver state. At 100 TB the only global
  * object is the group-totals frame (one row per coarse group).
  */
object Packing {

  /** Exact floor division on non-negative longs. */
  private def floorDiv(x: Column, d: Long): Column =
    ((x - pmod(x, lit(d))) / lit(d)).cast("long")

  /** Adds `window_id` + `tok_in_window` rows for each chunk span.
    * @param groupCol coarse split, monotone non-decreasing in the global
    *                 `orderCols` order (prefix-sum correctness depends on
    *                 it); @param tokCol positive token counts. */
  def packWindows(
      df: DataFrame,
      groupCol: String,
      orderCols: Seq[String],
      tokCol: String,
      budget: Long): DataFrame = {
    val wLocal = Window.partitionBy(groupCol).orderBy(orderCols.map(col): _*)
    val local = df.withColumn("_cum", sum(col(tokCol)).over(wLocal))
    val wOff = Window.orderBy(groupCol).rowsBetween(Window.unboundedPreceding, -1)
    val offsets = df.groupBy(groupCol).agg(sum(col(tokCol)).as("_gtot"))
      .withColumn("_goff", coalesce(sum(col("_gtot")).over(wOff), lit(0L)))
      .drop("_gtot")
    local.join(broadcast(offsets), Seq(groupCol))
      .withColumn("_start", col("_goff") + col("_cum") - col(tokCol))
      .withColumn("_end", col("_goff") + col("_cum"))
      .withColumn("window_id",
        explode(sequence(floorDiv(col("_start"), budget),
          floorDiv(col("_end") - 1, budget))))
      .withColumn("tok_in_window",
        least(col("_end"), (col("window_id") + 1) * budget) -
          greatest(col("_start"), col("window_id") * budget))
      .drop("_cum", "_goff", "_start", "_end")
  }
}
