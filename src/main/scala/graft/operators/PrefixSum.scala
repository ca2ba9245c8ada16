package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Two-level global running sums over a distinct-key-grain frame — the
  * scale-safe replacement for `Window.orderBy(key)` with no partition
  * key (which funnels every row through ONE task).
  *
  * Shape (the [[Packing.packWindows]] / q174 prefix-sum decomposition):
  *
  *   1. per-group running sum, partitioned by a caller-supplied coarse
  *      `group` expression that must be monotone non-decreasing in the
  *      `keyCol` order (e.g. `floor(key / 4096)`) — one hash shuffle,
  *      parallel across groups;
  *   2. exclusive group offsets: one tiny partition-less window over the
  *      per-group TOTALS (rows = number of groups — hundreds, bounded by
  *      the key domain / `group` granularity, never by the corpus),
  *      broadcast-joined back.
  *
  * The fine-grain frame never passes through a single-partition window;
  * the only global object is the group-totals relation. Results are
  * bit-identical to the single-window form (integer sums reassociate
  * freely).
  */
object PrefixSum {

  /** Adds, for each `(valCol, outCol)` pair, the running sum of `valCol`
    * over the global `keyCol` order.
    *
    * @param df        one row per distinct `keyCol` value (aggregate
    *                  first — running sums over duplicate keys would
    *                  depend on intra-key order)
    * @param group     coarse bucket expression, monotone non-decreasing
    *                  in `keyCol` (bucket count should be ≲ thousands)
    * @param inclusive true → sum includes the current row (UNBOUNDED
    *                  PRECEDING..CURRENT ROW); false → strict
    *                  predecessors only (..1 PRECEDING, empty prefix = 0)
    */
  def overKeys(df: DataFrame, keyCol: String, group: Column,
               inclusive: Boolean, sums: Seq[(String, String)]): DataFrame = {
    require(sums.nonEmpty, "PrefixSum.overKeys: sums must be non-empty")
    require(!df.columns.exists(_.startsWith("_ps")),
      s"PrefixSum.overKeys: input columns ${df.columns.filter(_.startsWith("_ps")).mkString(",")} " +
        "collide with the _ps* temp-column namespace")
    val hi = if (inclusive) Window.currentRow else -1L
    val wLocal = Window.partitionBy("_psg").orderBy(keyCol)
      .rowsBetween(Window.unboundedPreceding, hi)
    val wOff = Window.orderBy("_psg").rowsBetween(Window.unboundedPreceding, -1)
    val tagged = df.withColumn("_psg", group)
    val offsets = tagged.groupBy("_psg")
      .agg(sums.map { case (v, o) => sum(col(v)).as(s"_pst_$o") }.head,
        sums.tail.map { case (v, o) => sum(col(v)).as(s"_pst_$o") }: _*)
    val offs = sums.foldLeft(offsets) { case (acc, (_, o)) =>
      acc.withColumn(s"_pso_$o",
        coalesce(sum(col(s"_pst_$o")).over(wOff), lit(0L)))
    }.select(col("_psg") +: sums.map { case (_, o) => col(s"_pso_$o") }: _*)
    val local = sums.foldLeft(tagged) { case (acc, (v, o)) =>
      acc.withColumn(s"_psl_$o",
        coalesce(sum(col(v)).over(wLocal), lit(0L)))
    }
    sums.foldLeft(local.join(broadcast(offs), Seq("_psg"))) {
      case (acc, (_, o)) =>
        acc.withColumn(o, col(s"_pso_$o") + col(s"_psl_$o"))
          .drop(s"_pso_$o", s"_psl_$o")
    }.drop("_psg")
  }
}
