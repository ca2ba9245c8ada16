package graft

import graft.operators.Incremental
import org.apache.spark.sql.functions._

class IncrementalSpec extends SparkSpec {
  import spark.implicits._

  private def rendered(df: org.apache.spark.sql.DataFrame) =
    Incremental.render(df, "k").orderBy("k").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq

  test("snapshot + delta merge is bit-identical to the full recompute") {
    val base  = Seq(("a", 1.10), ("a", 2.20), ("b", 0.30)).toDF("k", "v")
    val delta = Seq(("a", 0.01), ("c", 5.00)).toDF("k", "v")
    val incremental = Incremental.mergeCountSum(
      Incremental.snapshotCountSum(base, "k", "v"), delta, "k", "v")
    val full = Incremental.snapshotCountSum(base.union(delta), "k", "v")
    assert(rendered(incremental) == rendered(full))
    assert(rendered(incremental) ==
      Seq(("a", 3L, 3.31), ("b", 1L, 0.3), ("c", 1L, 5.0)))
  }

  test("deletes maintain via negated-count/sum deltas") {
    val base = Seq(("a", 1.10), ("a", 2.20), ("b", 0.30)).toDF("k", "v")
    val snap = Incremental.snapshotCountSum(base, "k", "v")
    // retract ("a", 2.20): a delta row with cnt=-1, sum_v=-2.20
    val retract = Seq(("a", -1L, BigDecimal(-2.20))).toDF("k", "cnt", "sum_v")
      .select($"k", $"cnt", $"sum_v".cast("decimal(28,2)"))
    val merged = snap.unionByName(retract)
      .groupBy("k").agg(sum("cnt").as("cnt"), sum("sum_v").as("sum_v"))
    assert(rendered(merged) == Seq(("a", 1L, 1.1), ("b", 1L, 0.3)))
  }
}
