package graft

import graft.functions.SimhashAgg
import org.apache.spark.sql.functions._

class SimhashAggSpec extends SparkSpec {
  import spark.implicits._

  test("group sketch is the per-bit majority, merge-order independent") {
    // bits: 0b0001, 0b0011, 0b0111 → votes per bit: b0=3, b1=2, b2=1
    // n=3 → majority (2*ones >= 3): b0 (6>=3), b1 (4>=3); not b2 (2<3)
    val df = Seq(("g", 1L), ("g", 3L), ("g", 7L)).toDF("k", "h")
    val r = df.groupBy("k").agg(SimhashAgg.column(col("h")).as("s"))
      .collect()(0).getAs[Long]("s")
    assert(r == 3L)
    // repartitioned (forces partial merge) → same result
    val r2 = df.repartition(3).groupBy("k").agg(SimhashAgg.column(col("h")).as("s"))
      .collect()(0).getAs[Long]("s")
    assert(r2 == 3L)
  }

  test("identical groups get identical sketches; disjoint groups differ") {
    val df = Seq(("a", 5L), ("a", 5L), ("b", 5L), ("c", 1L << 20)).toDF("k", "h")
    val m = df.groupBy("k").agg(SimhashAgg.column(col("h")).as("s"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(m("a") == m("b") && m("a") == 5L)
    assert(m("c") == (1L << 20))
  }
}
