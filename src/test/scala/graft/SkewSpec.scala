package graft

import graft.operators.Skew
import org.apache.spark.sql.functions._

class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("salted aggregation matches the direct groupBy bit-for-bit") {
    // hot key: 'a' holds 90% of rows
    val df = ((1 to 900).map(i => ("a", i * 0.01)) ++ (1 to 100).map(i => ("b", i * 0.1)))
      .toDF("k", "v")
    val salted = Skew.saltedCountSum(df, "k", "v", salts = 8)
      .orderBy("k").collect()
    val direct = df.groupBy("k")
      .agg(count(lit(1)).as("cnt"),
        graft.functions.Det.roundAt(
          sum(col("v").cast("decimal(28,2)")).cast("double"), 6).as("total"))
      .orderBy("k").collect()
    assert(salted.map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
      == direct.map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq)
  }

  test("salting actually splits the hot key across partial groups") {
    val df = (1 to 1000).map(i => ("hot", i.toDouble)).toDF("k", "v")
    // internal shape check: distinct (key, salt) pairs > 1 for the hot key
    val salts = df.withColumn("__salt", pmod(xxhash64(col("v")), lit(8L)))
      .select("__salt").distinct().count()
    assert(salts > 1)
  }

  test("keyHistogram buckets per-key counts by floor(log2)+1") {
    // counts: a=1, b=1 (bucket 1), c=3 (bucket 2), d=8 (bucket 4)
    val df = (Seq("a", "b") ++ Seq.fill(3)("c") ++ Seq.fill(8)("d")).toDF("k")
    val rows = Skew.keyHistogram(df, "k").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    assert(rows.toSeq == Seq(
      (1L, 2L, 2L, 1L, 2.0 / 13),
      (2L, 1L, 3L, 3L, 3.0 / 13),
      (4L, 1L, 8L, 8L, 8.0 / 13)).map {
        case (b, k, n, m, s) => (b, k, n, m, math.floor(s * 1e6 + 0.5) / 1e6)
      })
  }
}
