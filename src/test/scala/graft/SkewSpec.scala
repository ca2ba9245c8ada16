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
}
