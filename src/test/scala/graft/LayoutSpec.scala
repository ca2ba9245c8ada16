package graft

import graft.operators.Layout
import org.apache.spark.sql.functions._

/** Proves the shuffle-avoidance claims by inspecting executed plans. */
class LayoutSpec extends SparkSpec {
  import spark.implicits._

  test("same-bucketed tables join and aggregate with no Exchange") {
    val orders = (1L to 1000L).map(i => (i, s"o$i", (i % 7).toDouble)).toDF("key", "oname", "amt")
    val items  = (1L to 3000L).map(i => (i % 1000 + 1, s"i$i")).toDF("key", "iname")
    Layout.writeBucketed(orders, "t_orders_b", "key", 4)
    Layout.writeBucketed(items, "t_items_b", "key", 4)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force non-broadcast path
    try {
      val joined = Layout.bucketedJoin(spark, "t_orders_b", "t_items_b", "key")
        .groupBy("key").agg(count(lit(1)).as("cnt"))
      assert(joined.count() == 1000)
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"expected no shuffle, got:\n$plan")
      // and the join keyed correctly
      val r = joined.filter($"key" === 1L).collect()(0)
      assert(r.getAs[Long]("cnt") == 3L)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS t_orders_b")
      spark.sql("DROP TABLE IF EXISTS t_items_b")
    }
  }

  test("non-bucketed baseline of the same join does shuffle") {
    val a = (1L to 100L).map(i => (i, i * 2)).toDF("key", "x")
    val b = (1L to 100L).map(i => (i, i * 3)).toDF("key", "y")
    val j = a.repartition(4).join(b.repartition(4), "key").groupBy("key").count()
    j.collect()
    assert(j.queryExecution.executedPlan.toString.contains("Exchange"))
  }
}
