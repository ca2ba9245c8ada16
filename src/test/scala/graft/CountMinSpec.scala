package graft

import graft.functions.{CountMinAgg, TextFns}
import org.apache.spark.sql.functions._

/** Count-min sketch invariants: the unconditional overestimate guarantee,
  * exactness when counters don't collide, and merge = sum (the property
  * that makes cross-shard roll-ups free). */
class CountMinSpec extends SparkSpec {
  import spark.implicits._

  private val depth = 4
  private val width = 64 // small width so collisions actually happen

  private def sketchOf(keys: Seq[String]): Array[Long] =
    keys.toDF("k").select(TextFns.portableHash(col("k")).as("h"))
      .agg(CountMinAgg.column(col("h"), depth, width).as("cm"))
      .collect()(0).getSeq[Long](0).toArray

  private def estimates(keys: Seq[String], sketch: Array[Long]): Map[String, Long] =
    keys.distinct.toDF("k")
      .select(col("k"), TextFns.portableHash(col("k")).as("h"))
      .withColumn("cm", typedLit(sketch))
      .select(col("k"), CountMinAgg.estimate(col("cm"), col("h"), depth, width).as("est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  test("estimate is never below the true count (hard CM guarantee)") {
    val keys = (1 to 500).map(i => s"k${i % 90}") // 90 distinct, forced collisions at width 64
    val exact = keys.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val est = estimates(keys, sketchOf(keys))
    exact.foreach { case (k, n) =>
      assert(est(k) >= n, s"$k: est ${est(k)} < exact $n")
    }
  }

  test("estimate is exact when no counters collide") {
    val keys = Seq("a", "a", "a", "b", "b", "c")
    val est = estimates(keys, sketchOf(keys))
    // 3 distinct keys in 4x64 counters: P(collision in ALL 4 rows) ~ 0;
    // the min over rows is exact unless every row collides
    assert(est == Map("a" -> 3L, "b" -> 2L, "c" -> 1L))
  }

  test("merging shard sketches equals sketching the union") {
    val shard1 = (1 to 200).map(i => s"k${i % 40}")
    val shard2 = (1 to 300).map(i => s"k${i % 70}")
    val merged = sketchOf(shard1).zip(sketchOf(shard2)).map { case (x, y) => x + y }
    assert(merged.toSeq == sketchOf(shard1 ++ shard2).toSeq)
  }

  test("streaming sketch over micro-batches equals the batch sketch") {
    // mergeability in action: the same Aggregator runs as a streaming
    // aggregate (complete mode), accumulating across micro-batches; the
    // final sketch must be bit-identical to sketching all data at once
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val batch1 = (1 to 150).map(i => s"k${i % 30}")
    val batch2 = (1 to 250).map(i => s"k${i % 55}")
    val in = MemoryStream[String]
    val q = in.toDF().select(TextFns.portableHash(col("value")).as("h"))
      .agg(CountMinAgg.column(col("h"), depth, width).as("cm"))
      .writeStream.format("memory").queryName("cmstream")
      .outputMode("complete").start()
    try {
      in.addData(batch1); q.processAllAvailable()
      in.addData(batch2); q.processAllAvailable()
      val streamed = spark.table("cmstream").collect()(0).getSeq[Long](0)
      assert(streamed == sketchOf(batch1 ++ batch2).toSeq)
    } finally q.stop()
  }

  test("total mass per row equals the stream length") {
    val keys = (1 to 123).map(i => s"x$i")
    val cm = sketchOf(keys)
    (0 until depth).foreach { i =>
      assert(cm.slice(i * width, (i + 1) * width).sum == 123L)
    }
  }
}
