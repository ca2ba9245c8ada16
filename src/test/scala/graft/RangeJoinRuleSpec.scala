package graft

import graft.plans.RangeJoinRule
import org.apache.spark.sql.functions._

/** The band-join optimizer rule: plan rewrite proof (nested-loop → bucketed
  * equi-join), bit-identical results, and the inertness / eligibility
  * guards. */
class RangeJoinRuleSpec extends SparkSpec {
  import spark.implicits._

  // points include negatives (floor-division edge) and band edges
  private lazy val pts = Seq((1L, -150L), (2L, -100L), (3L, 0L), (4L, 7L),
    (5L, 99L), (6L, 100L), (7L, 101L), (8L, 250L), (9L, 999L))
    .toDF("pid", "t")
  private lazy val bands = Seq((10L, -200L, -100L), (20L, 0L, 99L),
    (30L, 50L, 250L), (40L, 500L, 501L)).toDF("bid", "lo", "hi")

  private def naive = pts.join(bands, $"t" >= $"lo" && $"t" <= $"hi")

  private def withRule[A](width: Long)(f: => A): A = {
    spark.conf.set(RangeJoinRule.WidthKey, width.toString)
    try f finally spark.conf.unset(RangeJoinRule.WidthKey)
  }

  private def planOf(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("without the width conf the nested-loop plan is untouched") {
    assert(planOf(naive).contains("BroadcastNestedLoopJoin"))
  }

  test("with a width the join becomes a bucketed equi-join, same rows") {
    val expected = naive.collect().map(_.toSeq).toSet
    withRule(100L) {
      val plan = planOf(naive)
      assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
      assert(plan.contains("Generate explode"), plan)
      val got = naive.collect()
      assert(got.map(_.toSeq).toSet == expected)
    }
  }

  test("rewrite preserves duplicates and band-edge inclusivity") {
    // overlapping bands → the same point matches twice; edges t=0,99,250
    withRule(100L) {
      val got = naive.orderBy("pid", "bid")
        .select("pid", "bid").as[(Long, Long)].collect().toList
      assert(got == List(1L -> 10L, 2L -> 10L, 3L -> 20L, 4L -> 20L,
        5L -> 20L, 5L -> 30L, 6L -> 30L, 7L -> 30L, 8L -> 30L))
    }
  }

  test("strict bounds stay strict through the rewrite") {
    // def, not val: a Dataset's queryExecution is lazy-cached, so a plan
    // materialized before the width conf is set would never see the rule
    def q = pts.join(bands, $"t" > $"lo" && $"t" < $"hi")
    val expected = q.collect().map(_.toSeq).toSet
    withRule(100L) {
      assert(!planOf(q).contains("BroadcastNestedLoopJoin"))
      assert(q.collect().map(_.toSeq).toSet == expected)
    }
  }

  test("joins with an existing equi conjunct are left alone") {
    val p2 = pts.withColumn("k", $"pid" % 2)
    val b2 = bands.withColumn("k", $"bid" % 2)
    val q = p2.join(b2, p2("k") === b2("k") && $"t" >= $"lo" && $"t" <= $"hi")
    withRule(100L) {
      assert(!planOf(q).contains("Generate explode"), "equi-join plan must not be rewritten")
    }
  }

  test("half-open bands (one bound) are not eligible") {
    val q = pts.join(bands, $"t" >= $"lo")
    withRule(100L) {
      assert(planOf(q).contains("BroadcastNestedLoopJoin"))
    }
  }
}
