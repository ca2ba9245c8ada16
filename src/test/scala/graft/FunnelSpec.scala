package graft

import graft.operators.{Funnel, Sampling}
import org.apache.spark.sql.functions._

class FunnelSpec extends SparkSpec {
  import spark.implicits._

  private val stages = Seq("signup", "view", "click", "purchase")

  test("stageTimes enforces the min-chain: a stage only counts at-or-after the previous one") {
    val ev = Seq(
      // user 1: events deliberately out of order around the chain
      (1L, 5L, "view"),     // before signup → must not count
      (1L, 10L, "signup"),
      (1L, 20L, "view"),
      (1L, 15L, "click"),   // before the qualifying view → must not count
      (1L, 30L, "click"),
      (1L, 25L, "purchase"),// before the qualifying click → must not count
      (1L, 40L, "purchase"),
      // user 2: never signs up → whole chain null
      (2L, 7L, "view"), (2L, 9L, "purchase")
    ).toDF("user_id", "sec", "event_type")
    val r = Funnel.stageTimes(ev, "user_id", "sec", "event_type", stages)
      .orderBy("user_id").collect()
    assert(r(0).getAs[Long]("ts_signup") == 10L)
    assert(r(0).getAs[Long]("ts_view") == 20L)
    assert(r(0).getAs[Long]("ts_click") == 30L)
    assert(r(0).getAs[Long]("ts_purchase") == 40L)
    assert((1 to 4).forall(r(1).isNullAt))
  }

  test("same-second stage transitions count (>= boundary, no intra-second order)") {
    val ev = Seq((1L, 10L, "signup"), (1L, 10L, "view")).toDF("user_id", "sec", "event_type")
    val r = Funnel.stageTimes(ev, "user_id", "sec", "event_type", Seq("signup", "view"))
      .collect()(0)
    assert(r.getAs[Long]("ts_signup") == 10L && r.getAs[Long]("ts_view") == 10L)
  }

  test("counts summarizes entities per reached stage") {
    val ev = Seq(
      (1L, 1L, "signup"), (1L, 2L, "view"), (1L, 3L, "click"), (1L, 4L, "purchase"),
      (2L, 1L, "signup"), (2L, 2L, "view"),
      (3L, 1L, "click") // active but never signed up
    ).toDF("user_id", "sec", "event_type")
    val r = Funnel.counts(ev, "user_id", "sec", "event_type", stages).collect()(0)
    assert(r.getAs[Long]("n_entities") == 3)
    assert(r.getAs[Long]("n_signup") == 2)
    assert(r.getAs[Long]("n_view") == 2)
    assert(r.getAs[Long]("n_click") == 1)
    assert(r.getAs[Long]("n_purchase") == 1)
  }

  test("cohortRetention anchors each entity to its first ISO week") {
    val ev = Seq(
      (1L, "2024-01-03 10:00:00"), // week of Mon Jan 1 → cohort
      (1L, "2024-01-17 10:00:00"), // week of Jan 15 → offset 2
      (2L, "2024-01-16 10:00:00")  // cohort = week of Jan 15
    ).toDF("user_id", "ts_s")
      .withColumn("ts", to_timestamp(col("ts_s")))
    val r = Funnel.cohortRetention(ev, "user_id", "ts")
      .withColumn("cohort_week", date_format(col("cohort_week"), "yyyy-MM-dd"))
      .collect().map(x => (x.getString(0), x.getLong(1), x.getLong(2))).toList
    assert(r == List(("2024-01-01", 0L, 1L), ("2024-01-01", 2L, 1L),
      ("2024-01-15", 0L, 1L)))
  }

  test("transitions counts consecutive type pairs per entity in (sec, id) order") {
    val ev = Seq(
      (1L, 10L, 1L, "view"), (1L, 20L, 2L, "click"), (1L, 20L, 3L, "purchase"),
      (2L, 5L, 4L, "view") // single event → no transition
    ).toDF("user_id", "sec", "event_id", "event_type")
    val r = Funnel.transitions(ev, "user_id", "sec", "event_id", "event_type")
      .orderBy("from_type", "to_type")
      .collect().map(x => (x.getString(0), x.getString(1), x.getLong(2))).toList
    // same-second tie at sec=20 resolves by event_id: click(2) before purchase(3)
    assert(r == List(("click", "purchase", 1L), ("view", "click", 1L)))
  }

  test("mixtureRebalance: exact targets, binomial-close kept counts, determinism, unknown groups dropped") {
    val df = ((0 until 100).map(i => (i.toLong, "A")) ++
      (100 until 150).map(i => (i.toLong, "B")) ++
      (150 until 160).map(i => (i.toLong, "C"))).toDF("id", "g")
    val out = Sampling.mixtureRebalance(df, "g", "id", Map("A" -> 1, "B" -> 1))
      .collect()
    assert(out.map(_.getAs[String]("g")).toList == List("A", "B")) // C has no weight
    val a = out(0); val b = out(1)
    // budget = min(100*2 div 1, 50*2 div 1) = 100 → both targets 50
    assert(a.getAs[Long]("n_target") == 50 && b.getAs[Long]("n_target") == 50)
    // B's target equals its size → the hash rule keeps EVERY row
    assert(b.getAs[Long]("n_kept") == 50)
    // A is downsampled to ~50 of 100 (binomial: allow a wide band)
    assert(math.abs(a.getAs[Long]("n_kept") - 50L) < 30)
    val again = Sampling.mixtureRebalance(df, "g", "id", Map("A" -> 1, "B" -> 1))
      .collect()
    assert(out.map(_.toString).toList == again.map(_.toString).toList)
  }

  test("journeyTransitions truncates at first conversion and adds boundary states") {
    val ts = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def at(s: Int) = new java.sql.Timestamp(ts.getTime + s * 1000L)
    val ev = Seq(
      (1L, at(0), 1L, "view"), (1L, at(1), 2L, "purchase"),
      (1L, at(2), 3L, "view"), // post-conversion: must be dropped
      (2L, at(0), 4L, "view"), (2L, at(1), 5L, "click"), (2L, at(2), 6L, "purchase"),
      (3L, at(0), 7L, "click"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val t = Funnel.journeyTransitions(ev, "user_id", "ts", "event_id",
      "event_type", "purchase")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(t == Map(
      ("start", "view") -> 2L, ("start", "click") -> 1L,
      ("view", "click") -> 1L, ("view", "conv") -> 1L,
      ("click", "conv") -> 1L, ("click", "null") -> 1L))
  }

  test("markovRemovalEffects matches the hand-solved absorption probabilities") {
    // chain: start→view 2/3, start→click 1/3; view→{click, conv} ½ each;
    // click→{conv, null} ½ each. P(conv) = 1/3 + 1/6 + 1/6 = 2/3;
    // removing click leaves only s→v→conv = 1/3 (effect ½); removing
    // view leaves s→c→conv = 1/6 (effect ¾).
    val trans = Seq(
      ("start", "view", 2L), ("start", "click", 1L),
      ("view", "click", 1L), ("view", "conv", 1L),
      ("click", "conv", 1L), ("click", "null", 1L))
      .toDF("f", "t", "cnt")
    val out = Funnel.markovRemovalEffects(trans, Seq("click", "view"), steps = 12)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(math.abs(out("none")._1 - 2.0 / 3) < 1e-6)
    assert(out("none")._2 == 0.0)
    assert(math.abs(out("click")._1 - 1.0 / 3) < 1e-6)
    assert(math.abs(out("click")._2 - 0.5) < 1e-6)
    assert(math.abs(out("view")._1 - 1.0 / 6) < 1e-6)
    assert(math.abs(out("view")._2 - 0.75) < 1e-6)
  }
}
