package graft

import graft.operators.AsOf
import org.apache.spark.sql.functions._

/** As-of backward join: merge_asof semantics (most recent right row at or
  * before the left time, per key), left-outer nulls, tolerance, and the
  * single-shuffle plan shape. */
class AsOfSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  private lazy val quotes = Seq(
    (1L, ts("2024-01-01 10:00:00"), 100.0),
    (1L, ts("2024-01-01 10:00:05"), 101.0),
    (1L, ts("2024-01-01 10:00:10"), 102.0),
    (2L, ts("2024-01-01 10:00:07"), 200.0)
  ).toDF("qkey", "qts", "px")

  private lazy val trades = Seq(
    (1L, ts("2024-01-01 10:00:03"), "a"), // after 10:00:00 quote
    (1L, ts("2024-01-01 10:00:05"), "b"), // exactly at a quote: <= matches it
    (1L, ts("2024-01-01 10:00:59"), "c"), // latest quote
    (2L, ts("2024-01-01 10:00:01"), "d"), // before key-2's only quote: null
    (3L, ts("2024-01-01 10:00:09"), "e")  // key with no quotes at all: null
  ).toDF("tkey", "tts", "tag")

  private def run(tol: Option[Long] = None) =
    AsOf.backward(trades, quotes, "tkey", "qkey", "tts", "qts", Seq("qts", "px"), tol)
      .select(col("tag"), col("asof.px").as("px"))
      .collect().map(r => r.getString(0) -> Option(r.get(1))).toMap

  test("backward picks the most recent right row at or before the left time") {
    val m = run()
    assert(m("a").contains(100.0))
    assert(m("b").contains(101.0), "a right row AT the left time matches (<=)")
    assert(m("c").contains(102.0))
  }

  test("no prior right row (or unseen key) yields a null match, left rows survive") {
    val m = run()
    assert(m.size == 5, "left-outer: every left row appears exactly once")
    assert(m("d").isEmpty && m("e").isEmpty)
  }

  test("tolerance discards matches older than leftTime - tolerance") {
    val m = run(tol = Some(10L))
    assert(m("a").contains(100.0), "3s-old match survives a 10s tolerance")
    assert(m("c").isEmpty, "49s-old match is too stale")
  }

  test("forward picks the earliest right row at or after the left time") {
    val m = AsOf.forward(trades, quotes, "tkey", "qkey", "tts", "qts", Seq("qts", "px"))
      .select(col("tag"), col("asof.px").as("px"))
      .collect().map(r => r.getString(0) -> Option(r.get(1))).toMap
    assert(m("a").contains(101.0), "next quote after 10:00:03 is 10:00:05")
    assert(m("b").contains(101.0), "a right row AT the left time matches (>=)")
    assert(m("c").isEmpty, "no quote after 10:00:59")
    assert(m("d").contains(200.0), "key 2's only quote is ahead of the trade")
    assert(m("e").isEmpty, "unseen key stays null")
    assert(m.size == 5)
    // forward tolerance: a match farther ahead than tol is discarded
    val t = AsOf.forward(trades, quotes, "tkey", "qkey", "tts", "qts",
        Seq("qts", "px"), toleranceSec = Some(2L))
      .select(col("tag"), col("asof.px").as("px"))
      .collect().map(r => r.getString(0) -> Option(r.get(1))).toMap
    assert(t("a").contains(101.0), "2s-ahead match survives a 2s tolerance")
    assert(t("d").isEmpty, "6s-ahead match is beyond a 2s tolerance")
  }

  test("plan is one window over the union — no join operator at all") {
    val plan = AsOf.backward(trades, quotes, "tkey", "qkey", "tts", "qts", Seq("px"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("Window"), plan)
    assert(!plan.toLowerCase.contains("join"),
      s"as-of must not plan a join (nested-loop at scale):\n$plan")
    assert("Exchange hashpartitioning".r.findAllIn(plan).size <= 2,
      s"one key exchange per input side at most:\n$plan")
  }
}
