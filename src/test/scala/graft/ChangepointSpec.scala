package graft

import graft.operators.Changepoint
import org.apache.spark.sql.functions._

/** CUSUM recurrence semantics: hand-computed trajectory, clamp at zero,
  * and state isolation across key boundaries within one partition. */
class ChangepointSpec extends SparkSpec {
  import spark.implicits._

  test("cusum replays the clamped recurrence s=max(0,s+x-drift)") {
    // drift 2.0; x = 1,4,1,5 → s = max(0,1-2)=0, 0+4-2=2, 2+1-2=1, 1+5-2=4
    val series = Seq(("a", 1L, 1.0, 2.0), ("a", 2L, 4.0, 2.0),
      ("a", 3L, 1.0, 2.0), ("a", 4L, 5.0, 2.0))
      .toDF("event_type", "rn", "x", "drift")
    val got = Changepoint.cusum(series, "event_type", "rn", "x", "drift")
      .orderBy("rn").select("cusum").as[Double].collect().toList
    assert(got == List(0.0, 2.0, 1.0, 4.0))
  }

  test("cusum clamps at zero and recovers after a quiet stretch") {
    // drift 10 swamps x=1 for three steps (stays 0), then a burst of 30
    // registers in full: the quiet stretch never builds negative credit.
    val series = (1L to 3L).map(i => ("k", i, 1.0, 10.0)) :+ (("k", 4L, 30.0, 10.0))
    val got = Changepoint.cusum(series.toDF("event_type", "rn", "x", "drift"),
        "event_type", "rn", "x", "drift")
      .orderBy("rn").select("cusum").as[Double].collect().toList
    assert(got == List(0.0, 0.0, 0.0, 20.0))
  }

  test("cusum state resets across key boundaries within a partition") {
    // Force both keys into one partition: the scan must restart s at the
    // key change, so key b's first step sees s=0, not key a's tail.
    val series = Seq(("a", 1L, 9.0, 1.0), ("a", 2L, 9.0, 1.0),
      ("b", 1L, 3.0, 1.0)).toDF("event_type", "rn", "x", "drift")
      .repartition(1)
    val got = Changepoint.cusum(series, "event_type", "rn", "x", "drift")
      .orderBy("k", "rn")
      .select("k", "cusum").as[(String, Double)].collect().toList
    assert(got == List(("a", 8.0), ("a", 16.0), ("b", 2.0)))
  }
}
