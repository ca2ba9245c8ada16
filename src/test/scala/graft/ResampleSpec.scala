package graft

import graft.operators.Resample
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Resample + forward fill: dense grid construction, last-per-bucket
  * survivor choice, gap filling, and per-key grid bounds. */
class ResampleSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("ffillGrid densifies per-key hours and forward-fills gaps") {
    // user 1: events at 10:xx and 13:xx → grid 10,11,12,13 with two gaps;
    // two events inside 10:xx → the later one (by ts, event_id) survives
    // user 2: a single hour → one-cell grid, no gaps
    val ev = Seq(
      (1L, ts("2024-01-01 10:05:00"), 1L, 5.0),
      (2L, ts("2024-01-01 10:40:00"), 1L, 7.0), // same hour, later → wins
      (3L, ts("2024-01-01 13:10:00"), 1L, 9.0),
      (4L, ts("2024-01-01 02:00:00"), 2L, 1.5)
    ).toDF("event_id", "ts", "user_id", "value")
    val g = Resample.ffillGrid(ev, "user_id", "ts", "value", "hour")
      .orderBy("k", "bucket")
      .select(col("k"), date_format(col("bucket"), "HH").cast("int").as("h"),
        col("v"), col("filled"), col("is_gap"))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), Option(r.get(2)), r.getDouble(3), r.getBoolean(4)))
    assert(g.toList == List(
      (1L, 10, Some(7.0), 7.0, false), // last event in the hour survives
      (1L, 11, None, 7.0, true),       // gap filled forward
      (1L, 12, None, 7.0, true),
      (1L, 13, Some(9.0), 9.0, false),
      (2L, 2, Some(1.5), 1.5, false)))
  }

  test("interpGrid linearly interpolates interior gaps") {
    // user 1: observations at hours 10 (v=1.0) and 13 (v=4.0) → gaps at
    // 11, 12 interpolate to 2.0, 3.0 (slope 1 per hour)
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L, 1.0),
      (2L, ts("2024-01-01 13:00:00"), 1L, 4.0)
    ).toDF("event_id", "ts", "user_id", "value")
    val g = Resample.interpGrid(ev, "user_id", "ts", "value", "hour")
      .orderBy("bucket")
      .select(date_format(col("bucket"), "HH").cast("int"), col("filled"), col("is_gap"))
      .collect().map(r => (r.getInt(0), r.getDouble(1), r.getBoolean(2)))
    assert(g.toList == List((10, 1.0, false), (11, 2.0, true),
      (12, 3.0, true), (13, 4.0, false)))
  }

  test("interpGrid weights by time distance for uneven gaps") {
    // observations at hours 0 (v=0.0) and 4 (v=10.0): hour 1 → 2.5,
    // hour 3 → 7.5 — fraction is (t-t0)/(t1-t0), not a per-row step
    val ev = Seq(
      (1L, ts("2024-01-01 00:00:00"), 7L, 0.0),
      (2L, ts("2024-01-01 04:00:00"), 7L, 10.0)
    ).toDF("event_id", "ts", "user_id", "value")
    val g = Resample.interpGrid(ev, "user_id", "ts", "value", "hour")
      .orderBy("bucket").select("filled").collect().map(_.getDouble(0))
    assert(g.toList == List(0.0, 2.5, 5.0, 7.5, 10.0))
  }

  test("ewma replays the pandas adjust=False recurrence per key") {
    // user 1: x = 10, 20, 40 → ew = 10, 15, 27.5; user 2: single event
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L, 10.0),
      (2L, ts("2024-01-01 11:00:00"), 1L, 20.0),
      (3L, ts("2024-01-01 12:00:00"), 1L, 40.0),
      (4L, ts("2024-01-01 10:00:00"), 2L, 7.0)
    ).toDF("event_id", "ts", "user_id", "value")
    val got = Resample.ewma(ev, "user_id", "ts", "value", alpha = 0.5)
      .orderBy("k", "event_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.toList == List((1L, 1L, 10.0), (1L, 2L, 15.0),
      (1L, 3L, 27.5), (2L, 4L, 7.0)))
  }

  test("ewma state resets across key boundaries within a partition") {
    // many keys forced into few partitions: a carry-over bug would leak
    // the previous key's state into the next key's first row
    val ev = (1 to 40).map { i =>
      (i.toLong, ts(f"2024-01-01 ${i % 24}%02d:00:00"), (i % 10).toLong, i * 1.0)
    }.toDF("event_id", "ts", "user_id", "value")
    // the recurrence starts at each key's first row in (ts, event_id)
    // order; ts here is hour event_id % 24, so rank by that
    val firsts = Resample.ewma(ev.repartition(2), "user_id", "ts", "value", 0.5)
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("k")
          .orderBy(col("event_id") % 24, col("event_id"))))
      .filter(col("rn") === 1)
      .collect()
    // each key's first ew must equal that key's first raw value
    val raw = (1 to 40).map(i => ((i % 10).toLong, i % 24, i.toLong, i * 1.0))
      .groupBy(_._1).map { case (k, rows) =>
        k -> rows.minBy(r => (r._2, r._3))._4
      }
    firsts.foreach { r =>
      assert(r.getDouble(2) == raw(r.getLong(0)), s"key ${r.getLong(0)}")
    }
  }

  test("ffillGrid survivor tie-break uses event_id at equal timestamps") {
    val t0 = ts("2024-01-01 08:30:00")
    val ev = Seq((10L, t0, 1L, 100.0), (11L, t0, 1L, 200.0))
      .toDF("event_id", "ts", "user_id", "value")
    val g = Resample.ffillGrid(ev, "user_id", "ts", "value", "hour").collect()
    assert(g.length == 1 && g(0).getAs[Double]("v") == 200.0,
      "highest event_id wins at identical timestamps")
  }
}
