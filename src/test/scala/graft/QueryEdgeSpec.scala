package graft

/** Edge-case regressions for registered queries on inputs the synthetic
  * testdata never produces (so the oracle gate can't catch them). */
class QueryEdgeSpec extends SparkSpec {
  import spark.implicits._

  test("q169 tolerates zero-token documents (empty and whitespace-only text)") {
    val dir = java.nio.file.Files.createTempDirectory("q169edge").toString
    Seq(
      (1L, "join merge join", "en", "s0", 15L),
      (2L, "", "en", "s0", 0L),         // empty → sequence(0,-1) hazard
      (3L, "   ", "en", "s0", 3L))      // whitespace-only → normalizes empty
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = Queries.byName("q169_snippet").run(spark, dir).collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L)) // only the doc with hits
    assert(out(0).getLong(1) == 3L)                // n_hits
  }

  private def eventsDir(rows: Seq[(Long, String, Long, String, Double, String)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("evedge").toString
    rows.toDF("event_id", "tss", "user_id", "event_type", "value", "props")
      .select($"event_id", $"tss".cast("timestamp").as("ts"), $"user_id",
        $"event_type", $"value", $"props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("q228 Holt survives a series too short to smooth (2 hourly buckets)") {
    val dir = eventsDir(Seq(
      (1L, "2024-01-01 00:10:00", 1L, "view", 10.0, "{\"k\": 1}"),
      (2L, "2024-01-01 01:10:00", 1L, "view", 14.0, "{\"k\": 1}")))
    val out = Queries.byName("q228_holt_forecast").run(spark, dir).collect()
    // init only: l = y₁ = 10, b = y₂ − y₁ = 4 → 1h forecast 14
    assert(out.length == 1 && out(0).getLong(0) == 2L)
    assert(out(0).getDouble(1) == 10.0 && out(0).getDouble(2) == 4.0)
    assert(out(0).getDouble(3) == 14.0)
  }

  test("q228 Holt emits nothing on a single-bucket series instead of nulls") {
    val dir = eventsDir(Seq(
      (1L, "2024-01-01 00:10:00", 1L, "view", 10.0, "{\"k\": 1}")))
    assert(Queries.byName("q228_holt_forecast").run(spark, dir).collect().isEmpty)
  }

  test("q231 decayed trending tolerates a single-day corpus (span 0)") {
    val dir = eventsDir(Seq(
      (1L, "2024-01-01 00:10:00", 1L, "view", 1.0, "{\"k\": 7}"),
      (2L, "2024-01-01 10:00:00", 2L, "click", 1.0, "{\"k\": 7}"),
      (3L, "2024-01-01 11:00:00", 2L, "view", 1.0, "{\"k\": 9}")))
    val out = Queries.byName("q231_decayed_trending").run(spark, dir).collect()
    // all weight 1.0 at age 0: score == count
    assert(out.map(r => (r.getLong(0), r.getDouble(2))).toSeq ==
      Seq((7L, 2.0), (9L, 1.0)))
  }
}
