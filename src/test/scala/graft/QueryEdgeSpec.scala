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
}
