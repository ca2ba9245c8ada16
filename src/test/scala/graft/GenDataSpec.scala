package graft

import org.apache.spark.sql.DataFrame

/** GenData determinism: every generated value must be a pure function of
  * (table, row id) — NEVER of the physical partitioning — or scale
  * experiments at sf1/sf3 would not be reproducible run-to-run. These
  * specs feed each builder the same id range at radically different
  * parallelism (1 partition vs 13 partitions vs a post-shuffle layout)
  * and require the multisets of rows to be identical. */
class GenDataSpec extends SparkSpec {

  /** Same ids, three physical layouts. */
  private def layouts(n: Long): Seq[DataFrame] = Seq(
    spark.range(0, n, 1, 1).toDF("id"),
    spark.range(0, n, 1, 13).toDF("id"),
    spark.range(0, n, 1, 4).toDF("id").repartition(7))

  private def assertSame(dfs: Seq[DataFrame]): Unit = {
    // True MULTISET equality: group by every column and compare per-row
    // multiplicities (except() is set-based and would miss duplicate-
    // multiplicity drift, e.g. {a,a,b} vs {a,b,b}).
    def counted(df: DataFrame): DataFrame =
      df.groupBy(df.columns.map(df.col): _*)
        .agg(org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("__mult"))
    val base = counted(dfs.head)
    for (other <- dfs.tail.map(counted)) {
      assert(base.except(other).isEmpty && other.except(base).isEmpty,
        "generated row multisets differ across partitionings")
    }
  }

  test("lineitemFrom is partition-insensitive (incl. the explode fan-out)") {
    assertSame(layouts(500).map(ids => GenData.lineitemFrom(ids, 200, 10)))
  }

  test("documentsFrom is partition-insensitive and plants true exact dups") {
    val n = 600L
    val dfs = layouts(n).map(ids => GenData.documentsFrom(ids, n, 1L))
    assertSame(dfs)
    // every planted dup's text must be an existing base doc's text + " dup"
    import org.apache.spark.sql.functions._
    val docs = dfs.head.cache()
    val dups = docs.filter(col("text").endsWith(" dup"))
      .select(expr("substring(text, 1, length(text) - 4)").as("base_text"))
    val bases = docs.filter(!col("text").endsWith(" dup"))
      .select(col("text").as("base_text"))
    val orphan = dups.join(bases, Seq("base_text"), "left_anti").count()
    assert(dups.count() > 0, "no planted dups in 600 docs — check the rate")
    assert(orphan == 0, s"$orphan dup docs whose base text exists nowhere")
    docs.unpersist()
  }

  test("documentsZipfFrom is partition-insensitive, plants dups, and is Zipf-shaped") {
    import org.apache.spark.sql.functions._
    val n = 600L
    val dfs = layouts(n).map(ids => GenData.documentsZipfFrom(ids, n, 1L, vocab = 100000L))
    assertSame(dfs)
    val docs = dfs.head.cache()
    // dup planting unchanged: every dup's text = an existing base's text + " dup"
    val dups = docs.filter(col("text").endsWith(" dup"))
      .select(expr("substring(text, 1, length(text) - 4)").as("base_text"))
    val bases = docs.filter(!col("text").endsWith(" dup"))
      .select(col("text").as("base_text"))
    assert(dups.count() > 0, "no planted dups in 600 docs")
    assert(dups.join(bases, Seq("base_text"), "left_anti").count() == 0,
      "dup docs whose base text exists nowhere")
    // Zipf shape: a large observed vocabulary (tail) plus a heavy head.
    // ~33k tokens over a 100k-word Zipf(1) universe should surface
    // thousands of distinct words (30-word vocab would cap at 30), and
    // rank-1 ("w1", P ~ ln2/ln(V+1) ~ 6%) should dwarf a mid-rank word.
    val freq = docs.select(explode(split(col("text"), " ")).as("w"))
      .groupBy("w").count()
    val distinctWords = freq.count()
    assert(distinctWords > 2000, s"vocab too small for Zipf mode: $distinctWords")
    val top = freq.orderBy(desc("count")).limit(1).head()
    assert(top.getString(0) == "w1", s"Zipf head should be w1, got ${top.getString(0)}")
    val rank100 = freq.filter(col("w") === "w100").collect().headOption
      .map(_.getLong(1))
      .getOrElse(fail(s"rank-100 word 'w100' absent from the $distinctWords-word sample — Zipf shape broken (seed/vocab change?)"))
    assert(top.getLong(1) > 10 * rank100,
      s"head/rank-100 ratio too flat: ${top.getLong(1)} vs $rank100 (expect ~100x)")
    docs.unpersist()
  }

  test("embeddingsFrom is partition-insensitive and unit-norm") {
    val dfs = layouts(400).map(GenData.embeddingsFrom)
    assertSame(dfs)
    import org.apache.spark.sql.functions._
    val badNorm = dfs.head.select(aggregate(col("embedding"), lit(0.0),
        (a, x) => a + x * x).as("n2"))
      .filter(abs(col("n2") - 1.0) > 0.001).count()
    assert(badNorm == 0, s"$badNorm embeddings not L2-normalized")
  }
}
