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

  test("zipf boilerplate mode plants the license prefix; dups of boiler docs regenerate it") {
    import org.apache.spark.sql.functions._
    val n = 800L
    val dfs = layouts(n).map(ids =>
      GenData.documentsZipfFrom(ids, n, 1L, vocab = 100000L, boilerPct = 0.05))
    assertSame(dfs)
    val docs = dfs.head.cache()
    val boiler = docs.filter(col("text").startsWith(GenData.BoilerPrefix))
    val nBoiler = boiler.count()
    // ~5% carry the prefix (boiler bases + dups of boiler bases)
    assert(nBoiler >= 20 && nBoiler <= 90, s"boiler fraction off: $nBoiler of $n")
    // boiler docs are prefix + 0-10 word body (+ optional ' dup'): the
    // prefix must DOMINATE the shingle set, or no mega-bucket forms
    val prefixWords = GenData.BoilerPrefix.split(" ").length
    val tooLong = boiler
      .filter(size(split(col("text"), " ")) > prefixWords + 11).count()
    assert(tooLong == 0, s"$tooLong boiler docs with bodies over 10 words")
    // a dup of a boiler base must carry the full boiler text + " dup"
    val boilerDups = docs.filter(col("text").startsWith(GenData.BoilerPrefix)
      && col("text").endsWith(" dup"))
      .select(expr("substring(text, 1, length(text) - 4)").as("base_text"))
    val orphan = boilerDups.join(
      docs.select(col("text").as("base_text")), Seq("base_text"), "left_anti").count()
    assert(orphan == 0, s"$orphan boiler-dup docs with no matching base text")
    docs.unpersist()
  }

  test("zipf marker mode: alphabetic words, detectable languages, zh stays unknown") {
    import org.apache.spark.sql.functions._
    val n = 800L
    val dfs = layouts(n).map(ids =>
      GenData.documentsZipfFrom(ids, n, 1L, vocab = 100000L, markerPct = 0.15))
    assertSame(dfs)
    val docs = dfs.head.cache()
    // no digit characters anywhere: the base-26 rendering exists so
    // qualityScore's alpha_ratio is not zeroed by 'wNNN' words
    assert(docs.filter(col("text").rlike("[0-9]")).count() == 0,
      "marker-mode words must be fully alphabetic")
    val pred = docs.select(col("lang"),
      graft.functions.TextFns.langId(col("text")).as(("pl"))).cache()
    // the dominant latin langs must be detected for a solid majority of
    // their docs (dup docs carry their BASE's markers, so per-doc lang
    // and text-lang can legitimately disagree on ~5% + short docs)
    val agree = pred.filter(col("lang") =!= "zh")
      .select(avg((col("pl") === col("lang")).cast("double"))).first().getDouble(0)
    assert(agree > 0.7, s"latin-language marker detection too weak: $agree")
    // zh has no latin markers: its docs must NOT be claimed by some
    // other language more often than chance dup-noise allows
    val zhClaimed = pred.filter(col("lang") === "zh" && col("pl") =!= "unknown").count()
    val zhAll = pred.filter(col("lang") === "zh").count()
    assert(zhClaimed.toDouble / zhAll < 0.35,
      s"zh docs claimed by latin languages: $zhClaimed of $zhAll")
    docs.unpersist(); pred.unpersist()
  }

  test("boiler+marker compose: alphabetic boiler prefix, consistent corpus") {
    import org.apache.spark.sql.functions._
    val n = 800L
    val dfs = layouts(n).map(ids =>
      GenData.documentsZipfFrom(ids, n, 1L, vocab = 100000L,
        boilerPct = 0.05, markerPct = 0.15))
    assertSame(dfs)
    val docs = dfs.head.cache()
    // the whole corpus — boiler prefixes included — stays alphabetic, so
    // the quality gate's alpha_ratio premise holds for every doc class
    assert(docs.filter(col("text").rlike("[0-9]")).count() == 0,
      "composed mode must not reintroduce digit words via the boiler prefix")
    val nBoiler = docs.filter(col("text").startsWith(GenData.BoilerPrefixAlpha)).count()
    assert(nBoiler >= 20 && nBoiler <= 90, s"alpha-boiler fraction off: $nBoiler of $n")
    // the alpha prefix renders the SAME 30 ranks as the digit prefix
    assert(GenData.BoilerPrefixAlpha.split(" ").length == 30)
    assert(!GenData.BoilerPrefixAlpha.exists(_.isDigit))
    docs.unpersist()
  }

  test("dupPct knob: 0 plants no dups, a raised rate scales the planting") {
    import org.apache.spark.sql.functions._
    val ids = spark.range(800L).toDF("id")
    val none = GenData.documentsZipfFrom(ids, 800L, 0L, vocab = 1000L, dupPct = 0.0)
    assert(none.filter(col("text").endsWith(" dup")).count() == 0)
    val some = GenData.documentsZipfFrom(ids, 800L, 1L, vocab = 1000L, dupPct = 0.15)
      .filter(col("text").endsWith(" dup")).count()
    assert(some >= 80 && some <= 160, s"~15% of 800 expected, got $some")
  }

  test("marker mode rejects vocab beyond the 4-letter rendering range") {
    val ids = spark.range(10L).toDF("id")
    intercept[IllegalArgumentException] {
      GenData.documentsZipfFrom(ids, 10L, 1L, vocab = 500000L, markerPct = 0.15)
    }
    // plain mode (digit words) has no such limit
    GenData.documentsZipfFrom(ids, 10L, 1L, vocab = 500000L)
  }

  test("embeddingsClusteredFrom: partition-insensitive, unit-norm, power-law clusters, tight") {
    import org.apache.spark.sql.functions._
    val dfs = layouts(2000).map(ids => GenData.embeddingsClusteredFrom(ids, k = 50))
    assertSame(dfs)
    val emb = dfs.head.cache()
    val badNorm = emb.select(aggregate(col("embedding"), lit(0.0),
        (a, x) => a + x * x).as("n2"))
      .filter(abs(col("n2") - 1.0) > 0.001).count()
    assert(badNorm == 0, s"$badNorm clustered embeddings not L2-normalized")
    // power-law occupancy: rank-1 cluster ~18%, and all 50 present
    val occ = emb.groupBy("label").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(occ.size == 50, s"expected 50 clusters, got ${occ.size}")
    val top = occ.values.max.toDouble / 2000
    assert(top > 0.12 && top < 0.25, s"top-cluster share $top not power-law-headed")
    // within-cluster tightness: mean pairwise cosine inside the top
    // cluster must be high (~1/(1+sigma^2) ~ 0.9), far above the ~0
    // between-cluster level — the property that defeats sign sub-buckets
    val topLabel = occ.maxBy(_._2)._1
    val c = emb.filter(col("label") === topLabel).limit(40)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getSeq[Float](1).toArray)
    def cos(a: Array[Float], b: Array[Float]) =
      a.zip(b).map { case (x, y) => x.toDouble * y }.sum
    val pairs = for (i <- c.indices; j <- c.indices if i < j) yield cos(c(i), c(j))
    val meanCos = pairs.sum / pairs.size
    assert(meanCos > 0.75, s"top cluster not tight: mean within-cosine $meanCos")
    emb.unpersist()
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
