package graft

import java.sql.Timestamp

/** Closed-form sanity checks for the statistical queries on tiny hand
  * computed fixtures — guards against the oracle gate's blind spot where
  * the Spark plan and its SQL mirror are wrong in the same way. Expected
  * values are hand-derived (Welch constants cross-checked against the
  * textbook formulas), not re-derived from the implementation. */
class StatsQuerySpec extends SparkSpec {
  import spark.implicits._

  private def dir(): String =
    java.nio.file.Files.createTempDirectory("statsq").toString

  test("q191 chi-square matches the hand-computed 2x2 table") {
    val d = dir()
    val rows =
      Seq.fill(10)(("A", "X")) ++ Seq.fill(20)(("A", "Y")) ++
      Seq.fill(20)(("B", "X")) ++ Seq.fill(10)(("B", "Y"))
    rows.toDF("o_orderpriority", "o_orderstatus")
      .write.mode("overwrite").parquet(s"$d/orders.parquet")
    val out = Queries.byName("q191_chi2_independence").run(spark, d).collect()
    assert(out.length == 1)
    val r = out(0)
    // E = 15 in every cell; term = 25/15 → 1.666667 rounded, ×4 cells
    assert(r.getAs[Long]("n") == 60L)
    assert(r.getAs[Long]("dof") == 1L)
    assert(r.getAs[Double]("chi2") == 6.666668)
    assert(r.getAs[Double]("cramers_v") == 0.333333)
  }

  test("q192 Welch t-test matches the textbook computation") {
    val d = dir()
    // variant A = even user_ids: values 1,2,3,4; B = odd: 2,4,6,8,10
    val a = Seq(1.0, 2.0, 3.0, 4.0).zipWithIndex.map { case (v, i) =>
      (i.toLong, Timestamp.valueOf("2026-01-01 00:00:00"), 2L, "t", v, "{}") }
    val b = Seq(2.0, 4.0, 6.0, 8.0, 10.0).zipWithIndex.map { case (v, i) =>
      (100L + i, Timestamp.valueOf("2026-01-01 00:00:00"), 3L, "t", v, "{}") }
    (a ++ b).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$d/events.parquet")
    val r = Queries.byName("q192_welch_ttest").run(spark, d).collect()(0)
    assert(r.getAs[Long]("na") == 4L && r.getAs[Long]("nb") == 5L)
    assert(r.getAs[Double]("mean_a") == 2.5 && r.getAs[Double]("mean_b") == 6.0)
    assert(r.getAs[Double]("t_stat") == -2.251436)
    assert(r.getAs[Double]("welch_df") == 5.520788)
  }

  private def docsDF(rows: Seq[(Long, String, String, String, Long)]) =
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")

  test("q190 entropy: uniform 2-way column → ln 2, constant column → 0") {
    val d = dir()
    docsDF(Seq(
      (1L, "x", "en", "s0", 1L), (2L, "x", "en", "s0", 1L),
      (3L, "x", "fr", "s0", 1L), (4L, "x", "fr", "s0", 1L)))
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    val out = Queries.byName("q190_entropy_profile").run(spark, d).collect()
      .map(r => r.getAs[String]("col_name") ->
        (r.getAs[Double]("entropy"), r.getAs[Double]("norm_entropy"))).toMap
    assert(out("lang") == ((0.693147, 1.0)))   // H = ln 2, fully uniform
    assert(out("source") == ((0.0, 0.0)))      // single category
  }

  test("q194 JSD: disjoint vocabularies → ln 2, identical → 0") {
    val d1 = dir()
    docsDF(Seq(
      (1L, "aa aa", "en", "src0", 5L), (2L, "bb bb", "en", "src1", 5L)))
      .write.mode("overwrite").parquet(s"$d1/documents.parquet")
    val r1 = Queries.byName("q194_jsd_drift").run(spark, d1).collect()(0)
    assert(r1.getAs[Double]("jsd") == 0.693147)
    val d2 = dir()
    docsDF(Seq(
      (1L, "aa bb", "en", "src0", 5L), (2L, "aa bb", "en", "src1", 5L)))
      .write.mode("overwrite").parquet(s"$d2/documents.parquet")
    val r2 = Queries.byName("q194_jsd_drift").run(spark, d2).collect()(0)
    assert(r2.getAs[Double]("jsd") == 0.0)
  }

  test("q198 audio RMS: byte pairs read as int16-LE, short clips dropped") {
    val d = dir()
    // doc 1 is the audio kind (doc_id % 3 == 1): "ab" → one sample
    // 97 + 98·256 = 25185; doc 4 is audio but 1 char → dropped; doc 2
    // is the wrong kind and must not appear at all
    docsDF(Seq(
      (1L, "ab", "s0", "s0", 2L),
      (4L, "x", "s0", "s0", 1L),
      (2L, "zzzz", "s0", "s0", 4L)))
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    val out = Queries.byName("q198_audio_rms").run(spark, d).collect()
    assert(out.length == 1)
    val r = out(0)
    assert(r.getAs[Long]("n_clips") == 1L && r.getAs[Long]("n_samples") == 1L)
    assert(r.getAs[Long]("peak") == 25185L)
    assert(r.getAs[Double]("rms") == 25185.0)
    assert(r.getAs[Double]("clip_ratio") == 0.0)
  }

  test("q200 BPE encode: merges collapse the toy vocab to whole-word symbols") {
    val d = dir()
    // vocab {aaaa:2, bb:1}; merges (a,a) → (aa,aa) → (b,b): every word
    // becomes a single symbol after 3 rounds
    docsDF(Seq((1L, "aaaa aaaa bb", "en", "s0", 12L)))
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    val r = Queries.byName("q200_bpe_encode").run(spark, d).collect()(0)
    assert(r.getAs[Long]("n_words") == 3L)
    assert(r.getAs[Long]("n_subwords") == 3L)
    assert(r.getAs[Double]("subwords_per_word") == 1.0)
    assert(r.getAs[Double]("chars_per_subword") == 3.333333) // 10 chars / 3
  }

  test("q201 seasonality: hand-computed ANOVA share, peak hour and index") {
    val d = dir()
    // hour 0 → values (1,1), hour 1 → (3,3): SS_between = SS_total = 4
    def ev(id: Long, hh: String, v: Double) =
      (id, Timestamp.valueOf(s"2026-01-01 $hh:00:00"), 1L, "t", v, "{}")
    Seq(ev(1, "00", 1.0), ev(2, "00", 1.0), ev(3, "01", 3.0), ev(4, "01", 3.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$d/events.parquet")
    val r = Queries.byName("q201_seasonal_strength").run(spark, d).collect()(0)
    assert(r.getAs[Long]("n") == 4L)
    assert(r.getAs[Double]("mean") == 2.0)
    assert(r.getAs[Long]("peak_hour") == 1L)
    assert(r.getAs[Double]("peak_index") == 1.5)
    assert(r.getAs[Double]("seasonal_strength") == 1.0)
  }

  test("q202 imputation: median fill and shifted mean from one aggregate") {
    val d = dir()
    def ev(id: Long, v: Double) =
      (id, Timestamp.valueOf("2026-01-01 00:00:00"), 1L, "t", v, "{}")
    // id 10 is masked (event_id % 10 == 0); observed = 1, 2, 9
    Seq(ev(1, 1.0), ev(2, 2.0), ev(3, 9.0), ev(10, 100.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$d/events.parquet")
    val r = Queries.byName("q202_impute_median").run(spark, d).collect()(0)
    assert(r.getAs[Long]("n") == 4L && r.getAs[Long]("n_missing") == 1L)
    assert(r.getAs[Double]("median_fill") == 2.0)
    assert(r.getAs[Double]("mean_observed") == 4.0)
    assert(r.getAs[Double]("mean_imputed") == 3.5)  // (12 + 2) / 4
  }

  test("q205 sequence patterns: non-overlapping leftmost matches on the encoded history") {
    val d = dir()
    // one user, history v c p v e p e e e → "vcpvepeee":
    //   v[^ep]*p  → "vcp" only (the second v→p run crosses an e)    = 1
    //   e[^v]*e   → "epeee" — greedy [^v]* runs to the LAST e, so
    //               the whole error run is one match, not "epe"+"ee" = 1
    val types = Seq("view", "click", "purchase", "view", "error",
      "purchase", "error", "error", "error")
    val rows = types.zipWithIndex.map { case (t, i) =>
      (i.toLong, Timestamp.valueOf(f"2026-01-01 00:00:${i}%02d"), 7L, t, 1.0, "{}") }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$d/events.parquet")
    val r = Queries.byName("q205_seq_pattern").run(spark, d).collect()(0)
    assert(r.getAs[Long]("n_users") == 1L)
    assert(r.getAs[Long]("users_converting") == 1L)
    assert(r.getAs[Long]("n_conversions") == 1L)
    assert(r.getAs[Long]("users_error_runs") == 1L)
    assert(r.getAs[Long]("n_error_runs") == 1L)
  }

  test("greedyCover picks by marginal gain with deterministic ties, stops when dry") {
    import graft.operators.Cover
    // A={1,2,3}, B={3,4}, C={4}: round1 A(3), round2 B(+1 via 4),
    // then C adds nothing → early stop even with k=3
    val m = Seq(("A", 1), ("A", 2), ("A", 3), ("B", 3), ("B", 4), ("C", 4))
      .toDF("s", "e")
    val picks = Cover.greedyCover(m, "s", "e", 3)
    assert(picks.map(p => (p.round, p.set, p.gain, p.coveredTotal)) ==
      Seq((1, "A", 3L, 3L), (2, "B", 1L, 4L)))
  }

  test("q193 blocking eval: counts pairs from block sizes, recall from truth") {
    val d = dir()
    val tA = "alpha beta gamma delta epsilon zeta eta theta"
    val tB = "one two three four five six seven eight nine"
    docsDF(Seq(
      (1L, tA, "en", "s0", 30L), (2L, tA, "en", "s0", 30L), // dup, co-blocked
      (3L, tB, "en", "s0", 27L),
      (4L, tB, "fr", "s0", 27L)))                           // dup, lang split
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    val r = Queries.byName("q193_blocking_eval").run(spark, d).collect()(0)
    assert(r.getAs[Long]("n_docs") == 4L)
    assert(r.getAs[Long]("n_cand") == 3L)     // en block of 3 → 3 pairs
    assert(r.getAs[Long]("n_truth") == 2L)    // (1,2) and (3,4)
    assert(r.getAs[Long]("n_coblocked") == 1L)
    assert(r.getAs[Double]("reduction_ratio") == 0.5)      // 1 − 3/6
    assert(r.getAs[Double]("pairs_completeness") == 0.5)
    assert(r.getAs[Double]("pairs_quality") == 0.333333)   // 1/3
  }
}
