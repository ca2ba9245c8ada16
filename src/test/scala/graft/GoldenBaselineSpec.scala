package graft

import graft.functions.CleanFns
import graft.operators.Profile
import graft.pipeline.Eda
import org.apache.spark.sql.functions._

/** Pins the reference notebook's PUBLISHED constants (BASELINE.md, from
  * exploracion_airbnb.ipynb cell 15) against this engine's operators, at
  * a 1:~26 scale. The full joint distribution cannot be reproduced on a
  * 1000-row fixture (the single 900,000 max alone contributes 900 to a
  * 1000-row mean), so each published statistic is pinned on a fixture
  * engineered to produce exactly that number through the same operator
  * the real pipeline uses. Any drift in the parity quirks — D5's
  * duplicate-lexicon double-count, P6's price parsing, exact linear
  * percentile interpolation, the IQR > (not ≥) bound — breaks a pin.
  */
class GoldenBaselineSpec extends SparkSpec {
  import spark.implicits._

  test("room_type shares reproduce the notebook's 65.3/33.6/0.8/0.3%") {
    // nb cell 15: Entire home/apt 17,235 (65.3%) · Private room 8,867
    // (33.6%) · Shared room 208 (0.8%) · Hotel room 91 (0.3%) — scaled
    // 1:1000 of the corpus total, identical share arithmetic.
    val rows = Seq.fill(653)("Entire home/apt") ++
      Seq.fill(336)("Private room") ++
      Seq.fill(8)("Shared room") ++
      Seq.fill(3)("Hotel room")
    val got = Profile.topK(rows.toDF("room_type"), "room_type", 100)
      .as[(String, Long, Double)].collect().toSeq
    assert(got === Seq(
      ("Entire home/apt", 653L, 65.3),
      ("Private room", 336L, 33.6),
      ("Shared room", 8L, 0.8),
      ("Hotel room", 3L, 0.3)))
  }

  test("price mean/median reproduce the notebook's $1742.60 / $909.00 through cleanPrice") {
    // nb cell 15: price_clean mean 1742.60, median 909.00. 1000 price
    // STRINGS (P6 path, including a comma-grouped one) summing to exactly
    // $1,742,600.00 with the 500th/501st sorted values both 909.
    val prices = Seq.fill(501)("$909.00") ++
      Seq.fill(498)("$2,579.34") ++ Seq("$2,679.68")
    val df = prices.toDF("price")
      .withColumn("price_clean", CleanFns.cleanPrice(col("price")))
    val r = Profile.descStats(df, "price_clean").collect()(0)
    assert(r.getAs[Long]("cnt") === 1000L)
    assert(r.getAs[Double]("mean") === 1742.6)
    assert(r.getAs[Double]("p50") === 909.0)
  }

  test("price percentiles and IQR outliers reproduce the notebook's published values") {
    // nb cell 15: percentiles 25/50/75/90/95/99 = 472/909/1520/2535/
    // 3682/9229; IQR outliers 7.0% with range 3093–900000 and max
    // 900,000. Engineered sorted layout: both linear-interpolation
    // neighbors at each percentile index (q·999) carry the published
    // value; q3+1.5·IQR lands at exactly 3092 so the 70 values ≥3093
    // (7.0%) are precisely the outliers.
    val values =
      Seq.fill(249)(100.0) ++ Seq.fill(2)(472.0) ++ Seq.fill(248)(700.0) ++
      Seq.fill(2)(909.0) ++ Seq.fill(248)(1200.0) ++ Seq.fill(2)(1520.0) ++
      Seq.fill(148)(2000.0) ++ Seq.fill(2)(2535.0) ++ Seq.fill(29)(2600.0) ++
      Seq.fill(19)(3093.0) ++ Seq.fill(40)(3682.0) ++ Seq.fill(10)(9229.0) ++
      Seq(900000.0)
    assert(values.size === 1000)
    val df = values.toDF("price_clean")
    val p = Profile.percentiles(df, "price_clean", Seq(0.25, 0.5, 0.75, 0.9, 0.95, 0.99))
      .collect()(0)
    assert(Seq("p25", "p50", "p75", "p90", "p95", "p99").map(p.getAs[Double]) ===
      Seq(472.0, 909.0, 1520.0, 2535.0, 3682.0, 9229.0))
    val o = Profile.iqrOutliers(df, "price_clean").collect()(0)
    assert(o.getAs[Long]("n_rows") === 1000L)
    assert(o.getAs[Long]("n_outliers") === 70L)
    assert(o.getAs[Double]("outlier_pct") === 7.0)
    assert(o.getAs[Double]("out_min") === 3093.0)
    assert(o.getAs[Double]("out_max") === 900000.0)
  }

  test("sentiment split reproduces the notebook's 0.67 mean, 53.4/0.5/46.1%") {
    // nb cell 15: mean 0.67, 741,617 pos (53.4%) / 7,175 neg (0.5%) /
    // 639,434 neutral (46.1%) over 1,388,226. Scaled to 1000 with the
    // same share arithmetic; the 5 negatives say 'terrible', which the
    // reference's duplicate EN+ES lexicon counts TWICE (score −2) — if
    // the double-count quirk drifts, the mean pin breaks (0.675 ≠ 0.67).
    val comments = Seq.fill(388)("a good stay") ++
      Seq.fill(146)("good and excellent") ++
      Seq.fill(5)("terrible") ++
      Seq.fill(461)("nothing remarkable")
    val df = comments.toDF("comments").withColumn("date", lit("2025-07-15"))
    val s = Eda.reviews(df)("sentiment").collect()(0)
    assert(s.getAs[Double]("mean_sent") === 0.67)
    assert(s.getAs[Long]("n_pos") === 534L)
    assert(s.getAs[Long]("n_neg") === 5L)
    assert(s.getAs[Long]("n_neu") === 461L)
  }
}
