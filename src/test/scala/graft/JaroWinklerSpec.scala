package graft

import graft.plans.JaroWinklerExpr
import org.apache.spark.sql.functions._

/** Jaro–Winkler parity: Winkler's canonical fixtures (the exact doubles
  * DuckDB's jaro_winkler_similarity returns), edge cases, SQL
  * registration, and whole-stage-codegen participation. */
class JaroWinklerSpec extends SparkSpec {
  import spark.implicits._

  private def jw(a: String, b: String): Double =
    Seq((a, b)).toDF("a", "b")
      .select(JaroWinklerExpr(col("a"), col("b"))).as[Double].head()

  test("matches the canonical Winkler fixtures bit-for-bit") {
    assert(jw("martha", "marhta") == 0.9611111111111111)
    assert(jw("dwayne", "duane") == 0.8400000000000001)
    assert(jw("DIXON", "DICKSONX") == 0.8133333333333332)
    assert(jw("same", "same") == 1.0)
  }

  test("boost applies only above the 0.7 jaro threshold") {
    // 'abcdef' vs 'fedcba': within-window matches only -> low jaro, no
    // prefix anyway; below-threshold values must come back unboosted
    val low = jw("abcdefgh", "zyxwvuts")
    assert(low == 0.0)
    // common 4-prefix with a tail edit: boosted above plain jaro
    val plainJaro = (8.0 / 9 + 8.0 / 8 + 8.0 / 8) / 3.0
    assert(jw("abcdwxyz9", "abcdwxyz") == plainJaro + (4 * 0.1) * (1 - plainJaro))
  }

  test("empty and null inputs") {
    assert(jw("", "") == 1.0)
    assert(jw("a", "") == 0.0)
    val r = Seq(("a", Option.empty[String])).toDF("a", "b")
      .select(JaroWinklerExpr(col("a"), col("b"))).collect()
    assert(r.head.isNullAt(0))
  }

  test("registered in SQL as graft_jaro_winkler") {
    graft.plans.GraftExtensions.register(spark)
    val v = spark.sql("SELECT graft_jaro_winkler('martha', 'marhta') AS s")
      .as[Double].head()
    assert(v == 0.9611111111111111)
  }

  test("expression participates in whole-stage codegen") {
    val df = Seq(("martha", "marhta"), ("dwayne", "duane")).toDF("a", "b")
      .repartition(2)
      .select(JaroWinklerExpr(col("a"), col("b")).as("s"))
    assert(df.collect().length == 2)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("WholeStageCodegen") || plan.matches("(?s).*\\*\\(\\d+\\) Project.*"))
  }
}
