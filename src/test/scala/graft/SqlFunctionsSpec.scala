package graft

import graft.plans.{MinhashSigExpr, WordPieceExpr}
import org.apache.spark.sql.functions._

/** SQL-surface parity for the literal-parameterized native expressions:
  * `graft_minhash(hashes, n)` and `graft_wordpiece(word, vocab)` must
  * resolve through the function registry and produce bit-identical
  * results to the Column-API constructors, and non-literal scalar
  * params must be rejected at analysis, not crash an executor. */
class SqlFunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("graft_minhash via SQL matches the Column API signature") {
    val df = Seq(Seq(7L, 19L, 23L), Seq(104729L, 1299709L)).toDF("hb")
    val api = df.select(MinhashSigExpr(col("hb"), 8).as("sig"))
      .collect().map(_.getSeq[Long](0))
    val sql = df.selectExpr("graft_minhash(hb, 8) AS sig")
      .collect().map(_.getSeq[Long](0))
    assert(api.toSeq == sql.toSeq)
  }

  test("graft_wordpiece via SQL matches the Column API encode") {
    val vocab = Seq("a", "b", "t", "le", "tab", "spark")
    val df = Seq("spark", "table", "a!b").toDF("w")
    val api = df.select(WordPieceExpr(col("w"), vocab).as("p"))
      .collect().map(_.getSeq[String](0))
    val sql = df.selectExpr("graft_wordpiece(w, array('a','b','t','le','tab','spark')) AS p")
      .collect().map(_.getSeq[String](0))
    assert(api.toSeq == sql.toSeq)
  }

  test("non-literal scalar params fail at resolution with a clear message") {
    val df = Seq((Seq(1L), 4)).toDF("hb", "n")
    val e1 = intercept[Exception](df.selectExpr("graft_minhash(hb, n)").collect())
    assert(e1.getMessage.contains("must be a literal"))
    val e2 = intercept[Exception](
      Seq(("w", Seq("a"))).toDF("w", "v").selectExpr("graft_wordpiece(w, v)").collect())
    assert(e2.getMessage.contains("must be a literal"))
  }
}
