package graft

import graft.plans.WordPieceExpr
import org.apache.spark.sql.functions._

/** Greedy longest-match WordPiece encode: match semantics, UNK handling,
  * and codegen/interpreted parity. */
class WordPieceSpec extends SparkSpec {
  import spark.implicits._

  private val vocab = Seq("a", "b", "c", "k", "l", "s", "p", "r", "t", "e",
    "ab", "le", "ta", "spark", "tab", "park")

  private def enc(words: String*): Seq[Seq[String]] =
    words.toDF("w").select(WordPieceExpr(col("w"), vocab).as("p"))
      .collect().map(_.getSeq[String](0).toSeq).toSeq

  test("greedy longest prefix wins at each position") {
    // 'tab' beats 'ta' at pos 0 of "table"; whole-word "spark" beats "sp..."
    assert(enc("spark", "table", "cat") ==
      Seq(Seq("spark"), Seq("tab", "le"), Seq("c", "a", "t")))
  }

  test("unknown characters emit [UNK] and advance one position") {
    assert(enc("a!b", "??") ==
      Seq(Seq("a", "[UNK]", "b"), Seq("[UNK]", "[UNK]")))
  }

  test("empty string encodes to an empty array") {
    assert(enc("") == Seq(Seq()))
  }

  test("greedy is not optimal: longest-at-position, not fewest-pieces") {
    // "tablee": greedy takes 'tab','le','e' (3) though 'ta','b','le','e'
    // exists — asserts we implement WordPiece's greedy, not a DP
    assert(enc("tablee") == Seq(Seq("tab", "le", "e")))
  }

  test("interpreted eval matches codegen output") {
    val words = Seq("spark", "table", "cat", "a!b", "parkspark", "tableta")
    val df = words.toDF("w")
    val viaCodegen = df.select(WordPieceExpr(col("w"), vocab).as("p"))
      .collect().map(_.getSeq[String](0).toSeq).toSeq
    val prev = spark.conf.get("spark.sql.codegen.wholeStage")
    try {
      spark.conf.set("spark.sql.codegen.wholeStage", "false")
      spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
      val interpreted = df.select(WordPieceExpr(col("w"), vocab).as("p"))
        .collect().map(_.getSeq[String](0).toSeq).toSeq
      assert(viaCodegen == interpreted)
    } finally {
      spark.conf.set("spark.sql.codegen.wholeStage", prev)
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
  }
}
