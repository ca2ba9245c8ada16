package graft

import graft.operators.Bpe
import org.apache.spark.sql.functions._

class BpeSpec extends SparkSpec {
  import spark.implicits._

  test("applyMerge is greedy left-to-right, non-overlapping") {
    val df = Seq(Tuple1(Seq("a", "a", "a", "a", "a"))).toDF("syms")
    val out = df.select(Bpe.applyMerge(col("syms"), "a", "a").as("m"))
      .collect()(0).getSeq[String](0)
    // aaaaa → (aa)(aa)a — a fresh "aa" never re-merges in the same pass
    assert(out == Seq("aa", "aa", "a"))
  }

  test("train: merge order and final segmentation on a hand vocab") {
    // freqs: "low"×5, "lower"×2, "newest"×6, "widest"×3 (the Sennrich
    // worked example family). Pair counts round 1: (e,s)=9, (s,t)=9,
    // (w,e)=8, ... argmax tie (e s) vs (s t) → "e s" wins by pair ASC.
    val words = Seq(("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))
      .toDF("w", "freq")
    val (seg, merges) = Bpe.train(words, "w", "freq", k = 3)
    assert(merges.map(m => (m._1, m._2)) == Seq(("e", "s"), ("es", "t"), ("l", "o")))
    assert(merges.head._3 == 9L)
    val m = seg.select(col("w"), col("syms")).collect()
      .map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    assert(m("newest") == Seq("n", "e", "w", "est"))
    assert(m("widest") == Seq("w", "i", "d", "est"))
    assert(m("low") == Seq("lo", "w"))
    assert(m("lower") == Seq("lo", "w", "e", "r"))
  }

  test("train stops early when no pairs remain") {
    val words = Seq(("ab", 3L), ("a", 1L)).toDF("w", "freq")
    val (seg, merges) = Bpe.train(words, "w", "freq", k = 5)
    assert(merges.map(m => (m._1, m._2)) == Seq(("a", "b")))
    val syms = seg.filter(col("w") === "ab").select("syms")
      .collect()(0).getSeq[String](0)
    assert(syms == Seq("ab"))
  }
}
