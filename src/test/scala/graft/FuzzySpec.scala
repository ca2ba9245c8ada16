package graft

import graft.operators.Fuzzy
import org.apache.spark.sql.functions._

class FuzzySpec extends SparkSpec {
  import spark.implicits._

  test("deletionKeys: identity plus each single deletion, deduplicated, empty-safe") {
    val r = Seq("abc", "aa", "").toDF("s")
      .select(Fuzzy.deletionKeys(col("s")).as("k"))
      .collect().map(_.getAs[scala.collection.Seq[String]]("k").toList).toList
    assert(r(0) == List("abc", "bc", "ac", "ab"))
    assert(r(1) == List("aa", "a")) // both deletions collapse to one key
    assert(r(2) == List(""))        // no descending sequence() fabrication
  }

  test("editJoinPairs matches the brute-force levenshtein self-join exactly") {
    val df = Seq(
      (1L, "smith"), (2L, "smyth"),   // substitution: dist 1
      (3L, "smiths"),                 // insertion vs 1: dist 1; vs 2: dist 2
      (4L, "jones"),                  // unrelated
      (5L, "smith")                   // exact dup of 1
    ).toDF("id", "name")
    val got = Fuzzy.editJoinPairs(df, "id", "name")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    // brute-force reference over the same rows
    val rows = Seq((1L, "smith"), (2L, "smyth"), (3L, "smiths"), (4L, "jones"), (5L, "smith"))
    val want = (for {
      (ia, sa) <- rows; (ib, sb) <- rows if ia < ib
      d = {
        val m = Array.tabulate(sa.length + 1, sb.length + 1)((i, j) => if (i == 0) j else if (j == 0) i else 0)
        for (i <- 1 to sa.length; j <- 1 to sb.length)
          m(i)(j) = math.min(math.min(m(i - 1)(j) + 1, m(i)(j - 1) + 1),
            m(i - 1)(j - 1) + (if (sa(i - 1) == sb(j - 1)) 0 else 1))
        m(sa.length)(sb.length)
      } if d <= 1
    } yield (ia, ib, d)).toSet
    assert(got == want)
    assert(got.contains((1L, 5L, 0)) && got.contains((1L, 2L, 1)) && got.contains((1L, 3L, 1)))
    assert(!got.exists(p => p._1 == 4L || p._2 == 4L))
  }
}
