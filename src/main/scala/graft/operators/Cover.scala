package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Greedy maximum-coverage selection (the classic (1−1/e) greedy for
  * submodular coverage): pick k sets (e.g. corpus sources) maximizing the
  * number of distinct elements (e.g. vocabulary tokens) covered — the
  * diversity-driven selection step of a corpus mix build, complementing
  * importance weighting (Dsir) and temperature mixing.
  *
  * Scale shape: the only corpus-scale work is building the DISTINCT
  * (set, element) membership relation once (one shuffle). Each of the k
  * rounds is a membership-grain anti-join + count aggregate with a 1-row
  * bounded collect for the argmax — the k-means/BPE driver-coordination
  * shape. The covered-element set stays a DataFrame (never collected);
  * round r filters membership by the r selected set NAMES (a tiny
  * broadcast literal list).
  */
object Cover {

  /** One selection round: (round, set, marginalGain, coveredTotal). */
  final case class Pick(round: Int, set: String, gain: Long, coveredTotal: Long)

  /** Greedy k-round max coverage over the distinct membership relation
    * `(setCol, elemCol)`. Ties break (gain DESC, set ASC) so the
    * trajectory is deterministic. Stops early when no set adds coverage. */
  def greedyCover(membership: DataFrame, setCol: String, elemCol: String,
                  k: Int): Seq[Pick] = {
    val st = membership.select(col(setCol).as("s"), col(elemCol).as("e")).distinct()
    var selected = Vector.empty[String]
    var covered = 0L
    val picks = Seq.newBuilder[Pick]
    var r = 1
    var done = false
    while (r <= k && !done) {
      val coveredElems = st.filter(col("s").isin(selected: _*)).select("e").distinct()
      val top = st
        .filter(!col("s").isin(selected: _*))
        .join(coveredElems, Seq("e"), "left_anti")
        .groupBy("s").agg(count(lit(1)).as("gain"))
        .orderBy(desc("gain"), asc("s"))
        .limit(1)
        .collect()                                     // exactly one row
      if (top.isEmpty || top(0).getLong(1) == 0L) done = true
      else {
        val (src, gain) = (top(0).getString(0), top(0).getLong(1))
        selected :+= src
        covered += gain
        picks += Pick(r, src, gain, covered)
      }
      r += 1
    }
    picks.result()
  }
}
