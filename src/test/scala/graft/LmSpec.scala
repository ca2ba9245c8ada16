package graft

import graft.operators.{Lm, Sampling}
import org.apache.spark.sql.functions._

/** Unigram-LM cross-entropy and weighted sampling: both checked against
  * independent driver-side re-derivations from first principles (plain
  * Scala collections + java MessageDigest), not against the operators'
  * own building blocks. */
class LmSpec extends SparkSpec {
  import spark.implicits._

  // The portable 60-bit hash, re-derived independently of PortableHash60.
  private def md5Hash60(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(d.take(8).map("%02x".format(_)).mkString.take(15), 16)
  }

  private def round(x: Double, digits: Int): Double = {
    val p = math.pow(10, digits)
    math.floor(x * p + 0.5) / p
  }

  test("unigramXent matches a from-first-principles recomputation") {
    val corpus = Seq(
      (1L, "the cat sat on the mat"),
      (2L, "the dog sat"),
      (3L, "zyx qwv"), // rare tokens → most surprising doc
      (4L, ""))        // zero tokens → absent from output
    val got = Lm.unigramXent(corpus.toDF("doc_id", "text"), "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap

    val toks = corpus.map { case (id, t) =>
      id -> t.toLowerCase.trim.split("\\s+").filter(_.nonEmpty).toSeq
    }
    val cnt = toks.flatMap(_._2).groupBy(identity).map { case (k, v) => k -> v.size }
    val n = cnt.values.sum.toDouble
    val v = cnt.size.toDouble
    val expected = toks.filter(_._2.nonEmpty).map { case (id, ts) =>
      val per = ts.map(t => round(-math.log((cnt(t) + 1.0) / (n + v)), 6))
      // decimal-exact sum of 6dp values: scale to micro-units in Long
      val sumMicros = per.map(x => math.rint(x * 1e6).toLong).sum
      id -> round(sumMicros / 1e6 / ts.size, 4)
    }.toMap
    assert(got == expected)
    assert(!got.contains(4L), "zero-token doc must be absent")
    // rare-token doc is the most surprising one
    assert(got(3L) == got.values.max)
  }

  test("weightedSample: deterministic, honors weights, equals full-sort top-k") {
    val rows = (1L to 200L).map(i => (i, if (i % 10 == 0) 5.0 else 0.2))
    val df = rows.toDF("id", "w")
    val got = Sampling.weightedSample(df, "id", "w", 25)
      .collect().map(r => (r.getLong(0), r.getDouble(2))).toSeq
    // independent re-derivation: u from md5, key = ln(u)/w, top-25
    val expected = rows.map { case (id, w) =>
      val u = (md5Hash60(s"$id:ws") % 1000000L + 0.5) / 1000000.0
      (id, round(math.log(u) / w, 6))
    }.sortBy { case (id, key) => (-key, id) }.take(25)
    assert(got == expected)
    // heavy rows are 10% of the corpus (20/200); uniform sampling would
    // put ~2.5 in a 25-row sample — w=5.0 must over-represent them hard
    val heavy = got.count(_._1 % 10 == 0)
    assert(heavy >= 8, s"expected heavy-weight rows over-represented, got $heavy/25")
    // rerun is bit-identical (retry-stability)
    val again = Sampling.weightedSample(df, "id", "w", 25)
      .collect().map(r => (r.getLong(0), r.getDouble(2))).toSeq
    assert(again == got)
  }

  test("weightedSamplePerGroup: per-group top-k matches recomputation, WindowGroupLimit plan") {
    val rows = (1L to 120L).map(i => (i, s"g${i % 3}", 0.1 + (i % 7) * 0.1))
    val df = rows.toDF("id", "grp", "w")
    val got = Sampling.weightedSamplePerGroup(df, "grp", "id", "w", 4)
      .collect().map(r => (r.getString(1), r.getLong(0), r.getLong(4))).toSet
    val expected = rows.map { case (id, g, w) =>
      val u = (md5Hash60(s"$id:ws") % 1000000L + 0.5) / 1000000.0
      (g, id, round(math.log(u) / w, 6))
    }.groupBy(_._1).flatMap { case (g, xs) =>
      xs.sortBy { case (_, id, key) => (-key, id) }.take(4)
        .zipWithIndex.map { case ((_, id, _), i) => (g, id, i + 1L) }
    }.toSet
    assert(got == expected)
    val plan = Sampling.weightedSamplePerGroup(df, "grp", "id", "w", 4)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), plan)
  }

  test("weightedSample compiles to a top-k, not a full sort") {
    val df = (1L to 50L).toDF("id").withColumn("w", lit(1.0))
    val plan = Sampling.weightedSample(df, "id", "w", 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("temperatureRebalance flattens shares toward the tail, caps at n_total") {
    // head domain 900 rows, tail domain 100 → proportional shares 90/10,
    // √-scaled shares 75/25: the tail's share must grow, and no target
    // may exceed its domain size or the budget.
    val df = ((1 to 900).map(i => (i.toLong, "head")) ++
      (1001 to 1100).map(i => (i.toLong, "tail"))).toDF("id", "grp")
    def run() = Sampling.temperatureRebalance(df, "grp", "id", budget = 200L)
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    val rows = run()
    val (headN, headT, _, _) = rows("head")
    val (tailN, tailT, _, _) = rows("tail")
    assert(headN == 900 && tailN == 100)
    assert(headT + tailT <= 200)
    assert(headT <= headN && tailT <= tailN)
    // √900=30, √100=10 → targets 200·30/40=150 and 200·10/40=50
    assert(headT == 150 && tailT == 50, s"got $headT/$tailT")
    // deterministic: an identical second run selects the identical rows
    assert(run() == rows)
  }
}
