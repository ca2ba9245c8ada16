package graft

import graft.operators.Dsir
import org.apache.spark.sql.functions._

/** DSIR importance scoring/selection checked against a from-first-
  * principles driver-side recomputation (plain Scala collections + java
  * MessageDigest — independent of PortableHash60 and the operator's own
  * aggregates). */
class DsirSpec extends SparkSpec {
  import spark.implicits._

  private def md5Hash60(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(d.take(8).map("%02x".format(_)).mkString.take(15), 16)
  }

  private def round(x: Double, digits: Int): Double = {
    val p = math.pow(10, digits)
    math.floor(x * p + 0.5) / p
  }

  private val corpus = Seq(
    (1L, "the cat sat on the mat", true),   // target
    (2L, "the dog sat on the rug", true),   // target
    (3L, "the cat sat quietly", false),     // target-like raw doc
    (4L, "zyx qwv foo bar", false),         // nothing like the target
    (5L, "", false))                        // zero tokens → absent

  private val B = 16

  private def expectedScores: Map[Long, (Long, Double)] = {
    val toks = corpus.map { case (id, t, tgt) =>
      (id, t.toLowerCase.trim.split("\\s+").filter(_.nonEmpty).toSeq
        .map(tok => md5Hash60(tok) % B), tgt)
    }
    val all = toks.flatMap(_._2)
    val tgtToks = toks.filter(_._3).flatMap(_._2)
    val cRaw = all.groupBy(identity).map { case (k, v) => k -> v.size }
    val cTgt = tgtToks.groupBy(identity).map { case (k, v) => k -> v.size }
    val (nRaw, nTgt) = (all.size.toDouble, tgtToks.size.toDouble)
    toks.filter(_._2.nonEmpty).map { case (id, fs, _) =>
      val per = fs.map { f =>
        round(math.log((cTgt.getOrElse(f, 0) + 1.0) / (nTgt + B)), 6) -
          round(math.log((cRaw(f) + 1.0) / (nRaw + B)), 6)
      }
      val sumMicros = per.map(x => math.rint(x * 1e6).toLong).sum
      id -> (fs.size.toLong, round(sumMicros / 1e6, 4))
    }.toMap
  }

  test("importanceScores matches a from-first-principles recomputation") {
    val got = Dsir.importanceScores(corpus.toDF("doc_id", "text", "tgt"),
        "doc_id", "text", isTarget = col("tgt"), buckets = B)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got == expectedScores)
    assert(!got.contains(5L), "zero-token doc must be absent")
    // the target-like raw doc must outscore the gibberish one
    assert(got(3L)._2 > got(4L)._2)
  }

  test("select keeps only raw-side docs, in importance order, capped at k") {
    val sel = Dsir.select(corpus.toDF("doc_id", "text", "tgt"),
        "doc_id", "text", isTarget = col("tgt"), k = 1, buckets = B)
      .collect().map(_.getLong(0)).toSeq
    assert(sel == Seq(3L), s"top-1 raw doc should be the target-like one, got $sel")
    val all = Dsir.select(corpus.toDF("doc_id", "text", "tgt"),
        "doc_id", "text", isTarget = col("tgt"), k = 10, buckets = B)
      .collect().map(_.getLong(0)).toSet
    assert(all == Set(3L, 4L), "targets and the empty doc are never candidates")
  }
}
