package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Group-level SimHash: aggregates one 60-bit content hash per row into a
  * single `bits`-bit sketch for the whole group — bit i is set when at
  * least half the members have bit i set (ties → set, matching
  * [[graft.operators.Dedup.simhash]]'s per-document rule).
  *
  * A genuine typed `Aggregator[IN, BUF, OUT]` (SURVEY §2.7's custom-UDAF
  * surface): the buffer is the per-bit vote vector plus a count, `merge`
  * is elementwise addition — associative and commutative, so partials
  * combine map-side and the group sketch costs one shuffle of 33 longs
  * per group regardless of group size. Use: cluster/source-level
  * fingerprints for corpus-vs-corpus near-dup screening.
  */
class SimhashAgg(bits: Int = 32) extends Aggregator[Long, SimhashAgg.Buf, Long] {
  import SimhashAgg.Buf

  override def zero: Buf = Buf(new Array[Long](bits), 0L)

  override def reduce(b: Buf, hash: Long): Buf = {
    var i = 0
    while (i < bits) {
      if (((hash >>> i) & 1L) == 1L) b.votes(i) += 1
      i += 1
    }
    Buf(b.votes, b.n + 1)
  }

  override def merge(a: Buf, c: Buf): Buf = {
    var i = 0
    while (i < bits) { a.votes(i) += c.votes(i); i += 1 }
    Buf(a.votes, a.n + c.n)
  }

  override def finish(b: Buf): Long = {
    var sketch = 0L
    var i = 0
    while (i < bits) {
      if (2 * b.votes(i) >= b.n) sketch |= (1L << i)
      i += 1
    }
    if (b.n == 0) 0L else sketch
  }

  override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
  override def outputEncoder: Encoder[Long] = Encoders.scalaLong
}

object SimhashAgg {
  final case class Buf(votes: Array[Long], n: Long)

  /** Column form: `df.groupBy(...).agg(SimhashAgg.column(col("h")))`. */
  def column(c: org.apache.spark.sql.Column, bits: Int = 32): org.apache.spark.sql.Column =
    org.apache.spark.sql.functions.udaf(new SimhashAgg(bits)).apply(c)
}
