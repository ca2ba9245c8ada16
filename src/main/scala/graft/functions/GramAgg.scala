package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Distributed Gram matrix Σ v·vᵀ over an embedding column — the one
  * corpus-wide pass a PCA / whitening / covariance pipeline needs. A
  * typed `Aggregator[IN, BUF, OUT]` whose buffer is the upper triangle
  * (dims·(dims+1)/2 longs) of the quantized outer-product sum: `reduce`
  * folds one vector in O(dims²) integer multiplies, `merge` is
  * elementwise addition — associative and commutative, so partials
  * combine map-side and the whole matrix costs ONE shuffle of 2,080
  * longs (dims = 64) no matter how many rows the corpus has.
  *
  * Determinism: coordinates quantize to integers at 1e4
  * (`floor(v·1e4 + 0.5)`), so every accumulation is exact integer math —
  * order-independent, bit-reproducible, and re-derivable by the DuckDB
  * oracle. Overflow bound: |vq| ≤ 1e4·maxabs; at maxabs ≈ 2 the
  * per-cell sum stays inside a signed long past 2×10¹⁰ rows — beyond
  * that, shard the aggregation (sum per shard, merge as BigInt).
  */
class GramAgg(dims: Int) extends Aggregator[Seq[Float], GramAgg.Buf, Seq[Long]] {
  import GramAgg.Buf
  private val cells = dims * (dims + 1) / 2

  override def zero: Buf = Buf(new Array[Long](cells))

  override def reduce(b: Buf, v: Seq[Float]): Buf = {
    val vq = new Array[Long](dims)
    var i = 0
    while (i < dims) {
      vq(i) = math.floor(v(i).toDouble * 1e4 + 0.5).toLong
      i += 1
    }
    var k = 0
    i = 0
    while (i < dims) {
      var j = i
      while (j < dims) {
        b.tri(k) += vq(i) * vq(j)
        k += 1; j += 1
      }
      i += 1
    }
    b
  }

  override def merge(a: Buf, c: Buf): Buf = {
    var k = 0
    while (k < cells) { a.tri(k) += c.tri(k); k += 1 }
    a
  }

  override def finish(b: Buf): Seq[Long] = b.tri.toSeq

  override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}

object GramAgg {
  final case class Buf(tri: Array[Long])

  /** Column form: one row out, the upper triangle in row-major order. */
  def column(c: org.apache.spark.sql.Column, dims: Int): org.apache.spark.sql.Column =
    org.apache.spark.sql.functions.udaf(new GramAgg(dims)).apply(c)
}
