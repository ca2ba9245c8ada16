package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Count-min sketch: fixed-size frequency summary of an unbounded key
  * stream (Cormode & Muthukrishnan 2005). `depth` hash rows × `width`
  * counters; every occurrence increments one counter per row; a key's
  * estimate is the MINIMUM of its `depth` counters — always ≥ the true
  * count (counters only ever over-count), and over by at most ~N/width
  * per row in expectation (N = stream length), so the min of `depth`
  * independent rows is tight for heavy hitters.
  *
  * A genuine typed `Aggregator[IN, BUF, OUT]`: the buffer is the flat
  * counter matrix, `merge` is elementwise addition — associative and
  * commutative, so partials combine map-side and the sketch costs one
  * shuffle of depth×width longs TOTAL regardless of stream size. That is
  * the 100 TB point: exact per-key counts of a high-cardinality column
  * shuffle one row per key; the sketch shuffles 32 KB, and sketches of
  * disjoint shards merge by addition (cross-day / cross-corpus roll-ups
  * without re-reading either side).
  *
  * Determinism: hash rows are fixed affine maps over the caller-supplied
  * portable 60-bit key hash ([[TextFns.portableHash]]) — same data, same
  * sketch, in any engine and any partitioning. [[CountMinAgg.estimate]]
  * reproduces the row indexing as Column arithmetic, so estimates read
  * straight out of the aggregated array in-plan (no driver round trip).
  */
class CountMinAgg(depth: Int, width: Int)
    extends Aggregator[Long, CountMinAgg.Buf, Array[Long]] {
  import CountMinAgg.{Buf, rowIndex}

  override def zero: Buf = Buf(new Array[Long](depth * width))

  override def reduce(b: Buf, keyHash: Long): Buf = {
    var i = 0
    while (i < depth) {
      b.cells(i * width + rowIndex(keyHash, i, width)) += 1
      i += 1
    }
    b
  }

  override def merge(a: Buf, c: Buf): Buf = {
    var i = 0
    while (i < a.cells.length) { a.cells(i) += c.cells(i); i += 1 }
    a
  }

  override def finish(b: Buf): Array[Long] = b.cells

  override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
  override def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}

object CountMinAgg {
  final case class Buf(cells: Array[Long])

  /** Same 31-bit prime as the MinHash family — affine maps below it never
    * overflow a long. */
  private val P: Long = 2147483647L

  /** Row i's counter slot for a key hash: ((aᵢ·(h mod p) + bᵢ) mod p) mod
    * width. Seeds are fixed (offset from the MinHash family's so the two
    * sketches are independent); aᵢ odd so the map is a bijection mod 2ᵏ. */
  private def seeds(i: Int): (Long, Long) = {
    val a = (((i + 101L) * 2654435761L) % P) | 1L
    val b = ((i + 101L) * 1099511628211L) % P
    (a, b)
  }

  private[graft] def rowIndex(keyHash: Long, i: Int, width: Int): Int = {
    val (a, b) = seeds(i)
    (((a * (keyHash % P) + b) % P) % width).toInt
  }

  /** The same row indexing as Column arithmetic (for in-plan reads). */
  private def rowIndexCol(keyHash: Column, i: Int, width: Int): Column = {
    val (a, b) = seeds(i)
    (lit(a) * (keyHash % lit(P)) + lit(b)) % lit(P) % lit(width)
  }

  /** Column form: `df.agg(CountMinAgg.column(col("h"), 4, 1024))` where
    * `h` is the portable hash of the counted key. */
  def column(c: Column, depth: Int = 4, width: Int = 1024): Column =
    udaf(new CountMinAgg(depth, width)).apply(c)

  /** Point estimate for a key hash against an aggregated sketch array:
    * min over rows of the key's counter (1-based `element_at`). */
  def estimate(sketch: Column, keyHash: Column, depth: Int = 4, width: Int = 1024): Column =
    least((0 until depth).map(i =>
      element_at(sketch, (lit(i * width) + rowIndexCol(keyHash, i, width) + 1).cast("int"))): _*)
}
