package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Dense-vector primitives over `array<float>` embedding columns, as pure
  * Column expressions (`zip_with`/`aggregate` fold left-to-right, so the
  * summation order is fixed and results are reproducible across engines up
  * to double rounding — we round similarity outputs to 6 decimals at query
  * boundaries).
  */
object VectorFns {

  /** Σ aᵢ·bᵢ in double (floats upcast first — keeps error ~1e-15 rel). */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast(DoubleType) * y.cast(DoubleType)),
      lit(0.0), (acc, v) => acc + v)

  /** ‖a‖₂ */
  def l2Norm(a: Column): Column =
    sqrt(aggregate(a, lit(0.0), (acc, v) => acc + v.cast(DoubleType) * v.cast(DoubleType)))

  /** Cosine similarity; 0.0 when either norm is 0. */
  def cosine(a: Column, b: Column): Column = {
    val d = dot(a, b) / (l2Norm(a) * l2Norm(b))
    when(l2Norm(a) === 0.0 || l2Norm(b) === 0.0, 0.0).otherwise(d)
  }

  /** Squared euclidean distance. */
  def sqDist(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => {
        val d = x.cast(DoubleType) - y.cast(DoubleType)
        d * d
      }),
      lit(0.0), (acc, v) => acc + v)

  // ── deterministic (oracle-stable) variants ───────────────────────────
  // Double addition is order-sensitive; for oracle-checked queries we
  // quantize each elementwise product to integer 1e-12 units (IEEE double
  // multiply is exactly specified, floor(x·1e12+0.5) is deterministic) and
  // sum exact integers — bit-identical in any engine, error ~1e-10, far
  // below the 6-decimal rounding at query boundaries.

  /** Σ round(aᵢ·bᵢ·1e12) as long. */
  def dotQ(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) =>
        floor(x.cast(DoubleType) * y.cast(DoubleType) * lit(1e12) + lit(0.5)).cast(LongType)),
      lit(0L), (acc, v) => acc + v)

  /** Cosine similarity from quantized integer sums; 0.0 on zero norms.
    * Deterministic across engines (see [[dotQ]]). */
  def cosineQ(a: Column, b: Column): Column = {
    val naq = dotQ(a, a)
    val nbq = dotQ(b, b)
    when(naq === 0L || nbq === 0L, 0.0)
      .otherwise(dotQ(a, b).cast(DoubleType) /
        sqrt(naq.cast(DoubleType) * nbq.cast(DoubleType)))
  }

  /** Johnson–Lindenstrauss random projection with deterministic ±1 planes
    * (`Similarity.signPlanes`): out[k] = (x·pₖ) / √K, each dot via the
    * quantized-integer native [[graft.plans.DotQExpr]] and rounded at
    * `digits` — so the reduced vectors are bit-identical in any engine.
    * The JL scale factor 1/√K preserves expected squared norms; ±1
    * entries make the projection a sequence of signed sums (no float
    * matrix to ship — the planes derive from the xorshift literals).
    * Per-row projection, no shuffle: the dim-reduction front of an ANN /
    * clustering pipeline at any corpus size. */
  def randomProject(emb: Column, planes: Array[Array[Float]], digits: Int = 6): Column =
    array(scala.collection.immutable.ArraySeq.unsafeWrapArray(planes).map(p =>
      Det.roundAt(graft.plans.DotQExpr(emb, lit(p)).cast(DoubleType) /
        lit(1e12 * math.sqrt(planes.length.toDouble)), digits)): _*)

  /** Per-vector max-abs scale for symmetric int8 quantization:
    * `127 / max|x|`, or 1 for the all-zero vector (whose codes are all
    * zero anyway). Pure double IEEE — engine-exact. */
  def int8Scale(emb: Column): Column = {
    val maxabs = array_max(transform(emb, x => abs(x.cast(DoubleType))))
    when(maxabs > lit(0.0), lit(127.0) / maxabs).otherwise(lit(1.0))
  }

  /** Symmetric int8 quantization codes — `floor(x·scale + 0.5)` per
    * element (round-half-up, the same portable formula as
    * [[graft.functions.Det.roundAt]], so Spark and any SQL engine agree
    * bit-for-bit). Codes lie in [-127, 127]; the 4× storage cut is what
    * makes a 100 TB embedding corpus ANN-servable, and the companion
    * [[int8Scale]] column is all a reader needs to dequantize. */
  def quantizeInt8(emb: Column, scale: Column): Column =
    transform(emb, x => floor(x.cast(DoubleType) * scale + lit(0.5)).cast("long"))
}
