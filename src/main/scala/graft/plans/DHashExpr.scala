package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._

/** Native difference-hash (dHash) over a decoded grayscale tile riding in
  * a `binary` column: the standard perceptual fingerprint for image
  * near-duplicate detection. The payload is read as a row-major
  * `height × width` gray tile (one unsigned byte per pixel); bit
  * `r*(width-1)+c` of the result is 1 iff pixel `(r, c+1)` is brighter
  * than pixel `(r, c)`. The canonical 8×9 tile yields exactly 64 bits in
  * one `long` — two near-identical images differ in a handful of bits
  * (hamming via `bit_count(xor)`), unrelated images in ~32.
  *
  * One fused pass over the payload bytes (eval and codegen share
  * [[DHashExpr.dhash]]) instead of `2·bits` interpreted
  * substring+conv byte reads. Payload shorter than `width·height`
  * (truncated/corrupt image) → null, so malformed media drops out of the
  * banding join instead of polluting a bucket.
  *
  * Reference analogue: the reference pipeline has no image path at all
  * (its EDA is tabular pandas); this is north-star surface for the
  * multimodal training-data pipeline, mirroring the classic dHash
  * construction (Krawetz, "Kind of Like That", 2013 — public algorithm).
  */
case class DHashExpr(child: Expression, tileW: Int, tileH: Int)
    extends UnaryExpression {
  require(tileW >= 2 && tileH >= 1 && (tileW - 1) * tileH <= 64,
    s"dhash tile ${tileW}x$tileH must fit 64 bits")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType | NullType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_dhash requires binary payload, got ${t.sql}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_dhash"
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[Array[Byte]]
    if (bytes.length < tileW * tileH) null
    else java.lang.Long.valueOf(DHashExpr.dhash(bytes, tileW, tileH))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |if ($c.length < ${tileW * tileH}) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = graft.plans.DHashExpr.dhash($c, $tileW, $tileH);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object DHashExpr {
  /** Row-major gradient bits, bit k = row k/(width-1), col k%(width-1);
    * unsigned byte compare. Callers guarantee length ≥ width*height. */
  def dhash(bytes: Array[Byte], width: Int, height: Int): Long = {
    var acc = 0L
    var r = 0
    while (r < height) {
      val base = r * width
      var c = 0
      while (c < width - 1) {
        if ((bytes(base + c + 1) & 0xff) > (bytes(base + c) & 0xff))
          acc |= 1L << (r * (width - 1) + c)
        c += 1
      }
      r += 1
    }
    acc
  }

  def apply(c: Column, width: Int, height: Int): Column =
    Bridge.column(DHashExpr(Bridge.expression(c), width, height))
}
