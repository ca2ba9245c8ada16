package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._

/** Native codegen'd quantized dot product over two `array<float>` columns:
  * Σᵢ floor(aᵢ·bᵢ·10¹² + 0.5) as a long — semantically identical to the
  * `zip_with`/`aggregate` formulation in
  * [[graft.functions.VectorFns.dotQ]] (src reference:
  * /root/reference has no vector ops; this is a north-star operator).
  *
  * WHY a custom Expression: higher-order array functions are
  * CodegenFallback — every element round-trips through an interpreted
  * lambda with boxing. This expression compiles to a tight primitive
  * loop inside whole-stage codegen (one JIT-friendly method per query),
  * which matters when similarity search scores millions of candidate
  * pairs. Result is bit-identical to the portable formulation, so the
  * DuckDB oracle is unaffected.
  *
  * Null semantics mirror zip_with+aggregate: null array, mismatched
  * lengths (zip_with pads with null), or any null element → null.
  */
case class DotQExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType, _) => true
      case NullType => true // untyped NULL literal → null result
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_dotq requires (array<float>, array<float>), got (${left.dataType.sql}, ${right.dataType.sql})")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_dotq"
  /** Can be null on NON-null inputs (length mismatch, null element) —
    * without this the codegen'd null-set writes to a constant. */
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) return null
    var acc = 0L
    var i = 0
    val n = x.numElements()
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc += math.floor(x.getFloat(i).toDouble * y.getFloat(i).toDouble * 1e12 + 0.5).toLong
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $acc = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $acc += (long) Math.floor((double) $a.getFloat($i) * (double) $b.getFloat($i) * 1.0E12 + 0.5);
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object DotQExpr {
  /** Column-API entry point. */
  def apply(a: Column, b: Column): Column =
    Bridge.column(DotQExpr(Bridge.expression(a), Bridge.expression(b)))
}
