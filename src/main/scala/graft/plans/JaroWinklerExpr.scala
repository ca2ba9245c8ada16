package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Jaro–Winkler similarity (Winkler 1990): the record-linkage
  * scorer for short identifying strings (names, codes), with the
  * standard parameters — prefix scale p = 0.1, max common prefix 4,
  * boost only when jaro > 0.7.
  *
  * Operates on the raw UTF-8 BYTES (like DuckDB's
  * `jaro_winkler_similarity`, whose output this matches bit-for-bit —
  * fixed evaluation order `(m/|a| + m/|b| + (m−t)/m) / 3`, then
  * `j + (l·0.1)·(1−j)`); for ASCII corpora byte and character grain
  * coincide. No per-row allocation beyond two small boolean arrays, and
  * codegen keeps the call inside whole-stage-generated code — no UDF
  * serialization boundary in the scoring loop of a blocked
  * record-linkage join.
  */
case class JaroWinklerExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType | NullType, StringType | NullType) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_jaro_winkler requires string arguments, got (${l.sql}, ${r.sql})")
    }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_jaro_winkler"

  override def nullSafeEval(a: Any, b: Any): Any =
    JaroWinklerExpr.jw(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.plans.JaroWinklerExpr.jw($a, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object JaroWinklerExpr {

  /** Jaro–Winkler over UTF-8 bytes, bit-compatible with DuckDB. */
  def jw(a: UTF8String, b: UTF8String): Double = {
    val x = a.getBytes
    val y = b.getBytes
    val la = x.length
    val lb = y.length
    if (la == 0 && lb == 0) return 1.0
    if (la == 0 || lb == 0) return 0.0
    val md = math.max(math.max(la, lb) / 2 - 1, 0)
    val ma = new Array[Boolean](la)
    val mb = new Array[Boolean](lb)
    var m = 0
    var i = 0
    while (i < la) {
      var j = math.max(0, i - md)
      val hi = math.min(lb, i + md + 1)
      var found = false
      while (j < hi && !found) {
        if (!mb(j) && x(i) == y(j)) { ma(i) = true; mb(j) = true; m += 1; found = true }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var t = 0
    var k = 0
    i = 0
    while (i < la) {
      if (ma(i)) {
        while (!mb(k)) k += 1
        if (x(i) != y(k)) t += 1
        k += 1
      }
      i += 1
    }
    t /= 2
    val j0 = (m.toDouble / la + m.toDouble / lb + (m - t).toDouble / m) / 3.0
    if (j0 <= 0.7) return j0
    var l = 0
    val maxP = math.min(4, math.min(la, lb))
    while (l < maxP && x(l) == y(l)) l += 1
    j0 + (l * 0.1) * (1.0 - j0)
  }

  /** Column-API entry point. */
  def apply(a: Column, b: Column): Column =
    Bridge.column(JaroWinklerExpr(Bridge.expression(a), Bridge.expression(b)))
}
