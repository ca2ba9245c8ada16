package graft.plans

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native form of the engine's portable 60-bit content hash: the value of
  * the first 15 hex chars of md5(utf8(s)) — i.e. the top 60 bits of the
  * digest — as a non-negative long. Identical to
  * `conv(substring(md5(c),1,15),16,10)` (and to DuckDB's
  * `CAST('0x'||substr(md5(x),1,15) AS BIGINT)`) but skips materializing
  * the 32-char hex string and re-parsing it: digest bytes go straight to
  * a long. Used by every fingerprint / minhash / simhash / LSH band key,
  * so it sits in the innermost dedup loops.
  */
case class PortableHash60(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType | NullType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_hash60 requires a string argument, got ${t.sql}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_hash60"

  override def nullSafeEval(input: Any): Any =
    PortableHash60.hash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.PortableHash60.hash($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PortableHash60 {
  private val digests = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** Top 60 bits of md5 over the string's utf8 bytes, as a long. */
  def hash(s: UTF8String): Long = {
    val md = digests.get()
    md.reset()
    val d = md.digest(s.getBytes)
    // first 8 bytes big-endian, dropped low nibble = first 15 hex chars
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    v >>> 4
  }

  /** Column-API entry point. */
  def apply(c: Column): Column = Bridge.column(PortableHash60(Bridge.expression(c)))
}
