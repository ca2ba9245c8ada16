package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._

/** Native minhash signature: given the array of base hashes (one portable
  * 60-bit hash per distinct shingle, already reduced mod p), compute all
  * `numHashes` minima of the affine family (h·aᵢ+bᵢ) mod p in ONE pass
  * over the array — replacing numHashes separate interpreted
  * `transform`+`array_min` evaluations. Seeds fixed by
  * [[graft.operators.Dedup.minhashSeeds]]; values bit-identical to the
  * composed-builtin form, so the DuckDB oracle is unaffected.
  *
  * Null array → null; null element → skipped (matches array_min's
  * null-skipping over transform results — transform of a null element
  * yields null, which array_min ignores).
  */
case class MinhashSigExpr(child: Expression, numHashes: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) | NullType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_minhash requires array<bigint> of base hashes, got ${t.sql}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash"
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val sig = MinhashSigExpr.signature(input.asInstanceOf[ArrayData], numHashes)
    if (sig == null) null else new GenericArrayData(sig)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val sig = ctx.freshName("sig")
      s"""
         |long[] $sig = graft.plans.MinhashSigExpr.signature($c, $numHashes);
         |if ($sig == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($sig);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinhashSigExpr {
  import graft.operators.Dedup.{minhashSeeds, MinhashP}

  private val seedCache = new java.util.concurrent.ConcurrentHashMap[Int, (Array[Long], Array[Long])]()
  private def seeds(n: Int): (Array[Long], Array[Long]) =
    seedCache.computeIfAbsent(n, k => {
      val s = minhashSeeds(k)
      (s.map(_._1).toArray, s.map(_._2).toArray)
    })

  /** One-pass signature; empty array → null (no shingles → no signature;
    * callers guarantee ≥1 shingle). */
  def signature(hashes: ArrayData, numHashes: Int): Array[Long] = {
    val n = hashes.numElements()
    if (n == 0) return null
    val (as, bs) = seeds(numHashes)
    val sig = Array.fill(numHashes)(Long.MaxValue)
    var j = 0
    while (j < n) {
      if (!hashes.isNullAt(j)) {
        val h = hashes.getLong(j)
        var i = 0
        while (i < numHashes) {
          val v = (h * as(i) + bs(i)) % MinhashP
          if (v < sig(i)) sig(i) = v
          i += 1
        }
      }
      j += 1
    }
    if (sig(0) == Long.MaxValue) null else sig // all-null array
  }

  def apply(c: Column, numHashes: Int): Column =
    Bridge.column(MinhashSigExpr(Bridge.expression(c), numHashes))
}
