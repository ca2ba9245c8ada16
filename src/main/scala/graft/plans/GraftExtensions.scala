package graft.plans

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String

/** Session extension wiring for the engine's native expressions, usable
  * two ways:
  *
  *  - cluster-wide: `spark.sql.extensions=graft.plans.GraftExtensions`
  *    (or `.withExtensions(new GraftExtensions)`) — functions exist in
  *    every session's SQL namespace;
  *  - per-session: `GraftExtensions.register(spark)` for an already-built
  *    session (notebooks, tests).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.functions.foreach(ext.injectFunction)
    // band-only inner joins → bucketed equi-joins (opt-in via
    // spark.graft.rangejoin.bucketWidth; inert otherwise)
    ext.injectOptimizerRule(_ => RangeJoinRule)
  }
}

object GraftExtensions {
  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[DotQExpr].getName, "", name, usage, "", "", "", "", "", "", "built-in")

  val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("graft_dotq"),
      info("graft_dotq",
        "graft_dotq(a, b) - quantized dot product of two float arrays: sum of round(a_i*b_i*1e12) as bigint."),
      (args: Seq[Expression]) => DotQExpr(args(0), args(1))),
    (FunctionIdentifier("graft_hash60"),
      info("graft_hash60",
        "graft_hash60(s) - portable 60-bit content hash: value of the first 15 hex chars of md5(s) as bigint."),
      (args: Seq[Expression]) => PortableHash60(args(0))),
    (FunctionIdentifier("graft_jaro_winkler"),
      info("graft_jaro_winkler",
        "graft_jaro_winkler(a, b) - Jaro-Winkler similarity over utf8 bytes (p=0.1, prefix<=4, boost iff jaro>0.7)."),
      (args: Seq[Expression]) => JaroWinklerExpr(args(0), args(1))),
    (FunctionIdentifier("graft_minhash"),
      info("graft_minhash",
        "graft_minhash(hashes, n) - n-element minhash signature over an array<bigint> of base " +
          "hashes: element i is min((h*a_i + b_i) mod p) with the engine's fixed seed family."),
      (args: Seq[Expression]) =>
        MinhashSigExpr(args(0), foldToInt(args(1), "graft_minhash", "n"))),
    (FunctionIdentifier("graft_dhash"),
      info("graft_dhash",
        "graft_dhash(bytes, width, height) - 64-bit perceptual difference hash of a row-major " +
          "width x height grayscale tile in a binary column; null if the payload is shorter " +
          "than width*height."),
      (args: Seq[Expression]) =>
        DHashExpr(args(0), foldToInt(args(1), "graft_dhash", "width"),
          foldToInt(args(2), "graft_dhash", "height"))),
    (FunctionIdentifier("graft_wordpiece"),
      info("graft_wordpiece",
        "graft_wordpiece(word, vocab) - greedy longest-match subword split of `word` against a " +
          "constant array<string> vocabulary; unmatched positions emit '[UNK]' and advance one char."),
      (args: Seq[Expression]) =>
        WordPieceExpr(args(0), foldToStrings(args(1), "graft_wordpiece", "vocab"))))

  /** SQL-surface scalar params arrive as expressions; the native exprs
    * take them as constructor constants (seed-family size, compiled vocab
    * table) — fold them at resolution time and reject non-literals. */
  private def foldToInt(e: Expression, fn: String, arg: String): Int =
    if (e.foldable) e.eval() match {
      case n: Number => n.intValue
      case v => throw new IllegalArgumentException(s"$fn: $arg must be an integer literal, got $v")
    } else throw new IllegalArgumentException(s"$fn: $arg must be a literal, got ${e.sql}")

  private def foldToStrings(e: Expression, fn: String, arg: String): Seq[String] =
    if (e.foldable) e.eval() match {
      case a: ArrayData => a.toArray[UTF8String](StringType).map(_.toString).toSeq
      case v => throw new IllegalArgumentException(s"$fn: $arg must be an array<string> literal, got $v")
    } else throw new IllegalArgumentException(s"$fn: $arg must be a literal, got ${e.sql}")

  /** Register into an existing session. The optimizer rule goes through
    * `experimental.extraOptimizations` (a built session's rule batches
    * are frozen); it is inert until the bucket-width conf is set. */
  def register(spark: SparkSession): Unit = {
    functions.foreach { case (id, inf, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, inf, builder)
    }
    if (!spark.experimental.extraOptimizations.contains(RangeJoinRule))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ RangeJoinRule
  }
}
