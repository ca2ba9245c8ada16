package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Greedy longest-match subword tokenization (the WordPiece/BPE *apply*
  * step — the counterpart of the q113 merge-candidate *training* step):
  * at each position take the longest vocabulary piece that prefixes the
  * remaining word; if none matches, emit `[UNK]` and advance one
  * character. One native expression evaluation per word — the vocabulary
  * is compiled once into a length-bucketed lookup shared by every row
  * (an `addReferenceObj`, not a per-row closure), and the match loop
  * runs inside whole-stage codegen via a static call, so tokenization
  * composes with `transform`/`flatten` over the token array without
  * leaving the generated plan.
  *
  * Determinism: greedy longest-prefix is a pure function of (word,
  * vocab); ties are impossible (equal-length prefixes of the same word
  * at the same position are the same string). Positions are UTF-16 code
  * units — for the engine's lowercase-ASCII normalized tokens this is
  * identical to the oracle's character positions.
  */
case class WordPieceExpr(child: Expression, vocab: Seq[String]) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType | NullType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_wordpiece requires a string argument, got ${t.sql}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_wordpiece"

  @transient private lazy val table = WordPieceExpr.Table(vocab)

  override def nullSafeEval(input: Any): Any =
    WordPieceExpr.encode(input.asInstanceOf[UTF8String], table)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("wpTable", table, classOf[WordPieceExpr.Table].getName)
    defineCodeGen(ctx, ev, c => s"graft.plans.WordPieceExpr.encode($c, $ref)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WordPieceExpr {

  val Unk = "[UNK]"
  private val UnkU = UTF8String.fromString(Unk)

  /** Vocabulary compiled for the greedy scan: piece set + max piece
    * length (bounds the inner probe loop). */
  final class Table(vocab: Seq[String]) extends Serializable {
    val set: java.util.HashSet[String] = {
      val s = new java.util.HashSet[String](vocab.size * 2)
      vocab.foreach(s.add)
      s
    }
    val maxLen: Int = if (vocab.isEmpty) 1 else vocab.map(_.length).max
  }
  object Table { def apply(vocab: Seq[String]): Table = new Table(vocab) }

  /** Greedy longest-prefix encode of one word. */
  def encode(word: UTF8String, t: Table): ArrayData = {
    val s = word.toString
    val out = new scala.collection.mutable.ArrayBuffer[Any](4)
    var pos = 0
    while (pos < s.length) {
      var l = math.min(t.maxLen, s.length - pos)
      var hit: String = null
      while (l >= 1 && hit == null) {
        val cand = s.substring(pos, pos + l)
        if (t.set.contains(cand)) hit = cand
        l -= 1
      }
      if (hit == null) { out += UnkU; pos += 1 }
      else { out += UTF8String.fromString(hit); pos += hit.length }
    }
    new GenericArrayData(out.toArray)
  }

  /** Column-API entry point: subword pieces of one word. */
  def apply(c: Column, vocab: Seq[String]): Column =
    Bridge.column(WordPieceExpr(Bridge.expression(c), vocab))
}
