package graft.operators

import graft.functions.{Det, TextFns}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Self-trained unigram language-model scoring — the "perplexity filter"
  * quality signal of CCNet-style curation pipelines, with the corpus
  * itself as the LM training set (no external model artifact: the score is
  * "how surprising is this document relative to this corpus", which is
  * what the filter actually thresholds on).
  *
  * Model: add-one-smoothed unigram probabilities
  * p(w) = (c(w) + 1) / (N + V) over the whitespace token stream
  * ([[TextFns.tokens]]); a document's score is its mean negative log-prob
  * (cross-entropy, nats/token). Gibberish and boilerplate-free word soup
  * score near ln(V); heavily templated text scores far below it.
  *
  * Scale shape: one token-count aggregate (map-side combinable) into a
  * CHECKPOINTED vocab-grain table, one driver read of the two scalars
  * (N, V) off that checkpoint, then one join of the token stream against
  * the probability table. The join is FORCE-BROADCAST while the measured
  * vocabulary is ≤ `maxBroadcastVocab` rows — without the hint the
  * planner sees the probability table behind a fresh aggregate, guesses
  * it corpus-sized, and sort-merge-joins the full token stream on a
  * low-cardinality skewed key (the measured super-linear slope at sf1:
  * 4.7× time for 10× data). Past the threshold it degrades to the
  * shuffle join, whose skew is capped by Zipf. The token stream is
  * deliberately re-derived on the join side rather than checkpointed:
  * materializing an exploded token stream is strictly more bytes than
  * re-scanning the documents.
  *
  * Determinism: per-token xent is rounded at 1e-6 before the exact-decimal
  * per-doc sum ([[Det.dsum]]), so the double-addition order never shows.
  */
object Lm {

  /** Per-document cross-entropy under the corpus's own unigram LM.
    * Documents with zero tokens have no defined cross-entropy and are
    * absent from the result (the explode drops them). `keepCols` are
    * carried through unchanged (dimension columns like source/lang).
    * Returns (idCol, keepCols..., doc_xent: double rounded at 1e-4). */
  def unigramXent(df: DataFrame, idCol: String, textCol: String,
                  keepCols: Seq[String] = Nil,
                  maxBroadcastVocab: Long = 5000000L): DataFrame = {
    val toks = df.select(
      (col(idCol) +: keepCols.map(col)) :+
        explode(TextFns.tokens(col(textCol))).as("tok"): _*)
    val cnts = Ckpt.local(toks.groupBy("tok").agg(count(lit(1)).as("cnt")))
    val tot = cnts.agg(coalesce(sum("cnt"), lit(0L)), count(lit(1))).first()
    val (nTotal, vocab) = (tot.getLong(0), tot.getLong(1))
    val probs = cnts.select(col("tok"),
      Det.roundAt(-log((col("cnt") + lit(1)).cast("double") /
        lit((nTotal + vocab).toDouble)), 6).as("xent"))
    val probRel = if (vocab <= maxBroadcastVocab) broadcast(probs) else probs
    toks.join(probRel, "tok")
      .groupBy(col(idCol) +: keepCols.map(col): _*)
      .agg(Det.roundAt(Det.dsum(col("xent"), 6) / count(lit(1)), 4)
        .as("doc_xent"))
  }
}
