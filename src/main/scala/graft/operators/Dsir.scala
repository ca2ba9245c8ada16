package graft.operators

import graft.functions.{Det, TextFns}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data Selection with Importance Resampling (DSIR, Xie et al. 2023,
  * arXiv:2302.03169): score every raw document by how much more likely its
  * token stream is under a TARGET domain's hashed-n-gram language model
  * than under the raw corpus's, then keep the highest-scoring documents.
  * This is the standard "make the crawl look like the trusted corpus"
  * selection step of large pretraining pipelines — the target is typically
  * a small curated set (wiki/books), the raw side the whole crawl.
  *
  * Model: hashed unigram bag-of-words features f(w) = h(w) mod B with
  * add-one smoothing over B buckets. Per-feature log-likelihood ratio
  * λ_f = ln p_target(f) − ln p_raw(f), each term rounded at 1e-6 (the
  * [[Lm]] convention — ln is the one non-correctly-rounded primitive, and
  * quantizing each SCALAR before any sum keeps engines bit-identical).
  * A document's importance is Σ_tokens λ_f(tok), an exact decimal sum of
  * quantized values, rounded at 1e-4.
  *
  * Scale shape: feature counts are two map-combinable aggregates over the
  * token stream (the target one over a filtered subset); the λ table has
  * exactly B rows — broadcast by construction, REGARDLESS of vocabulary
  * size (that is the point of hashed features: [[Lm.unigramXent]]'s
  * probability table grows with the vocabulary; this never does). Scoring
  * is one broadcast-join pass over the token stream plus a per-doc
  * aggregate. Selection is a global top-k → TakeOrderedAndProject
  * (per-partition heaps, never a full sort).
  */
object Dsir {

  /** Per-document DSIR importance score. Documents whose token stream is
    * empty have no defined score and are absent (the explode drops them).
    * Returns (idCol, keepCols..., n_toks, logw) — logw rounded at 1e-4. */
  def importanceScores(df: DataFrame, idCol: String, textCol: String,
                       isTarget: Column, buckets: Int = 256,
                       keepCols: Seq[String] = Nil): DataFrame = {
    val toks = df.select(
      (col(idCol) +: isTarget.as("__t") +: keepCols.map(col)) :+
        explode(TextFns.tokens(col(textCol))).as("tok"): _*)
      .withColumn("f", pmod(TextFns.portableHash(col("tok")), lit(buckets.toLong)))
    // One pass counts both sides; count(when(target)) is the filtered twin.
    val cnts = toks.groupBy("f").agg(
      count(lit(1)).as("c_raw"),
      count(when(col("__t"), lit(1))).as("c_tgt"))
    val tot = cnts.agg(
      sum("c_raw").as("n_raw"), sum("c_tgt").as("n_tgt"))
    val lam = cnts.crossJoin(broadcast(tot)).select(col("f"),
      (Det.roundAt(log((col("c_tgt") + 1).cast("double") /
          (col("n_tgt") + buckets).cast("double")), 6) -
        Det.roundAt(log((col("c_raw") + 1).cast("double") /
          (col("n_raw") + buckets).cast("double")), 6)).as("lam"))
    toks.join(broadcast(lam), "f")
      .groupBy(col(idCol) +: keepCols.map(col): _*)
      .agg(count(lit(1)).as("n_toks"),
        Det.roundAt(Det.dsum(col("lam"), 6), 4).as("logw"))
  }

  /** DSIR selection: the `k` raw-side documents with the highest
    * importance (ties broken by id — total order, engine-stable). Target
    * documents define the model but are not themselves candidates. */
  def select(df: DataFrame, idCol: String, textCol: String,
             isTarget: Column, k: Int, buckets: Int = 256,
             keepCols: Seq[String] = Nil): DataFrame = {
    val candIds = df.filter(!isTarget).select(col(idCol))
    importanceScores(df, idCol, textCol, isTarget, buckets, keepCols)
      .join(candIds, idCol)
      .orderBy(col("logw").desc, col(idCol))
      .limit(k)
  }
}
