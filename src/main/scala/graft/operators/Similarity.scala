package graft.operators

import graft.functions.{Det, VectorFns}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Similarity search over an `array<float>` embedding column.
  *
  * `bruteTopK` is the exact baseline: a broadcast of the (small) query set
  * against the full corpus — one pass over the data, no shuffle of the
  * corpus side, per-query top-k via a rank-limited window. `ivfTopK` is
  * the scale path: a coarse partition (here the precomputed `label`
  * cluster, standing in for a k-means assignment) prunes the search to
  * matching buckets before the same scoring — at 100 TB this turns a full
  * scan per query into a partition-pruned scan. `nearDupPairs` is
  * embedding-cosine near-dedup, brute-force within the verify scale and
  * bucketable by the same coarse key at scale.
  *
  * Cosines are computed in double with a fixed left-to-right fold
  * ([[VectorFns]]) and rounded to 6 decimals before ranking, with id
  * tie-breaks, so rankings are reproducible across engines.
  */
object Similarity {

  private def ranked(scored: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("query_id")
      .orderBy(desc("cos"), asc("vec_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("vec_id"), col("cos"),
        col("rank").cast("long").as("rank"))
      .orderBy("query_id", "rank")
  }

  /** Exact cosine top-k: broadcast the query rows, score every corpus row,
    * keep k per query. */
  def bruteTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val q = queries.select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
    val scored = corpus.join(broadcast(q), col("vec_id") =!= col("query_id"))
      .withColumn("cos", Det.roundAt(VectorFns.cosineQ(col("embedding"), col("q_emb")), 6))
      .select("query_id", "vec_id", "cos")
    ranked(scored, k)
  }

  /** IVF-style top-k: only score corpus rows whose coarse bucket matches
    * the query's (partition pruning — the ANN trade: recall bounded by the
    * coarse quantizer, cost cut by the bucket fan-out). */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, bucketCol: String, k: Int): DataFrame = {
    val q = queries.select(col("vec_id").as("query_id"),
      col("embedding").as("q_emb"), col(bucketCol).as("q_bucket"))
    val scored = corpus
      .join(broadcast(q),
        col(bucketCol) === col("q_bucket") && col("vec_id") =!= col("query_id"))
      .withColumn("cos", Det.roundAt(VectorFns.cosineQ(col("embedding"), col("q_emb")), 6))
      .select("query_id", "vec_id", "cos")
    ranked(scored, k)
  }

  /** Embedding-cosine near-duplicate pairs ≥ `threshold` (id_a < id_b).
    * Brute force at verify scale; at 100 TB bucket by a coarse quantizer
    * first (same shape as [[Dedup.minhashLshPairs]]). */
  def nearDupPairs(corpus: DataFrame, threshold: Double): DataFrame = {
    val a = corpus.select(col("vec_id").as("id_a"), col("embedding").as("emb_a"))
    val b = corpus.select(col("vec_id").as("id_b"), col("embedding").as("emb_b"))
    a.crossJoin(b).filter(col("id_a") < col("id_b"))
      .withColumn("cos", Det.roundAt(VectorFns.cosineQ(col("emb_a"), col("emb_b")), 6))
      .filter(col("cos") >= threshold)
      .select("id_a", "id_b", "cos")
      .orderBy("id_a", "id_b")
  }
}
