package graft

import org.apache.spark.sql.functions._

/** Dev probe (args: sfDir...): measures how the MinHash-LSH relations
  * actually grow with corpus size, to adjudicate the sf10 watch item
  * ("LSH families above the data ratio — storage pressure or plan
  * shape?") with data instead of argument. For each sf dir it prints,
  * for the q22 parameterization (32 hashes / 8 bands / 3-shingles):
  *
  *   - n_docs                      the corpus (grows linearly by design)
  *   - n_buckets, p50/p99/max      (band, key) bucket-size distribution
  *   - cand_pairs = Σ C(size, 2)   the candidate relation the banded
  *                                 self-join materializes — THE number
  *                                 that decides linear vs quadratic
  *   - verified_pairs              pairs at Jaccard >= 0.5 (true dups)
  *
  * If cand_pairs grows ~quadratically while verified_pairs stays
  * linear, the excess is the data's semantics (random signatures over a
  * small shingle universe colliding at a size-independent rate), the
  * same adjudication as q227's temporal edge counts — not a defect in
  * the plan, which is linear in the relation it actually processes. */
object ProbeLsh {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(cores = "32", app = "graft-probe-lsh")
    for (dir <- args) {
      val docs = Queries.tbl(spark, dir, "documents")
      val numHashes = 32; val bands = 8
      val banded = docs
        .select(col("doc_id").as("id"),
          operators.Dedup.minhashSignature(col("text"), numHashes, 3).as("__sig"))
        .select(col("id"),
          posexplode(operators.Dedup.bandKeysFromSig(col("__sig"), numHashes, bands))
            .as(Seq("band", "key")))
      val sizes = banded.groupBy("band", "key").agg(count(lit(1)).as("n"))
        .select(col("n")).persist()
      val stats = sizes.agg(
        count(lit(1)).as("n_buckets"),
        sum(expr("n * (n - 1) div 2")).as("cand_pairs"),
        max(col("n")).as("max_bucket"),
        percentile_approx(col("n"), lit(0.5), lit(10000)).as("p50"),
        percentile_approx(col("n"), lit(0.99), lit(10000)).as("p99")
      ).first()
      val nDocs = docs.count()
      val verified = operators.Dedup.minhashLshPairs(
        docs, "doc_id", "text", numHashes, bands, 3, 0.5).count()
      println(s"""PROBE_LSH {"dir":"$dir","n_docs":$nDocs,""" +
        s""""n_buckets":${stats.getLong(0)},"cand_pairs":${stats.get(1)},""" +
        s""""max_bucket":${stats.getLong(2)},"p50":${stats.get(3)},""" +
        s""""p99":${stats.get(4)},"verified_pairs":$verified}""")
      sizes.unpersist()
      operators.Ckpt.release(spark)
    }
    spark.stop()
  }
}
