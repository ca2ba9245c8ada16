package graft

import org.apache.spark.sql.functions._

/** Dev probe (args: docsDir cap1[,cap2,...]): fires the LSH bucket cap on
  * a boilerplate-planted corpus and measures what it costs.
  *
  * The production cap ([[operators.Dedup.DefaultMaxBucket]] = 100000) is
  * sized to never fire below corpus scale — which means no corpus in the
  * evidence chain had ever exercised the shed path at all. This probe
  * runs on a `GenData zipf-docs <vocab> <boilerPct>` corpus (a fixed
  * 30-word license prefix dominating ~boilerPct of docs, the exact
  * mega-bucket shape the cap exists for) and, for each requested cap:
  *
  *   - truth          brute-force word-3-shingle Jaccard ≥ 0.5 pairs
  *                    (cap-independent, computed once)
  *   - n_lsh          verified pairs the capped LSH pipeline returns
  *   - recall         |lsh ∩ truth| / |truth|
  *   - shed_docs      docs with ≥1 band bucket dropped (EXPOSURE count —
  *                    a shed doc still joins through its other bands)
  *   - max_bucket     largest (band,key) bucket before capping
  *
  * Expected shape (SCALE_r10 `lsh_cap_fire`): recall holds near the
  * uncapped value while the cap only sheds the boilerplate buckets —
  * boiler-pair candidates survive through body-containing bands and the
  * genuine planted dups never touch a mega-bucket; recall only drops
  * once the cap is squeezed under ordinary bucket sizes. */
object ProbeCap {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val caps = args(1).split(",").map(_.toInt)
    val spark = GraftSession.local(
      cores = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"),
      app = "graft-probe-cap", periodicGC = "10h")
    val docs = Queries.tbl(spark, dir, "documents").select("doc_id", "text")

    val truth = operators.Ckpt.local(
      operators.Dedup.wordJaccardPairs(docs, "doc_id", "text",
          shingleN = 3, threshold = 0.5)
        .select("id_a", "id_b"))
    val nTruth = truth.count()

    // bucket-size distribution before any capping (cap-independent)
    val banded = docs.select(col("doc_id").as("id"),
        operators.Dedup.minhashSignature(col("text"), 32, 3).as("__sig"))
      .select(col("id"),
        posexplode(operators.Dedup.bandKeysFromSig(col("__sig"), 32, 8))
          .as(Seq("band", "key")))
    val bs = banded.groupBy("band", "key").agg(count(lit(1)).as("n"))
      .agg(max(col("n")).as("mx"),
        sum(expr("n * (n - 1) div 2")).as("cand_uncapped")).first()
    val nDocs = docs.count()

    for (cap <- caps) {
      val t0 = System.nanoTime()
      val (pairs, shedIds) = operators.Dedup.minhashLshPairsWithShed(
        docs, "doc_id", "text", numHashes = 32, bands = 8, shingleN = 3,
        threshold = 0.5, maxBucket = cap)
      val p = operators.Ckpt.local(pairs.select("id_a", "id_b"))
      val nLsh = p.count()
      val nShed = shedIds.count()
      val nCommon = truth.join(p, Seq("id_a", "id_b"), "left_semi").count()
      val sec = (System.nanoTime() - t0) / 1e9
      val recall = if (nTruth == 0) 1.0 else nCommon.toDouble / nTruth
      println(s"""PROBE_CAP {"dir":"$dir","cap":$cap,"n_docs":$nDocs,""" +
        s""""max_bucket":${bs.getLong(0)},"cand_uncapped":${bs.get(1)},""" +
        s""""n_truth":$nTruth,"n_lsh":$nLsh,"n_common":$nCommon,""" +
        s""""recall":${math.floor(recall * 1e6 + 0.5) / 1e6},""" +
        s""""shed_docs":$nShed,"sec":${math.floor(sec * 100 + 0.5) / 100}}""")
      // no Ckpt.release inside the loop: `truth` is itself a local
      // checkpoint (lineage truncated — releasing it would kill the
      // next iteration's recall join); everything here is pair-grain
      // tiny, release once at the end
    }
    operators.Ckpt.release(spark)
    spark.stop()
  }
}
