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
  * Recall is reported PER PAIR CLASS (SCALE_r10 `lsh_cap_fire`): a
  * boilerplate cluster of b docs is pairwise near-duplicate by
  * construction, so boiler-boiler pairs dominate whole-corpus truth
  * (C(b,2) of them) and their recall collapses when the cap sheds the
  * cluster's buckets — BY DESIGN: enumerating a mega-cluster pairwise
  * is the O(b²) blowup the cap exists to prevent, and a production
  * pipeline removes such clusters with exact/prefix dedup instead. The
  * number that must hold is recall_organic (pairs with ≥1 non-boiler
  * side): organic near-dups live in ordinary-sized buckets the cap
  * never touches, so it should stay at the uncapped level until the
  * cap is squeezed under ordinary bucket sizes. */
object ProbeCap {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val caps = args(1).split(",").map(_.toInt)
    val spark = GraftSession.local(
      cores = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"),
      app = "graft-probe-cap", periodicGC = "10h")
    val docs = Queries.tbl(spark, dir, "documents").select("doc_id", "text")

    // Per-pair class accounting: a "boiler" pair has BOTH sides carrying
    // the planted license prefix — those pairs are real near-dups, but
    // they are exactly the cluster the cap is designed to shed (a
    // production pipeline catches a boilerplate cluster with exact /
    // prefix dedup at a fraction of the cost; pairwise enumeration of a
    // b-doc cluster is O(b²) by definition). The number that must
    // survive capping is ORGANIC recall: pairs with at least one
    // non-boiler side.
    val boilerIds = operators.Ckpt.local(docs
      .filter(col("text").startsWith(GenData.BoilerPrefix))
      .select(col("doc_id").as("bid")))
    def classed(pairs: org.apache.spark.sql.DataFrame) = pairs
      .join(boilerIds.select(col("bid").as("id_a"), lit(1).as("ba")),
        Seq("id_a"), "left")
      .join(boilerIds.select(col("bid").as("id_b"), lit(1).as("bb")),
        Seq("id_b"), "left")
      .withColumn("cls", when(col("ba").isNotNull && col("bb").isNotNull,
        "boiler").otherwise("organic"))
      .select("id_a", "id_b", "cls")
    val truth = operators.Ckpt.local(classed(
      operators.Dedup.wordJaccardPairs(docs, "doc_id", "text",
          shingleN = 3, threshold = 0.5)
        .select("id_a", "id_b")))
    val nTruth = truth.count()
    val nTruthBoiler = truth.filter(col("cls") === "boiler").count()
    val nTruthOrganic = nTruth - nTruthBoiler

    // bucket-size distribution before any capping (cap-independent)
    val banded = docs.select(col("doc_id").as("id"),
        operators.Dedup.minhashSignature(col("text"), 32, 3).as("__sig"))
      .select(col("id"),
        posexplode(operators.Dedup.bandKeysFromSig(col("__sig"), 32, 8))
          .as(Seq("band", "key")))
    val bs = banded.groupBy("band", "key").agg(count(lit(1)).as("n"))
      .agg(max(col("n")).as("mx"),
        sum(expr("n * (n - 1) div 2")).as("cand_uncapped"),
        sum(when(col("n") > 25, 1).otherwise(0)).as("gt25"),
        sum(when(col("n") > 50, 1).otherwise(0)).as("gt50"),
        sum(when(col("n") > 100, 1).otherwise(0)).as("gt100")).first()
    val nDocs = docs.count()

    for (cap <- caps) {
      val t0 = System.nanoTime()
      val (pairs, shedIds) = operators.Dedup.minhashLshPairsWithShed(
        docs, "doc_id", "text", numHashes = 32, bands = 8, shingleN = 3,
        threshold = 0.5, maxBucket = cap)
      val p = operators.Ckpt.local(pairs.select("id_a", "id_b"))
      val nLsh = p.count()
      val nShed = shedIds.count()
      val common = operators.Ckpt.local(
        truth.join(p, Seq("id_a", "id_b"), "left_semi"))
      val nCommon = common.count()
      val nCommonBoiler = common.filter(col("cls") === "boiler").count()
      val nCommonOrganic = nCommon - nCommonBoiler
      val sec = (System.nanoTime() - t0) / 1e9
      def rec(c: Long, t: Long) =
        if (t == 0) 1.0 else math.floor(c.toDouble / t * 1e6 + 0.5) / 1e6
      println(s"""PROBE_CAP {"dir":"$dir","cap":$cap,"n_docs":$nDocs,""" +
        s""""max_bucket":${bs.getLong(0)},"cand_uncapped":${bs.get(1)},""" +
        s""""buckets_gt25":${bs.get(2)},"buckets_gt50":${bs.get(3)},"buckets_gt100":${bs.get(4)},""" +
        s""""n_truth":$nTruth,"n_truth_boiler":$nTruthBoiler,"n_truth_organic":$nTruthOrganic,""" +
        s""""n_lsh":$nLsh,"n_common":$nCommon,""" +
        s""""recall":${rec(nCommon, nTruth)},""" +
        s""""recall_boiler":${rec(nCommonBoiler, nTruthBoiler)},""" +
        s""""recall_organic":${rec(nCommonOrganic, nTruthOrganic)},""" +
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
