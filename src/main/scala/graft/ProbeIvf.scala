package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dev probe (args: embDir...): IVF recall and sub-bucketing shape on an
  * embeddings corpus — built for the `GenData clustered-embs` mixture
  * corpora (power-law cluster sizes, ~0.9 within-cluster cosine), where
  * bucket occupancy is skewed like a real embedding space, vs the
  * shipped isotropic corpus where every bucket holds ~n/10 by
  * construction.
  *
  * Per dir it prints one JSON line with:
  *   - n, n_buckets, top_share, max_bucket   label-bucket occupancy (the
  *     power-law: top cluster ≈ 18% on the clustered corpus)
  *   - recall_ivf       mean top-10 overlap of label-bucket IVF
  *     ([[operators.Similarity.ivfTopK]]) vs brute-force cosine top-10
  *     over the q28/q29 query sample — on the clustered corpus the label
  *     IS the true cluster, so this measures what a correctly-trained
  *     coarse quantizer achieves; on the isotropic corpus label is a
  *     hash (≈0.1 by construction, the testdata artifact this probe
  *     exists to expose)
  *   - adaptive sub-bucket stats over (label, sign-LSH ladder) — the
  *     q35/q218 candidate bound: sum_b2 is the within-bucket pair work;
  *     the ladder must hold max_sub roughly flat as n grows even though
  *     the top cluster grows linearly
  */
object ProbeIvf {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(
      cores = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"),
      app = "graft-probe-ivf", periodicGC = "10h")
    val isQuery = "vec_id % 100 = 0 AND vec_id < 5000"
    for (dir <- args) {
      val emb = Queries.tbl(spark, dir, "embeddings")
      val n = emb.count()
      val q = emb.filter(expr(isQuery))

      val occ = emb.groupBy("label").agg(count(lit(1)).as("bn"))
      val occs = occ.agg(count(lit(1)).as("nb"), max(col("bn")).as("mx"),
        sum(expr("bn * (bn - 1) div 2")).as("sum_b2")).first()

      def topIds(df: DataFrame, tag: String) =
        df.select(col("query_id").as(s"${tag}_q"), col("vec_id").as(s"${tag}_id"))
      val brute = operators.Ckpt.local(
        topIds(operators.Similarity.bruteTopK(emb, q, 10), "b"))
      val ivf = topIds(operators.Similarity.ivfTopK(emb, q, "label", 10), "i")
      val nQ = q.count()
      val hit = brute.join(ivf,
        col("b_q") === col("i_q") && col("b_id") === col("i_id"),
        "left_semi").count()
      val recall = if (nQ == 0) 0.0 else hit.toDouble / (nQ * 10.0)

      // adaptive (label # sign-LSH) sub-bucket, same ladder as q35/q218:
      // bits = min(12, floor(log2(max(1, n/64)))) — ~64 rows per bucket
      val planes = operators.Similarity.signPlanes(12, 64)
      val bits = math.max(0, math.min(12,
        63 - java.lang.Long.numberOfLeadingZeros(math.max(1L, n / 64L)))).toInt
      val sub = emb.select(concat(col("label").cast("string"), lit("#"),
          operators.Similarity.signSketch(col("embedding"), planes)
            .bitwiseAND(lit((1L << bits) - 1L)).cast("string")).as("mb"))
        .groupBy("mb").agg(count(lit(1)).as("bn"))
        .agg(count(lit(1)).as("nsb"), max(col("bn")).as("mxs"),
          sum(expr("bn * (bn - 1) div 2")).as("sum_sb2")).first()

      // candidate fix prototype: SHELL sub-bucket — quantized projection
      // VALUES (E2LSH shells) instead of sign bits. Within a tight
      // cluster every member shares the centroid's signs (extra sign
      // bits never split a hot bucket) but the projection values still
      // spread by the cluster's sigma, so shells do split it.
      val W = 250000000000L // 0.25 in DotQ 1e-12 units
      val Off = 64000000000000L // shifts dots non-negative; multiple of W
      val mShells = (0 to 6).find(m =>
        64L * math.pow(6.0, m).toLong >= n).getOrElse(6)
      val shellKey = concat((col("label").cast("string") +:
        (0 until mShells).map { j =>
          val d = graft.plans.DotQExpr(col("embedding"),
            lit(operators.Similarity.signPlanes(12, 64)(j))) + lit(Off)
          concat(lit("#"), ((d - pmod(d, lit(W))) / lit(W)).cast("long")
            .cast("string"))
        }): _*)
      val shell = emb.select(shellKey.as("mb"))
        .groupBy("mb").agg(count(lit(1)).as("bn"))
        .agg(count(lit(1)).as("nsb"), max(col("bn")).as("mxs"),
          sum(expr("bn * (bn - 1) div 2")).as("sum_sb2")).first()

      // blocking-recall accounting at the q35 threshold (0.3), corpora
      // small enough for the brute truth: which fraction of true
      // near-dup pairs does each single-key blocking (sign-bits vs
      // shells) retain? The trade under adjudication: shells bound hot
      // buckets but are a harsher block for mid-similarity pairs.
      val recallStats = if (n <= 5000) {
        val truth = operators.Ckpt.local(
          operators.Similarity.nearDupPairs(emb, 0.3).select("id_a", "id_b"))
        val nTruth = truth.count()
        def bucketPairs(keyed: DataFrame) = {
          val a = keyed.select(col("mb"), col("vec_id").as("id_a"))
          val b = keyed.select(col("mb"), col("vec_id").as("id_b"))
          truth.join(
            a.join(b, Seq("mb")).filter(col("id_a") < col("id_b"))
              .select("id_a", "id_b").distinct(),
            Seq("id_a", "id_b"), "left_semi").count()
        }
        val signKeyed = emb.select(col("vec_id"),
          concat(col("label").cast("string"), lit("#"),
            operators.Similarity.signSketch(col("embedding"), planes)
              .bitwiseAND(lit((1L << bits) - 1L)).cast("string")).as("mb"))
        val shellKeyed = emb.select(col("vec_id"), shellKey.as("mb"))
        val hitSign = bucketPairs(signKeyed)
        val hitShell = bucketPairs(shellKeyed)
        s""","n_truth_03":$nTruth,"block_recall_sign":${
          math.floor((if (nTruth == 0) 1.0 else hitSign.toDouble / nTruth) * 1e4 + 0.5) / 1e4
        },"block_recall_shell":${
          math.floor((if (nTruth == 0) 1.0 else hitShell.toDouble / nTruth) * 1e4 + 0.5) / 1e4}"""
      } else ""

      println(s"""PROBE_IVF {"dir":"$dir","n":$n,""" +
        s""""n_buckets":${occs.getLong(0)},"max_bucket":${occs.getLong(1)},""" +
        s""""top_share":${math.floor(occs.getLong(1) * 1e4 / n + 0.5) / 1e4},""" +
        s""""sum_b2":${occs.get(2)},"n_queries":$nQ,""" +
        s""""recall_ivf":${math.floor(recall * 1e4 + 0.5) / 1e4},""" +
        s""""sub_bits":$bits,"n_sub":${sub.getLong(0)},""" +
        s""""max_sub":${sub.getLong(1)},"sum_sb2":${sub.get(2)},""" +
        s""""m_shells":$mShells,"n_shell":${shell.getLong(0)},""" +
        s""""max_shell":${shell.getLong(1)},"sum_shell2":${shell.get(2)}""" +
        recallStats + "}")
      operators.Ckpt.release(spark)
    }
    spark.stop()
  }
}
