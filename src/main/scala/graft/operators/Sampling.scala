package graft.operators

import graft.functions.TextFns
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data pipelines.
  *
  * `sample(fraction)` / `rand()` draws differ per run and per retry — a
  * re-executed task re-samples, which breaks exactly-once writes and makes
  * oracle comparison impossible. Both operators here key off the portable
  * md5 hash of a stable id instead: the same row is always in or out, on
  * any engine, at any parallelism, on any retry.
  *
  * Scale shape: `hashSample` is a pure narrow filter (pushes to the scan's
  * partition boundary, no shuffle). `stratifiedSample` is one shuffle on
  * the stratum key with the rank limit compiled to `WindowGroupLimit` on
  * both map and reduce side — per-stratum state is n rows, never the
  * stratum.
  */
object Sampling {

  /** Keep ~`pct`% of rows: hash(id) mod 100 < pct. Narrow, deterministic,
    * retry-stable. */
  def hashSample(df: DataFrame, idCol: String, pct: Int): DataFrame =
    df.filter(pmod(TextFns.portableHash(col(idCol)), lit(100L)) < pct)

  /** Exactly ≤ `n` rows per stratum, chosen by hash order (a deterministic
    * "random" order independent of storage layout), id as tie-break. */
  def stratifiedSample(df: DataFrame, strataCol: String, idCol: String, n: Int): DataFrame = {
    val w = Window.partitionBy(strataCol)
      .orderBy(TextFns.portableHash(col(idCol)), col(idCol))
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= n)
      .drop("__rn")
  }

  /** Weighted sample WITHOUT replacement, k rows, inclusion probability
    * proportional to `weightCol` — Efraimidis–Spirakis A-Res with the
    * random draw replaced by a deterministic hash uniform: each row gets
    * u = (hash(id±salt) mod 10⁶ + 0.5)/10⁶ ∈ (0,1) and key = ln(u)/w
    * (monotone in u^(1/w)); the k largest keys are the sample. Higher
    * weight pulls the key toward 0, so quality-weighted corpus draws
    * (weight = quality score) favor good documents while any document
    * stays reachable — exactly the mixture-sampling rule, but retry- and
    * engine-stable.
    *
    * Scale shape: one narrow projection plus a global top-k, which Spark
    * compiles to TakeOrderedAndProject — per-partition heaps of k rows,
    * never a full sort. Keys are rounded at 1e-6 with id as tie-break, so
    * the selected set is total-order deterministic. `weightCol` must be
    * strictly positive. Returns the selected rows plus their `key`. */
  def weightedSample(df: DataFrame, idCol: String, weightCol: String,
                     k: Int, salt: String = ":ws"): DataFrame = {
    val u = (pmod(TextFns.portableHash(
      concat(col(idCol).cast("string"), lit(salt))), lit(1000000L))
      .cast("double") + lit(0.5)) / lit(1000000.0)
    df.withColumn("key", graft.functions.Det.roundAt(log(u) / col(weightCol), 6))
      .orderBy(desc("key"), col(idCol))
      .limit(k)
  }

  /** Per-group [[weightedSample]]: k rows per `groupCol` value, same
    * A-Res keys, ranked inside the group. The rank limit compiles to
    * WindowGroupLimit (map- and reduce-side truncation), so per-group
    * state is k rows and no group is ever materialized whole — the
    * per-domain quality-weighted draw of a mixture build. */
  def weightedSamplePerGroup(df: DataFrame, groupCol: String, idCol: String,
                             weightCol: String, k: Int,
                             salt: String = ":ws"): DataFrame = {
    val u = (pmod(TextFns.portableHash(
      concat(col(idCol).cast("string"), lit(salt))), lit(1000000L))
      .cast("double") + lit(0.5)) / lit(1000000.0)
    val w = Window.partitionBy(groupCol)
      .orderBy(desc("key"), col(idCol))
    df.withColumn("key", graft.functions.Det.roundAt(log(u) / col(weightCol), 6))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .withColumn("rank", col("rank").cast("long"))
  }

  /** Rebalance a corpus toward target mixture `weights` (integer parts —
    * e.g. en→4, es→2 means 2:1) by downsampling over-represented groups:
    * the largest budget B every group can serve is computed from the
    * observed counts (B = min over groups of ⌊n·Σw/wᵍ⌋), each group's
    * target is ⌊wᵍ·B/Σw⌋, and membership is the deterministic hash rule
    * u(id) · n_total < n_target · 10⁶ with u(id) = hash(id) mod 10⁶ — so
    * kept counts are binomially close to target, selection is
    * retry-stable, and no per-group global ranking exists anywhere.
    * Groups absent from `weights` get weight 0 (dropped).
    *
    * This is the domain-mixture step of a training-data build (DoReMi-
    * style static weights): all arithmetic is integer, so any engine
    * derives the identical sample.
    *
    * Scale shape: group counts are one tiny aggregate, the budget is a
    * single-row reduce of it, and both come back as BROADCAST joins; the
    * corpus-side membership test is a narrow filter. The only full-width
    * work is the final per-group summary. Returns
    * (group, n_total, n_target, n_kept, id_sum). */
  /** Temperature-scaled domain rebalancing: target share of domain d is
    * n_d^α / Σ n^α with α = 1/2 — the multilingual-corpus "temperature
    * sampling" rule (Conneau et al. 2020 §3.1 use α∈[0.3,0.7] to keep
    * head domains from drowning the tail). α is fixed at 1/2 because
    * pow(x, 0.5) = sqrt(x) is IEEE-correctly-rounded, so the weights —
    * and therefore the integer targets — are bit-identical across
    * engines; other α go through libm pow and are not.
    *
    * Unlike [[mixtureRebalance]] (caller supplies target weights), the
    * weights here are DERIVED from the corpus counts. Each weight is
    * quantized to integer micro-units (floor(√n·10⁶ + ½)) so the weight
    * SUM and the targets are exact integer arithmetic — no
    * double-addition-order dependence anywhere. `budget` rows are
    * allocated as target_d = budget·wq_d div Σwq, capped at n_d
    * (sampling is without replacement), and membership is the same
    * hash-threshold rule as mixtureRebalance: a narrow filter, no
    * per-group sort. Scale shape: one tiny count aggregate broadcast
    * back, one corpus filter, one summary aggregate.
    *
    * Returns (group, n_total, n_target, n_kept, id_sum) per group. */
  def temperatureRebalance(df: DataFrame, groupCol: String, idCol: String,
                           budget: Long): DataFrame = {
    val counts = df.groupBy(groupCol).agg(count(lit(1)).as("n_total"))
      .withColumn("__wq",
        floor(sqrt(col("n_total").cast("double")) * lit(1e6) + lit(0.5)).cast("long"))
    val wsum = counts.agg(sum(col("__wq")).as("__wsum"))
    val targets = counts.crossJoin(broadcast(wsum))
      .withColumn("n_target",
        least(expr(s"$budget * __wq div __wsum"), col("n_total")))
      .select(col(groupCol), col("n_total"), col("n_target"))
    df.join(broadcast(targets), groupCol)
      .filter(pmod(TextFns.portableHash(col(idCol)), lit(1000000L)) *
        col("n_total") < col("n_target") * lit(1000000L))
      .groupBy(groupCol, "n_total", "n_target")
      .agg(count(lit(1)).as("n_kept"), sum(col(idCol)).as("id_sum"))
      .orderBy(groupCol)
  }

  def mixtureRebalance(df: DataFrame, groupCol: String, idCol: String,
                       weights: Map[String, Int]): DataFrame = {
    val wSum = weights.values.sum
    val counts = df.groupBy(groupCol).agg(count(lit(1)).as("n_total"))
      .withColumn("__w", element_at(typedLit(weights), col(groupCol)))
      .filter(col("__w").isNotNull)
    val budget = counts.agg(
      min(expr(s"n_total * $wSum div __w")).as("__budget"))
    val targets = counts.crossJoin(broadcast(budget))
      .withColumn("n_target", expr(s"__w * __budget div $wSum"))
      .select(col(groupCol), col("n_total"), col("n_target"))
    df.join(broadcast(targets), groupCol)
      .filter(pmod(TextFns.portableHash(col(idCol)), lit(1000000L)) *
        col("n_total") < col("n_target") * lit(1000000L))
      .groupBy(groupCol, "n_total", "n_target")
      .agg(count(lit(1)).as("n_kept"), sum(col(idCol)).as("id_sum"))
      .orderBy(groupCol)
  }
}
