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
}
