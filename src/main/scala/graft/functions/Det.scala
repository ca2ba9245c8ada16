package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Deterministic (oracle-stable) aggregate builders.
  *
  * Double aggregation order differs between Spark partitions and the DuckDB
  * oracle, so raw `sum(double)` is not bit-reproducible. Instead we sum in
  * exact decimal (input data carries fixed-scale money/quantity values), then
  * cast the exact decimal result to double — IEEE nearest — which is bitwise
  * identical in any engine. Derived stats (avg/std/corr) are computed from
  * those exact sums with a fixed double formula, so they are reproducible too.
  *
  * At 100 TB these stay single-pass partial aggregates: decimal(28,s) sums
  * are Tungsten-native and map-side combinable, no extra shuffle vs sum().
  */
object Det {

  /** Exact decimal sum emitted as double. `scale` must cover the true scale
    * of the data (2 for money, 4 for price*discount products, ...). */
  def dsum(c: Column, scale: Int = 2): Column =
    sum(c.cast(DecimalType(28, scale))).cast(DoubleType)

  /** Mean from exact decimal sum / count — reproducible double division. */
  def davg(c: Column, scale: Int = 2): Column =
    dsum(c, scale) / count(c)

  /** Sample stddev from exact decimal sums of x and x^2 (pandas ddof=1).
    * sqrt((s2 - s1^2/n) / (n-1)) evaluated in double — deterministic. */
  def dstddev(c: Column, scale: Int = 2): Column = {
    val n  = count(c).cast(DoubleType)
    val s1 = dsum(c, scale)
    val s2 = dsum(c * c, scale * 2)
    sqrt((s2 - s1 * s1 / n) / (n - lit(1.0)))
  }

  /** Engine-portable round-half-up: floor(x·10ᵈ + 0.5)/10ᵈ — pure IEEE
    * double ops, bit-identical in Spark and DuckDB. Spark's `round` goes
    * through the shortest-decimal string (HALF_UP on Double.toString) while
    * DuckDB rounds the binary value — they disagree on values like 2.675
    * whose shortest decimal is a half. This formula can't. */
  def roundAt(c: Column, digits: Int): Column = {
    val p = math.pow(10, digits)
    floor(c * lit(p) + lit(0.5)) / lit(p)
  }

  /** The DuckDB-SQL spelling of [[roundAt]]. */
  def roundAtSql(expr: String, digits: Int): String = {
    val p = math.pow(10, digits).toLong
    s"floor(($expr) * $p + 0.5) / $p"
  }

  /** Pearson correlation from exact decimal cross-sums — deterministic,
    * pairwise-complete over non-null (x,y) pairs like pandas `corr`. */
  def dcorr(x: Column, y: Column, scale: Int = 2): Column = {
    val both = x.isNotNull && y.isNotNull
    val xv   = when(both, x)
    val yv   = when(both, y)
    val n    = count(when(both, lit(1))).cast(DoubleType)
    val sx   = dsum(xv, scale)
    val sy   = dsum(yv, scale)
    val sxx  = dsum(xv * xv, scale * 2)
    val syy  = dsum(yv * yv, scale * 2)
    val sxy  = dsum(xv * yv, scale * 2)
    (n * sxy - sx * sy) / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
  }
}
