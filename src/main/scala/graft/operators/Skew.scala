package graft.operators

import graft.functions.Det
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Skew mitigation for hot aggregation keys.
  *
  * A groupBy on a key where one value holds 30% of 100 TB sends 30 TB to
  * one reducer. Salting splits each key into `salts` subkeys for the
  * partial aggregation, then combines the (tiny) per-salt partials in a
  * second, uniformly-distributed aggregation. Only algebraic aggregates
  * decompose this way — exposed here for count / decimal-exact sum /
  * min / max, which also keeps results bit-identical to the unsalted
  * plan (decimal addition is associative; double addition is not).
  *
  * AQE's skew-join splitting handles JOIN skew automatically; aggregation
  * skew still needs this explicit two-stage shape.
  */
object Skew {

  /** Deterministic salt in [0, salts): hashes the row's value column so
    * retries re-salt identically (rand() would break exactly-once). */
  private def salt(c: Column, salts: Int): Column =
    pmod(xxhash64(c), lit(salts.toLong))

  /** Salted count + exact-decimal sum per key — bit-identical to the
    * direct `groupBy(key).agg(count, dsum)` result. */
  def saltedCountSum(df: DataFrame, key: String, value: String,
                     salts: Int = 16, scale: Int = 2): DataFrame =
    df.withColumn("__salt", salt(col(value), salts))
      .groupBy(col(key), col("__salt"))
      .agg(count(lit(1)).as("__cnt"),
        sum(col(value).cast(DecimalType(28, scale))).as("__sum"))
      .groupBy(col(key))
      .agg(sum(col("__cnt")).as("cnt"),
        Det.roundAt(sum(col("__sum")).cast("double"), 6).as("total"))

  /** Salted equi-join for a skewed fact key: fact rows scatter across
    * `salts` sub-partitions via a deterministic per-row salt (hashed
    * from `saltSrc`, a column unique-ish per row — retries re-salt
    * identically), the dimension replicates ×`salts` via one explode,
    * and the join runs on (key, salt) — so one hot key spreads over
    * `salts` reducers instead of melting a single one. Result is
    * row-identical to the plain join (each fact row meets exactly the
    * one dim replica carrying its salt). Use when AQE's skew split
    * cannot help (e.g. the skew is in the post-shuffle aggregation
    * input, or AQE is off); cost is `salts×|dim|` shuffle rows. */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
                 saltSrc: String, salts: Int = 16): DataFrame = {
    val f = fact.withColumn("__salt", salt(col(saltSrc), salts))
    val d = dim.withColumn("__salt",
      explode(sequence(lit(0L), lit(salts.toLong - 1))))
    f.join(d, Seq(key, "__salt")).drop("__salt")
  }

  /** Key-skew diagnostic: histogram of per-key row counts in power-of-two
    * buckets — the measurement that decides whether a key needs
    * [[saltedJoin]]/[[saltedCountSum]] before you pay for it. The bucket
    * is `length(bin(cnt))` = ⌊log₂ cnt⌋ + 1, computed on integers (no
    * libm, engine-exact). Output per bucket: distinct keys, total rows,
    * the bucket's heaviest key count, and its share of all rows (a top
    * bucket holding a large share with few keys = salt those keys).
    *
    * Scale shape: one groupBy on the key (the same shuffle the real
    * aggregation would do), then a ~64-row bucket aggregate and a scalar
    * total broadcast back — no windows, nothing driver-side. */
  def keyHistogram(df: DataFrame, key: String): DataFrame = {
    val perKey = df.groupBy(col(key)).agg(count(lit(1)).as("cnt"))
    val buckets = perKey
      .withColumn("bucket", length(bin(col("cnt"))).cast("long"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_keys"), sum("cnt").as("n_rows"),
        max("cnt").as("max_key_rows"))
    val total = buckets.agg(sum("n_rows").as("__total"))
    buckets.crossJoin(broadcast(total))
      .withColumn("row_share",
        Det.roundAt(col("n_rows").cast("double") / col("__total"), 6))
      .select("bucket", "n_keys", "n_rows", "max_key_rows", "row_share")
      .orderBy("bucket")
  }
}
