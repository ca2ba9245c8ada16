package graft.operators

import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, ScalarSubquery}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.DataFrame

/** Bloom-pruned semi join — the explicit form of Spark's runtime
  * row-level filtering (`InjectRuntimeFilter`), exposed as an operator so
  * a pipeline can force it where the optimizer's size/selectivity
  * heuristics would not fire (e.g. the build side is a filtered dimension
  * the planner can't estimate).
  *
  * Shape: a `BloomFilterAggregate` over `xxhash64(buildKey)` runs first
  * as a scalar subquery (partial aggregation — each task folds its rows
  * into a local sketch, one merge reduces them); the probe side is then
  * filtered map-side by `BloomFilterMightContain` BEFORE its shuffle, so
  * at 100 TB the exchange moves only `selectivity × probe` rows plus the
  * bloom's false positives (`fpp` ≈ 3% at the default sizing). The final
  * `LEFT SEMI` equi-join removes those false positives — the result is
  * bit-identical to a plain semi join, which is exactly what the oracle
  * asserts (q79).
  *
  * The entire path is codegen'd: `xxhash64` and `might_contain` are
  * native expressions, and the bloom bytes travel as one subquery result
  * (a broadcast-sized binary), never a driver-side collect at plan time.
  */
object BloomJoin {

  /** `probe LEFT SEMI JOIN build ON probe(probeKey) = build(buildKey)`,
    * with a bloom prefilter on the probe side sized for `expectedItems`
    * distinct build keys. */
  def semiJoin(
      probe: DataFrame,
      build: DataFrame,
      probeKey: String,
      buildKey: String,
      expectedItems: Long = 1000000L): DataFrame = {
    val bloomDf = build
      .select(xxhash64(col(buildKey)).as("h"))
      .select(Bridge.column(
        new BloomFilterAggregate(Bridge.expression(col("h")), expectedItems)
          .toAggregateExpression()).as("bloom"))
    val bloomSub = ScalarSubquery(bloomDf.queryExecution.analyzed)
    val pruned = probe.filter(Bridge.column(
      BloomFilterMightContain(bloomSub,
        Bridge.expression(xxhash64(probe(probeKey))))))
    pruned.join(build, pruned(probeKey) === build(buildKey), "left_semi")
  }
}
