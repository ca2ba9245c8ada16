package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Ordered-stage funnel and cohort-retention analysis over an event log
  * (reference anchor: the events workload's sessionize/trend family —
  * nb cells 10-12 compute per-entity firsts and temporal rollups; these
  * are their multi-stage generalizations).
  *
  * Both operators use the min-chain definition — stage i's timestamp is
  * the MINIMUM event time of stage i's type at-or-after stage i-1's
  * timestamp — rather than a sequential scan over ordered events, so
  * same-second ties need no intra-second tie-break and any engine
  * reproduces the result bit-for-bit from (entity, second, type) alone.
  *
  * Scale shape (100 TB of events): [[stageTimes]] is ONE shuffle on the
  * entity key; the chained stage minima are stacked whole-partition
  * window aggregates over that single exchange (Catalyst plans one Sort
  * + one Exchange, then N Window operators), and the per-entity collapse
  * reuses the same partitioning. [[cohortRetention]] is the classic
  * two-level rollup: distinct (entity, week) first — the corpus-wide
  * shuffle carries one row per entity-week, not per event — then a
  * window min for the cohort and a small (cohort, offset) aggregate.
  */
object Funnel {

  /** Per-entity stage timestamps: one row per entity, one `ts_<stage>`
    * column per stage (epoch seconds; null = stage never reached). An
    * event only advances stage i if its second is >= stage i-1's second
    * for that entity. */
  def stageTimes(events: DataFrame, entityCol: String, secCol: String,
                 typeCol: String, stages: Seq[String]): DataFrame = {
    val w = Window.partitionBy(entityCol)
    val staged = stages.zipWithIndex.foldLeft(events) { case (df, (st, i)) =>
      val hit = col(typeCol) === lit(st) &&
        (if (i == 0) lit(true) else col(secCol) >= col(s"ts_${stages(i - 1)}"))
      df.withColumn(s"ts_$st", min(when(hit, col(secCol))).over(w))
    }
    // every ts_ column is constant per entity — max() collapses without a
    // second exchange (the groupBy key is the window partition key)
    val aggs = stages.map(st => max(col(s"ts_$st")).as(s"ts_$st"))
    staged.groupBy(entityCol).agg(aggs.head, aggs.tail: _*)
  }

  /** Funnel summary: one row with the entity count plus, per stage, how
    * many entities reached it (in order). */
  def counts(events: DataFrame, entityCol: String, secCol: String,
             typeCol: String, stages: Seq[String]): DataFrame =
    stageTimes(events, entityCol, secCol, typeCol, stages)
      .agg(count(lit(1)).as("n_entities"),
        stages.map(st => count(col(s"ts_$st")).as(s"n_$st")): _*)

  /** First-order transition counts between consecutive event types per
    * entity (the Markov-chain view of user paths): one shuffle on the
    * entity key, a lag window over (sec, id) — a total order immune to
    * sub-second timestamp precision differences — then a small
    * (from_type, to_type) aggregate. */
  def transitions(events: DataFrame, entityCol: String, secCol: String,
                  idCol: String, typeCol: String): DataFrame = {
    val w = Window.partitionBy(entityCol).orderBy(col(secCol), col(idCol))
    events
      .select(col(entityCol), col(typeCol).as("to_type"),
        lag(col(typeCol), 1).over(w).as("from_type"))
      .filter(col("from_type").isNotNull)
      .groupBy("from_type", "to_type")
      .agg(count(lit(1)).as("n"))
  }

  /** Journey-grain transition counts for Markov attribution: each
    * entity's ordered event-type sequence, truncated at its FIRST
    * `convType` occurrence, becomes the chain
    * start → t₁ → … → tₙ → (conv | null). Output (f, t, cnt).
    *
    * The per-entity array is bounded by that entity's activity (the
    * q205 sequence-pattern shape), and everything after the explode is
    * state-pair grain — a handful of rows at any corpus size. */
  def journeyTransitions(events: DataFrame, entityCol: String, tsCol: String,
                         idCol: String, typeCol: String,
                         convType: String): DataFrame = {
    val seqs = events
      .groupBy(col(entityCol))
      .agg(array_sort(collect_list(
        struct(col(tsCol), col(idCol), col(typeCol).as("t")))).as("s"))
      .select(transform(col("s"), x => x.getField("t")).as("types"))
    val idx = array_position(col("types"), convType)
    val pre = when(idx > 0, slice(col("types"), lit(1), (idx - 1).cast("int")))
      .otherwise(col("types"))
    val endSt = when(idx > 0, lit("conv")).otherwise(lit("null"))
    seqs.select(concat(array(lit("start")), pre, array(endSt)).as("full"))
      .select(explode(transform(sequence(lit(1), size(col("full")) - 1),
        i => struct(element_at(col("full"), i).as("f"),
          element_at(col("full"), i + 1).as("t")))).as("p"))
      .groupBy(col("p.f").as("f"), col("p.t").as("t"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Markov removal-effect attribution over journey transition counts:
    * P(conv within `steps` hops of 'start') for the full chain and with
    * each channel's edges deleted (no renormalization — lost mass is
    * lost, the standard removal-effect rule); a channel's credit is
    * `1 − P₋c/P`. The transition matrix is STATE-PAIR grain —
    * (channels+3)² rows at any corpus size — so like MMR's candidate
    * matrix it is collected to the driver (bounded, documented) and the
    * `steps` power iterations run as scalar arithmetic. Every per-term
    * product is quantized to 1e-12 integer units before the
    * order-independent sum, so the DuckDB oracle's unrolled-CTE replay
    * matches bit-for-bit. Output (removed, p_conv, removal_effect). */
  def markovRemovalEffects(trans: DataFrame, channels: Seq[String],
                           steps: Int): DataFrame = {
    val spark = trans.sparkSession
    val rows = trans.select(col("f"), col("t"), col("cnt").cast(LongType)).collect()
    val cnt = rows.map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val out = cnt.toSeq.groupBy(_._1._1).map { case (f, xs) => f -> xs.map(_._2).sum }
    val p = cnt.map { case ((f, t), c) => (f, t) -> c.toDouble / out(f).toDouble } ++
      Map(("conv", "conv") -> 1.0, ("null", "null") -> 1.0)
    def r6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6
    def pconv(removed: Option[String]): Double = {
      val edges = p.filterNot { case ((f, t), _) =>
        removed.exists(r => f == r || t == r) }
      var v = Map("start" -> 1.0)
      (1 to steps).foreach { _ =>
        v = edges.toSeq
          .flatMap { case ((f, t), pp) =>
            v.get(f).map(x => t -> math.floor(x * pp * 1e12 + 0.5).toLong) }
          .groupBy(_._1)
          .map { case (t, xs) => t -> xs.map(_._2).sum / 1e12 }
      }
      v.getOrElse("conv", 0.0)
    }
    val base = pconv(None)
    val outRows = ("none", r6(base), 0.0) +: channels.map { c =>
      val pc = pconv(Some(c))
      // conversion-free corpus: base = 0 makes 1 − pc/base a 0/0 NaN;
      // removing a channel from a chain that never converts changes
      // nothing, so the defined answer is 0.
      val eff = if (base == 0.0) 0.0 else r6(1.0 - pc / base)
      (c, r6(pc), eff)
    }
    import spark.implicits._
    outRows.toDF("removed", "p_conv", "removal_effect").orderBy("removed")
  }

  /** Cohort retention matrix: entities grouped by first-active ISO week,
    * counted in every week they were active. Output
    * (cohort_week date, week_offset long, n_entities long), offset 0 =
    * the cohort's own week. */
  def cohortRetention(events: DataFrame, entityCol: String,
                      tsCol: String): DataFrame = {
    val weeks = events
      .select(col(entityCol),
        date_trunc("week", col(tsCol)).cast(DateType).as("week"))
      .distinct()
    val cohort = weeks.withColumn("cohort_week",
      min(col("week")).over(Window.partitionBy(entityCol)))
    cohort.groupBy(col("cohort_week"),
        (datediff(col("week"), col("cohort_week")) / lit(7))
          .cast(LongType).as("week_offset"))
      .agg(count(lit(1)).as("n_entities"))
      .orderBy("cohort_week", "week_offset")
  }
}
