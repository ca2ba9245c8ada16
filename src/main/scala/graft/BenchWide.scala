package graft

/** Wide-sweep benchmark: ONE cold pass over EVERY registry query (not
  * just the headline set) so a perf regression in the ~250 non-headline
  * queries is visible round-over-round. Headline queries get the
  * variance-controlled treatment in `Bench` (5 warm medians + CV); here
  * the goal is breadth, not precision — a single cold time per query is
  * enough to flag a 2×+ drift, and one pass keeps the sweep to minutes.
  *
  * Usage: `runMain graft.BenchWide [outFile [shardIdx numShards]]` with
  * SPARK_GRAFT_SF_DIR (default sf0.1). Writes one JSON object: per-query
  * cold seconds, total, and a `failed` list (failures are excluded from
  * the total so a broken query can never make the sweep look faster).
  *
  * SHARDED protocol (round 14, VERDICT r13 #4): both r12 and r13 sweeps
  * ran ~1.5× faster at their end than their start (intra-sweep probe
  * spread 0.706/0.596) — a systematic JVM/page-cache warm-up over one
  * 298-query JVM that forced per-query flags to be suppressed. Running
  * the sweep as N fresh-JVM shards (tools/benchwide_sharded.sh, default
  * 4 × ~75 queries, shard membership pinned by sorted name order, one
  * probe pair per shard) amortizes warm-up per shard, so each shard's
  * intra-shard spread lands inside the qualification bar and per-query
  * flagging is adjudicable again. `shardIdx numShards` selects the
  * contiguous slice of the name-sorted registry; the merge tool
  * (tools/merge_benchwide.py) combines shard outputs into one
  * BENCHWIDE.json with per-shard spreads recorded. Cadence: run the
  * sharded sweep once per round, commit as BENCHWIDE.json (see README).
  */
object BenchWide {
  /** Fixed CALIBRATION PROBE (round 12, VERDICT r11 #5): ten queries
    * spanning the box's load axes — parquet-scan-bound (q01/q41/q11),
    * shuffle-join (q03/q70/q80), window (q06), sessionization (q37),
    * vector-CPU (q28), and LSH/checkpoint (q22) — run with 3 warm passes
    * BEFORE and AFTER the cold sweep. The probe's round-over-round ratio
    * estimates box drift INDEPENDENTLY of the 297 swept queries it is
    * used to de-drift (the r11 estimate was the median over the same
    * queries it then corrected — circular), and the before/after pair
    * bounds intra-sweep drift. Names are pinned: changing this list
    * breaks round-over-round comparability.
    *
    * Side effect, by design (ADVICE r12): the before-probe pre-warms
    * JIT/codegen and the page cache for exactly these ten queries, so
    * their entries in the SWEEP are warm-biased — symmetric in any two
    * probe-carrying snapshots, but not against a pre-r12 one.
    * `tools/diff_benchwide.py` therefore EXCLUDES the probe queries from
    * per-query flagging (their drift duty is served by the probe block
    * itself); the r12→r13 transition is the last diff to straddle the
    * discontinuity. */
  val ProbeQueries: Seq[String] = Seq(
    "q01_groupby_agg", "q41_region_revenue", "q11_monthly_trend",
    "q03_join_revenue", "q70_asof_join", "q80_range_join",
    "q06_window_topn", "q37_sessionize", "q28_ann_brute",
    "q22_minhash_lsh")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val outFile = if (args.nonEmpty) args(0) else "BENCHWIDE.json"
    val (shardIdx, numShards) =
      if (args.length >= 3) (args(1).toInt, args(2).toInt) else (0, 1)
    require(numShards >= 1 && shardIdx >= 0 && shardIdx < numShards,
      s"shard $shardIdx of $numShards is not a valid slice")
    // per-query System.gc() below already keeps the cleaner fed; a 2min
    // periodic GC would land mid-query and stall the measurement
    val spark = GraftSession.local(
      cores = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"), app = "graft-benchwide",
      periodicGC = "10h")

    def timed(q: Q): Option[Double] = {
      val t0 = System.nanoTime()
      val r = try { q.run(spark, sfDir).count()
                    Some(math.rint((System.nanoTime() - t0) / 1e6) / 1e3) }
              catch { case e: Throwable =>
                System.err.println(s"[benchwide] ${q.name} failed: ${e.getMessage}")
                None }
      // free localCheckpoint blocks between queries — 280+ plans in one
      // session would otherwise accumulate storage until eviction noise
      // pollutes the timings — and GC so ContextCleaner reclaims each
      // query's shuffle/broadcast state before the next one is timed
      // (see Bench: un-collected driver heap degrades later passes 4×)
      graft.operators.Ckpt.release(spark)
      System.gc()
      r
    }
    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted
      if (s.size % 2 == 1) s(s.size / 2) else (s(s.size / 2 - 1) + s(s.size / 2)) / 2.0
    }
    // The probe list is load-bearing for round-over-round drift
    // comparability: a renamed/removed query silently shrinking the
    // estimator would bias every future diff (ADVICE r12) — fail loudly
    // instead.
    ProbeQueries.foreach { n =>
      require(Queries.all.exists(_.name == n),
        s"BenchWide.ProbeQueries pins '$n' but no registry query has " +
          "that name — the drift estimator must never shrink silently")
    }
    // one untimed pass warms JIT/parquet footers, then median of 3
    def probe(): Seq[(String, Double)] =
      ProbeQueries.flatMap { n =>
        Queries.all.find(_.name == n).flatMap { q =>
          timed(q)
          val warms = (1 to 3).flatMap(_ => timed(q))
          if (warms.size == 3) Some(q.name -> median(warms)) else None
        }
      }

    // Shard membership is PINNED by sorted-name order + contiguous
    // slicing: same registry + same numShards → same membership, so a
    // query's cold time is always measured in the same warm-up context
    // round-over-round (the property per-query diffs rest on).
    val sorted = Queries.all.sortBy(_.name)
    val lo = sorted.size.toLong * shardIdx / numShards
    val hi = sorted.size.toLong * (shardIdx + 1) / numShards
    val slice = sorted.slice(lo.toInt, hi.toInt)

    val probeBefore = probe()
    val results = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    val failed = scala.collection.mutable.ArrayBuffer.empty[String]
    for (q <- slice)
      timed(q) match {
        case Some(s) => results(q.name) = s
        case None => failed += q.name
      }
    val probeAfter = probe()

    val total = math.rint(results.values.sum * 1000) / 1000
    def obj(rs: Seq[(String, Double)]): String =
      rs.map { case (n, s) => s""""$n":$s""" }.mkString("{", ",", "}")
    val json = new StringBuilder
    json ++= s"""{"metric":"wide_cold_total_sec","value":$total,"unit":"sec","sf":"$sfDir","n_queries":${results.size}"""
    json ++= s""","shard":$shardIdx,"n_shards":$numShards"""
    json ++= s""","failed":[${failed.map("\"" + _ + "\"").mkString(",")}]"""
    json ++= s""","probe_before":${obj(probeBefore)},"probe_after":${obj(probeAfter)}"""
    json ++= s""","queries":${obj(results.toSeq)}}"""
    java.nio.file.Files.write(java.nio.file.Paths.get(outFile),
      json.toString.getBytes("UTF-8"))
    println(json.toString)
    spark.stop()
  }
}
