package graft

/** Wide-sweep benchmark: ONE cold pass over EVERY registry query (not
  * just the headline set) so a perf regression in the ~250 non-headline
  * queries is visible round-over-round. Headline queries get the
  * variance-controlled treatment in `Bench` (5 warm medians + CV); here
  * the goal is breadth, not precision — a single cold time per query is
  * enough to flag a 2×+ drift, and one pass keeps the sweep to minutes.
  *
  * Usage: `runMain graft.BenchWide [outFile]` with SPARK_GRAFT_SF_DIR
  * (default sf0.1). Writes one JSON object: per-query cold seconds,
  * total, and a `failed` list (failures are excluded from the total so
  * a broken query can never make the sweep look faster). Cadence: run
  * once per round, commit as BENCHWIDE.json (see README).
  */
object BenchWide {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val outFile = if (args.nonEmpty) args(0) else "BENCHWIDE.json"
    // per-query System.gc() below already keeps the cleaner fed; a 2min
    // periodic GC would land mid-query and stall the measurement
    val spark = GraftSession.local(
      cores = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"), app = "graft-benchwide",
      periodicGC = "10h")
    val results = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    val failed = scala.collection.mutable.ArrayBuffer.empty[String]
    for (q <- Queries.all.sortBy(_.name)) {
      val t0 = System.nanoTime()
      try {
        q.run(spark, sfDir).count()
        results(q.name) = math.rint((System.nanoTime() - t0) / 1e6) / 1e3
      } catch { case e: Throwable =>
        System.err.println(s"[benchwide] ${q.name} failed: ${e.getMessage}")
        failed += q.name
      }
      // free localCheckpoint blocks between queries — 280+ plans in one
      // session would otherwise accumulate storage until eviction noise
      // pollutes the timings — and GC so ContextCleaner reclaims each
      // query's shuffle/broadcast state before the next one is timed
      // (see Bench: un-collected driver heap degrades later passes 4×)
      graft.operators.Ckpt.release(spark)
      System.gc()
    }
    val total = math.rint(results.values.sum * 1000) / 1000
    val json = new StringBuilder
    json ++= s"""{"metric":"wide_cold_total_sec","value":$total,"unit":"sec","sf":"$sfDir","n_queries":${results.size}"""
    json ++= s""","failed":[${failed.map("\"" + _ + "\"").mkString(",")}]"""
    json ++= ""","queries":{"""
    json ++= results.map { case (n, s) => s""""$n":$s""" }.mkString(",")
    json ++= "}}"
    java.nio.file.Files.write(java.nio.file.Paths.get(outFile),
      json.toString.getBytes("UTF-8"))
    println(json.toString)
    spark.stop()
  }
}
