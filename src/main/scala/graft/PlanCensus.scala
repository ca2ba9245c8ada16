package graft

/** Dev probe: a repeated-expensive-expression census over EVERY registry
  * query's physical plan. Round 9 found band-key consumers evaluating
  * the MinHash signature 32× per row because higher-order-function
  * lambdas block codegen subexpression elimination, so an aliased
  * pipeline that gets re-inlined (by hand or by a future CollapseProject
  * change) silently multiplies per-row cost by the number of consumer
  * slots — and nothing in the correctness gate notices, because the
  * answers stay right. PlanShapeSpec now guards the three known LSH
  * consumers; this probe is the corpus-wide sweep that says whether ANY
  * other plan carries the same signature.
  *
  * For each query it builds the executed plan at a small sf (plan
  * construction only — iterative operators do run their driver loops,
  * which is why the default sf is 0.001) and counts occurrences of each
  * expensive-expression marker: the six native codegen expressions
  * (graft_minhash / graft_hash60 / graft_dotq / graft_jaro_winkler /
  * graft_wordpiece / graft_dhash), the md5 base hash under
  * [[graft.functions.TextFns.portableHash]], and `lambdafunction(` (an
  * interpreted HOF body — fine per se, expensive when the same one
  * repeats). A marker count says "this plan evaluates the marked
  * expression N times SOMEWHERE" — across different columns or plan
  * stages that's legitimate, so the output is an adjudication worklist,
  * not a pass/fail: entries at or above `--flag` (default 8, a quarter
  * of the 32× defect) deserve a look.
  *
  * Usage: `runMain graft.PlanCensus [sfDir [outFile]]`. Writes one JSON
  * object: per-query nonzero marker counts, the flagged subset, and the
  * per-marker corpus maxima. */
object PlanCensus {
  private val Markers: Seq[String] = Seq(
    "graft_minhash", "graft_hash60", "graft_dotq", "graft_jaro_winkler",
    "graft_wordpiece", "graft_dhash", "md5(", "lambdafunction(")

  private def count(hay: String, needle: String): Int = {
    var n = 0; var i = hay.indexOf(needle)
    while (i >= 0) { n += 1; i = hay.indexOf(needle, i + needle.length) }
    n
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val outFile = if (args.length > 1) args(1) else "PLANCENSUS.json"
    val flagAt = sys.env.getOrElse("SPARK_GRAFT_CENSUS_FLAG", "8").toInt
    val spark = GraftSession.local(
      cores = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"),
      app = "graft-plan-census", periodicGC = "10h")
    val rows = scala.collection.mutable.LinkedHashMap.empty[String, Seq[(String, Int)]]
    val failed = scala.collection.mutable.ArrayBuffer.empty[String]
    // SPARK_GRAFT_CENSUS_DUMP=<dir>: write each flagged query's raw plan
    // text there, for offline duplicate-call adjudication (identical
    // full-call substrings inside one node line = definite recompute;
    // distinct args across calls = legitimate breadth).
    val dumpDir = sys.env.get("SPARK_GRAFT_CENSUS_DUMP")
    dumpDir.foreach(d => java.nio.file.Files.createDirectories(java.nio.file.Paths.get(d)))
    for (q <- Queries.all.sortBy(_.name)) {
      try {
        val plan = q.run(spark, sfDir).queryExecution.executedPlan.toString()
        val counts = Markers.map(m => m -> count(plan, m)).filter(_._2 > 0)
        if (counts.nonEmpty) rows(q.name) = counts
        // flagAt <= 0 dumps every plan (for sweeps that look for
        // marker-less shapes, e.g. isnotnull-of-a-big-derivation)
        if (flagAt <= 0 || counts.exists(_._2 >= flagAt)) dumpDir.foreach { d =>
          java.nio.file.Files.write(
            java.nio.file.Paths.get(d, s"${q.name}.plan.txt"),
            plan.getBytes("UTF-8"))
        }
      } catch { case e: Throwable =>
        System.err.println(s"[census] ${q.name} failed: ${e.getMessage}")
        failed += q.name
      }
      graft.operators.Ckpt.release(spark)
      System.gc()
    }
    val flagged = rows.collect {
      case (n, cs) if cs.exists(_._2 >= flagAt) => n -> cs.filter(_._2 >= flagAt)
    }
    val maxima = Markers.map { m =>
      val hits = rows.toSeq.flatMap { case (n, cs) =>
        cs.collectFirst { case (`m`, c) => (n, c) } }
      m -> hits.sortBy(-_._2).headOption
    }
    def entry(cs: Seq[(String, Int)]): String =
      cs.map { case (m, c) => s""""$m":$c""" }.mkString("{", ",", "}")
    val json = new StringBuilder
    json ++= s"""{"metric":"plan_expr_census","sf":"$sfDir","flag_at":$flagAt"""
    json ++= s""","n_queries":${Queries.all.size},"n_with_markers":${rows.size}"""
    json ++= s""","failed":[${failed.map("\"" + _ + "\"").mkString(",")}]"""
    json ++= s""","flagged":{${flagged.map { case (n, cs) => s""""$n":${entry(cs)}""" }.mkString(",")}}"""
    json ++= s""","marker_max":{${maxima.collect {
      case (m, Some((n, c))) => s""""$m":{"query":"$n","count":$c}""" }.mkString(",")}}"""
    json ++= s""","queries":{${rows.map { case (n, cs) => s""""$n":${entry(cs)}""" }.mkString(",")}}}"""
    java.nio.file.Files.write(java.nio.file.Paths.get(outFile),
      json.toString.getBytes("UTF-8"))
    println(json.toString)
    spark.stop()
  }
}
