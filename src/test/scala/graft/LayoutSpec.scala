package graft

import graft.operators.Layout
import org.apache.spark.sql.functions._

/** Proves the shuffle-avoidance claims by inspecting executed plans. */
class LayoutSpec extends SparkSpec {
  import spark.implicits._

  test("same-bucketed tables join and aggregate with no Exchange") {
    val orders = (1L to 1000L).map(i => (i, s"o$i", (i % 7).toDouble)).toDF("key", "oname", "amt")
    val items  = (1L to 3000L).map(i => (i % 1000 + 1, s"i$i")).toDF("key", "iname")
    Layout.writeBucketed(orders, "t_orders_b", "key", 4)
    Layout.writeBucketed(items, "t_items_b", "key", 4)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force non-broadcast path
    try {
      val joined = Layout.bucketedJoin(spark, "t_orders_b", "t_items_b", "key")
        .groupBy("key").agg(count(lit(1)).as("cnt"))
      assert(joined.count() == 1000)
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"expected no shuffle, got:\n$plan")
      // and the join keyed correctly
      val r = joined.filter($"key" === 1L).collect()(0)
      assert(r.getAs[Long]("cnt") == 3L)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS t_orders_b")
      spark.sql("DROP TABLE IF EXISTS t_items_b")
    }
  }

  test("z-ordered layout writes files whose (a,b) rectangles are skippable") {
    // uniform 2-d keys; after writeZOrdered each file's min/max rectangle
    // must cover a small fraction of the key plane — that rectangle IS
    // the parquet footer stat a reader prunes on
    val df = (0 until 20000).map { i =>
      val h = i * 2654435761L % (1L << 31) // Knuth multiplicative mixer
      (h % 256, h / 256 % 256)
    }.toDF("a", "b")
    val path = java.nio.file.Files.createTempDirectory("zord").toString + "/t"
    Layout.writeZOrdered(df, "a", "b", path, partitions = 16)
    val rects = spark.read.parquet(path)
      .groupBy(input_file_name().as("f"))
      .agg(min("a").as("la"), max("a").as("ha"), min("b").as("lb"), max("b").as("hb"))
      .select(($"ha" - $"la" + 1) * ($"hb" - $"lb" + 1)).as[Long].collect()
    assert(rects.nonEmpty)
    val avgArea = rects.sum.toDouble / rects.length
    // 16 files over a 256×256 plane: z-order keeps each file near
    // 65536/16 ≈ 4096; a random or single-column layout sits near 65536
    assert(avgArea < 65536.0 / 4, s"files not localized: avg rect area $avgArea")
  }

  test("z-ordered layout actually prunes row groups at read time; unsorted decodes everything") {
    // end-to-end proof of the skipping claim: same rows, same predicate,
    // the SCAN's numOutputRows (rows decoded after parquet row-group
    // stat pruning, before Spark's residual Filter) must collapse under
    // the z-ordered layout and stay full-table under a random layout
    import org.apache.spark.sql.execution.FileSourceScanExec
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .select("l_partkey", "l_suppkey", "l_quantity")
    val base = java.nio.file.Files.createTempDirectory("skip").toString
    li.repartition(8).write.mode("overwrite").parquet(s"$base/rand")
    Layout.writeZOrdered(li, "l_partkey", "l_suppkey", s"$base/zord", partitions = 8)
    def run(path: String): (Long, Long) = {
      val q = spark.read.parquet(path)
        .filter($"l_partkey" < 25 && $"l_suppkey" < 3)
      val matched = q.count()
      q.collect() // no-shuffle plan: scan metrics readable directly
      val scan = q.queryExecution.executedPlan.collectLeaves()
        .collectFirst { case s: FileSourceScanExec => s }.get
      (matched, scan.metrics("numOutputRows").value)
    }
    val (nRand, decodedRand) = run(s"$base/rand")
    val (nZord, decodedZord) = run(s"$base/zord")
    assert(nRand == nZord && nRand > 0) // layout must not change the answer
    assert(decodedRand == li.count(), // random layout: stats prune nothing
      s"expected full decode on random layout, got $decodedRand")
    assert(decodedZord <= decodedRand / 3,
      s"z-order pruned nothing: decoded $decodedZord of $decodedRand")
  }

  test("compact collapses a small-file directory without changing the data") {
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .select("l_orderkey", "l_partkey", "l_quantity")
    val base = java.nio.file.Files.createTempDirectory("compact").toString
    li.repartition(64).write.mode("overwrite").parquet(s"$base/small")
    val (before, after) =
      Layout.compact(spark, s"$base/small", s"$base/big", targetFileBytes = 1L << 30)
    assert(before >= 64 && after == 1, s"$before -> $after")
    // compaction must be a pure layout change
    val a = spark.read.parquet(s"$base/big")
    assert(a.count() == li.count())
    assert(a.agg(sum($"l_quantity"), sum($"l_orderkey")).collect()(0) ==
      li.agg(sum($"l_quantity"), sum($"l_orderkey")).collect()(0))
    intercept[IllegalArgumentException] {
      Layout.compact(spark, s"$base/big", s"$base/big")
    }
  }

  test("partitioned layout prunes directories at planning time") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val base = java.nio.file.Files.createTempDirectory("hivepart").toString + "/docs"
    Layout.writePartitioned(docs, "lang", base)
    val all = spark.read.parquet(base)
    val one = all.filter($"lang" === "en")
    // read-time proof: the files the executed scan SELECTED (inputFiles
    // would show the pre-pruning listing) are only the lang=en directory
    val files = one.queryExecution.executedPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.selectedPartitions.toPartitionArray.map(_.urlEncodedPath).toSeq
    }.flatten
    assert(files.nonEmpty && files.forall(_.contains("lang=en")),
      files.take(3).mkString(", "))
    assert(files.length < all.inputFiles.length)
    // and the predicate shows as a PartitionFilter, not a data filter
    val scan = one.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters") && scan.contains("lang"), scan)
    // values survive the layout round-trip (partition col is re-attached)
    assert(one.count() == docs.filter($"lang" === "en").count())
    assert(one.agg(sum($"doc_id")).collect()(0).getLong(0) ==
      docs.filter($"lang" === "en").agg(sum($"doc_id")).collect()(0).getLong(0))
  }

  test("dynamic partition pruning: a filtered dim prunes the partitioned fact at runtime") {
    // the 100 TB shape: fact Hive-partitioned on the join key's dimension
    // attribute; DPP turns the dim filter into a runtime partition filter
    // on the fact scan, so only matching directories are read even though
    // the literal predicate sits on the OTHER side of the join
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val base = java.nio.file.Files.createTempDirectory("dpp").toString + "/docs"
    Layout.writePartitioned(docs, "lang", base)
    val fact = spark.read.parquet(base)
    val langs = docs.select($"lang").distinct().count()
    // dim must be a real scan with a selective filter — DPP's planning
    // rule only injects the runtime subquery when the build side filters
    val dimPath = base + "_dim"
    docs.select($"lang").distinct()
      .withColumn("lang_name", upper($"lang"))
      .write.mode("overwrite").parquet(dimPath)
    val dim = spark.read.parquet(dimPath).filter($"lang_name" === "EN")
    val j = fact.join(dim, "lang").groupBy("lang").agg(count(lit(1)).as("n"))
    val rows = j.collect()
    // the optimized plan carries a dynamicpruning subquery on the fact scan
    val planStr = j.queryExecution.executedPlan.toString
    assert(planStr.contains("dynamicpruning"), s"no DPP filter in plan:\n$planStr")
    // and the executed fact scan READ only one of the lang partitions —
    // runtime pruning surfaces in the scan's metrics (AQE nests the scan
    // inside query stages, so traverse through them)
    def scans(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.FileSourceScanExec] = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        scans(a.executedPlan)
      case s: org.apache.spark.sql.execution.adaptive.QueryStageExec => scans(s.plan)
      case f: org.apache.spark.sql.execution.FileSourceScanExec => Seq(f)
      case other => other.children.flatMap(scans)
    }
    val factScan = scans(j.queryExecution.executedPlan)
      .filter(_.toString.contains("dynamicpruning"))
    assert(factScan.nonEmpty, "no fact scan with a dynamicpruning filter found")
    val partsRead = factScan.head.metrics("numPartitions").value
    assert(partsRead == 1L,
      s"fact scan read $partsRead of $langs partitions — DPP did not prune")
    assert(rows.length == 1 &&
      rows(0).getAs[Long]("n") == docs.filter($"lang" === "en").count())
  }

  test("parquet aggregate pushdown: MIN/MAX/COUNT answered from footer statistics") {
    // at 100 TB a MAX over a raw parquet lake should read row-group
    // statistics, not decode every page — the v2 reader pushes the whole
    // aggregate into the scan (plan shows PushedAggregation)
    val dir = java.nio.file.Files.createTempDirectory("aggpush").toString + "/t"
    (1L to 10000L).map(i => (i, i * 2.0)).toDF("id", "v")
      .write.mode("overwrite").parquet(dir)
    val prevV1 = spark.conf.get("spark.sql.sources.useV1SourceList")
    spark.conf.set("spark.sql.sources.useV1SourceList", "")
    spark.conf.set("spark.sql.parquet.aggregatePushdown", "true")
    try {
      val agg = spark.read.parquet(dir).agg(
        min($"id").as("lo"), max($"id").as("hi"), count(lit(1)).as("n"))
      val r = agg.collect()(0)
      assert((r.getLong(0), r.getLong(1), r.getLong(2)) == (1L, 10000L, 10000L))
      val plan = agg.queryExecution.executedPlan.toString
      assert(plan.contains("PushedAggregation: [MIN(id), MAX(id), COUNT(*)]"),
        s"aggregate not pushed to the scan:\n$plan")
    } finally {
      spark.conf.set("spark.sql.sources.useV1SourceList", prevV1)
      spark.conf.set("spark.sql.parquet.aggregatePushdown", "false")
    }
  }

  test("schema evolution: mergeSchema unions parquet parts, null-fills old rows") {
    val dir = java.nio.file.Files.createTempDirectory("evolve").toString
    Seq((1L, "a")).toDF("id", "a").write.parquet(s"$dir/w1")
    Seq((2L, "b", 9.5)).toDF("id", "a", "b").write.parquet(s"$dir/w2")
    val merged = spark.read.option("mergeSchema", "true").parquet(s"$dir/w1", s"$dir/w2")
    assert(merged.columns.sorted.toSeq == Seq("a", "b", "id"))
    val rows = merged.orderBy("id").collect()
    assert(rows(0).isNullAt(rows(0).fieldIndex("b"))) // old writer's rows null-fill
    assert(rows(1).getDouble(rows(1).fieldIndex("b")) == 9.5)
  }

  test("non-bucketed baseline of the same join does shuffle") {
    val a = (1L to 100L).map(i => (i, i * 2)).toDF("key", "x")
    val b = (1L to 100L).map(i => (i, i * 3)).toDF("key", "y")
    val j = a.repartition(4).join(b.repartition(4), "key").groupBy("key").count()
    j.collect()
    assert(j.queryExecution.executedPlan.toString.contains("Exchange"))
  }
}
