package graft

import graft.operators.{Ckpt, Dedup, Similarity}
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** The two 100 TB safety rails added in round 4: the LSH mega-bucket cap
  * (bounded candidate volume under boilerplate skew, observable drops) and
  * the localCheckpoint unpersist lifecycle (no storage accumulation across
  * repeated operator invocations in one session). */
class CkptCapSpec extends SparkSpec {
  import spark.implicits._

  /** 200 identical boilerplate docs (one (band,key) bucket per band holds
    * all of them) plus two genuine near-dups outside the mega-bucket. */
  private def megaDocs = {
    val boiler = (1 to 200).map(i =>
      (i.toLong, "all rights reserved standard license boilerplate header text for every page"))
    val real = Seq(
      (1001L, "the quick brown fox jumps over the lazy dog again and again today"),
      (1002L, "the quick brown fox jumps over the lazy dog again and again tonight"))
    (boiler ++ real).toDF("doc_id", "text")
  }

  test("minhash maxBucket drops the mega-bucket, keeps pairs outside it") {
    val capped = Dedup.minhashLshPairs(megaDocs, "doc_id", "text", maxBucket = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(capped.toSet == Set((1001L, 1002L)),
      s"expected only the out-of-bucket near-dup pair, got ${capped.length} pairs")
    Ckpt.release(spark)
  }

  test("without the cap the mega-bucket floods the pair list") {
    val n = Dedup.minhashLshPairs(megaDocs, "doc_id", "text").count()
    assert(n == 200L * 199 / 2 + 1) // all boilerplate pairs + the near-dup
    Ckpt.release(spark)
  }

  test("simhash maxBucket bounds candidates the same way") {
    val capped = Dedup.simhashPairs(megaDocs, "doc_id", "text", maxBucket = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(!capped.exists(p => p._1 <= 200L || p._2 <= 200L))
    Ckpt.release(spark)
  }

  test("cap drops are observable, never silent") {
    @volatile var dropped = -1L
    val listener = new QueryExecutionListener {
      override def onSuccess(f: String, qe: QueryExecution, d: Long): Unit =
        qe.observedMetrics.collectFirst {
          // per-invocation sequence number between tag and _cap suffix
          case (name, row) if name.startsWith("minhash_lsh_") && name.endsWith("_cap") => row
        }.foreach { row =>
          dropped = row.getAs[Long]("rows_in_dropped_buckets")
        }
      override def onFailure(f: String, qe: QueryExecution, e: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      Dedup.minhashLshPairs(megaDocs, "doc_id", "text", maxBucket = 10).count()
      // the listener bus is async — poll briefly
      val deadline = System.nanoTime() + 10_000_000_000L
      while (dropped < 0 && System.nanoTime() < deadline) Thread.sleep(50)
      assert(dropped == 200L * 8, s"expected 200 rows x 8 bands in dropped buckets, saw $dropped")
    } finally {
      spark.listenerManager.unregister(listener)
      Ckpt.release(spark)
    }
  }

  test("two capped invocations compose into ONE plan — observe names are unique") {
    // Before the per-invocation sequence suffix, this union failed analysis
    // with "duplicate observed metrics" (same CollectMetrics name twice).
    val a = Dedup.minhashLshPairs(megaDocs, "doc_id", "text", maxBucket = 10)
    val b = Dedup.minhashLshPairs(megaDocs, "doc_id", "text", maxBucket = 10)
    assert(a.union(b).count() == 2) // the out-of-bucket near-dup pair, twice
    Ckpt.release(spark)
  }

  test("Ckpt registry is keyed by applicationId — stale contexts are pruned") {
    // Ids tracked under a stopped SparkContext must never be unpersisted in
    // a successor context where RDD ids restart from 0 and could alias.
    Ckpt.idsFor("app-from-a-stopped-context") += 999999
    assert(Ckpt.trackedApps.contains("app-from-a-stopped-context"))
    val (ck, ids) = Ckpt.localScoped(megaDocs)
    ck.count()
    // touching the registry under the live context dropped the stale app
    assert(Ckpt.trackedApps == Set(spark.sparkContext.applicationId))
    Ckpt.releaseIds(spark, ids)
  }

  test("release alone prunes stopped contexts — no checkpoint required first") {
    // A restarted JVM whose new session only ever calls release (never
    // localScoped) must still shed its predecessor's stale ids: liveness,
    // not supersession-by-checkpoint, keys the prune.
    Ckpt.idsFor("another-stopped-context") += 424242
    assert(Ckpt.trackedApps.contains("another-stopped-context"))
    Ckpt.release(spark)
    assert(Ckpt.trackedApps == Set(spark.sparkContext.applicationId))
  }

  test("Ckpt.release unpersists every checkpoint a query registered") {
    val before = spark.sparkContext.getPersistentRDDs.keySet.toSet
    Dedup.minhashLshPairs(megaDocs, "doc_id", "text").count()
    assert(spark.sparkContext.getPersistentRDDs.keySet.toSet != before,
      "the LSH path should have registered checkpoint blocks")
    Ckpt.release(spark)
    assert(spark.sparkContext.getPersistentRDDs.keySet.toSet == before)
  }

  test("release is SYNCHRONOUS — blocks are gone the moment it returns") {
    // unpersist(blocking = false) only enqueues removal: a loop producing
    // checkpoint generations faster than the async drain accumulates
    // storage without bound (the q227/q214 sf10 spread's root cause —
    // SCALE_r10 q227_steady_state: one pass fit a 24 g heap, seven OOMed).
    //
    // ADVICE r11: the original assertions read getRDDStorageInfo, which
    // enumerates the driver's persistentRdds map — a map unpersist clears
    // synchronously REGARDLESS of the blocking flag, so they passed even
    // under the async env knob (a vacuous guard). This version captures
    // the checkpoint's RDD ids and asks the BlockManagerMaster for actual
    // block state (askStorageEndpoints = true) immediately after release,
    // plus pins the blocking default directly — a regression to async
    // release flips isBlockingRelease and fails deterministically, and
    // any removal lag shows up as live blocks for the captured ids.
    import org.apache.spark.graftbridge.BlockBridge
    val sc = spark.sparkContext
    assert(Ckpt.isBlockingRelease,
      "blocking release is the contract default (SPARK_GRAFT_CKPT_ASYNC_RELEASE is an A/B-only knob)")
    val (ck, ids) = Ckpt.localScoped(megaDocs)
    assert(ck.count() == 202L)
    assert(ids.nonEmpty, "localScoped should have registered the checkpoint RDD")
    // block writes report to the master synchronously during the put
    // (tellMaster), so by count()'s return the endpoint state is settled
    assert(BlockBridge.rddBlocksFor(sc, ids).nonEmpty,
      "the checkpoint should hold BlockManager blocks before release")
    Ckpt.release(spark)
    val leftover = BlockBridge.rddBlocksFor(sc, ids)
    assert(leftover.isEmpty,
      s"blocking release must have dropped every block before returning: " +
        leftover.mkString(","))
    assert(sc.getPersistentRDDs.isEmpty)
  }

  /** Fork tools/graft_java.sh ProbeAsyncRelease and return its result
    * line. stderr is MERGED into stdout (ADVICE r13: with only stdout
    * drained, Spark's pre-setLogLevel INFO chatter on stderr could fill
    * the ~64 KB pipe buffer and deadlock the child on write — the result
    * line is found by its JSON marker, so merging is safe) and waitFor is
    * bounded so a hung probe fails the test instead of the whole suite. */
  private def runAsyncReleaseProbe(cycles: Int, async: Boolean): String = {
    val repo = new java.io.File(".").getCanonicalFile
    val pb = new java.lang.ProcessBuilder(
      s"$repo/tools/graft_java.sh", "4g", "graft.ProbeAsyncRelease", cycles.toString)
    if (async) pb.environment().put("SPARK_GRAFT_CKPT_ASYNC_RELEASE", "1")
    else pb.environment().remove("SPARK_GRAFT_CKPT_ASYNC_RELEASE")
    pb.environment().put("SPARK_GRAFT_CPUS", "4")
    pb.redirectErrorStream(true)
    val p = pb.start()
    // drain on a thread: the timeout must bite even if the child never
    // closes stdout (a blocking mkString on the main thread would hang
    // BEFORE waitFor and defeat the bound)
    val buf = new java.lang.StringBuilder
    val reader = new Thread(() => {
      val src = scala.io.Source.fromInputStream(p.getInputStream)
      try src.getLines().foreach { l => buf.synchronized { buf.append(l).append('\n') } }
      finally src.close()
    })
    reader.setDaemon(true)
    reader.start()
    val exited = p.waitFor(5, java.util.concurrent.TimeUnit.MINUTES)
    if (!exited) {
      p.destroyForcibly()
      fail(s"probe JVM did not exit within 5 minutes; output tail: " +
        buf.synchronized(buf.toString.takeRight(2000)))
    }
    reader.join(10000)
    val out = buf.synchronized(buf.toString)
    val rc = p.exitValue()
    assert(rc == 0, s"probe JVM exited $rc; output tail: ${out.takeRight(2000)}")
    out.linesIterator.find(_.contains("\"probe\":\"async_release\""))
      .getOrElse(fail(s"probe printed no result line; output tail: ${out.takeRight(2000)}"))
  }

  test("async-release CONTROL: the BlockBridge guard can fail when release is async") {
    // VERDICT r12 #6a: the blocking-default pin above is a config guard;
    // this leg proves the post-release BlockBridge check is BEHAVIORAL —
    // a forked JVM with SPARK_GRAFT_CKPT_ASYNC_RELEASE=1 (env is
    // immutable in-process, hence the fork) must OBSERVE leftover blocks
    // immediately after releaseIds returns, i.e. exactly the state the
    // main spec's assertion exists to catch. Measured before pinning:
    // async observes a leftover on cycle 1; blocking observes none in 50.
    val line = runAsyncReleaseProbe(200, async = true)
    assert(line.contains("\"blocking\":false"),
      s"env knob must flip the release mode in the forked JVM: $line")
    assert(!line.contains("\"leftover_observed\":0"),
      s"async release must be observable as leftover blocks (else the " +
        s"main spec's BlockBridge assertion is vacuous): $line")
  }

  test("blocking-release CONTROL: zero leftovers across every probe cycle") {
    // VERDICT r13 #5: the complementary leg — the same forked probe
    // WITHOUT the env knob must observe zero leftover blocks over all
    // its cycles, so the pair brackets the contract from both sides in
    // CI (async CAN leave leftovers; blocking NEVER does), not just the
    // failure direction. 200 cycles in the probe's blocking mode run
    // every cycle (each one is an assertion of the contract).
    val line = runAsyncReleaseProbe(200, async = false)
    assert(line.contains("\"blocking\":true"),
      s"probe without the env knob must run in blocking mode: $line")
    assert(line.contains("\"cycles\":200"),
      s"blocking mode must run every cycle, never early-exit: $line")
    assert(line.contains("\"leftover_observed\":0"),
      s"blocking release must never leave observable leftover blocks: $line")
  }

  test("session shuffle-partition default follows cores — the adjudicated rule") {
    // SCALE_r13 q119_partitions_ab: raising the default regresses the
    // checkpoint-heavy funnel family (q119 sf10 warm 68.0 s at 32 vs
    // 238.1 s at 128, min-of-legs over 3 interleaved fresh-JVM rounds);
    // the graph family opts INTO 128 via the env knob. A default flip
    // must fail here, not at the next scale run.
    assume(!sys.env.contains("SPARK_GRAFT_SHUFFLE_PARTITIONS"),
      "harness env knob set — the default rule is not observable")
    assert(GraftSession.shufflePartitions("32") == "32")
    assert(GraftSession.shufflePartitions("7") == "7")
  }

  test("clusters + release leave no persistent RDDs behind") {
    val before = spark.sparkContext.getPersistentRDDs.keySet.toSet
    val pairs = Dedup.minhashLshPairs(megaDocs, "doc_id", "text", maxBucket = 10)
    val labels = Dedup.clusters(pairs)
    assert(labels.collect().nonEmpty)
    Ckpt.release(spark)
    assert(spark.sparkContext.getPersistentRDDs.keySet.toSet == before)
  }

  test("embedding sign-LSH honors maxBucket") {
    val vecs = (1 to 100).map(i => (i.toLong, Array.fill(64)(1.0f), 0)) ++
      Seq((1001L, Array.tabulate(64)(j => if (j % 2 == 0) 1.0f else -1.0f), 1))
    val df = vecs.toDF("vec_id", "embedding", "label")
    val n = Similarity.lshNearDupPairs(df, 0.99, maxBucket = 10).count()
    assert(n == 0, s"identical-vector mega-bucket must be dropped, got $n pairs")
    Ckpt.release(spark)
  }
}
