package graft

import graft.operators.{Ckpt, Dedup, Graph}
import org.apache.spark.sql.DataFrame

/** Reliable-checkpoint mode (round 14, VERDICT r13 #2): with
  * `SPARK_GRAFT_CKPT_DIR` set, every Ckpt call becomes an eager
  * `Dataset.checkpoint` to durable storage — the fault-tolerant path for
  * the DP-loop families on a cluster, where the in-loop N−2 release makes
  * released localCheckpoint generations unrecoverable by design. This
  * spec pins the contract that makes the mode trustworthy:
  *
  *  - RESULT EQUIVALENCE: temporalBfs, cheapestPath, and Dedup.clusters
  *    return identical rows under both modes on fixture graphs whose
  *    loops run several generations (so the scoped release actually
  *    fires in the local leg).
  *  - MECHANISM: the reliable leg registers NO persistent RDDs (nothing
  *    for an executor loss to take) and writes real checkpoint files
  *    under the directory; scoped release is a structural no-op there.
  *
  * Env is immutable in-process, so the spec drives the mode through
  * Ckpt.reliableDirOverride — the same code path the env var selects
  * (reliableDir is consulted per call, not cached at class init). */
class CkptModeSpec extends SparkSpec {
  import spark.implicits._

  // A weighted temporal graph with a 6-node chain (forces ≥6 DP rounds —
  // deep enough that cheapestPath/temporalBfs release generations
  // in-loop) plus a diamond where the cheap path has MORE hops (the
  // relaxation must overwrite an earlier, worse arrival).
  private def edges = Seq(
    // chain 0→1→…→6, weight 1, timestamps increasing
    (0L, 1L, 1L, 10L), (1L, 2L, 1L, 20L), (2L, 3L, 1L, 30L),
    (3L, 4L, 1L, 40L), (4L, 5L, 1L, 50L), (5L, 6L, 1L, 60L),
    // diamond: 0→7 (w=10, early), 0→8→7 (w=1+1, later timestamps)
    (0L, 7L, 10L, 5L), (0L, 8L, 1L, 15L), (8L, 7L, 1L, 25L),
    // a temporal dead end: edge into 9 whose ets precedes any arrival
    (6L, 9L, 1L, 1L)
  ).toDF("src", "dst", "w", "ets")

  private def seeds = Seq(0L).toDF("id")

  // Near-dup pair list with a 5-long chain {10..14} (pointer doubling
  // needs >1 round), a triangle {20,21,22}, and an isolated pair.
  private def pairs = Seq(
    (10L, 11L), (11L, 12L), (12L, 13L), (13L, 14L),
    (20L, 21L), (21L, 22L), (20L, 22L),
    (30L, 31L)
  ).toDF("id_a", "id_b")

  private def rows(df: DataFrame): Set[Seq[Any]] =
    df.collect().map(_.toSeq).toSet

  /** Run `body` with Ckpt forced into reliable mode at `dir`; always
    * restore the default (env-driven) mode and drain the session blocks. */
  private def inReliableMode[A](dir: String)(body: => A): A = {
    Ckpt.reliableDirOverride = Some(Some(dir))
    try body
    finally {
      Ckpt.reliableDirOverride = None
      Ckpt.release(spark)
    }
  }

  private def inLocalMode[A](body: => A): A = {
    Ckpt.reliableDirOverride = Some(None) // force local even if env is set
    try body
    finally {
      Ckpt.reliableDirOverride = None
      Ckpt.release(spark)
    }
  }

  test("DP operators are mode-equivalent: reliable ≡ local results") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ckpt").toString
    val local = inLocalMode {
      (rows(Graph.temporalBfs(edges, seeds, maxHops = 10)),
        rows(Graph.cheapestPath(edges, seeds, maxHops = 10)),
        rows(Dedup.clusters(pairs)))
    }
    val reliable = inReliableMode(dir) {
      (rows(Graph.temporalBfs(edges, seeds, maxHops = 10)),
        rows(Graph.cheapestPath(edges, seeds, maxHops = 10)),
        rows(Dedup.clusters(pairs)))
    }
    assert(reliable._1 == local._1, "temporalBfs diverged across ckpt modes")
    assert(reliable._2 == local._2, "cheapestPath diverged across ckpt modes")
    assert(reliable._3 == local._3, "Dedup.clusters diverged across ckpt modes")
    // sanity on the fixture itself: the chain is traversed end-to-end,
    // the diamond's 2-hop path wins (cost 2 < 10), and the temporal
    // dead end is NOT reached (ets=1 < arrival 60 at node 6)
    val cost = local._2.map(r => r.head -> r(1)).toMap
    assert(cost(7L) == 2L, s"diamond relaxation should win with cost 2: $cost")
    assert(cost(6L) == 6L)
    val arr = local._1.map(r => r.head -> r(1)).toMap
    assert(!arr.contains(9L), s"time-respecting rule must block node 9: $arr")
  }

  test("reliable mode holds no block-manager state and writes durable files") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ckpt").toString
    val before = spark.sparkContext.getPersistentRDDs.keySet.toSet
    inReliableMode(dir) {
      assert(Ckpt.isReliable)
      val (ck, ids) = Ckpt.localScoped(Seq((1L, "a"), (2L, "b")).toDF("id", "t"))
      assert(ids.isEmpty, "reliable checkpoints must register no RDD ids")
      assert(ck.count() == 2L)
      // nothing for an executor loss to take: no new persistent RDDs
      assert(spark.sparkContext.getPersistentRDDs.keySet.toSet == before,
        "reliable mode must not add block-manager state")
      // the generation is real files on durable storage, written EAGERLY
      // (before any consuming action beyond the checkpoint itself)
      def files(p: java.nio.file.Path) = {
        val s = java.nio.file.Files.walk(p)
        try s.filter(java.nio.file.Files.isRegularFile(_))
          .filter(_.getFileName.toString.startsWith("part-")).count()
        finally s.close()
      }
      assert(files(java.nio.file.Paths.get(dir)) > 0,
        s"no checkpoint part-files under $dir")
      // releasing a file-backed generation is a no-op, never an error
      Ckpt.releaseIds(spark, ids)
      assert(ck.count() == 2L, "generation must survive its own release")
    }
  }

  test("local mode (the default) still tracks and releases block ids") {
    // guards the refactor: the block-registry path is unchanged when the
    // reliable knob is absent
    val (ck, ids) = inLocalMode {
      val r = Ckpt.localScoped(Seq((1L, "a")).toDF("id", "t"))
      r._1.count()
      assert(r._2.nonEmpty, "local mode must register the checkpoint RDD id")
      r
    }
    // inLocalMode's finally released the session's blocks
    assert(!spark.sparkContext.getPersistentRDDs.keySet.exists(ids.contains),
      "release must have dropped the tracked ids")
    assert(ck.queryExecution != null)
  }
}
