package graft

import graft.operators.Dedup
import org.apache.spark.sql.functions._

class ClusterSpec extends SparkSpec {
  import spark.implicits._

  test("clusters propagates min labels across chains, dedup keeps representatives") {
    // chain 1-2-3, pair 10-11, singleton 99 (no pairs → untouched)
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val cl = Dedup.clusters(pairs).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cl == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
    val docs = Seq(1L, 2L, 3L, 10L, 11L, 99L).toDF("doc_id")
    val kept = Dedup.dedupByClusters(docs, "doc_id", pairs)
      .collect().map(_.getLong(0)).sorted
    assert(kept.toSeq == Seq(1L, 10L, 99L))
  }

  test("clusters converges on a long chain (diameter > 1 round)") {
    val pairs = (1L until 20L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val cl = Dedup.clusters(pairs).collect()
    assert(cl.forall(_.getLong(1) == 1L))
    assert(cl.length == 20)
  }

  test("clusters converges on a chain far longer than the round cap (pointer doubling)") {
    // 60-link chain: 1-hop propagation alone would need ~60 rounds and
    // trip the default 20-round cap; pointer doubling closes it in
    // O(log 60) rounds.
    val pairs = (1L until 60L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val cl = Dedup.clusters(pairs).collect()
    assert(cl.forall(_.getLong(1) == 1L))
    assert(cl.length == 60)
  }

  test("clusters fails loudly instead of returning unconverged labels") {
    // maxRounds = 1 cannot reach a fixpoint on a 60-link chain — the
    // guard must throw rather than silently return partial labels.
    val pairs = (1L until 60L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val e = intercept[IllegalArgumentException] {
      Dedup.clusters(pairs, maxRounds = 1).collect()
    }
    assert(e.getMessage.contains("not at a fixpoint"))
  }
}
