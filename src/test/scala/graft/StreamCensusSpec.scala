package graft

/** CI guard for the streaming-recompute class (round-9/10 defect family):
  * re-runs the [[StreamCensus]] sweep over the 8 StreamBench pipelines at
  * sf0.001 and asserts no plan carries an unexpected expensive-expression
  * marker count. Round 10 adjudicated the steady state by hand
  * (STREAMCENSUS.json: 7 pipelines clean, lsh_tag exactly ONE
  * graft_minhash per micro-batch plan — breadth, not recompute); this
  * spec pins that adjudication so the class can't silently reopen when a
  * streaming operator changes. */
class StreamCensusSpec extends SparkSpec {

  test("streaming plan census: no recompute markers beyond the adjudicated steady state") {
    val res = StreamCensus.sweep(spark, "/root/testdata/sf0.001")
    assert(res.size == 8, s"census should cover the 8 pipelines, got ${res.map(_.name)}")
    // Adjudicated budgets (STREAMCENSUS.json, round 10): 7 pipelines are
    // marker-FREE; lsh_tag evaluates graft_minhash exactly ONCE per plan
    // (bandKeysFromSig binds the signature), its 9 graft_hash60 calls are
    // 8 distinct band prefixes + 1 shingle hash (breadth, not recompute),
    // and 3 lambdafunction bodies are the shingle/band transforms.
    val budget: Map[String, Int] =
      Map("graft_minhash" -> 1, "graft_hash60" -> 9, "lambdafunction(" -> 3)
    val over = res.flatMap { r =>
      val allowed: String => Int =
        if (r.name == "lsh_tag") m => budget.getOrElse(m, 0) else _ => 0
      (r.stream ++ r.batchMax).collect {
        case (m, c) if c > allowed(m) => s"${r.name}:$m=$c(allowed ${allowed(m)})"
      }
    }
    assert(over.isEmpty,
      "census over adjudicated budget - the streaming-recompute class is " +
        "reopening (or a new pipeline needs adjudication): " + over.mkString("; "))
  }
}
