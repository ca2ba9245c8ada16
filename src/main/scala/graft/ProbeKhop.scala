package graft

import org.apache.spark.sql.functions._

/** Dev probe (args: sfDir...): measures q214_khop_reach's TRUE per-hop
  * inputs so its time-vs-sf slope can be read against the work the plan
  * actually does, not the raw row counts — the same adjudication
  * `tools/probe_temporal_edges.py` gives q227. For each sf dir:
  *
  *   - n_edges            the deduped symmetric edge relation (the join's
  *                        build side, re-partitioned once)
  *   - n_seeds            hop-0 frontier
  *   - hop_h: frontier    |new nodes at hop h| (the probe side of hop h+1)
  *   - hop_h: join_rows   |edges ⋈ frontier_h| — the rows hop h+1's join
  *                        emits BEFORE distinct/anti-join; per-hop cost is
  *                        linear in this number plus the distinct shuffle
  *
  * If Σ join_rows grows ~like wall time, the slope is the graph getting
  * denser (an input property), not a plan defect; if join_rows is flat
  * while time curves, look for a residual exchange in the hop loop. */
object ProbeKhop {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(cores = "32", app = "graft-probe-khop")
    for (dir <- args) {
      val pairs = Queries.tbl(spark, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"))
        .join(Queries.tbl(spark, dir, "lineitem")
          .select(col("l_orderkey"), col("l_suppkey")),
          col("l_orderkey") === col("o_orderkey"))
        .select((col("o_custkey") * 2).as("c"), (col("l_suppkey") * 2 + 1).as("s"))
      val edges = pairs.select(col("c").as("src"), col("s").as("dst"))
        .union(pairs.select(col("s").as("src"), col("c").as("dst")))
      val e = operators.Ckpt.local(
        edges.dropDuplicates("src", "dst")
          .repartition(col("src")).sortWithinPartitions("src"))
      val nEdges = e.count()
      val seeds = Queries.tbl(spark, dir, "customer")
        .filter(col("c_custkey") % 100 === 0)
        .select((col("c_custkey") * 2).as("id")).distinct()
      val nSeeds = seeds.count()
      var visited = operators.Ckpt.local(seeds)
      var frontier = visited
      val hops = (1 to 3).map { h =>
        val joined = e.join(frontier.select(col("id").as("src")), "src")
        val joinRows = joined.count()
        val nf = operators.Ckpt.local(
          joined.select(col("dst").as("id")).distinct()
            .join(visited, Seq("id"), "left_anti"))
        val fSize = nf.count()
        visited = operators.Ckpt.local(visited.union(nf))
        frontier = nf
        s""""hop_$h":{"frontier":$fSize,"join_rows":$joinRows}"""
      }
      println(s"""PROBE_KHOP {"dir":"$dir","n_edges":$nEdges,""" +
        s""""n_seeds":$nSeeds,${hops.mkString(",")}}""")
      operators.Ckpt.release(spark)
    }
    spark.stop()
  }
}
