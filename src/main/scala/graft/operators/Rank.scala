package graft.operators

import graft.functions.{Det, TextFns}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Lexical relevance ranking (BM25) over a document corpus for a fixed
  * query-term set — the retrieval front of a RAG / data-curation
  * pipeline.
  *
  * Standard BM25 with one substitution: the idf factor is the LINEAR
  * ratio `(N − df + 0.5)/(df + 0.5)` rather than its log — `ln()` is not
  * bit-identical across libm implementations (same reason q55's tf-idf
  * is linear), the ranking it induces for a fixed term is the same
  * (monotone transform), and a production deployment can swap `log` in
  * where cross-engine hash equality is not required.
  *
  * Scale shape: one explode with the term filter applied BEFORE any
  * shuffle (only query-term postings survive — the moral equivalent of
  * an inverted-index lookup), one aggregate per (term, doc), the
  * corpus-level (N, Σdl) as a broadcast scalar, per-term document
  * frequencies as a broadcast dimension, and a per-term
  * `WindowGroupLimit` top-k. Nothing global, nothing n².
  */
object Rank {

  /** Top-`topK` docs per query term by BM25. All arithmetic is double
    * IEEE in a fixed expression order and the result is rounded at 6
    * digits, so scores are engine-exact for any `k1`/`b` whose SQL
    * mirror spells the same literals. */
  def bm25TopK(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      terms: Seq[String],
      k1: Double = 1.2,
      b: Double = 0.75,
      topK: Int = 5): DataFrame = {
    val base = docs
      .select(col(idCol).as("doc_id"), TextFns.tokens(col(textCol)).as("_toks"))
      .withColumn("dl", size(col("_toks")).cast("long"))
    val stats = base.agg(count(lit(1)).as("__n"), sum(col("dl")).as("__sumdl"))
    val tf = base
      .select(col("doc_id"), col("dl"), explode(col("_toks")).as("term"))
      .filter(col("term").isin(terms: _*))
      .groupBy("term", "doc_id", "dl")
      .agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val nD = col("__n").cast("double")
    val idf = (nD - col("df").cast("double") + lit(0.5)) /
      (col("df").cast("double") + lit(0.5))
    val norm = col("tf").cast("double") + lit(k1) *
      (lit(1) - lit(b) + lit(b) * col("dl").cast("double") * nD /
        col("__sumdl").cast("double"))
    val w = Window.partitionBy("term").orderBy(desc("score"), asc("doc_id"))
    tf.join(broadcast(dfreq), "term")
      .crossJoin(broadcast(stats))
      .withColumn("score", Det.roundAt(
        idf * (col("tf").cast("double") * (lit(k1) + lit(1))) / norm, 6))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= topK)
      .select("term", "doc_id", "tf", "df", "score", "rank")
      .orderBy("term", "rank")
  }

  /** Item-item co-occurrence neighborhoods ("customers also bought"):
    * cosine = co/√(cₐ·c_b) over basket co-occurrence counts, top-`k`
    * partners per item among pairs with co ≥ `minCo`. `baskets` carries
    * (o = basket id, p = item); pair building is row-local off the
    * per-basket item array (basket-bounded), item supports broadcast,
    * and the per-item rank limit compiles to WindowGroupLimit. Returns
    * (item, partner, co, cos, rank). */
  def itemCooc(baskets: DataFrame, minCo: Long, k: Int): DataFrame = {
    val b = Ckpt.local(
      baskets.select(col("o"), col("p")).distinct())
    val itemCnt = b.groupBy(col("p")).agg(count(lit(1)).as("c"))
    val arr = b.groupBy("o").agg(array_sort(collect_list(col("p"))).as("ps"))
      .filter(size(col("ps")) >= 2)
    def el(i: org.apache.spark.sql.Column) = element_at(col("ps"), i)
    val pairExpr = flatten(transform(sequence(lit(1), size(col("ps")) - 1),
      i => transform(sequence(i + 1, size(col("ps"))),
        j => struct(el(i).as("pa"), el(j).as("pb")))))
    val co = arr.select(explode(pairExpr).as("pr"))
      .groupBy(col("pr.pa").as("pa"), col("pr.pb").as("pb"))
      .agg(count(lit(1)).as("co"))
      .filter(col("co") >= minCo)
    val sym = co.select(col("pa").as("item"), col("pb").as("partner"), col("co"))
      .union(co.select(col("pb"), col("pa"), col("co")))
    val w = Window.partitionBy("item").orderBy(desc("cos"), asc("partner"))
    sym
      .join(broadcast(itemCnt.withColumnRenamed("p", "item")
        .withColumnRenamed("c", "ca")), "item")
      .join(broadcast(itemCnt.withColumnRenamed("p", "partner")
        .withColumnRenamed("c", "cb")), "partner")
      .withColumn("cos", Det.roundAt(col("co").cast("double")
        / sqrt(col("ca").cast("double") * col("cb").cast("double")), 6))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("item", "partner", "co", "cos", "rank")
  }

  /** GLOBAL exact row_number over (valCol asc|desc, tieCol asc) WITHOUT
    * a single-partition window — the scale shape for corpus-wide
    * rankings (RFM scores, uplift deciles, concentration curves) whose
    * entity grain can reach billions:
    *
    *   1. within-VALUE rank: `row_number` partitioned by the exact
    *      ranking value, ordered by the (unique) tiebreak — entity
    *      grain, keyed, parallel;
    *   2. value offsets: the value HISTOGRAM (one groupBy) through
    *      [[PrefixSum.overKeys]] — two-level itself, so the only
    *      partition-less window is block-grain;
    *   3. global rank = offset + within-rank, joined back at value
    *      grain (both sides already hash-partitioned on the value).
    *
    * `block` must be a monotone non-decreasing expression of the SIGNED
    * rank key exposed as column `_rnk_v` (= valCol negated when `desc`),
    * e.g. `floor(col("_rnk_v") / 1024.0)` — it bounds the PrefixSum
    * block-totals frame exactly as in the score-grain queries.
    * `tieCol` must be unique per row (an entity id), or ranks within a
    * tied value would be nondeterministic in any engine. */
  def globalRowNumber(df: DataFrame, valCol: String, tieCol: String,
                      desc0: Boolean, block: Column, out: String): DataFrame = {
    val keyed = df.withColumn("_rnk_v",
      if (desc0) negate(col(valCol)) else col(valCol))
    val wIn = Window.partitionBy("_rnk_v").orderBy(col(tieCol).asc)
    val hist = keyed.groupBy("_rnk_v").agg(count(lit(1)).as("_rnk_c"))
    val offs = PrefixSum.overKeys(hist, "_rnk_v", block, inclusive = false,
        Seq("_rnk_c" -> "_rnk_off"))
      .select(col("_rnk_v"), col("_rnk_off"))
    keyed
      .withColumn("_rnk_i", row_number().over(wIn).cast("long"))
      .join(offs, Seq("_rnk_v"))
      .withColumn(out, col("_rnk_off") + col("_rnk_i"))
      .drop("_rnk_v", "_rnk_i", "_rnk_off")
  }

  /** Exact SQL NTILE(n) from a global rank and the total row count —
    * the standard uneven-bucket rule (the first `N mod n` buckets get
    * one extra row), arithmetically identical to `ntile(n)` over the
    * same total order, so swapping a window ntile for
    * [[globalRowNumber]] + this leaves every result untouched. */
  def ntileFromRank(rank: Column, total: Column, n: Int): Column = {
    // Column./ is DOUBLE division — spell integer division as
    // floor(a/b) cast long (exact below 2^53, far past any row count)
    def ldiv(a: Column, b: Column): Column = floor(a / b).cast("long")
    val size = ldiv(total, lit(n.toLong))
    val rem = total - size * n
    val cut = rem * (size + 1L)
    when(rank <= cut, ldiv(rank + size, size + 1L)) // = ceil(rank/(size+1))
      .otherwise(rem + ldiv(rank - cut + greatest(size, lit(1L)) - 1L,
        greatest(size, lit(1L))))
  }
}
