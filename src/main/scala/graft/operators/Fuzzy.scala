package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Edit-distance (fuzzy) self-join via deletion neighborhoods (the FastSS
  * family: Bocek et al., "Fast Similarity Search in Large Dictionaries",
  * 2007): two strings at Levenshtein distance ≤ 1 always share a key in
  * {s} ∪ {s minus one character} — equal strings share s itself, a
  * substitution pair shares the deletion at the substituted position, an
  * insert/delete pair shares the shorter string. Candidates therefore
  * come from a plain equi-join on generated keys and are verified with
  * the exact `levenshtein`, so the result is identical to the O(n²)
  * all-pairs scan.
  *
  * Scale shape (entity resolution over billions of names): the key
  * relation is |s|+1 rows per string — a narrow explode — and deletion
  * keys are near-unique (a key is shared only by genuine near-matches
  * plus rare collisions), so the self-join has NO mega-blocks, unlike
  * prefix/length blocking where one popular prefix funnels a quadratic
  * bucket through one task. Key skew, if a corpus has it (e.g. millions
  * of identical names), is the same (band, key) problem as LSH banding
  * and would take the same `Dedup.capBuckets` guard.
  *
  * `maxDist` must be ≤ 1: single-deletion neighborhoods are complete only
  * for distance 1 (distance-2 completeness needs double deletions — a
  * |s|²/2 key blowup not worth it until a use case demands it). */
object Fuzzy {

  /** {s} ∪ all single-character deletions of s, deduplicated ("aa" → one
    * "a"). Empty strings keep just their identity key — `sequence()`
    * would descend on (1, 0). */
  def deletionKeys(s: Column): Column =
    when(length(s) === 0, array(s)).otherwise(array_distinct(concat(
      array(s),
      transform(sequence(lit(1), length(s)),
        i => concat(s.substr(lit(1), i - 1), s.substr(i + 1, length(s)))))))

  /** All pairs (id_a < id_b) with levenshtein(s_a, s_b) ≤ maxDist.
    * Output: (id_a, id_b, dist). */
  def editJoinPairs(df: DataFrame, idCol: String, strCol: String,
                    maxDist: Int = 1): DataFrame = {
    require(maxDist <= 1, "deletion-neighborhood blocking is complete only for maxDist <= 1")
    val keys = df.select(col(idCol).as("__id"), col(strCol).as("__s"),
      explode(deletionKeys(col(strCol))).as("__k"))
    val a = keys.select(col("__id").as("id_a"), col("__s").as("s_a"), col("__k"))
    val b = keys.select(col("__id").as("id_b"), col("__s").as("s_b"), col("__k"))
    a.join(b, Seq("__k")).filter(col("id_a") < col("id_b"))
      .select("id_a", "s_a", "id_b", "s_b").distinct()
      .withColumn("dist", levenshtein(col("s_a"), col("s_b")))
      .filter(col("dist") <= maxDist)
      .select("id_a", "id_b", "dist")
  }
}
