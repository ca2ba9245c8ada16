package graft

import graft.operators.Integrity
import org.apache.spark.sql.functions._

class IntegritySpec extends SparkSpec {
  import spark.implicits._

  test("checksum is row-order and partitioning independent; any value change flips it") {
    val a = Seq((1L, "x"), (2L, "y"), (3L, null: String)).toDF("k", "v")
    val shuffled = a.orderBy(desc("k")).repartition(7)
    val fp = Integrity.checksum(a, Seq("k", "v")).collect()(0)
    val fp2 = Integrity.checksum(shuffled, Seq("k", "v")).collect()(0)
    assert(fp == fp2)
    val mutated = Seq((1L, "x"), (2L, "Y"), (3L, null: String)).toDF("k", "v")
    assert(Integrity.checksum(mutated, Seq("k", "v")).collect()(0)
      .getAs[Long]("hash_xor") != fp.getAs[Long]("hash_xor"))
  }

  test("diff classifies added/removed/changed/unchanged, null-safe") {
    val left = Seq((1L, "a"), (2L, "b"), (3L, null: String), (4L, "d")).toDF("k", "v")
    val right = Seq((1L, "a"), (2L, "B"), (3L, null: String), (5L, "e")).toDF("k", "v")
    val r = Integrity.diff(left, right, Seq("k"), Seq("v"))
      .collect().map(x => x.getLong(0) -> x.getString(1)).toMap
    assert(r == Map(1L -> "unchanged", 2L -> "changed", 3L -> "unchanged",
      4L -> "removed", 5L -> "added"))
  }
}
