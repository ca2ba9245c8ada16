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

  test("constraint checks count pk dups, fk orphans, and nulls exactly") {
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val child = Seq((10L, 1L, Some(1.0)), (11L, 1L, Some(2.0)), (11L, 2L, None),
      (12L, 9L, Some(3.0)), (13L, 8L, Some(4.0))).toDF("id", "fk", "v")
    val report = Integrity.constraintReport(Seq(
      "fk_child_parent" -> Integrity.fkViolations(child, "fk", parent, "pk"),
      "not_null_v" -> Integrity.nullViolations(child, "v"),
      "pk_child" -> Integrity.pkViolations(child, Seq("id"))))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getBoolean(2))).toList
    assert(report == List(
      ("fk_child_parent", 2L, false), // fks 9 and 8 have no parent
      ("not_null_v", 1L, false),
      ("pk_child", 1L, false)))      // id 11 appears twice → 1 excess row
    // a clean table reports all-ok with zero counts
    val clean = Integrity.constraintReport(Seq(
      "pk" -> Integrity.pkViolations(parent, Seq("pk")),
      "fk" -> Integrity.fkViolations(parent, "pk", parent, "pk")))
      .collect().map(r => (r.getLong(1), r.getBoolean(2))).toList
    assert(clean == List((0L, true), (0L, true)))
  }
}
