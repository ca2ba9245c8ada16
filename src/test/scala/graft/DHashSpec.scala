package graft

import graft.operators.Multimodal
import graft.plans.{DHashExpr, GraftExtensions}
import org.apache.spark.sql.functions._

class DHashSpec extends SparkSpec {
  import spark.implicits._

  test("known-answer: hand-built 2x3 tile") {
    // width=3, height=2: bits per row = 2.
    // row0 = [10, 20, 5]  → bits (20>10)=1, (5>20)=0 → 0b01
    // row1 = [200, 200, 255] → (200>200)=0, (255>200)=1 → bit3
    val bytes = Array[Byte](10, 20, 5, 200.toByte, 200.toByte, 255.toByte)
    assert(DHashExpr.dhash(bytes, 3, 2) == ((1L << 0) | (1L << 3)))
  }

  test("unsigned byte compare: 0x80 (128) is brighter than 0x7F (127)") {
    val up = Array[Byte](0x7F, 0x80.toByte)
    val down = Array[Byte](0x80.toByte, 0x7F)
    assert(DHashExpr.dhash(up, 2, 1) == 1L)
    assert(DHashExpr.dhash(down, 2, 1) == 0L)
  }

  test("codegen and interpreted paths agree; short payload → null") {
    val df = (0L until 64L).map { i =>
      (i, Array.tabulate[Byte](72)(j => ((i * 31 + j * 17) % 251).toByte))
    }.toDF("id", "bytes").repartition(3)
    val viaExec = df.select(col("id"), Multimodal.dhash64(col("bytes")).as("h"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    (0L until 64L).foreach { i =>
      val bytes = Array.tabulate[Byte](72)(j => ((i * 31 + j * 17) % 251).toByte)
      assert(viaExec(i) == DHashExpr.dhash(bytes, 9, 8))
    }
    val short = Seq((1L, Array[Byte](1, 2, 3))).toDF("id", "bytes").repartition(2)
      .select(Multimodal.dhash64(col("bytes")).as("h")).collect()
    assert(short(0).isNullAt(0))
  }

  test("registered SQL function graft_dhash") {
    GraftExtensions.register(spark)
    val r = spark.sql("SELECT graft_dhash(CAST(unhex('0A1405C8C8FF') AS BINARY), 3, 2) AS h")
      .collect()(0).getLong(0)
    assert(r == ((1L << 0) | (1L << 3)))
    assert(spark.sql("SELECT graft_dhash(CAST(NULL AS BINARY), 9, 8)").collect()(0).isNullAt(0))
  }

  test("phashPairs: identical tiles pair at hamming 0, perturbed at small hamming, unrelated never") {
    val docs = (0L until 30L).map(i => (i, i % 3)).toDF("doc_id", "grp")
    val media = docs.select(col("doc_id"),
      Multimodal.grayTilePayload(72) { i =>
        (col("grp") * 59 + i * 29 + (i * i * 13) % 97) % 150 + lit(20) +
          when(col("doc_id") >= 27 && i % 20 === 0, lit(60)).otherwise(lit(0))
      }.as("bytes"))
    val pairs = Multimodal.phashPairs(media, "doc_id", "bytes", maxHamming = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // unperturbed docs in the same grp share the exact tile → hamming 0
    assert(pairs.exists { case (a, b, h) => a == 0L && b == 3L && h == 0L })
    // perturbed docs (27..29) still pair with their group at hamming > 0, <= 10
    assert(pairs.exists { case (a, b, h) => b == 27L && a % 3 == 0 && h > 0L && h <= 10L })
    // cross-group pairs never survive the hamming verify
    assert(pairs.forall { case (a, b, _) => a % 3 == b % 3 })
  }
}
