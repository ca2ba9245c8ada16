package graft

import graft.operators.Multimodal
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val media = Multimodal.synthesizeMedia(
    Seq((1L, "hello world payload"), (2L, "xy"), (3L, "another fake payload here"))
      .toDF("id", "text"), "id", "text")

  test("synthesizeMedia produces the canonical schema") {
    assert(media.schema("bytes").dataType.typeName == "binary")
    assert(media.select("meta.width").collect().forall(!_.isNullAt(0)))
    assert(media.select("kind").distinct().count() == 3) // ids 1,2,3 → audio,video,image
  }

  test("byteStats: size, fingerprint, checksum are pure column ops") {
    val r = Multimodal.byteStats(media).filter($"media_id" === 1L).collect()(0)
    assert(r.getAs[Long]("n_bytes") == "hello world payload".getBytes("UTF-8").length)
    assert(r.getAs[String]("fingerprint").length == 32)
  }

  test("sniffFormat recovers the true container from real magic bytes") {
    val m = Multimodal.synthesizeMediaWithMagic(
      (1L to 60L).map(i => (i, s"payload number $i")).toDF("id", "text"),
      "id", "text")
      .withColumn("fmt", Multimodal.sniffFormat(col("bytes")))
    // kind→format mapping is total and exact on every row
    val mismatches = m.filter(
      ($"kind" === "image" && $"fmt" =!= "png") ||
      ($"kind" === "video" && $"fmt" =!= "jpeg") ||
      ($"kind" === "audio" && $"fmt" =!= "riff")).count()
    assert(mismatches == 0)
    assert(m.select("fmt").distinct().count() == 3)
    // corrupt payloads (headers sliced off) must sniff as unknown, and
    // the check runs BEFORE any decode — pure prefix compare
    val corrupt = m.withColumn("bytes", expr("substring(bytes, 2)"))
      .withColumn("fmt", Multimodal.sniffFormat(col("bytes")))
    assert(corrupt.filter($"fmt" =!= "unknown").count() == 0)
  }

  test("decodeStub emits deterministic normalized byte-bucket features") {
    val f = Multimodal.decodeStub(media).filter($"media_id" === 2L)
      .select("features").collect()(0).getAs[scala.collection.Seq[Float]](0)
    assert(f.length == 8)
    assert(math.abs(f.sum - 1.0f) < 1e-6) // normalized histogram
    // deterministic: same input → same features
    val f2 = Multimodal.decodeStub(media).filter($"media_id" === 2L)
      .select("features").collect()(0).getAs[scala.collection.Seq[Float]](0)
    assert(f == f2)
  }

  test("frameSample chunks payloads and keeps metadata") {
    val frames = Multimodal.frameSample(media.filter($"media_id" === 1L), n = 3, chunkBytes = 5)
    val rows = frames.orderBy("frame_idx").collect()
    assert(rows.length == 3)
    assert(new String(rows(0).getAs[Array[Byte]]("frame"), "UTF-8") == "hello")
    assert(new String(rows(1).getAs[Array[Byte]]("frame"), "UTF-8") == " worl")
    assert(rows.forall(_.getAs[String]("kind") != null))
    // short payload yields a single partial chunk
    val short = Multimodal.frameSample(media.filter($"media_id" === 2L), 3, 5).collect()
    assert(short.length == 1 && new String(short(0).getAs[Array[Byte]]("frame"), "UTF-8") == "xy")
  }
}
