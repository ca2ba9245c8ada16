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

  test("pngDims parses a REAL hand-written PNG IHDR; non-png yields nulls") {
    // a literal 160×90 PNG file head, byte-for-byte per the PNG spec:
    // signature, IHDR length 13, "IHDR", width 0x000000A0, height
    // 0x0000005A, bit depth 8, color type 2
    val realHeader: Array[Byte] = Array(
      0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A,  // signature
      0x00, 0x00, 0x00, 0x0D,                          // IHDR length
      0x49, 0x48, 0x44, 0x52,                          // "IHDR"
      0x00, 0x00, 0x00, 0xA0,                          // width 160
      0x00, 0x00, 0x00, 0x5A,                          // height 90
      0x08, 0x02, 0x00, 0x00, 0x00                     // depth/color/...
    ).map(_.toByte)
    val df = Seq((1L, realHeader), (2L, "not a png".getBytes("UTF-8")))
      .toDF("id", "bytes")
      .select(col("id"), Multimodal.pngDims(col("bytes")).as("d"))
      .select(col("id"), col("d.width"), col("d.height"))
      .orderBy("id")
    val rows = df.collect()
    assert(rows(0).getLong(1) == 160L && rows(0).getLong(2) == 90L)
    assert(rows(1).isNullAt(1) && rows(1).isNullAt(2))
    // and the builder round-trips through the parser on arbitrary dims
    val built = Seq((640, 480), (1, 1), (65535, 1080)).toDF("w", "h")
      .select(Multimodal.pngDims(
        Multimodal.pngPayload(col("w"), col("h"))).as("d"), col("w"), col("h"))
    assert(built.filter(col("d.width") =!= col("w").cast("long") ||
      col("d.height") =!= col("h").cast("long")).count() == 0)
  }

  test("wavSampleRate parses a canonical RIFF/WAVE header, little-endian") {
    // literal canonical 44-byte WAV head: RIFF, size, WAVE, "fmt ", len 16,
    // PCM, mono, sample rate 16000 = 0x3E80 → LE bytes 80 3E 00 00
    val wav: Array[Byte] = Array[Int](
      0x52, 0x49, 0x46, 0x46, 0x24, 0x08, 0x00, 0x00,  // "RIFF", size
      0x57, 0x41, 0x56, 0x45, 0x66, 0x6D, 0x74, 0x20,  // "WAVE", "fmt "
      0x10, 0x00, 0x00, 0x00, 0x01, 0x00, 0x01, 0x00,  // len 16, PCM, 1 ch
      0x80, 0x3E, 0x00, 0x00                            // 16000 Hz LE
    ).map(_.toByte)
    val df = Seq((1L, wav), (2L, "RIFFnotawave".getBytes("UTF-8")))
      .toDF("id", "bytes")
      .select(col("id"), Multimodal.wavSampleRate(col("bytes")).as("sr"))
      .orderBy("id").collect()
    assert(df(0).getLong(1) == 16000L)
    assert(df(1).isNullAt(1))
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

  test("jpegDims walks the marker chain to SOF0, wherever it sits") {
    val df = Seq((640, 480), (2000, 1), (1, 2000)).toDF("w", "h")
      .select(Multimodal.jpegPayload(col("w"), col("h")).as("bytes"),
        col("w"), col("h"))
    val parsed = df.select(Multimodal.jpegDims(col("bytes")).as("d"), col("w"), col("h"))
      .collect()
    parsed.foreach { r =>
      val d = r.getStruct(0)
      assert(d.getLong(0) == r.getInt(1) && d.getLong(1) == r.getInt(2))
    }
    // insert an extra COM segment between APP0 and SOF0 — the parser must
    // HOP it via the length prefix, not assume a fixed offset
    val withCom = df.select(concat(
      expr("substring(bytes, 1, 20)"),                        // SOI + APP0
      lit(Array(0xFF, 0xFE).map(_.toByte)),                   // COM marker
      Multimodal.beInt16(lit(7)),                             // len 7
      lit("hello".getBytes("US-ASCII")),                      // 5 payload bytes
      expr("substring(bytes, 21)")).as("bytes"), col("w"), col("h"))
    val parsed2 = withCom
      .select(Multimodal.jpegDims(col("bytes")).as("d"), col("w"), col("h")).collect()
    parsed2.foreach { r =>
      val d = r.getStruct(0)
      assert(d.getLong(0) == r.getInt(1) && d.getLong(1) == r.getInt(2))
    }
    // non-jpeg and marker-chain-exhausted payloads yield null dims
    assert(Seq(Tuple1("GIF89a junk")).toDF("t")
      .select(Multimodal.jpegDims(encode(col("t"), "US-ASCII"))).collect()(0).isNullAt(0))
  }

  test("gifDims reads the little-endian logical screen descriptor") {
    val r = Seq((320, 200)).toDF("w", "h")
      .select(Multimodal.gifDims(Multimodal.gifPayload(col("w"), col("h"))).as("d"))
      .collect()(0).getStruct(0)
    assert(r.getLong(0) == 320L && r.getLong(1) == 200L)
    // little-endian proof: 258 = 0x0102 must round-trip (bytes 02 01)
    val r2 = Seq((258, 513)).toDF("w", "h")
      .select(Multimodal.gifDims(Multimodal.gifPayload(col("w"), col("h"))).as("d"))
      .collect()(0).getStruct(0)
    assert(r2.getLong(0) == 258L && r2.getLong(1) == 513L)
    assert(Seq(Tuple1("NOTGIF")).toDF("t")
      .select(Multimodal.gifDims(encode(col("t"), "US-ASCII"))).collect()(0).isNullAt(0))
  }
}
