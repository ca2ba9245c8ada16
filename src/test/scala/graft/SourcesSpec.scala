package graft

import graft.pipeline.{CsvSource, OrcSource}
import org.apache.spark.sql.types._

/** S1 breadth: the pluggable Source trait over the remaining Spark-native
  * file formats — ORC (self-describing, stats-pruned like parquet) and
  * headered CSV (explicit schema for production, inference for ad-hoc). */
class SourcesSpec extends SparkSpec {
  import spark.implicits._

  private val rows = Seq((1L, "ana", 9.5), (2L, "bo", 8.0), (3L, null: String, 7.25))

  test("OrcSource round-trips schema and values; absent table → empty frame") {
    val dir = java.nio.file.Files.createTempDirectory("graft_orc").toString
    rows.toDF("id", "name", "score").write.orc(s"$dir/t.orc")
    val src = new OrcSource(dir)
    val back = src.load(spark, "t")
    assert(back.schema.map(f => (f.name, f.dataType)) ==
      Seq(("id", LongType), ("name", StringType), ("score", DoubleType)))
    assert(back.orderBy("id").collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq
      == rows)
    assert(src.load(spark, "missing").columns.isEmpty)
  }

  test("CsvSource honors an explicit schema (nulls, types) and infers without one") {
    val dir = java.nio.file.Files.createTempDirectory("graft_csv").toString
    rows.toDF("id", "name", "score").write.option("header", "true").csv(s"$dir/t.csv")
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("name", StringType), StructField("score", DoubleType)))
    val typed = new CsvSource(dir, Some(schema)).load(spark, "t")
    assert(typed.schema == schema)
    assert(typed.orderBy("id").collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq
      == rows)
    val inferred = new CsvSource(dir).load(spark, "t")
    assert(inferred.schema("id").dataType.isInstanceOf[NumericType])
    assert(inferred.count() == rows.length)
    assert(new CsvSource(dir).load(spark, "missing").columns.isEmpty)
  }
}
