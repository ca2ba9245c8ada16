package graft

import graft.functions.CleanFns
import graft.pipeline.{JsonSource, Transforms}
import org.apache.spark.sql.functions._

/** S1 fidelity: a raw Mongo export (extended JSON — $oid ids, $date
  * wrappers) landed as JSONL flows through source → transform unchanged. */
class JsonSourceSpec extends SparkSpec {
  import spark.implicits._

  test("mongoDate unwraps ISO and epoch-millis $date, passes scalars") {
    def d(v: String) = Seq(v).toDF("c")
      .select(date_format(CleanFns.mongoDate(col("c")), "yyyy-MM-dd").as("d"))
      .collect()(0).getAs[String]("d")
    assert(d("""{"$date": "2016-01-08T00:00:00Z"}""") == "2016-01-08")
    assert(d("""{"$date": 1452211200000}""") == "2016-01-08")
    assert(d("2016-01-08") == "2016-01-08")
    assert(d("not a date") == null)
  }

  test("Mongo-export JSONL → JsonSource → reviews transform end-to-end") {
    val dir = java.nio.file.Files.createTempDirectory("graft_json").toString
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$dir/reviews.json"),
      """{"_id": {"$oid": "65a1"}, "id": 1, "listing_id": 10, "date": {"$date": "2016-01-08T00:00:00Z"}, "reviewer_name": "ana", "comments": "excellent"}
        |{"_id": {"$oid": "65a2"}, "id": 2, "listing_id": 10, "date": {"$date": "2016-01-09T00:00:00Z"}, "reviewer_name": "bo", "comments": "terrible"}
        |""".stripMargin)
    val raw = new JsonSource(dir).load(spark, "reviews")
    val t = Transforms.reviews(raw).orderBy("id").collect()
    assert(t.length == 2)
    assert(t(0).getAs[String]("date_clean") == "2016-01-08")
    assert(t(0).getAs[Int]("dia_semana") == 4) // Friday
    assert(t(0).getAs[Int]("sentiment_score") == 1)
    assert(t(1).getAs[Int]("sentiment_score") == -2)
    // missing table → empty frame, not an error (extraccion.py:114-146)
    assert(new JsonSource(dir).load(spark, "calendar").columns.isEmpty)
  }
}
