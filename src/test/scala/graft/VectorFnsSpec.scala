package graft

import graft.functions.VectorFns
import org.apache.spark.sql.functions._

class VectorFnsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val df = Seq(
    (Array(3.0f, 4.0f), Array(4.0f, 3.0f)),
    (Array(1.0f, 0.0f), Array(0.0f, 1.0f)),
    (Array(0.0f, 0.0f), Array(1.0f, 1.0f))
  ).toDF("a", "b")

  test("dot, l2Norm, cosine, sqDist reference semantics") {
    val r = df.select(
      VectorFns.dot(col("a"), col("b")).as("dot"),
      VectorFns.l2Norm(col("a")).as("na"),
      VectorFns.cosine(col("a"), col("b")).as("cos"),
      VectorFns.sqDist(col("a"), col("b")).as("d2")).collect()
    assert(r(0).getAs[Double]("dot") == 24.0)
    assert(r(0).getAs[Double]("na") == 5.0)
    assert(math.abs(r(0).getAs[Double]("cos") - 24.0 / 25.0) < 1e-12)
    assert(r(0).getAs[Double]("d2") == 2.0)
    assert(r(1).getAs[Double]("cos") == 0.0)        // orthogonal
    assert(r(2).getAs[Double]("cos") == 0.0)        // zero-norm guard
  }

  test("cosineQ agrees with cosine to quantization error") {
    val r = df.limit(2).select(
      VectorFns.cosine(col("a"), col("b")).as("c"),
      VectorFns.cosineQ(col("a"), col("b")).as("cq")).collect()
    r.foreach(row => assert(math.abs(row.getDouble(0) - row.getDouble(1)) < 1e-9))
  }
}
