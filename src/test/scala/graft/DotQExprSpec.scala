package graft

import graft.functions.VectorFns
import graft.plans.{DotQExpr, GraftExtensions}
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

class DotQExprSpec extends SparkSpec {
  import spark.implicits._

  private def vecs(n: Int): Seq[(Array[Float], Array[Float])] = {
    val g = Gen.listOfN(16, Gen.chooseNum(-3.0f, 3.0f)).map(_.toArray)
    (0 until n).flatMap { i =>
      for (a <- g(Gen.Parameters.default, Seed(7L + i));
           b <- g(Gen.Parameters.default, Seed(1007L + i))) yield (a, b)
    }
  }

  test("native DotQExpr is bit-identical to the portable HOF formulation") {
    val df = vecs(200).toDF("a", "b")
    val mism = df.select(
        DotQExpr(col("a"), col("b")).as("native"),
        VectorFns.dotQ(col("a"), col("b")).as("hof"))
      .filter(col("native") =!= col("hof") ||
        col("native").isNull =!= col("hof").isNull)
    assert(mism.count() == 0)
  }

  test("null semantics: null array, null element, length mismatch → null") {
    val df = Seq(
      (Array(1.0f, 2.0f), Array(1.0f, 2.0f)),       // ok
      (Array(1.0f, 2.0f), Array(1.0f))              // length mismatch
    ).toDF("a", "b")
    val r = df.select(DotQExpr(col("a"), col("b")).as("d")).collect()
    assert(!r(0).isNullAt(0) && r(1).isNullAt(0))
    val withNullElem = spark.sql(
      "SELECT array(CAST(1.0 AS FLOAT), CAST(NULL AS FLOAT)) AS a, array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)) AS b")
    GraftExtensions.register(spark)
    assert(withNullElem.selectExpr("graft_dotq(a, b)").collect()(0).isNullAt(0))
    assert(spark.sql("SELECT graft_dotq(NULL, array(CAST(1.0 AS FLOAT)))").collect()(0).isNullAt(0))
  }

  test("registered SQL function computes known values") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      """SELECT graft_dotq(array(CAST(1.5 AS FLOAT), CAST(2.0 AS FLOAT)),
        |                  array(CAST(2.0 AS FLOAT), CAST(0.5 AS FLOAT))) AS d""".stripMargin)
      .collect()(0).getLong(0)
    assert(r == 4L * 1000000000000L) // 1.5*2 + 2*0.5 = 4.0 → 4e12
  }

  test("expression participates in whole-stage codegen") {
    // repartition breaks ConvertToLocalRelation so the projection executes
    val df = vecs(4).toDF("a", "b").repartition(2)
      .select(DotQExpr(col("a"), col("b")).as("d"))
    assert(df.collect().length == 4) // finalize the adaptive plan
    val plan = df.queryExecution.executedPlan.toString
    // '*(n)' marks a WholeStageCodegen stage in plan strings
    assert(plan.contains("WholeStageCodegen") || plan.matches("(?s).*\\*\\(\\d+\\) Project.*"))
  }
}
