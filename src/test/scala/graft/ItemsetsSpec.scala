package graft

import graft.operators.Itemsets

class ItemsetsSpec extends SparkSpec {
  import spark.implicits._

  // 4 baskets: {x,y,z}, {x,y}, {x,z}, {y} — duplicates inside a basket
  // must not inflate supports
  private def baskets = Seq(
    (1L, "x"), (1L, "y"), (1L, "z"), (1L, "x"),
    (2L, "x"), (2L, "y"),
    (3L, "x"), (3L, "z"),
    (4L, "y")
  ).toDF("basket", "item")

  test("frequentPairs: apriori prune and canonical a<b pairs") {
    val pairs = Itemsets.frequentPairs(baskets, "basket", "item",
        minItemSupport = 2L, minPairSupport = 2L)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    // supports: x=3, y=3, z=2; pairs ≥2: (x,y)=2, (x,z)=2; (y,z)=1 drops
    assert(pairs == Set(("x", "y", 2L), ("x", "z", 2L)))
  }

  test("associationRules: confidence and lift from exact counts, both directions") {
    val rules = Itemsets.associationRules(baskets, "basket", "item",
        minItemSupport = 2L, minPairSupport = 2L)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5), r.getDouble(6)))
      .toMap
    assert(rules.keySet == Set(("x", "y"), ("y", "x"), ("x", "z"), ("z", "x")))
    // x→y: conf 2/3, lift 2*4/(3*3); z→x: conf 2/2=1, lift 2*4/(2*3)
    val (psXY, saXY, scXY, confXY, liftXY) = rules(("x", "y"))
    assert((psXY, saXY, scXY) == (2L, 3L, 3L))
    assert(math.abs(confXY - 0.666667) < 1e-9)
    assert(math.abs(liftXY - 0.888889) < 1e-9)
    val (_, _, _, confZX, liftZX) = rules(("z", "x"))
    assert(confZX == 1.0)
    assert(math.abs(liftZX - 1.333333) < 1e-9)
  }
}
