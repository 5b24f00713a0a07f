package graft

import org.apache.spark.sql.functions._
import graft.operators.Assoc

class AssocSpec extends SparkSpec {
  import spark.implicits._

  // b1={x,y,z} b2={x,y} b3={x,z} b4={y}; duplicate (b1,x) row must not
  // double-count
  private def baskets = Seq(
    ("b1", "x"), ("b1", "x"), ("b1", "y"), ("b1", "z"),
    ("b2", "x"), ("b2", "y"),
    ("b3", "x"), ("b3", "z"),
    ("b4", "y")
  ).toDF("bk", "it")

  test("coOccurrencePairs: dedup, unordered a<b pairs, minCount filter") {
    val got = Assoc.coOccurrencePairs(baskets, "bk", "it")
      .orderBy("item_a", "item_b")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(got.toSeq == Seq(("x", "y", 2L), ("x", "z", 2L), ("y", "z", 1L)))
    val filtered = Assoc.coOccurrencePairs(baskets, "bk", "it", minCount = 2L)
      .count()
    assert(filtered == 2)
  }

  test("coOccurrencePairs: maxBasket guard drops the mega-basket before the explosion") {
    val mega = (1 to 50).map(i => ("big", s"i$i")).toDF("bk", "it")
      .union(baskets)
    val got = Assoc.coOccurrencePairs(mega, "bk", "it", maxBasket = 10)
      .orderBy("item_a", "item_b")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    // identical to the un-polluted result: the 50-item basket is dropped
    assert(got.toSeq == Seq(("x", "y", 2L), ("x", "z", 2L), ("y", "z", 1L)))
  }

  test("associationRules: support/confidence/lift from exact counts, both directions") {
    val rules = Assoc.associationRules(baskets, "bk", "it", minPairCount = 1L)
      .collect()
      .map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))))
      .toMap // keyed (antecedent, consequent)
    // n=4, cnt: x=3 y=3 z=2; (x,y)=2 (x,z)=2 (y,z)=1
    assert(rules.size == 6, "both directions of all three pairs")
    val (cntXY, supXY, confXY, liftXY) = rules(("x", "y"))
    assert(cntXY == 2L && supXY == 0.5 && confXY == 2.0 / 3.0)
    assert(liftXY == (2.0 * 4.0) / (3.0 * 3.0))
    val (_, _, confZX, liftZX) = rules(("z", "x"))
    assert(confZX == 1.0, "z always co-occurs with x")
    assert(liftZX == (2.0 * 4.0) / (2.0 * 3.0))
    // direction changes confidence, not lift
    assert(rules(("x", "z"))._4 == rules(("z", "x"))._4)
    assert(rules(("x", "z"))._3 == 2.0 / 3.0)
  }

  test("frequentTriples: ordered triples, counts, cubic guard") {
    // b1={x,y,z,w} b2={x,y,z} b3={x,y,w}: (x,y,z) twice, (x,y,w) twice,
    // (x,z,w)/(y,z,w)/(x,y,z,w)-subsets once
    val tdf = Seq(
      ("b1", "x"), ("b1", "y"), ("b1", "z"), ("b1", "w"),
      ("b2", "x"), ("b2", "y"), ("b2", "z"),
      ("b3", "x"), ("b3", "y"), ("b3", "w")
    ).toDF("bk", "it")
    val got = Assoc.frequentTriples(tdf, "bk", "it", minCount = 2L)
      .orderBy("item_a", "item_b", "item_c")
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2), r.getLong(3)))
    // lexicographic item order: {x,y,w} canonicalizes to (w,x,y)
    assert(got.toSeq == Seq(("w", "x", "y", 2L), ("x", "y", "z", 2L)))
    // the guard drops a poisoned basket before the cubic explosion
    val mega = (1 to 80).map(i => ("big", s"i$i")).toDF("bk", "it").union(tdf)
    val guarded = Assoc.frequentTriples(mega, "bk", "it", minCount = 2L, maxBasket = 10)
      .orderBy("item_a", "item_b", "item_c")
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(guarded.toSeq == got.toSeq)
  }

  test("itemSimilarity: exact cosine from count product, both directions, top-k rank") {
    // x,y together in 2 of: x in 3 baskets, y in 2 -> cos = 2/sqrt(6)
    val df = Seq(
      ("b1", "x"), ("b1", "y"),
      ("b2", "x"), ("b2", "y"),
      ("b3", "x"), ("b3", "z"), ("b4", "z")).toDF("bk", "it")
    val out = Assoc.itemSimilarity(df, "bk", "it", k = 5, minPairCount = 2L)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3), r.getInt(4))).toMap
    // only the (x,y) pair reaches minPairCount=2; both directions emitted
    assert(out.keySet == Set(("x", "y"), ("y", "x")))
    assert(out(("x", "y")) == ((2L, 0.816497, 1)))
    assert(out(("y", "x")) == ((2L, 0.816497, 1)))
    // rank orders by cosine desc with neighbor tie-break
    val multi = Seq(
      ("c1", "a"), ("c1", "b"), ("c2", "a"), ("c2", "b"),  // a-b twice
      ("c3", "a"), ("c3", "c"), ("c4", "a"), ("c4", "c"),
      ("c5", "a"), ("c5", "c"), ("c6", "c")).toDF("bk", "it")
    val ranks = Assoc.itemSimilarity(multi, "bk", "it", k = 1, minPairCount = 2L)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    // a: cos(a,c)=3/sqrt(5*4)=0.67, cos(a,b)=2/sqrt(5*2)=0.63 -> c first
    assert(ranks("a") == "c")
  }
}
