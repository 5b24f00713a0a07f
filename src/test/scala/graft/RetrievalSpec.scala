package graft

import org.apache.spark.sql.functions._
import graft.operators.Retrieval

class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (0L, "spark joins data with spark hash joins"), // tf(spark)=2, short
    (1L, "window window window window window window window window"), // high tf one term
    (2L, "merge sort merge join merge scan"),
    (3L, "nothing relevant here at all plain words only"),
    (4L, "spark window hash merge spark window hash merge") // all terms
  ).toDF("doc_id", "text")

  test("bm25TopK: docs matching more query terms outrank term-free docs; rank is dense from 1") {
    val out = Retrieval.bm25TopK(docs, "doc_id", "text",
      Seq("spark", "window", "hash", "merge"), k = 10).collect()
    val ids = out.map(_.getLong(0))
    // doc 3 has no query term: absent entirely
    assert(!ids.contains(3L))
    assert(out.map(_.getInt(2)).toSeq == (1 to out.length))
    // scores strictly ordered with the declared tie-break
    val scores = out.map(_.getDouble(1))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    // doc 4 contains every query term twice in 8 tokens: top rank
    assert(ids.head == 4L)
  }

  test("bm25TopK: tf saturation — k1 bounds a single term's contribution") {
    // doc 1 repeats one term 8x; its bm25 must be below 8x a single
    // occurrence's contribution (the k1 saturation property)
    val one = Seq((10L, "window plain plain plain plain plain plain plain"))
      .toDF("doc_id", "text")
    val both = docs.unionAll(one)
    val out = Retrieval.bm25TopK(both, "doc_id", "text", Seq("window"), k = 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out(1L) < 8 * out(10L))
    assert(out(1L) > out(10L)) // but more occurrences still score higher
  }

  test("bm25TopK: invalid args raise") {
    intercept[IllegalArgumentException] {
      Retrieval.bm25TopK(docs, "doc_id", "text", Seq.empty, 5)
    }
    intercept[IllegalArgumentException] {
      Retrieval.bm25TopK(docs, "doc_id", "text", Seq("x"), 0)
    }
  }

  test("rrfFuse: agreement wins — an id ranked well by both lists beats a single #1") {
    val a = Seq((1L, 1), (2L, 2), (3L, 3)).toDF("id", "rank")
    val b = Seq((4L, 1), (2L, 2), (3L, 3)).toDF("id", "rank")
    val out = Retrieval.rrfFuse(Seq(a, b), "id", "rank", k = 4).collect()
    // id 2 appears at rank 2 in BOTH lists: 2/62 > 1/61 (either solo #1)
    assert(out.head.getLong(0) == 2L)
    assert(out.map(_.getInt(2)).toSeq == (1 to out.length))
  }

  test("rrfFuse: ids missing from one list still score from the other (published semantics)") {
    val a = Seq((1L, 1)).toDF("id", "rank")
    val b = Seq((2L, 1), (1L, 2)).toDF("id", "rank")
    val out = Retrieval.rrfFuse(Seq(a, b), "id", "rank", k = 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out.keySet == Set(1L, 2L))
    assert(out(1L) > out(2L)) // 1/61 + 1/62 > 1/61
  }
}
