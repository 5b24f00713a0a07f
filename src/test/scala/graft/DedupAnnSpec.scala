package graft

import org.apache.spark.sql.functions._
import graft.operators.{Ann, Dedup}

class DedupAnnSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (0L, "the quick brown fox jumps over the lazy dog"),
    (1L, "the quick brown fox jumps over the lazy cat"),
    (2L, "completely different words entirely here now folks"),
    (3L, "the quick brown fox jumps over the lazy dog"), // exact dup of 0
    (4L, "another unrelated sentence with its own tokens")
  ).toDF("doc_id", "text")

  test("exactGroups: dup group keeps min id with multiplicity") {
    val g = Dedup.exactGroups(docs, "text", "doc_id").collect()
    val dupGroup = g.find(_.getLong(1) == 2L).get
    assert(dupGroup.getLong(0) == 0L)
    assert(g.length == 4)
    assert(Dedup.exactDedup(docs, "text", "doc_id").count() == 4)
  }

  test("minhash LSH finds exact and near dups, verified by Jaccard") {
    val sigs = Dedup.minhashSignatures(docs, "doc_id", "text", 16, 3)
    assert(sigs.count() == 5)
    val cands = Dedup.minhashCandidates(sigs, "doc_id", 16, 4)
    val verified = Dedup.jaccardForPairs(cands, docs, "doc_id", "text", 3)
      .filter(col("jaccard") >= 0.5).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(verified.contains((0L, 3L))) // exact dup must survive any LSH
  }

  test("ngramJaccardPairs: exact dup pair has jaccard 1.0") {
    val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.5).collect()
    val exact = pairs.find(r => r.getLong(0) == 0L && r.getLong(1) == 3L).get
    assert(math.abs(exact.getDouble(2) - 1.0) < 1e-12)
  }

  test("simhash: identical docs get identical hashes, near docs small hamming") {
    val sh = Dedup.simhash(docs, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sh(0L) == sh(3L))
    val hammingNear = java.lang.Long.bitCount(sh(0L) ^ sh(1L))
    val hammingFar = java.lang.Long.bitCount(sh(0L) ^ sh(2L))
    assert(hammingNear < hammingFar)
    val cands = Dedup.simhashCandidates(
      Dedup.simhash(docs, "doc_id", "text"), "doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(cands.contains((0L, 3L)))
  }

  test("ANN brute force: self-similar corpus ranks exact copy first") {
    val emb = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f)),
      (1L, Array(0.9f, 0.1f, 0.0f)),
      (2L, Array(0.0f, 1.0f, 0.0f)),
      (3L, Array(1.0f, 0.0f, 0.0f))).toDF("vec_id", "embedding")
    val res = Ann.bruteForceTopK(emb, emb.filter(col("vec_id") === 0), "vec_id", "embedding", 2)
      .collect()
    assert(res.head.getLong(1) == 3L) // exact copy is rank 1
    assert(math.abs(res.head.getDouble(2) - 1.0) < 1e-12)
  }

  test("LSH ANN recall vs brute force on real embeddings >= 0.3") {
    val emb = core.Tables.load(spark, sf, "embeddings")
    val queries = emb.filter(col("vec_id") < 10)
    val exact = Ann.bruteForceTopK(emb, queries, "vec_id", "embedding", 5)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Ann.lshTopK(emb, queries, "vec_id", "embedding", 5)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.4, s"recall $recall") // 8 tables x 4 planes
  }
}
